package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io._
import graft.sources.{Ingest, StubTickerFetcher}

class PipelineSpec extends SparkSpec {
  import TestSpark.tmpDir

  test("end-to-end: stub feed -> bronze -> silver -> gold -> both sinks") {
    val root = tmpDir("pipe")
    val wh = new StagedWarehouseSink(s"$root/staging", s"$root/warehouse")
    val pipe = new Pipeline(ParquetTableFormat, wh, JsonDocumentSink)

    val ingested = Ingest.ingest(spark, new StubTickerFetcher(Ingest.stubBatches), 4)
    val serving = pipe.run(spark, ingested, root, LocalDate.of(2022, 2, 28))

    // stage schemas (SURVEY.md §1.1)
    val bronze = spark.read.parquet(s"$root/bronze")
    assert(bronze.schema("symbol").dataType == StringType)
    assert(bronze.schema("price").dataType == DecimalType(10, 2))

    val silver = spark.read.parquet(s"$root/silver")
    assert(silver.count() == silver.distinct().count()) // deduped
    // 4 polls of 2 alternating batches -> exactly the 10 distinct filtered rows
    assert(silver.count() == 10)

    val gold = ParquetTableFormat.read(spark, s"$root/gold")
    assert(gold.columns.toSet ==
      Set("symbol", "min_value", "max_value", "diff", "as_of_year", "as_of_month", "as_of_day"))
    assert(gold.count() == 5) // one row per tracked symbol
    // partition pruning columns recovered from layout
    assert(gold.filter(col("as_of_year") === 2022).count() == 5)

    // declared schema contracts: Schemas.gold/serving must equal what the
    // pipeline actually emits (they drifted once; this pins them). Names and
    // types — nullability is lossy through a parquet round-trip.
    assert(gold.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      graft.model.Schemas.gold.fields.map(f => (f.name, f.dataType)).toSeq,
      s"gold schema drifted from Schemas.gold: ${gold.schema.simpleString}")
    assert(serving.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      graft.model.Schemas.serving.fields.map(f => (f.name, f.dataType)).toSeq,
      s"serving schema drifted from Schemas.serving: ${serving.schema.simpleString}")

    // serving: all strings + id, landed in both sinks
    assert(serving.schema.fields.forall(_.dataType == StringType))
    assert(wh.read(spark, "gold_serving").count() == 5)
    assert(spark.read.text(s"$root/documents").count() == 5)
    serving.unpersist()
  }
}
