package graft

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.{DocumentSink, TableFormat, WarehouseSink}
import graft.operators.Medallion

/** End-to-end medallion pipeline: ingest → bronze → silver → gold →
  * {warehouse, documents} (reference DAG chain etl-vini-azure.py:408:
  * bronze2silver >> silver2gold >> [gold2cosmosdb, gold2synapse]).
  *
  * The Airflow `>>` graph becomes plain sequencing; the two serving sinks
  * share one cached gold scan instead of re-reading gold independently the
  * way the reference notebooks do (goldToCosmosdb.scala:24, goldToSynapse.scala:24).
  */
final class Pipeline(fmt: TableFormat, warehouse: WarehouseSink, docs: DocumentSink) {

  /** Runs the full chain rooted at `root`; returns the serving DataFrame. */
  def run(spark: SparkSession, ingested: DataFrame, root: String, asOf: LocalDate,
          keyCol: String = "symbol", valueCol: String = "price"): DataFrame = {
    // bronze: raw ingest landed columnar
    fmt.write(ingested, s"$root/bronze")
    val bronze = fmt.read(spark, s"$root/bronze")

    // silver: global dedup + sort (codes/bronzeToSilver.scala:7-15)
    val silver = Medallion.bronzeToSilver(bronze, Seq(keyCol))
    fmt.write(silver, s"$root/silver")

    // gold: per-key min/max/spread + as-of partitions (codes/silverToGold.scala:10-26)
    val gold = Medallion.silverToGold(fmt.read(spark, s"$root/silver"), keyCol, valueCol, asOf)
    fmt.write(gold, s"$root/gold", partitionCols = Seq("as_of_year", "as_of_month", "as_of_day"))

    // serving: surrogate id + stringify, fanned out to both sinks off one scan
    val serving = Medallion.stringify(
      Medallion.withSurrogateId(fmt.read(spark, s"$root/gold")
        .select(keyCol, "min_value", "max_value", "diff", "as_of_year", "as_of_month", "as_of_day"),
        Seq(keyCol))).cache()
    warehouse.append(serving, "gold_serving")
    docs.write(serving, s"$root/documents")
    serving
  }
}
