package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.operators.Medallion

class MedallionSpec extends SparkSpec {
  import TestSpark.sf

  private lazy val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
  private val asOf = LocalDate.of(2022, 2, 28)

  test("snapshotDiff: add/remove/change verdicts; NULL never collides with empty string") {
    import spark.implicits._
    val a = Seq((1L, Option("x")), (2L, Option("y")), (3L, Option("")), (5L, Option("k")))
      .toDF("id", "v")
    val b = Seq((1L, Option("x")), (2L, Option("y2")), (3L, Option.empty[String]), (4L, Option("new")))
      .toDF("id", "v")
    val out = graft.operators.Relational.snapshotDiff(a, b, Seq("id"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // id 1 unchanged (absent); id 3 is '' -> NULL, which MUST read as changed
    assert(out == Map(2L -> "changed", 3L -> "changed", 4L -> "added", 5L -> "removed"))
  }

  test("snapshotDiff: per-column digests kill separator-shift and NULL-sentinel collisions") {
    import spark.implicits._
    // adversarial tuple pairs: ("a|b","c") vs ("a","b|c") concatenate
    // identically under any raw separator-joined concat (value content
    // shifts across the column boundary); ("null", x) vs (NULL, x) would
    // collide with a sentinel-string NULL marker. Both MUST read as
    // changed; identical tuples CONTAINING the separator must not diff.
    val a = Seq((1L, Option("a|b"), Option("c")), (2L, Option("null"), Option("x")),
        (3L, Option("|"), Option("|")))
      .toDF("id", "v1", "v2")
    val b = Seq((1L, Option("a"), Option("b|c")), (2L, Option.empty[String], Option("x")),
        (3L, Option("|"), Option("|")))
      .toDF("id", "v1", "v2")
    val out = graft.operators.Relational.snapshotDiff(a, b, Seq("id"), Seq("v1", "v2"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "changed", 2L -> "changed"))
  }

  test("silverToGold: min <= max and diff = max - min for every group") {
    val gold = Medallion.silverToGold(lineitem, "l_returnflag", "l_extendedprice", asOf).collect()
    assert(gold.nonEmpty)
    gold.foreach { r =>
      val mn = r.getDecimal(1); val mx = r.getDecimal(2); val diff = r.getDecimal(3)
      assert(mn.compareTo(mx) <= 0)
      assert(mx.subtract(mn).compareTo(diff) == 0)
      assert(r.getInt(4) == 2022 && r.getInt(5) == 2 && r.getInt(6) == 28)
    }
  }

  test("bronzeToSilver: distinct is idempotent and sorted") {
    val df = lineitem.select("l_returnflag", "l_linestatus")
    val once = Medallion.bronzeToSilver(df, Seq("l_returnflag", "l_linestatus"))
    val twice = Medallion.bronzeToSilver(once, Seq("l_returnflag", "l_linestatus"))
    assert(once.collect().toSeq == twice.collect().toSeq)
    assert(once.count() == df.distinct().count())
  }

  test("declared stage schemas match the stage outputs (names + types)") {
    import spark.implicits._
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).toSeq
    // bronze: exactly what the batch ingest parser emits
    val bronze = graft.sources.Ingest.parseBatches(spark, graft.sources.Ingest.stubBatches)
    assert(shape(bronze.schema) == shape(graft.model.Schemas.bronze))
    // gold: exactly what silverToGold emits (key column name is the caller's)
    val ticks = Seq(("BTCUSDT", new java.math.BigDecimal("1.00"))).toDF("symbol", "price")
    val gold = Medallion.silverToGold(ticks, "symbol", "price", asOf)
    assert(shape(gold.schema) == shape(graft.model.Schemas.gold))
    // serving: gold + id, all strings
    val serving = Medallion.stringify(Medallion.withSurrogateId(gold, Seq("symbol")))
    assert(shape(serving.schema) == shape(graft.model.Schemas.serving))
  }

  test("stringify preserves DECIMAL(_,2) scale in rendered strings") {
    import spark.implicits._
    val df = Seq(("x", new java.math.BigDecimal("0.88")), ("y", new java.math.BigDecimal("12.30")))
      .toDF("k", "v").select(col("k"), col("v").cast("decimal(10,2)").as("v"))
    val rows = Medallion.stringify(df).orderBy("k").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("0.88", "12.30"))
  }

  test("withSurrogateId: dense 1..n ids in key order") {
    val gold = Medallion.silverToGold(lineitem, "l_returnflag", "l_extendedprice", asOf)
    val ids = Medallion.withSurrogateId(gold, Seq("l_returnflag"))
      .select("id").collect().map(_.getString(0)).toSeq
    assert(ids == (1 to gold.count().toInt).map(_.toString))
  }

  test("withScalableSurrogateId sorts once: count and assign passes share the checkpoint") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val sc = spark.sparkContext
    val evals = sc.longAccumulator("input-partition-evals")
    val rdd = sc.parallelize(1 to 100, 4).mapPartitions { it =>
      evals.add(1); it.map(i => Row(i.toLong))
    }
    val df = spark.createDataFrame(rdd, StructType(Seq(StructField("k", LongType, false))))
    Medallion.withScalableSurrogateId(df, Seq("k")).collect()
    // repartitionByRange samples the input once (4 partition evals) and the
    // checkpointed sort reads it once more (4). Without the localCheckpoint,
    // the count pass and the assignment pass would each re-execute
    // sample+shuffle from the lineage — 16 evals.
    assert(evals.value <= 8, s"input evaluated ${evals.value}×; sort is being re-executed")
  }

  test("withScalableSurrogateId matches the window-based id assignment") {
    val df = lineitem.select("l_orderkey", "l_linenumber").limit(500)
    val windowed = Medallion.withSurrogateId(df, Seq("l_orderkey", "l_linenumber"))
      .select(col("id").cast("long"), col("l_orderkey"), col("l_linenumber"))
    val scalable = Medallion.withScalableSurrogateId(df, Seq("l_orderkey", "l_linenumber"))
      .select(col("id"), col("l_orderkey"), col("l_linenumber"))
    assert(windowed.orderBy("id").collect().toSeq == scalable.orderBy("id").collect().toSeq)
  }

  test("quarantine: violated names attach in order, NULL counts as violation, clean rows empty") {
    import spark.implicits._
    val df = Seq[(Long, java.lang.Double, String)](
      (1L, 5.0, "ok"),      // clean
      (2L, -1.0, "ok"),     // fails positive
      (3L, null, "ok"),     // NULL -> violation (silence is not compliance)
      (4L, -2.0, null)      // fails both
    ).toDF("id", "v", "s")
    val out = graft.operators.Relational.quarantine(df, Seq(
        "v_positive" -> (col("v") > 0),
        "s_present" -> col("s").isNotNull))
      .select(col("id"), col("violations"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    assert(out(1L) == Seq())
    assert(out(2L) == Seq("v_positive"))
    assert(out(3L) == Seq("v_positive"), s"NULL must quarantine: $out")
    assert(out(4L) == Seq("v_positive", "s_present"), "names keep declaration order")
    // map-side only: no exchange in the plan
    val plan = graft.operators.Relational.quarantine(df, Seq("v_positive" -> (col("v") > 0)))
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"quarantine must not shuffle:\n${plan.take(800)}")
  }
}
