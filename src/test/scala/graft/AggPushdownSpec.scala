package graft

import org.apache.spark.sql.functions._

/** DSv2 aggregate pushdown (SupportsPushDownAggregates on
  * GraftScanBuilder): COUNT/MIN/MAX — optionally GROUP BY partition
  * columns — served at plan time from commit metadata + parquet footers,
  * with the Aggregate node GONE from the plan. Every pushed answer is
  * cross-checked against the ordinary scan with the pushdown disabled,
  * and every exactness refusal (MOR debt, WHERE present, string min/max,
  * DISTINCT) is pinned to fall back — never to a wrong answer.
  */
class AggPushdownSpec extends SparkSpec {
  import TestSpark._

  private lazy val warehouse: String = {
    val w = tmpDir("gagg_wh")
    spark.conf.set("spark.sql.catalog.gagg", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gagg.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gagg.db")
    w
  }

  private def planOf(sql: String): String =
    spark.sql(sql).queryExecution.executedPlan.toString

  private def assertPushed(sql: String): Unit = {
    val p = planOf(sql)
    assert(p.contains("GraftAggScan"), s"expected pushed aggregation:\n${p.take(1200)}")
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
      s"expected NO aggregate node:\n${p.take(1200)}")
    assert(!p.contains("Exchange"), s"expected NO exchange:\n${p.take(1200)}")
  }

  private def assertFallback(sql: String): Unit = {
    val p = planOf(sql)
    assert(!p.contains("GraftAggScan"), s"expected ordinary scan:\n${p.take(1200)}")
  }

  /** Same query with the pushdown disabled — the ground truth. */
  private def truth(sql: String): Seq[Seq[Any]] = {
    spark.conf.set("spark.graft.aggPushdown", "false")
    try {
      val rows = spark.sql(sql).collect().toSeq.map(_.toSeq)
      assertFallback(sql)
      rows
    } finally spark.conf.set("spark.graft.aggPushdown", "true")
  }

  private def sortedRows(rows: Seq[Seq[Any]]): Seq[String] =
    rows.map(_.mkString("|")).sorted

  private def checkAgainstTruth(sql: String): Unit = {
    assertPushed(sql)
    val pushed = spark.sql(sql).collect().toSeq.map(_.toSeq)
    assert(sortedRows(pushed) == sortedRows(truth(sql)),
      s"pushed result diverged for: $sql")
  }

  test("agg pushdown: global COUNT/MIN/MAX/COUNT(col) from metadata — no aggregate node, exact") {
    warehouse
    spark.sql(
      """CREATE TABLE gagg.db.t (id BIGINT, grp STRING, v INT, s STRING)
        |PARTITIONED BY (grp)
        |TBLPROPERTIES ('graft.stats.columns' = 'id')""".stripMargin)
    // two commits; NULLs in v and a NULL partition value; s carries strings
    spark.sql("INSERT INTO gagg.db.t SELECT id, concat('g', id % 3), " +
      "CASE WHEN id % 4 = 0 THEN NULL ELSE CAST(id AS INT) END, " +
      "concat('s', id) FROM range(1, 51)")
    spark.sql("INSERT INTO gagg.db.t SELECT id, " +
      "CASE WHEN id % 10 = 0 THEN NULL ELSE concat('g', id % 3) END, " +
      "CAST(id AS INT), concat('s', id) FROM range(100, 161)")
    checkAgainstTruth(
      "SELECT count(*) AS n, count(v) AS nv, min(id) AS lo, max(id) AS hi, " +
        "min(v) AS vlo, max(v) AS vhi FROM gagg.db.t")
  }

  test("agg pushdown: GROUP BY partition column — zero Exchange, zero Aggregate, NULL partition grouped") {
    warehouse
    checkAgainstTruth(
      "SELECT grp, count(*) AS n, min(id) AS lo, max(id) AS hi " +
        "FROM gagg.db.t GROUP BY grp")
    // partition column as an aggregate input (path-sourced — exact even
    // for strings, which footers would refuse)
    checkAgainstTruth(
      "SELECT count(grp) AS ng, min(grp) AS glo, max(grp) AS ghi FROM gagg.db.t")
  }

  test("agg pushdown: all-NULL column serves NULL min/max; add-column evolution reads absent files as NULL") {
    warehouse
    spark.sql("CREATE TABLE gagg.db.tn (id BIGINT, w INT) " +
      "TBLPROPERTIES ('graft.stats.columns' = 'id')")
    spark.sql("INSERT INTO gagg.db.tn SELECT id, CAST(NULL AS INT) FROM range(0, 20)")
    checkAgainstTruth(
      "SELECT count(*) AS n, count(w) AS nw, min(w) AS lo, max(w) AS hi FROM gagg.db.tn")
    // add-column evolution WITHOUT default: the programmatic append widens
    // the schema; pre-evolution files physically lack `extra` and read NULL
    import spark.implicits._
    val root = s"$warehouse/db/tn"
    graft.io.VersionedTable.commit(
      Seq((1000L, 7, 42L)).toDF("id", "w", "extra"), root, "append", "agg_evo_1")
    checkAgainstTruth(
      "SELECT count(*) AS n, count(extra) AS ne, min(extra) AS lo, max(extra) AS hi " +
        "FROM gagg.db.tn")
  }

  test("agg pushdown: refusals fall back to the ordinary scan — WHERE, string min/max, DISTINCT, MOR debt, conf off") {
    warehouse
    // WHERE present: residual filters block the pushdown (skipping is
    // envelope-based, never exact row accounting)
    assertFallback("SELECT count(*) AS n FROM gagg.db.t WHERE id > 10")
    assert(spark.sql("SELECT count(*) AS n FROM gagg.db.t WHERE id > 10")
      .head().getLong(0) ==
      spark.table("gagg.db.t").where("id > 10").collect().length.toLong)
    // string MIN/MAX on a DATA column: parquet may truncate binary stats
    assertFallback("SELECT min(s) AS lo FROM gagg.db.t")
    // DISTINCT is not metadata-servable
    assertFallback("SELECT count(DISTINCT v) AS d FROM gagg.db.t")
    // MOR debt: a positional deletion vector makes footer counts overcount
    spark.sql("CREATE TABLE gagg.db.tm (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.stats.columns' = 'id')")
    spark.sql("INSERT INTO gagg.db.tm SELECT id, id * 2 FROM range(0, 30)")
    assertPushed("SELECT count(*) AS n FROM gagg.db.tm")
    // a genuine positional deletion vector (predicate-form MOR delete):
    // footer counts can't see the pending vector — the pushdown must refuse
    graft.io.VersionedTable.deletePosWhere(spark, s"$warehouse/db/tm",
      "v = 14", "agg_mor_dv")
    assertFallback("SELECT count(*) AS n FROM gagg.db.tm")
    assert(spark.sql("SELECT count(*) AS n FROM gagg.db.tm").head().getLong(0) == 29L)
    // conf off
    spark.conf.set("spark.graft.aggPushdown", "false")
    try assertFallback("SELECT count(*) AS n FROM gagg.db.t")
    finally spark.conf.set("spark.graft.aggPushdown", "true")
  }

  test("agg pushdown: VERSION AS OF pins the metadata answer; DATE min/max round-trips") {
    warehouse
    spark.sql("CREATE TABLE gagg.db.tv (id BIGINT, d DATE) " +
      "TBLPROPERTIES ('graft.stats.columns' = 'id')")
    spark.sql("INSERT INTO gagg.db.tv SELECT id, " +
      "date_add(DATE'2024-03-01', CAST(id AS INT)) FROM range(0, 10)") // v2
    spark.sql("INSERT INTO gagg.db.tv SELECT id + 100, " +
      "date_add(DATE'2024-06-01', CAST(id AS INT)) FROM range(0, 10)") // v3
    // time travel: the aggregation answers from the PINNED snapshot's
    // metadata — and still with no aggregate node
    val tt = spark.sql(
      "SELECT count(*) AS n, min(d) AS lo, max(d) AS hi FROM gagg.db.tv VERSION AS OF 2")
    assert(tt.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      tt.queryExecution.executedPlan.toString.take(600))
    val r = tt.head()
    assert(r.getLong(0) == 10L &&
      r.getDate(1).toString == "2024-03-01" && r.getDate(2).toString == "2024-03-10", r.toString)
    checkAgainstTruth("SELECT count(*) AS n, min(d) AS lo, max(d) AS hi FROM gagg.db.tv")
  }

  test("agg pushdown: GROUP BY a DATE partition key — zero tasks under a claimed DATE filter too") {
    warehouse
    spark.sql("CREATE TABLE gagg.db.dday (id BIGINT, day DATE, v BIGINT) " +
      "PARTITIONED BY (day) TBLPROPERTIES ('graft.stats.columns' = 'id')")
    spark.sql("INSERT INTO gagg.db.dday SELECT id, " +
      "date_add(DATE '2024-06-01', CAST(id % 3 AS INT)), id FROM range(0, 30)")
    spark.sql("INSERT INTO gagg.db.dday SELECT 100 + id, NULL, id FROM range(0, 4)")
    // the canonical day-partitioned report: grouped row counts answered
    // from metadata — DATE group values come off hive paths exactly
    checkAgainstTruth("SELECT day, count(*) FROM gagg.db.dday GROUP BY day")
    checkAgainstTruth("SELECT min(day), max(day), count(day) FROM gagg.db.dday")
    // composed with a CLAIMED DATE partition predicate: still zero tasks
    checkAgainstTruth(
      "SELECT count(*) FROM gagg.db.dday WHERE day = DATE '2024-06-02'")
    checkAgainstTruth(
      "SELECT day, count(*) FROM gagg.db.dday WHERE day IS NOT NULL GROUP BY day")
  }

  test("agg pushdown: timestamp min/max (micros annotation) and empty/declared-only tables") {
    warehouse
    spark.sql("CREATE TABLE gagg.db.tt (id BIGINT, ts TIMESTAMP)")
    spark.sql("INSERT INTO gagg.db.tt SELECT id, " +
      "timestampadd(SECOND, CAST(id AS INT), TIMESTAMP'2024-01-01 00:00:00') " +
      "FROM range(0, 25)")
    checkAgainstTruth(
      "SELECT count(*) AS n, min(ts) AS lo, max(ts) AS hi FROM gagg.db.tt")
    // declared-but-empty table: one row of zeros/NULLs, still no scan job
    spark.sql("CREATE TABLE gagg.db.te (id BIGINT, v INT)")
    checkAgainstTruth(
      "SELECT count(*) AS n, count(v) AS nv, min(v) AS lo FROM gagg.db.te")
  }
}
