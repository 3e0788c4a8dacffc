package graft

/** Residual-free partition predicates (GraftPartitionFilters +
  * GraftScanBuilder.pushFilters): exact `=` / `IN` / `IS [NOT] NULL`
  * over hive partition columns are CLAIMED, so Spark drops its Filter
  * node, and every scan shape enforces them — keyed groups, the V1
  * fallback's DataFrame filter, row-coordinate file sets, and the
  * metadata aggregation (which therefore now composes with WHERE
  * partition = v). Every claim is cross-checked against the same query
  * with the pushdown disabled, including escaped path values and NULL
  * partitions.
  */
class PartitionFilterSpec extends SparkSpec {
  import TestSpark._

  private lazy val warehouse: String = {
    val w = tmpDir("gpf_wh")
    spark.conf.set("spark.sql.catalog.gpf", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gpf.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gpf.db")
    spark.sql("CREATE TABLE gpf.db.t (id BIGINT, grp STRING, n INT, v BIGINT) " +
      "PARTITIONED BY (grp, n) TBLPROPERTIES ('graft.stats.columns' = 'id')")
    // values exercising path escaping (':' '%' ' ') and a NULL partition
    spark.sql("INSERT INTO gpf.db.t SELECT id, " +
      "CASE WHEN id % 5 = 0 THEN NULL " +
      "     WHEN id % 5 = 1 THEN 'a:b' WHEN id % 5 = 2 THEN 'p%q' " +
      "     WHEN id % 5 = 3 THEN 'w s' ELSE 'plain' END, " +
      "CAST(id % 3 AS INT), id * 10 FROM range(0, 200)")
    w
  }

  private def filterNodes(df: org.apache.spark.sql.DataFrame): Int = {
    val rx = "(?m)^[\\s:+\\-]*(?:\\*\\(\\d+\\) )?Filter\\b".r
    rx.findAllIn(df.queryExecution.executedPlan.toString).length
  }

  /** Pushed result vs the same query with the claim disabled. */
  private def check(sql: String, expectNoFilter: Boolean = true): Unit = {
    val pushedQ = spark.sql(sql)
    if (expectNoFilter)
      assert(filterNodes(pushedQ) == 0,
        s"expected NO Filter node for: $sql\n${pushedQ.queryExecution.executedPlan.toString.take(900)}")
    val got = pushedQ.collect().map(_.toSeq.mkString("|")).sorted.toSeq
    spark.conf.set("spark.graft.partitionFilterPushdown", "false")
    try {
      val truthQ = spark.sql(sql)
      assert(filterNodes(truthQ) > 0 || !expectNoFilter,
        "truth run should keep the Filter node")
      val want = truthQ.collect().map(_.toSeq.mkString("|")).sorted.toSeq
      assert(got == want, s"claimed-filter result diverged for: $sql")
    } finally spark.conf.set("spark.graft.partitionFilterPushdown", "true")
  }

  test("partition filters: = / IN / IS NULL / IS NOT NULL claim residual-free and stay exact (escaped values included)") {
    warehouse
    check("SELECT id, v FROM gpf.db.t WHERE grp = 'plain'")
    check("SELECT id, v FROM gpf.db.t WHERE grp = 'a:b'")
    check("SELECT id, v FROM gpf.db.t WHERE grp = 'p%q'")
    check("SELECT id, v FROM gpf.db.t WHERE grp = 'w s'")
    check("SELECT id, v FROM gpf.db.t WHERE grp IN ('a:b', 'w s')")
    check("SELECT id, v FROM gpf.db.t WHERE grp IS NULL")
    check("SELECT id, v FROM gpf.db.t WHERE grp IS NOT NULL AND n = 2")
    check("SELECT id, v FROM gpf.db.t WHERE n IN (0, 1)")
    // no matching partition value: zero groups → empty, still no Filter
    check("SELECT id FROM gpf.db.t WHERE grp = 'absent'")
    assert(spark.sql("SELECT id FROM gpf.db.t WHERE grp = 'absent'").count() == 0L)
  }

  test("partition filters: mixed predicate keeps only the residual in the Filter node") {
    warehouse
    val q = spark.sql("SELECT id FROM gpf.db.t WHERE grp = 'plain' AND v > 500")
    val plan = q.queryExecution.executedPlan.toString
    assert(filterNodes(q) == 1, plan.take(600))
    // the Filter OPERATOR lines must not mention grp (the scan's own
    // PartitionFilters tag of course does — that's the claim)
    val filterLines = plan.linesIterator.filter(
      _.matches("^[\\s:+\\-]*(?:\\*\\(\\d+\\) )?Filter\\b.*")).toSeq
    assert(filterLines.nonEmpty && filterLines.forall(!_.contains("grp")),
      s"grp must not appear in the Filter node:\n${plan.take(900)}")
    check("SELECT id FROM gpf.db.t WHERE grp = 'plain' AND v > 500",
      expectNoFilter = false)
  }

  test("partition filters: compose with the metadata aggregation — COUNT under WHERE partition, zero data tasks") {
    warehouse
    val q = spark.sql("SELECT count(*) AS c, min(id) AS lo, max(id) AS hi " +
      "FROM gpf.db.t WHERE grp = 'plain'")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GraftAggScan"), plan.take(900))
    assert(!plan.contains("HashAggregate"), plan.take(900))
    check("SELECT count(*) AS c, min(id) AS lo, max(id) AS hi " +
      "FROM gpf.db.t WHERE grp = 'plain'")
    check("SELECT n, count(*) AS c FROM gpf.db.t WHERE grp IS NULL GROUP BY n")
    // two DIFFERENT claimed aggregations in one query must not share a
    // scan via exchange/subquery reuse (identity includes the claim) —
    // pinned by exact per-claim counts: ids 0..199, id%5==4 → 'plain'
    // (40 rows), id%3==0 → n=0 (67 rows)
    val two = spark.sql(
      "SELECT (SELECT count(*) FROM gpf.db.t WHERE grp = 'plain') AS a, " +
        "(SELECT count(*) FROM gpf.db.t WHERE n = 0) AS b").head()
    assert(two.getLong(0) == 40L && two.getLong(1) == 67L,
      s"${two.getLong(0)} / ${two.getLong(1)}")
  }

  test("partition filters: V1 fallback route enforces via DataFrame filter (bucketing off)") {
    warehouse
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    try {
      val q = spark.sql("SELECT id, v FROM gpf.db.t WHERE grp = 'plain' AND id >= 0")
      assert(q.queryExecution.executedPlan.toString.contains("PartitionFilters"),
        q.queryExecution.executedPlan.toString.take(900))
      val got = q.collect().map(_.getLong(0)).sorted.toSeq
      assert(got.nonEmpty && got.forall(_ % 5 == 4))
    } finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
  }

  test("partition filters: row-coordinate introspection and DML honor the claim") {
    warehouse
    // _graft_file/_graft_pos scan with a claimed partition filter: the
    // delta scan's file set drops non-matching key values exactly
    val coords = spark.sql("SELECT id, _graft_pos FROM gpf.db.t WHERE grp = 'w s'")
      .collect()
    assert(coords.nonEmpty && coords.forall(_.getLong(0) % 5 == 3))
    // DML with a partition predicate touches ONLY the intended rows
    spark.sql("CREATE TABLE gpf.db.dml (id BIGINT, grp STRING, v BIGINT) " +
      "PARTITIONED BY (grp)")
    spark.sql("INSERT INTO gpf.db.dml SELECT id, concat('g', id % 2), id " +
      "FROM range(0, 40)")
    spark.sql("UPDATE gpf.db.dml SET v = v + 1000 WHERE grp = 'g1'")
    val rows = spark.table("gpf.db.dml").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows.count { case (id, g, v) => g == "g1" && v == id + 1000 } == 20)
    assert(rows.count { case (id, g, v) => g == "g0" && v == id } == 20)
    spark.sql("DELETE FROM gpf.db.dml WHERE grp = 'g0'")
    assert(spark.table("gpf.db.dml").collect().forall(_.getString(1) == "g1"))
  }

  test("partition filters: DATE partition keys claim residual-free — keyed scan, epoch-day-exact equality") {
    warehouse
    spark.sql("CREATE TABLE gpf.db.d (id BIGINT, day DATE, v BIGINT) " +
      "PARTITIONED BY (day) TBLPROPERTIES ('graft.stats.columns' = 'id')")
    spark.sql("INSERT INTO gpf.db.d SELECT id, " +
      "date_add(DATE '2024-03-01', CAST(id % 4 AS INT)), id * 10 FROM range(0, 40)")
    spark.sql("INSERT INTO gpf.db.d SELECT 1000 + id, NULL, id FROM range(0, 3)")
    // = / IN / IS [NOT] NULL all claim (the literal arrives as
    // java.sql.Date or LocalDate per the java8API setting; the path
    // parse yields java.sql.Date — epoch-day normalization makes the
    // comparison representation-proof), cross-checked vs the kill switch
    check("SELECT id, v FROM gpf.db.d WHERE day = DATE '2024-03-02'")
    check("SELECT id, v FROM gpf.db.d WHERE day IN (DATE '2024-03-01', DATE '2024-03-03')")
    check("SELECT id, v FROM gpf.db.d WHERE day IS NOT NULL")
    check("SELECT id, v FROM gpf.db.d WHERE day IS NULL")
    // DATE keys are path-round-trippable: the scan is the keyed DSv2
    // batch (KeyGroupedPartitioning), not the V1 fallback
    val q = spark.sql("SELECT id FROM gpf.db.d WHERE day = DATE '2024-03-02'")
    assert(q.queryExecution.executedPlan.toString.contains("GraftKeyedScan"),
      q.queryExecution.executedPlan.toString.take(600))
    assert(q.collect().map(_.getLong(0)).toSet == (0L until 40L).filter(_ % 4 == 1).toSet)
    // and the java8API flavor of the literal claims identically
    spark.conf.set("spark.sql.datetime.java8API.enabled", "true")
    try check("SELECT id, v FROM gpf.db.d WHERE day = DATE '2024-03-02'")
    finally spark.conf.set("spark.sql.datetime.java8API.enabled", "false")
  }

  test("partition filters: row-level DML on a DATE-partitioned table — delta and copy-on-write routes") {
    warehouse
    spark.sql("CREATE TABLE gpf.db.ddml (id BIGINT, day DATE, v BIGINT) " +
      "PARTITIONED BY (day)")
    spark.sql("INSERT INTO gpf.db.ddml SELECT id, " +
      "date_add(DATE '2024-03-01', CAST(id % 2 AS INT)), id FROM range(0, 20)")
    // merge-on-read (default): UPDATE under a claimed DATE predicate
    // writes one positional vector + post-images in the SAME hive
    // yyyy-MM-dd layout (keyString's DATE spelling)
    spark.sql("UPDATE gpf.db.ddml SET v = v + 1000 WHERE day = DATE '2024-03-02'")
    val rows = spark.table("gpf.db.ddml").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2))).toSeq
    assert(rows.count { case (id, d, v) => d == "2024-03-02" && v == id + 1000 } == 10)
    assert(rows.count { case (id, d, v) => d == "2024-03-01" && v == id } == 10)
    // reading back by the updated partition still claims residual-free
    check("SELECT id, v FROM gpf.db.ddml WHERE day = DATE '2024-03-02'",
      expectNoFilter = false) // MOR debt → V1 fallback keeps claim enforcement
    // copy-on-write route on a fresh DATE table: DELETE rewrites only the
    // matched partition, survivors land back under day=yyyy-MM-dd
    spark.sql("CREATE TABLE gpf.db.ddml2 (id BIGINT, day DATE, v BIGINT) " +
      "PARTITIONED BY (day) " +
      "TBLPROPERTIES ('graft.dml.mode' = 'copy-on-write')")
    spark.sql("INSERT INTO gpf.db.ddml2 SELECT id, " +
      "date_add(DATE '2024-03-01', CAST(id % 2 AS INT)), id FROM range(0, 20)")
    spark.sql("DELETE FROM gpf.db.ddml2 WHERE day = DATE '2024-03-01' AND v < 6")
    val left = spark.table("gpf.db.ddml2").collect()
      .map(r => (r.getDate(1).toString, r.getLong(2))).toSeq
    assert(left.count(_._1 == "2024-03-02") == 10)
    assert(left.filter(_._1 == "2024-03-01").map(_._2).sorted
      == Seq(6L, 8L, 10L, 12L, 14L, 16L, 18L))
  }

  test("partition filters: TIMESTAMP partition keys claim residual-free — keyed scan, epoch-micros-exact equality") {
    warehouse
    spark.sql("CREATE TABLE gpf.db.ts (id BIGINT, hr TIMESTAMP, v BIGINT) " +
      "PARTITIONED BY (hr) TBLPROPERTIES ('graft.stats.columns' = 'id')")
    // hour-bucket instants — the streaming landing-table layout; the path
    // value carries an escaped space and colons
    spark.sql("INSERT INTO gpf.db.ts SELECT id, " +
      "TIMESTAMP '2024-03-01 00:00:00' + make_interval(0,0,0,0,CAST(id % 4 AS INT),0,0), " +
      "id * 10 FROM range(0, 40)")
    spark.sql("INSERT INTO gpf.db.ts SELECT 1000 + id, NULL, id FROM range(0, 3)")
    check("SELECT id, v FROM gpf.db.ts WHERE hr = TIMESTAMP '2024-03-01 01:00:00'")
    check("SELECT id, v FROM gpf.db.ts WHERE hr IN " +
      "(TIMESTAMP '2024-03-01 00:00:00', TIMESTAMP '2024-03-01 02:00:00')")
    check("SELECT id, v FROM gpf.db.ts WHERE hr IS NOT NULL")
    check("SELECT id, v FROM gpf.db.ts WHERE hr IS NULL")
    // TIMESTAMP keys are path-round-trippable (session-zone parse is the
    // exact inverse of partitionBy's session-zone spelling): keyed batch
    val q = spark.sql(
      "SELECT id FROM gpf.db.ts WHERE hr = TIMESTAMP '2024-03-01 01:00:00'")
    assert(q.queryExecution.executedPlan.toString.contains("GraftKeyedScan"),
      q.queryExecution.executedPlan.toString.take(600))
    assert(q.collect().map(_.getLong(0)).toSet
      == (0L until 40L).filter(_ % 4 == 1).toSet)
    // the java8API flavor (Instant literals) claims identically
    spark.conf.set("spark.sql.datetime.java8API.enabled", "true")
    try check("SELECT id, v FROM gpf.db.ts WHERE hr = TIMESTAMP '2024-03-01 01:00:00'")
    finally spark.conf.set("spark.sql.datetime.java8API.enabled", "false")
    // metadata aggregation composes: min/max over the TIMESTAMP key with
    // zero data tasks (path-sourced micros)
    val agg = spark.sql("SELECT min(hr), max(hr), count(*) FROM gpf.db.ts")
    assert(agg.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      agg.queryExecution.executedPlan.toString.take(600))
    val r = agg.head()
    assert(r.getTimestamp(0).toString.startsWith("2024-03-01 00:00:00") &&
      r.getTimestamp(1).toString.startsWith("2024-03-01 03:00:00") &&
      r.getLong(2) == 43L, r.toString)
  }

  test("partition filters: row-level DML on a TIMESTAMP-partitioned table — delta and copy-on-write routes") {
    warehouse
    spark.sql("CREATE TABLE gpf.db.tsdml (id BIGINT, hr TIMESTAMP, v BIGINT) " +
      "PARTITIONED BY (hr)")
    spark.sql("INSERT INTO gpf.db.tsdml SELECT id, " +
      "TIMESTAMP '2024-03-01 00:00:00' + make_interval(0,0,0,0,CAST(id % 2 AS INT),0,0), " +
      "id FROM range(0, 20)")
    // merge-on-read UPDATE under a claimed TIMESTAMP predicate:
    // post-images land back in the SAME hive layout (keyString's
    // session-zone TIMESTAMP spelling — the round trip under test)
    spark.sql("UPDATE gpf.db.tsdml SET v = v + 1000 " +
      "WHERE hr = TIMESTAMP '2024-03-01 01:00:00'")
    val rows = spark.table("gpf.db.tsdml").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2))).toSeq
    assert(rows.count { case (id, h, v) =>
      h.startsWith("2024-03-01 01:00:00") && v == id + 1000 } == 10, rows.toString)
    assert(rows.count { case (id, h, v) =>
      h.startsWith("2024-03-01 00:00:00") && v == id } == 10, rows.toString)
    // copy-on-write DELETE rewrites only the matched partition
    spark.sql("CREATE TABLE gpf.db.tsdml2 (id BIGINT, hr TIMESTAMP, v BIGINT) " +
      "PARTITIONED BY (hr) " +
      "TBLPROPERTIES ('graft.dml.mode' = 'copy-on-write')")
    spark.sql("INSERT INTO gpf.db.tsdml2 SELECT id, " +
      "TIMESTAMP '2024-03-01 00:00:00' + make_interval(0,0,0,0,CAST(id % 2 AS INT),0,0), " +
      "id FROM range(0, 20)")
    spark.sql("DELETE FROM gpf.db.tsdml2 " +
      "WHERE hr = TIMESTAMP '2024-03-01 00:00:00' AND v < 6")
    val left = spark.table("gpf.db.tsdml2").collect()
      .map(r => (r.getTimestamp(1).toString, r.getLong(2))).toSeq
    assert(left.count(_._1.startsWith("2024-03-01 01:00:00")) == 10)
    assert(left.filter(_._1.startsWith("2024-03-01 00:00:00")).map(_._2).sorted
      == Seq(6L, 8L, 10L, 12L, 14L, 16L, 18L))
  }

  test("partition filters: TIMESTAMP_NTZ partition keys claim residual-free — zone-free round trip") {
    warehouse
    spark.sql("CREATE TABLE gpf.db.ntz (id BIGINT, hr TIMESTAMP_NTZ, v BIGINT) " +
      "PARTITIONED BY (hr) TBLPROPERTIES ('graft.stats.columns' = 'id')")
    spark.sql("INSERT INTO gpf.db.ntz SELECT id, " +
      "TIMESTAMP_NTZ '2024-03-01 00:00:00' + make_interval(0,0,0,0,CAST(id % 3 AS INT),0,0), " +
      "id * 10 FROM range(0, 30)")
    // = / IN / IS NOT NULL claim; NTZ literals arrive as LocalDateTime,
    // path values parse zone-free — micros-exact equality either way
    check("SELECT id, v FROM gpf.db.ntz WHERE hr = TIMESTAMP_NTZ '2024-03-01 01:00:00'")
    check("SELECT id, v FROM gpf.db.ntz WHERE hr IN " +
      "(TIMESTAMP_NTZ '2024-03-01 00:00:00', TIMESTAMP_NTZ '2024-03-01 02:00:00')")
    check("SELECT id, v FROM gpf.db.ntz WHERE hr IS NOT NULL")
    val q = spark.sql(
      "SELECT id FROM gpf.db.ntz WHERE hr = TIMESTAMP_NTZ '2024-03-01 01:00:00'")
    assert(q.queryExecution.executedPlan.toString.contains("GraftKeyedScan"),
      q.queryExecution.executedPlan.toString.take(600))
    assert(q.collect().map(_.getLong(0)).toSet
      == (0L until 30L).filter(_ % 3 == 1).toSet)
    // metadata aggregation: min/max over the NTZ key with zero data tasks (pre-DML: MOR debt rightly refuses the pushdown)
    val agg = spark.sql("SELECT min(hr), max(hr), count(*) FROM gpf.db.ntz")
    assert(agg.queryExecution.executedPlan.toString.contains("GraftAggScan"),
      agg.queryExecution.executedPlan.toString.take(600))
    val r = agg.head()
    assert(r.getAs[java.time.LocalDateTime](0).toString.startsWith("2024-03-01T00:00") &&
      r.getAs[java.time.LocalDateTime](1).toString.startsWith("2024-03-01T02:00") &&
      r.getLong(2) == 30L, r.toString)
    // row-level DML on the NTZ layout: survivors land back zone-free
    spark.sql("UPDATE gpf.db.ntz SET v = v + 1000 " +
      "WHERE hr = TIMESTAMP_NTZ '2024-03-01 02:00:00'")
    val rows = spark.table("gpf.db.ntz").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1).toString,
        r.getLong(2))).toSeq
    assert(rows.count { case (id, h, v) =>
      h.startsWith("2024-03-01T02:00") && v == id * 10 + 1000 } == 10, rows.toString)
    assert(rows.count { case (_, h, _) => h.startsWith("2024-03-01T00:00") } == 10)
  }

  test("partition filters: kill switch restores the residual Filter node") {
    warehouse
    spark.conf.set("spark.graft.partitionFilterPushdown", "false")
    try {
      val q = spark.sql("SELECT id FROM gpf.db.t WHERE grp = 'plain'")
      assert(filterNodes(q) == 1)
      assert(q.count() == 40L)
    } finally spark.conf.set("spark.graft.partitionFilterPushdown", "true")
  }
}
