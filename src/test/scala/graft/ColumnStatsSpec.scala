package graft

/** Column-level statistics for Spark's cost-based optimizer
  * (Statistics.columnStats on the catalog scans, served from the
  * manifest's skipping-index envelopes — VersionedTable.v2ColumnStats):
  * min/max/nullCount surface in the optimized plan's attributeStats with
  * zero extra IO, on both the flat and the key-grouped scan; pending MOR
  * debt or partial index coverage serves nothing (estimates feed plans —
  * honesty beats coverage).
  */
class ColumnStatsSpec extends SparkSpec {
  import TestSpark._

  private lazy val warehouse: String = {
    val w = tmpDir("gcs_wh")
    spark.conf.set("spark.sql.catalog.gcs", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcs.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcs.db")
    w
  }

  /** The scan RELATION's own stats (a Project above it — e.g. the keyed
    * scan's column reorder — would drop attributeStats in the default
    * size-only estimation; BasicStatsPlanVisitor propagates them when
    * spark.sql.cbo.enabled, pinned separately below).
    */
  private def attrStats(table: String) = {
    val df = spark.table(table)
    val rel = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }.head
    val stats = rel.stats
    (stats, stats.attributeStats.map { case (a, cs) => a.name -> cs })
  }

  test("column stats: flat scan serves min/max/nullCount from the manifest; rowCount exact") {
    warehouse
    spark.sql("CREATE TABLE gcs.db.t (id BIGINT, nv BIGINT) " +
      "TBLPROPERTIES ('graft.stats.columns' = 'id,nv')")
    spark.sql("INSERT INTO gcs.db.t SELECT id + 10, " +
      "CASE WHEN id % 4 = 0 THEN NULL ELSE id * 2 END FROM range(0, 40)")
    spark.sql("INSERT INTO gcs.db.t SELECT id + 100, id FROM range(0, 10)")
    val (stats, byName) = attrStats("gcs.db.t")
    assert(stats.rowCount.contains(BigInt(50)), stats.rowCount.toString)
    val idStats = byName("id")
    assert(idStats.min.contains(10L) && idStats.max.contains(109L),
      s"${idStats.min} .. ${idStats.max}")
    assert(idStats.nullCount.contains(BigInt(0)))
    val nvStats = byName("nv")
    assert(nvStats.nullCount.contains(BigInt(10)), nvStats.nullCount.toString)
    assert(nvStats.min.contains(0L) && nvStats.max.contains(78L),
      s"${nvStats.min} .. ${nvStats.max}")
  }

  test("column stats: keyed (partitioned) scan serves them too; un-indexed columns serve nothing") {
    warehouse
    spark.sql("CREATE TABLE gcs.db.p (id BIGINT, grp STRING, free BIGINT) " +
      "PARTITIONED BY (grp) TBLPROPERTIES ('graft.stats.columns' = 'id')")
    spark.sql("INSERT INTO gcs.db.p SELECT id, concat('g', id % 2), id " +
      "FROM range(5, 25)")
    val (stats, byName) = attrStats("gcs.db.p")
    assert(stats.rowCount.contains(BigInt(20)), stats.rowCount.toString)
    assert(byName("id").min.contains(5L) && byName("id").max.contains(24L))
    // `free` is not in the skipping index: no envelope, no claim
    assert(!byName.contains("free"), byName.keys.toString)
    // with CBO on, the stats survive the keyed scan's reorder Project —
    // what filter/join estimation actually consumes
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val s = spark.table("gcs.db.p").queryExecution.optimizedPlan.stats
      assert(s.rowCount.contains(BigInt(20)), s.toString)
      assert(s.attributeStats.exists { case (a, cs) =>
        a.name == "id" && cs.min.contains(5L) && cs.max.contains(24L) })
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("column stats: ANALYZE NDV serves measured distinctCount; malformed hand-set props serve nothing") {
    warehouse
    spark.sql("CREATE TABLE gcs.db.nd (id BIGINT, grp BIGINT) " +
      "TBLPROPERTIES ('graft.stats.columns' = 'id')")
    spark.sql("INSERT INTO gcs.db.nd SELECT id, id % 7 FROM range(0, 100)")
    val root = s"$warehouse/db/nd"
    val out = spark.sql(s"ANALYZE GRAFT '$root' NDV BY (id, grp)").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("id" -> 100L, "grp" -> 7L), out.toString)
    val (_, byName) = attrStats("gcs.db.nd")
    assert(byName.contains("grp") && byName.contains("id"),
      s"attrStats keys: ${byName.keys.toSeq.sorted}; props: " +
        graft.io.VersionedTable.latestCommit(root).get.props)
    assert(byName("id").distinctCount.contains(BigInt(100)),
      byName("id").toString)
    assert(byName("grp").distinctCount.contains(BigInt(7)))
    // min/max from the index ride alongside the measured NDV
    assert(byName("id").min.contains(0L) && byName("id").max.contains(99L))
    // a hand-poisoned property never serves a fabricated estimate
    graft.io.VersionedTable.setTableProperties(root,
      Map("graft.ndv.grp" -> "banana"), "cs_ndv_poison")
    // grp had ONLY the NDV claim, so the whole entry disappears
    assert(attrStats("gcs.db.nd")._2.get("grp").forall(_.distinctCount.isEmpty))
  }

  test("column stats: pending MOR debt serves no column stats") {
    warehouse
    spark.sql("CREATE TABLE gcs.db.m (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('graft.stats.columns' = 'id')")
    spark.sql("INSERT INTO gcs.db.m SELECT id, id FROM range(0, 30)")
    assert(attrStats("gcs.db.m")._2.contains("id"))
    graft.io.VersionedTable.deletePosWhere(spark, s"$warehouse/db/m",
      "v = 3", "cs_mor_dv")
    assert(attrStats("gcs.db.m")._2.isEmpty)
  }
}
