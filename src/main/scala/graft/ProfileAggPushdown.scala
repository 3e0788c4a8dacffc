package graft

import org.apache.spark.sql.SparkSession

/** Measures the AGGREGATE-PUSHDOWN payoff (SCALE.md §round-15): the same
  * aggregation answered by the ordinary scan (spark.graft.aggPushdown=
  * false — read every file, HashAggregate, Exchange) versus the
  * metadata path (GraftAggScan — commit manifests, `_filestats` side
  * files, parquet footers, zero data bytes):
  *
  *  - COUNT(*): side-file counts only, zero footer opens;
  *  - GROUP BY partition + COUNT(*)/MIN/MAX: one footer open per file.
  *
  * Both paths must produce IDENTICAL rows (asserted) — the profile is
  * the wall-clock gap, which at real scale is a cluster-wide scan vs a
  * driver metadata walk.
  *
  * Usage: runMain graft.ProfileAggPushdown [rows] [files] [passes]
  */
object ProfileAggPushdown {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val nFiles = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val passes = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", ShmLocalDir.path())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_profile_aggpd_wh"
    QuerySupport.rmrf(wh)
    spark.conf.set("spark.sql.catalog.ga", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ga.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ga.db")
    spark.sql("CREATE TABLE ga.db.t (id BIGINT, grp STRING, v BIGINT, u BIGINT) " +
      "PARTITIONED BY (grp) TBLPROPERTIES ('graft.stats.columns' = 'id,v')")
    spark.range(0, rows).repartition(nFiles)
      .selectExpr("id", "concat('g', id % 8) AS grp",
        "CASE WHEN id % 11 = 0 THEN NULL ELSE id * 3 END AS v",
        "id * 7 AS u")
      .createOrReplaceTempView("aggpd_src")
    spark.sql("INSERT INTO ga.db.t SELECT * FROM aggpd_src")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def run(sql: String, pushdown: Boolean): (Seq[String], Double) = {
      spark.conf.set("spark.graft.aggPushdown", pushdown.toString)
      val (rws, s) = timed(spark.sql(sql).collect().toSeq
        .map(_.toSeq.mkString("|")).sorted)
      val plan = spark.sql(sql).queryExecution.executedPlan.toString
      require(plan.contains("GraftAggScan") == pushdown,
        s"pushdown=$pushdown but plan:\n${plan.take(400)}")
      (rws, s)
    }
    val queries = Seq(
      "count_star" -> "SELECT count(*) AS n FROM ga.db.t",
      "global_minmax" ->
        "SELECT count(*) AS n, count(v) AS nv, min(id) AS lo, max(id) AS hi FROM ga.db.t",
      "group_by_part" ->
        "SELECT grp, count(*) AS n, min(id) AS lo, max(id) AS hi FROM ga.db.t GROUP BY grp",
      "unindexed_col" ->
        "SELECT count(u) AS nu, min(u) AS lo, max(u) AS hi FROM ga.db.t",
      "where_partition" ->
        "SELECT count(*) AS n, min(id) AS lo FROM ga.db.t WHERE grp = 'g3'")
    queries.foreach { case (name, sql) =>
      run(sql, pushdown = false) // scan warmup
      val cold = run(sql, pushdown = true) // first metadata pass: footer IO
      val slow = (1 to passes).map(_ => run(sql, pushdown = false)).minBy(_._2)
      val fast = (1 to passes).map(_ => run(sql, pushdown = true)).minBy(_._2)
      require(slow._1 == fast._1 && cold._1 == fast._1,
        s"$name diverged: ${slow._1} vs ${fast._1}")
      println(f"$name%-14s scan=${slow._2}%7.3f s  metadata cold=${cold._2}%7.3f s " +
        f"warm=${fast._2}%7.3f s  speedup=${slow._2 / fast._2}%6.1fx  rows=${fast._1.size}")
    }
    spark.conf.set("spark.graft.aggPushdown", "true")
    spark.stop()
  }
}
