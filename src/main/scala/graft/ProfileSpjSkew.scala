package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the SPJ SKEW-SPLITTING payoff (SCALE.md §round-15): a
  * storage-partitioned join whose fact side has one HOT partition value
  * (many files) against a small keyed dim —
  *
  *  - partially-clustered OFF: Spark's grouping coalesces the hot key's
  *    packs into ONE task; the join's wall-clock is that straggler;
  *  - partially-clustered ON (`spark.sql.sources.v2.bucketing
  *    .partiallyClusteredDistribution.enabled`): the packs stay separate
  *    tasks and the dim side replicates — the hot value's work spreads
  *    across the cluster.
  *
  * Both runs produce the identical result (asserted) and both stay
  * exchange-free below the join; the gap is purely straggler vs spread.
  *
  * Usage: runMain graft.ProfileSpjSkew [hotRows] [files] [passes]
  */
object ProfileSpjSkew {
  def main(args: Array[String]): Unit = {
    val hotRows = args.headOption.map(_.toLong).getOrElse(4000000L)
    val nFiles = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val passes = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", ShmLocalDir.path())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_profile_spjskew_wh"
    QuerySupport.rmrf(wh)
    spark.conf.set("spark.sql.catalog.gs", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gs.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gs.db")
    spark.sql("CREATE TABLE gs.db.f (id BIGINT, grp STRING, v BIGINT) " +
      "PARTITIONED BY (grp) TBLPROPERTIES ('graft.stats.columns' = 'id')")
    // HOT key: hotRows rows landing as ~nFiles files in one hive slot;
    // 7 cold keys with a sliver each
    spark.range(0, hotRows).repartition(nFiles)
      .selectExpr("id", "'hot' AS grp", "id AS v")
      .createOrReplaceTempView("hot_src")
    spark.sql("INSERT INTO gs.db.f SELECT * FROM hot_src")
    spark.sql("INSERT INTO gs.db.f SELECT id, concat('c', id % 7), id " +
      s"FROM range(${hotRows}, ${hotRows + 7000})")
    spark.sql("CREATE TABLE gs.db.d (grp STRING, w BIGINT) PARTITIONED BY (grp)")
    spark.sql("INSERT INTO gs.db.d SELECT 'hot', 3 UNION ALL " +
      "SELECT concat('c', id), id FROM range(0, 7)")
    // split the hot slot's files into one pack each
    spark.conf.set("spark.sql.files.maxPartitionBytes", (1 << 20).toString)
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    def run(): (Long, Double, Int) = {
      val j = spark.sql(
        "SELECT /*+ MERGE(a) */ a.grp AS grp, a.v AS v, b.w AS w " +
          "FROM gs.db.f a JOIN gs.db.d b ON a.grp = b.grp")
      val agg = j.groupBy().agg(count(lit(1)), sum(col("v") + col("w")))
      val t0 = System.nanoTime()
      val r = agg.collect().head
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = agg.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      require(plan.contains("SortMergeJoin") &&
        !plan.split("SortMergeJoin").last.contains("Exchange"),
        s"join must stay exchange-free below the SMJ:\n${plan.take(1500)}")
      (r.getLong(0), sec, j.queryExecution.toRdd.getNumPartitions)
    }
    def best(mode: String): (Long, Double, Int) = {
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled", mode)
      run() // warm
      (1 to passes).map(_ => run()).minBy(_._2)
    }
    val off = best("false")
    val on = best("true")
    require(off._1 == on._1, s"row counts diverged: ${off._1} vs ${on._1}")
    println(f"[spjskew] hotRows=$hotRows files=$nFiles rows=${off._1} " +
      f"grouped(OFF)=${off._2}%.3f s/${off._3} tasks " +
      f"split(ON)=${on._2}%.3f s/${on._3} tasks speedup=${off._2 / on._2}%.2fx")
    spark.stop()
  }
}
