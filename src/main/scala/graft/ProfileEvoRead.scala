package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the partition-evolution read path (r18 opt round):
  * times each phase of reading a three-era hidden-partitioned table — plan
  * construction (listing + schema), the raw scan, and the month rollup —
  * against the fixture `versioned_partition_evolution_hidden` builds.
  * Backs the OPTIMIZATION_r18.md numbers; not part of the declared registry.
  */
object ProfileEvoRead {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", ShmLocalDir.path())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[evoread] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // build the fixture step by step (the registry row's exact statements)
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_pevo_hidden_${QuerySupport.dirTag(dir)}"
    if (!new java.io.File(s"$root/_commits").isDirectory) {
      QuerySupport.rmrf(root)
      QuerySupport.rd(spark, dir, "orders").createOrReplaceTempView("pevo_orders")
      val mx = QuerySupport.rd(spark, dir, "orders")
        .agg(max(col("o_orderkey"))).head().getLong(0)
      val (t1, t2) = (mx / 3, 2 * mx / 3)
      def band(lo: String, hi: String) =
        "SELECT o_orderkey, CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS ts " +
          s"FROM pevo_orders WHERE o_orderkey > $lo AND o_orderkey <= $hi"
      t("fx: CREATE CTAS") {
        spark.sql(s"CREATE GRAFT '$root' AS (${band("-1", t1.toString)})").collect() }
      t("fx: ALTER -> days(ts)") {
        spark.sql(s"ALTER GRAFT '$root' SET PARTITIONED BY (days(ts))").collect() }
      t("fx: INSERT band2 (daily)") {
        spark.sql(s"INSERT INTO GRAFT '$root' FROM (${band(t1.toString, t2.toString)})").collect() }
      t("fx: ALTER -> months(ts)") {
        spark.sql(s"ALTER GRAFT '$root' SET PARTITIONED BY (months(ts))").collect() }
      t("fx: INSERT band3 (monthly)") {
        spark.sql(s"INSERT INTO GRAFT '$root' FROM (${band(t2.toString, mx.toString)})").collect() }
    }
    (1 to 3).foreach { i =>
      val df = t(s"pass $i: plan construction (read())") {
        graft.io.VersionedTable.read(spark, root)
      }
      t(s"pass $i: raw scan count") { df.count() }
      val agg = df.groupBy(date_format(col("ts_month"), "yyyy-MM-dd").as("ts_month"))
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
        .orderBy("ts_month")
      t(s"pass $i: rollup noop") {
        agg.write.format("noop").mode("overwrite").save()
      }
    }
    // micro-breakdown: which reader step costs what on the 2405-dir era
    val dayDir = new java.io.File(s"$root/data").listFiles()
      .filter(_.getName.contains("0000000003")).head.getAbsolutePath
    (1 to 2).foreach { i =>
      t(s"micro $i: baseline spark.read.parquet(dayDir)") {
        spark.read.parquet(dayDir).schema
      }
      val files = t(s"micro $i: engine walk (Files.walk)") {
        import scala.jdk.CollectionConverters._
        val w = java.nio.file.Files.walk(java.nio.file.Paths.get(dayDir))
        try w.iterator().asScala.filter { p =>
          val n = p.getFileName.toString
          java.nio.file.Files.isRegularFile(p) && n.endsWith(".parquet") &&
            !n.startsWith("_") && !n.startsWith(".")
        }.map(_.toString).toSeq.sorted
        finally w.close()
      }
      t(s"micro $i: explicit files + basePath (n=${files.size})") {
        spark.read.option("basePath", dayDir).parquet(files: _*).schema
      }
      spark.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", "9999")
      t(s"micro $i: threshold=9999 spark.read.parquet(dayDir)") {
        spark.read.parquet(dayDir).schema
      }
      t(s"micro $i: threshold=9999 explicit files + basePath") {
        spark.read.option("basePath", dayDir).parquet(files: _*).schema
      }
      t(s"micro $i: threshold=9999 read+rollup noop") {
        graft.io.VersionedTable.read(spark, root)
          .groupBy(date_format(col("ts_month"), "yyyy-MM-dd").as("ts_month"))
          .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
          .orderBy("ts_month")
          .write.format("noop").mode("overwrite").save()
      }
      spark.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", "32")
    }
    spark.stop()
  }
}
