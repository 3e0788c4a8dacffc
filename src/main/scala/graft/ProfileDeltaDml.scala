package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** Measures the WRITE-side cost model of the two catalog DML modes as the
  * table grows (SCALE.md §round-15): a POINT UPDATE (one matched row in
  * one dir) under
  *
  *  - `graft.dml.mode = 'merge-on-read'` (default, SupportsDelta): one
  *    positional vector + one post-image row — bytes written should stay
  *    FLAT as the table scales;
  *  - `graft.dml.mode = 'copy-on-write'` (group-based ReplaceData): the
  *    matched DIR rewrites — bytes written grow linearly with dir size.
  *
  * Both modes answer the same reads afterwards (asserted); the gap is
  * purely the write encoding. This is the 100 TB argument for
  * merge-on-read DML made with numbers instead of adjectives.
  *
  * Usage: runMain graft.ProfileDeltaDml [rowsPerStep]... steps double.
  */
object ProfileDeltaDml {
  def main(args: Array[String]): Unit = {
    val baseRows = args.headOption.map(_.toLong).getOrElse(100000L)
    val steps = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", ShmLocalDir.path())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_profile_dml_wh"
    QuerySupport.rmrf(wh)
    spark.conf.set("spark.sql.catalog.gp", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gp.db")

    def dirBytes(root: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
      walk(new java.io.File(root))
    }

    println(f"${"rows"}%12s ${"mode"}%-14s ${"update_s"}%10s ${"bytes_written"}%14s")
    (0 until steps).foreach { s =>
      val n = baseRows << s
      Seq("merge-on-read", "copy-on-write").foreach { mode =>
        val t = s"t_${s}_${mode.take(4)}"
        spark.sql(s"CREATE TABLE gp.db.$t (id BIGINT, v BIGINT, s STRING) " +
          s"TBLPROPERTIES ('graft.stats.columns' = 'id', 'graft.dml.mode' = '$mode')")
        spark.sql(s"INSERT INTO gp.db.$t SELECT id, id * 10, " +
          s"concat('payload-', id % 1000) FROM range(0, $n)")
        val root = s"$wh/db/$t"
        val before = dirBytes(root)
        val t0 = System.nanoTime()
        spark.sql(s"UPDATE gp.db.$t SET v = -1 WHERE id = ${n / 2}")
        val sec = (System.nanoTime() - t0) / 1e9
        val written = dirBytes(root) - before
        // same answer either way
        val got = spark.table(s"gp.db.$t").filter(col("id") === n / 2)
          .head().getLong(1)
        require(got == -1L, s"update lost: $got")
        require(spark.table(s"gp.db.$t").count() == n)
        println(f"$n%12d $mode%-14s $sec%10.3f $written%14d")
      }
    }
    spark.stop()
  }
}
