package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.VersionedTable

/** Measures the read-side cost of the two merge-on-read delete forms as
  * pending debt scales (SCALE.md §deletion-vectors): key sets make every
  * reader pay one broadcast anti-join per covering set (build cost grows
  * with pending KEYS), positional vectors a codegen'd scalar predicate
  * inside the scan's own whole-stage span (cost ~flat in both set count
  * and position count). Same row set deleted under both forms, same
  * aggregate measured, results asserted identical to the baseline minus
  * the deleted keys — so the wall-clock gap is purely the read mechanism.
  *
  * Usage: runMain graft.ProfileDeletionVectors <sfDir> [replicate] [passes]
  */
object ProfileDeletionVectors {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicate = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val passes = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", ShmLocalDir.path())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val n = orders.count()
    val base = (0 until replicate).map(i =>
        orders.select((col("o_orderkey") + lit(i * n * 4)).as("id"),
          col("o_custkey").as("v")))
      .reduce(_.unionByName(_)).cache()
    val total = base.count()
    println(s"# base rows = $total (orders x$replicate)")

    def rmrf(p: String): Unit = {
      import scala.jdk.CollectionConverters._
      val path = java.nio.file.Paths.get(p)
      if (java.nio.file.Files.exists(path)) {
        val w = java.nio.file.Files.walk(path)
        try w.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
        finally w.close()
      }
    }

    def timed(f: => (Long, Long)): (Double, (Long, Long)) = {
      var best = Double.MaxValue; var r: (Long, Long) = null
      (1 to passes).foreach { _ =>
        val t0 = System.nanoTime(); r = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, r)
    }

    def agg(root: String): (Long, Long) = {
      val r = VersionedTable.read(spark, root).agg(count(lit(1)), sum(col("v"))).head()
      (r.getLong(0), r.getLong(1))
    }

    // keysPerSet scattered across every dir (mod-selected) so all dirs are
    // covered — the worst-case coverage shape for the read side
    for (nSets <- Seq(1, 4, 8); keysPerSet <- Seq(20000)) {
      // hash-scatter each set's keys across every dir: set s takes ids with
      // hash(id) ≡ s (mod M), M sized so each residue class ≈ keysPerSet
      val selectMod = math.max(nSets.toLong + 1, total / keysPerSet)
      for (mode <- Seq("baseline", "key", "pos")) {
        val root = s"${System.getProperty("java.io.tmpdir")}/graft_profile_dv_${mode}_$nSets"
        rmrf(root)
        (0 until 4).foreach(k => VersionedTable.commit(
          base.filter(col("id") % 4 === k), root, "append", s"dv-c$k",
          statsCols = Seq("id")))
        if (mode != "baseline") (0 until nSets).foreach { s0 =>
          val keys = base.select("id")
            .filter(pmod(col("id") * 2654435761L, lit(selectMod)) === s0)
          if (mode == "key")
            VersionedTable.deleteWhereMor(spark, root, keys, "id", s"dv-k$s0")
          else
            VersionedTable.deleteWherePos(spark, root, keys, "id", s"dv-p$s0")
        }
        val (sec, (cnt, sm)) = timed(agg(root))
        println(f"mode=$mode%-8s sets=$nSets keysPerSet=$keysPerSet " +
          f"scan=$sec%7.2f s rows=$cnt sum=$sm")
      }
    }
    spark.stop()
  }
}
