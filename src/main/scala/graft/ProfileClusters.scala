package graft

import org.apache.spark.sql.SparkSession

import graft.operators.ext.Dedup

/** Dev harness: phase timing of the x1_dedup_clusters pipeline — how much is
  * pair generation vs. contraction + finish (or propagation rounds).
  * Usage: runMain graft.ProfileClusters [sfDir]
  */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", ShmLocalDir.path())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val pairs = t("pairs (build+checkpoints)") {
        Dedup.minhashLshPairs(docs, "doc_id", "text", 8, 19, 20)
      }
      val clustered = t("dedupClusters (contract + finish)") {
        Dedup.dedupClusters(docs, "doc_id", pairs)
      }
      t("final noop write") {
        clustered.orderBy("doc_id").write.format("noop").mode("overwrite").save()
      }
      System.gc()
    }
    spark.stop()
  }
}
