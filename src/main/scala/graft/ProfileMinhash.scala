package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.ext.Dedup

/** Dev harness: stage-by-stage timing of the MinHash LSH pipeline. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toks = Dedup.tokens(docs, "doc_id", "text")
    time("toks count")(println(toks.count()))
    val sigs = Dedup.minhashSignatures(toks)
    time("signatures")(println(sigs.count()))
    val bands = sigs
      .withColumn("band", (col("seed") / lit(8)).cast("int"))
      .groupBy("doc_id", "band")
      .agg(sort_array(collect_list(struct(col("seed"), col("mh")))).as("sig"))
      .withColumn("key", expr("concat_ws('-', transform(sig, x -> cast(x.mh as string)))"))
      .select("doc_id", "band", "key")
    time("bands")(println(bands.count()))
    val candidates = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
    time("candidates raw")(println(candidates.count()))
    time("candidates distinct")(println(candidates.distinct().count()))
    time("full pipeline")(println(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 8, 19, 20).count()))
    spark.stop()
  }
}
