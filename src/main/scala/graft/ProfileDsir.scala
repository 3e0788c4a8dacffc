package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of x6_dsir at a scaled corpus: background model
  * aggregate vs scoring join vs full row, to attribute any non-linear step.
  * Usage: runMain graft.ProfileDsir <sfDir> <k>
  */
object ProfileDsir {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = args(1).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", ShmLocalDir.path())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val scaled = ScaleBench.ensureScaledCorpus(spark, sfDir, k)
    for ((label, dir) <- Seq("1x" -> sfDir, s"${k}x" -> scaled)) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      def toks = docs.select(col("doc_id"), explode(expr("filter(split(text, ' '), x -> x != '')")).as("tok"))
        .withColumn("bucket", expr("cast(conv(substring(md5(tok), 1, 8), 16, 10) as bigint) % 1024"))
        .select("doc_id", "bucket")
      def time(what: String)(df: org.apache.spark.sql.DataFrame): Unit =
        (1 to 2).foreach { pass =>
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          println(f"[dsir] $label%-4s $what%-14s pass$pass ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        }
      time("explode")(toks)
      time("bmodel")(toks.groupBy("bucket").agg(count(lit(1)).as("cb")))
      val lw = toks.groupBy("bucket").agg(count(lit(1)).as("cb")).withColumn("lw", col("cb") % 7)
      time("score-join")(toks.join(broadcast(lw.select("bucket", "lw")), Seq("bucket"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_tok"), sum("lw").as("weight")))
      time("full-row")(graft.operators.ext.TextAnalysis.dsirSelect(
        docs, docs.filter(col("doc_id") < 300), "doc_id", "text", 400))
    }
    spark.stop()
  }
}
