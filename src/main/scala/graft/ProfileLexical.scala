package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ext.TextAnalysis

/** Empirical backing for the lexical index's 100 TB claim: BM25 PROBE cost
  * against the standing index tracks query-term POSTING mass, while a fresh
  * corpus SCAN tracks corpus mass. Under the replica-tagged scaled corpus
  * (ScaleBench.ensureScaledCorpus — disjoint vocabularies, fixed per-term
  * density) the same query set touches the same posting rows at any k, so
  * probe time should stay ~flat at k× corpus while the batch scan grows ~k×
  * and the one-time build grows ~k×. That gap is the index's reason to
  * exist; this harness measures all three legs at 1× and k× in one session.
  *
  * Usage: runMain graft.ProfileLexical <sfDir> <k>
  * Prints [lex] lines; commit the numbers to SCALE.md.
  */
object ProfileLexical {
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

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def queriesOf(docs: DataFrame): DataFrame = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"),
        expr("array_join(slice(filter(split(text, ' '), x -> x != ''), 1, 8), ' ')").as("qtext"))

    for ((label, dir) <- Seq("1x" -> sfDir, s"${k}x" -> scaled)) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val qs = queriesOf(docs)
      val root = s"/tmp/graft_prof_lex_$label"
      Seq("graft_prof_lex_post", "graft_prof_lex_len")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      val p = java.nio.file.Paths.get(root)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        val w = java.nio.file.Files.walk(p)
        try w.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
        finally w.close()
      }
      val (_, tBuild) = time(TextAnalysis.buildLexicalIndex(
        "graft_prof_lex_post", "graft_prof_lex_len", docs, "doc_id", "text", 32, root))
      println(f"[lex] build  $label%-4s ${tBuild}%8.2f s")
      for (pass <- 1 to 2) {
        val (_, tProbe) = time(TextAnalysis.bm25IndexTopK(spark,
            "graft_prof_lex_post", "graft_prof_lex_len", qs, "query_id", "qtext", 10)
          .write.format("noop").mode("overwrite").save())
        println(f"[lex] probe  $label%-4s pass$pass ${tProbe}%8.2f s")
      }
      for (pass <- 1 to 2) {
        val (_, tScan) = time(TextAnalysis.bm25TopK(docs, qs,
            "doc_id", "text", "query_id", "qtext", 10)
          .write.format("noop").mode("overwrite").save())
        println(f"[lex] scan   $label%-4s pass$pass ${tScan}%8.2f s")
      }
    }
    spark.stop()
  }
}
