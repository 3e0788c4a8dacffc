package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession

/** Dev harness: per-stage timing of named declared queries (bench-style).
  * Usage: runMain graft.ProfileMinhash <sfDir> [query ...] — defaults to the
  * similarity family. Each query gets a cold pass + 2 warm passes.
  */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val queries = if (args.length > 1) args.tail.toSeq
                  else Seq("x2_simhash", "x2_minhash_lsh", "x2_ngram_minhash")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", ShmLocalDir.path())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stageTotal = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(0L)
        stageTotal.addAndGet(ms)
        if (ms > 2000) println(f"[stage] ${si.stageId} tasks=${si.numTasks} ${ms / 1000.0}%.1f s ${si.name.takeWhile(_ != '\n').take(60)}")
      }
    })
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); stageTotal.set(0); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s (stage-time ${stageTotal.get() / 1000.0}%.1f s)")
      r
    }
    queries.foreach { q =>
      (1 to 3).foreach { i =>
        time(s"$q #$i")(
          Queries.queries(q)(spark, dir).write.format("noop").mode("overwrite").save())
        if (sys.env.contains("SPARK_GRAFT_GC_BETWEEN")) { System.gc(); Thread.sleep(500) }
      }
    }
    spark.stop()
  }
}
