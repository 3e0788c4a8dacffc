package graft
import org.apache.spark.sql.SparkSession
/** Ad-hoc debug harness: run a named subset of the registry. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.local.dir", ShmLocalDir.path())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dump = sys.env.get("SPARK_PROBE_DUMP")
    val explain = sys.env.contains("SPARK_PROBE_EXPLAIN")
    args.tail.foreach { name =>
      try {
        val df = Queries.queries(name)(spark, args.head)
        if (explain) {
          println(s"[probe] $name formatted plan:")
          df.explain("formatted")
        }
        dump match {
          case Some(root) =>
            df.coalesce(1).write.mode("overwrite").parquet(s"$root/$name")
            println(s"[probe] $name dumped to $root/$name")
          case None =>
            println(s"[probe] $name rows=${df.count()}")
            df.show(3, truncate = false)
        }
      } catch { case e: Throwable =>
        println(s"[probe] $name FAILED: ${e.toString.take(500)}")
      }
    }
    spark.stop()
  }
}
