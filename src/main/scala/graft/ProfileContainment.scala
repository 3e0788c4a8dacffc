package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Dev harness: candidate-mass measurement for the containment join — runs
  * the declared x2_containment_join and prints every plan node's
  * numOutputRows metric, so the prefix + positional filter effectiveness is
  * read off the REAL executed plan (no re-implemented probe logic to drift).
  * Usage: runMain graft.ProfileContainment [sfDir]
  */
object ProfileContainment {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", ShmLocalDir.path())
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Queries.queries("x2_containment_join")(spark, dir)
    val t0 = System.nanoTime()
    val n = df.collect().length
    println(f"[containment] result rows=$n elapsed ${(System.nanoTime() - t0) / 1e9}%.2f s")
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
      case q: QueryStageExec => q +: nodes(q.plan)
      case other => other +: other.children.flatMap(nodes)
    }
    nodes(df.queryExecution.executedPlan).foreach { nd =>
      nd.metrics.get("numOutputRows").foreach { m =>
        println(f"[metric] ${nd.nodeName}%-45s rows=${m.value}")
      }
    }
    spark.stop()
  }
}
