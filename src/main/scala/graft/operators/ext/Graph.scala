package graft.operators.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation beyond the X1 connected-components labeling:
  * rank propagation over an edge list — the web-graph quality signal
  * (page importance) a corpus-curation pipeline joins against its documents
  * the way Common Crawl derivatives weight pages before sampling.
  */
object Graph {

  /** Rank scale: ranks are integers in units of 10^-12 of total mass. */
  val Scale: Long = 1000000000000L

  /** G1: integer-exact PageRank, fixed iteration count, damping 0.85.
    *
    *   r_0(v)    = SCALE div N
    *   r_t+1(v)  = (150·(SCALE div N)) div 1000
    *             + (850·Σ_{(u,v)∈E} (r_t(u) div outdeg(u))) div 1000
    *
    * Every division is an integer FLOOR division, so the deterministic mass
    * leak (dangling nodes keep their mass out of circulation; floors shave
    * sub-unit remainders) is identical in any engine — the whole fixed-point
    * prefix replays bit-for-bit in DuckDB, which float PageRank cannot
    * (summation order changes the ranking). Multi-edges contribute once per
    * edge row, matching outdeg = count of edge rows.
    *
    * 100 TB shape: each iteration is one shuffle-hash join of the rank
    * frame against the edge list on src (edges dominate; ranks are two
    * narrow longs) followed by one partial-aggregated sum by dst — the
    * standard distributed PageRank step, linear in |E| per iteration, no
    * broadcast of anything graph-sized (only the 1-row node count). `iters`
    * is a fixed small constant (quality signals converge in a handful of
    * damped steps); the loop unrolls into one declarative plan.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 10, "iters must be in [1, 10] (plan unrolls)")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val n = broadcast(nodes.agg(count(lit(1)).as("n")))
    val outdeg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
    var ranks = nodes.crossJoin(n).select(col("node"), expr(s"$Scale div n").as("rank"))
    for (_ <- 1 to iters) {
      val inmass = e
        .join(ranks.join(outdeg.hint("shuffle_hash"), Seq("node"))
          .withColumnRenamed("node", "src").hint("shuffle_hash"), Seq("src"))
        .select(col("dst").as("node"), expr("rank div outdeg").as("c"))
        .groupBy("node").agg(sum("c").as("inmass"))
      ranks = nodes.join(inmass.hint("shuffle_hash"), Seq("node"), "left")
        .crossJoin(n)
        .select(col("node"),
          expr(s"(150 * ($Scale div n)) div 1000 + (850 * coalesce(inmass, 0)) div 1000")
            .as("rank"))
    }
    ranks
  }
}
