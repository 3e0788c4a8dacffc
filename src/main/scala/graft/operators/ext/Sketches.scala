package graft.operators.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation (SURVEY.md §2.3 notes the reference
  * has no approx-distinct; this is the [EXT] sketch surface).
  *
  * Unlike Spark's built-in `approx_count_distinct` (HLL++ over xxhash64,
  * Spark-specific and not reproducible elsewhere), this HyperLogLog is built
  * from engine-portable primitives — md5-derived 32-bit hashes, integer
  * bucket/rank arithmetic, and a harmonic sum whose terms are all powers of
  * two — so the whole sketch, including the final estimate, is bit-identical
  * in any engine that can run the same SQL (the DuckDB oracle mirrors it
  * exactly). The 2^-rank harmonic sum is EXACT in IEEE double regardless of
  * aggregation order: every term is a power of two and the exponent span
  * (2^6 down to 2^-27) is under 52 bits, so no rounding ever occurs and the
  * estimate is deterministic under any partitioning.
  *
  * 100 TB design: one narrow shuffle of at most m=2^p rows after map-side
  * partial max per bucket; the estimate reduces m rows to one. This is the
  * shape a distributed sketch must have — mergeable per-bucket maxima, no
  * row-level data movement.
  */
object Sketches {

  /** Per-bucket HLL state: (bucket, max_rank) over md5-derived 32-bit hashes.
    * p bucket bits → m = 2^p buckets; rank = leading-zero count of the
    * remaining (32-p)-bit suffix + 1 (the classic Flajolet rho), computed via
    * binary-string length so both engines share the exact integer formula.
    */
  def hllBuckets(df: DataFrame, valueCol: String, p: Int): DataFrame = {
    val m = 1 << p
    val w = 32 - p
    df.select(
        expr(s"cast(conv(substring(md5(cast($valueCol as string)), 1, 8), 16, 10) as bigint)").as("h"))
      .select((col("h") % m).as("bucket"), expr(s"h div $m").as("rest"))
      .select(col("bucket"),
        when(col("rest") === 0, lit(w + 1))
          .otherwise(lit(w + 1) - length(expr("bin(rest)"))).as("rank"))
      .groupBy("bucket").agg(max("rank").as("max_rank"))
  }

  /** Scalar HLL estimate alongside the exact distinct count. The estimate is
    * emitted as floor(est * 10^4) — an integer, so no float rendering enters
    * the comparison surface. alphaM for m=64 is the standard 0.709.
    */
  def hllDistinct(df: DataFrame, valueCol: String, p: Int): DataFrame = {
    val m = 1 << p
    val alphaM2 = alphaTimesM2(p)
    val sketch = hllBuckets(df, valueCol, p)
      .agg(count(lit(1)).as("nb"), sum(expr("power(2.0, -max_rank)")).as("s_obs"))
      .select(floor(lit(alphaM2) / (col("s_obs") + (lit(m) - col("nb"))) * 10000)
        .cast("long").as("hll_estimate_e4"))
    val exact = df.agg(countDistinct(col(valueCol)).as("exact_distinct"))
    exact.crossJoin(sketch)
  }

  /** alpha_m * m^2 for the standard HLL bias correction; the same double is
    * embedded as a literal in the oracle SQL so both engines divide by the
    * identical value.
    */
  def alphaTimesM2(p: Int): Double = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1 + 1.079 / m)
    }
    alpha * m * m
  }
}
