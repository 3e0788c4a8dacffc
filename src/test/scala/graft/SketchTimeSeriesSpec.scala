package graft

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries
import graft.operators.ext.Sketches

/** Unit coverage for the sketch and time-series operators: count-min
  * overestimate invariant, bloom no-false-negative guarantee and probe-side
  * join shape, calendar gap-fill semantics (leading nulls, forward fill,
  * global range).
  */
class SketchTimeSeriesSpec extends SparkSpec {

  test("countMin/heavyHitters: estimate >= exact for every value, exact when uncrowded") {
    import spark.implicits._
    val vals = Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++
      Seq.fill(10)("gamma") ++ (1 to 30).map(i => s"tail$i")
    val df = vals.toDF("v")
    val hh = Sketches.heavyHitters(df, "v", 4, 256, 3).collect()
    assert(hh.map(_.getString(0)).toSeq == Seq("alpha", "beta", "gamma"))
    hh.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"cm_est < exact for ${r.getString(0)}")
    }
    // 33 distinct values in 4x256 buckets: the top hitter is collision-free
    // with overwhelming probability under the fixed md5 seeds (deterministic
    // here — this asserts the actual bucketing, not a probability)
    assert(hh.head.getLong(2) == hh.head.getLong(1))
  }

  test("bloom: every member passes (no false negatives), non-members mostly rejected") {
    import spark.implicits._
    val members = (1 to 200).map(i => s"k$i").toDF("k")
    val words = Sketches.bloomWords(members, "k", 4096, 3)
    val inProbe = Sketches.bloomProbe(members, "k", words, 4096, 3)
    assert(inProbe.filter(col("bloom_pass") === 0).count() == 0)
    val outProbe = Sketches.bloomProbe(
      (1001 to 2000).map(i => s"x$i").toDF("k"), "k", words, 4096, 3)
    val fp = outProbe.filter(col("bloom_pass") === 1).count()
    // 200 keys x 3 hashes in 4096 bits -> ~14% fill; fp rate ~(0.14)^3 < 1%
    assert(fp < 50, s"false-positive count $fp out of 1000 is implausibly high")
  }

  test("bloomProbe never shuffles the probe side: one broadcast join per hash") {
    import spark.implicits._
    val members = (1 to 50).map(i => s"k$i").toDF("k")
    val words = Sketches.bloomWords(members, "k", 4096, 3)
    val plan = Sketches.bloomProbe(members, "k", words, 4096, 3)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 3, plan)
  }

  test("gapFillDaily: dense global spine, forward fill across gaps, leading nulls kept") {
    import spark.implicits._
    val ev = Seq(
      ("a", "2024-01-01", "10.00"), ("a", "2024-01-01", "12.00"), // same-day dup -> max
      ("a", "2024-01-04", "7.00"),
      ("b", "2024-01-03", "5.00")                                 // b: no obs on day 1-2
    ).toDF("k", "d", "v")
    val out = TimeSeries.gapFillDaily(ev, "k", to_date(col("d")),
        col("v").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
      .select(col("key"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("v").cast("string"), col("v_filled").cast("string"))
      .orderBy("key", "day").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq(
      ("a", "2024-01-01", "12.00", "12.00"),
      ("a", "2024-01-02", null, "12.00"),
      ("a", "2024-01-03", null, "12.00"),
      ("a", "2024-01-04", "7.00", "7.00"),
      ("b", "2024-01-01", null, null),
      ("b", "2024-01-02", null, null),
      ("b", "2024-01-03", "5.00", "5.00"),
      ("b", "2024-01-04", null, "5.00")))
  }
}
