package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.operators.ext.{Similarity, TextAnalysis}

/** Unit coverage for the round-4 operators: gap sessionization, range join,
  * bigram frequencies, centroid accumulators. Edge cases the sf-data oracle
  * can't pin down: exact-gap boundaries, sub-2-token documents, band
  * boundaries, decimal-sum exactness.
  */
class SessionRangeSpec extends SparkSpec {

  test("sessionize: strict-gap semantics, per-key restart, bounds and counts") {
    import spark.implicits._
    // key 1: gaps of exactly 10 (same session, strict >) then 11 (new session)
    val df = Seq(
      (1L, 0L, 1L), (1L, 10L, 2L), (1L, 21L, 3L),
      (2L, 5L, 4L)
    ).toDF("user_id", "ts_us", "event_id")
    val out = Relational.sessionize(df, "user_id", "ts_us", "event_id", gapUs = 10L)
      .orderBy("user_id", "session_idx").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq ==
      Seq((1L, 1L, 0L, 10L, 2L), (1L, 2L, 21L, 21L, 1L), (2L, 1L, 5L, 5L, 1L)))
  }

  test("coalesceIntervals: touch merges, containment keeps prefix max, strict gap splits") {
    import spark.implicits._
    // key 1: (0,100) contains (10,20) — the prefix MAX (not the previous
    // row's end) must keep the span open through (90,110); (110,120)
    // TOUCHES the running end (start == max-end, not >) so it still merges;
    // (121,130) is strictly past it and opens span 2.
    // key 2: independent sweep.
    val df = Seq(
      (1L, 0L, 100L, 1L), (1L, 10L, 20L, 2L), (1L, 90L, 110L, 3L),
      (1L, 110L, 120L, 4L), (1L, 121L, 130L, 5L),
      (2L, 5L, 6L, 6L)
    ).toDF("user_id", "iv_start", "iv_end", "event_id")
    val out = Relational.coalesceIntervals(df, "user_id", "iv_start", "iv_end", "event_id")
      .orderBy("user_id", "span_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq(
      (1L, 1L, 0L, 120L, 4L), (1L, 2L, 121L, 130L, 1L),
      (2L, 1L, 5L, 6L, 1L)))
  }

  test("intervalOverlapJoin: exactly-once across shared cells, touching endpoints overlap, disjoint never") {
    import spark.implicits._
    // grid 10: a1 [0, 35] spans 4 cells and overlaps b1 [5, 30] in all of
    // them — the responsibility filter must emit the pair ONCE. a1/b2 touch
    // at a point (35 == 35): closed semantics, they match. a2/b3 disjoint.
    val a = Seq((1L, 0L, 35L), (2L, 100L, 110L)).toDF("id", "s", "e")
    val b = Seq((10L, 5L, 30L), (11L, 35L, 40L), (12L, 200L, 210L)).toDF("id", "s", "e")
    val got = Relational.intervalOverlapJoin(a, "id", "s", "e", b, "id", "s", "e", gridUs = 10L)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 10L, 5L, 30L), (1L, 11L, 35L, 35L)))
  }

  test("nearestJoin: |Δt| ties prefer backward, equal-t ties prefer smaller id, keyless left keeps nulls") {
    import spark.implicits._
    val left = Seq((100L, 1L, 10L), (101L, 2L, 50L), (102L, 3L, 7L)).toDF("id", "k", "t")
    val right = Seq(
      (1L, 1L, 5L), (2L, 1L, 5L), (3L, 1L, 15L), // key 1: Δ=5 both sides -> backward t=5, ids 1&2 tie -> 1
      (4L, 2L, 60L)                              // key 2: forward-only
    ).toDF("id", "k", "t")
    val got = Relational.nearestJoin(left, right, "k", "t", "id", "id")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(got == Seq((100L, 1L), (101L, 4L), (102L, -1L)))
  }

  test("rangeJoin: [lo, hi) semantics — hi excluded, lo included, no-band rows dropped") {
    import spark.implicits._
    val fact = Seq(0.0, 9.99, 10.0, 19.99, 20.0).toDF("v")
    val bands = Seq((0L, 0.0, 10.0), (1L, 10.0, 20.0)).toDF("band", "lo", "hi")
    val got = Relational.rangeJoin(fact, bands, "v", "lo", "hi")
      .groupBy("band").count().orderBy("band").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 2L), (1L, 2L))) // 20.0 falls outside every band
  }

  test("topBigramsPerLang: sub-2-token docs contribute nothing; ranks are dense per lang") {
    import spark.implicits._
    val docs = Seq(
      ("en", "a b a b c"), ("en", "a"), ("en", ""),
      ("de", "x y")
    ).toDF("lang", "text")
    val out = TextAnalysis.topBigramsPerLang(docs, "lang", "text", 2)
      .orderBy("lang", "rk").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3))).toSeq
    // doc1 bigrams: "a b","b a","a b","b c" -> a b:2, b a:1, b c:1 (tie -> lexicographic)
    assert(out == Seq(("de", "x y", 1L, 1), ("en", "a b", 2L, 1), ("en", "b a", 1L, 2)))
  }

  test("labelCentroidSums: exact decimal sums, one row per (label, pos)") {
    import spark.implicits._
    val emb = Seq(
      (0, Array(1.5f, -2.25f)), (0, Array(0.5f, 0.25f)), (1, Array(3.0f, 4.0f))
    ).toDF("label", "embedding")
    val out = Similarity.labelCentroidSums(emb, "label")
      .orderBy("label", "pos").collect()
    assert(out.length == 4)
    val sums = out.map(r => (r.getInt(0), r.getInt(1), r.getDecimal(2).doubleValue, r.getLong(3))).toSeq
    assert(sums == Seq((0, 0, 2.0, 2L), (0, 1, -2.0, 2L), (1, 0, 3.0, 1L), (1, 1, 4.0, 1L)))
  }

  test("funnel: strictly-after ordering, same-instant never advances, stalls leave nulls") {
    import spark.implicits._
    val ev = Seq(
      // user 1 completes A(10) -> B(20) -> C(30); a B at ts 5 (before A) is ignored
      (1L, "B", 5L), (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L),
      // user 2: B lands at the SAME instant as A -> strictness blocks stage 2
      (2L, "A", 10L), (2L, "B", 10L), (2L, "C", 40L),
      // user 3 never does A at all
      (3L, "B", 1L), (3L, "C", 2L)
    ).toDF("uid", "typ", "ts")
    val out = Relational.funnel(ev, "uid", "typ", "ts", Seq("A", "B", "C"))
      .collect().map(r => r.getLong(0) ->
        (Seq(1, 2, 3).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i))))).toMap
    assert(out(1L) == Seq(Some(10L), Some(20L), Some(30L)))
    assert(out(2L) == Seq(Some(10L), None, None),
      s"same-instant B must not advance past A, and C needs B first: $out")
    assert(!out.contains(3L), "an entity that never enters stage 0 has no funnel row")
    // the chained joins must stay co-partitioned shuffle-hash, never cartesian
    val plan = Relational.funnel(ev, "uid", "typ", "ts", Seq("A", "B", "C"))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("ShuffledHashJoin") && !plan.contains("CartesianProduct"))
  }

  test("retention: cohort = first-event period, multiple same-period events count once") {
    import spark.implicits._
    val ev = Seq(
      // user 1: cohort period 0, active 0 and 2 (twice in period 0 -> once)
      (1L, 5L), (1L, 8L), (1L, 25L),
      // user 2: cohort period 1, active 1 only
      (2L, 12L),
      // user 3: cohort period 0, active 0, 1, 2
      (3L, 0L), (3L, 11L), (3L, 20L)
    ).toDF("uid", "ts")
    val out = Relational.retention(ev, "uid", "ts", periodUs = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (0L, 0L) -> 2L, // users 1 and 3 in their cohort week
      (0L, 1L) -> 1L, // only user 3 returned the next period
      (0L, 2L) -> 2L, // both again two periods on
      (1L, 0L) -> 1L
    ), s"retention matrix mismatch: $out")
  }

  test("transitions: per-entity ordering with tie column, cross-entity bigrams never count") {
    import spark.implicits._
    val ev = Seq(
      // user 1: A -> B -> A; same-ts tie broken by event_id (10 before 11)
      (1L, "A", 100L, 10L), (1L, "B", 100L, 11L), (1L, "A", 200L, 12L),
      // user 2: single event -> no bigram; u1's last and u2's first never pair
      (2L, "C", 300L, 13L)
    ).toDF("uid", "typ", "ts", "eid")
    val out = graft.operators.Relational.transitions(ev, "uid", "typ", "ts", "eid")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("A", "B") -> 1L, ("B", "A") -> 1L),
      s"expected exactly the two within-user bigrams: $out")
  }
}
