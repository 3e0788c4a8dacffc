package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

import graft.operators.{Medallion, Relational}

/** Property-based invariants (SURVEY.md §5.2.3): generated inputs via
  * ScalaCheck Gen (seeded — deterministic), laws that must hold at any scale.
  */
class PropertySpec extends SparkSpec {

  private val rowsGen = Gen.listOfN(30, Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0, 9999)))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, rng.Seed(42L + i)))

  test("exactPercentiles equals Spark's percentile() aggregate bit-for-bit") {
    import spark.implicits._
    // generated groups plus edge cases: singleton group, two-row group
    samples(rowsGen, 3).filter(_.nonEmpty).foreach { data =>
      val withEdges = data.map { case (k, v) => (k, Integer.valueOf(v)) } ++
        Seq(("solo", Integer.valueOf(7777)), ("duo", Integer.valueOf(1)),
          ("duo", Integer.valueOf(2)), ("a", null: Integer), // nulls are ignored
          ("ghost", null: Integer), ("ghost", null: Integer)) // all-null group → NULL percentiles, row kept
      val df = withEdges.toDF("k", "v")
      val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75)
      val sorted = Relational.exactPercentiles(df, "k", "v", ps)
        .orderBy("k").collect().map(r => (r.getString(0), r.get(1), r.get(2), r.get(3))).toSeq
      val builtin = df.groupBy("k").agg(
          expr("percentile(v, 0.25)").as("p25"),
          expr("percentile(v, 0.5)").as("p50"),
          expr("percentile(v, 0.75)").as("p75"))
        .orderBy("k").collect().map(r => (r.getString(0), r.get(1), r.get(2), r.get(3))).toSeq
      assert(sorted == builtin)
    }
  }

  test("distinct is idempotent; union-all counts are additive pre-dedup") {
    samples(rowsGen, 5).filter(_.nonEmpty).foreach { data =>
      import spark.implicits._
      val df = data.toDF("k", "v")
      val d1 = df.distinct()
      assert(d1.count() == d1.distinct().count())
      assert(Relational.unionAll(Seq(df, df)).count() == 2L * df.count())
    }
  }

  test("silverToGold: min <= max, diff = max - min, one row per key") {
    samples(rowsGen, 5).filter(_.nonEmpty).foreach { data =>
      import spark.implicits._
      val df = data.toDF("k", "v").select(col("k"), (col("v") / 100.0).as("v"))
      val gold = Medallion.silverToGold(df, "k", "v", java.time.LocalDate.of(2022, 2, 28)).collect()
      assert(gold.length == data.map(_._1).distinct.length)
      gold.foreach { r =>
        assert(r.getDecimal(1).compareTo(r.getDecimal(2)) <= 0)
        assert(r.getDecimal(2).subtract(r.getDecimal(1)).compareTo(r.getDecimal(3)) == 0)
      }
    }
  }

  test("dedupClusters equals a reference union-find on random graphs") {
    import graft.operators.ext.Dedup
    val edgeGen = Gen.listOfN(25, Gen.zip(Gen.choose(1L, 30L), Gen.choose(1L, 30L)))
    samples(edgeGen, 4).foreach { edges =>
      import spark.implicits._
      val pairs = edges.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      val docs = (1L to 30L).toDF("doc_id")
      val got = Dedup.dedupClusters(docs, "doc_id", pairs.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference union-find with path compression
      val parent = scala.collection.mutable.Map((1L to 30L).map(i => i -> i): _*)
      def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // normalize: min id per component
      val want = (1L to 30L).map { i =>
        val root = find(i)
        i -> (1L to 30L).filter(j => find(j) == root).min
      }.toMap
      assert(got == want)
    }
  }

  test("intervalOverlapJoin equals the brute-force overlap join on random interval sets") {
    val ivGen = Gen.listOfN(18, Gen.zip(Gen.choose(0L, 200L), Gen.choose(0L, 60L)))
    samples(Gen.zip(ivGen, ivGen), 4).foreach { case (as, bs) =>
      import spark.implicits._
      def mk(xs: List[(Long, Long)]) = xs.zipWithIndex
        .map { case ((s0, len), i) => (i.toLong, s0, s0 + len) }
      val (a, b) = (mk(as), mk(bs))
      val got = Relational.intervalOverlapJoin(
          a.toDF("id", "s", "e"), "id", "s", "e",
          b.toDF("id", "s", "e"), "id", "s", "e", gridUs = 25L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (ia, sa, ea) <- a; (ib, sb, eb) <- b if sa <= eb && sb <= ea
      } yield (ia, ib)).toSet
      assert(got.size == got.toSeq.size && got == want,
        s"grid join must equal brute force exactly once per pair")
    }
  }

  test("nearestJoin equals the brute-force argmin on random event sets") {
    val evGen = Gen.listOfN(20, Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 100L)))
    samples(Gen.zip(evGen, evGen), 4).foreach { case (ls, rs) =>
      import spark.implicits._
      def mk(xs: List[(Long, Long)], off: Long) = xs.zipWithIndex
        .map { case ((k, t), i) => (off + i, k, t) }
      val (l, r) = (mk(ls, 1000L), mk(rs, 2000L))
      val got = Relational.nearestJoin(l.toDF("id", "k", "t"), r.toDF("id", "k", "t"),
          "k", "t", "id", "id")
        .collect().map(x => x.getLong(0) -> (if (x.isNullAt(3)) -1L else x.getLong(3))).toMap
      val want = l.map { case (lid, lk, lt) =>
        val cands = r.filter(_._2 == lk)
        lid -> (if (cands.isEmpty) -1L
                else cands.minBy { case (rid, _, rt) => (math.abs(rt - lt), rt, rid) }._1)
      }.toMap
      assert(got == want)
    }
  }

  test("coalesceIntervals: spans are disjoint, ordered, and cover exactly the input mass") {
    val ivGen = Gen.listOfN(20, Gen.zip(Gen.choose(0L, 150L), Gen.choose(0L, 40L)))
    samples(ivGen, 4).foreach { ivs =>
      import spark.implicits._
      val rows = ivs.zipWithIndex.map { case ((s0, len), i) => (1L, s0, s0 + len, i.toLong) }
      val got = Relational.coalesceIntervals(rows.toDF("k", "s", "e", "tie"), "k", "s", "e", "tie")
        .orderBy("span_idx").collect()
        .map(r => (r.getLong(2), r.getLong(3))).toSeq
      // disjoint with a strict gap between consecutive spans
      got.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(s2 > e1, s"spans must be separated: $got")
        case _ =>
      }
      // covered point set identical to the union of inputs
      val wantCovered = rows.flatMap { case (_, s0, e0, _) => s0 to e0 }.toSet
      val gotCovered = got.flatMap { case (s0, e0) => s0 to e0 }.toSet
      assert(gotCovered == wantCovered)
    }
  }

  test("stringify round-trip: decimal(10,2) strings parse back to equal values") {
    samples(Gen.listOfN(20, Gen.choose(-99999L, 99999L)), 5).filter(_.nonEmpty).foreach { vals =>
      import spark.implicits._
      val df = vals.toDF("cents")
        .select((col("cents") / 100.0).cast("decimal(10,2)").as("v"))
      val strs = Medallion.stringify(df)
      val back = strs.select(col("v").cast("decimal(10,2)").as("v"))
      assert(back.except(df).count() == 0 && df.except(back).count() == 0)
    }
  }

  test("scdType2 matches a brute-force reference on random dimensions and batches") {
    import spark.implicits._
    // dimension: keys 0..9 with random attr; update batches: random subset
    // of keys 0..14 (5 keys are inserts) with random attrs — covering
    // change, no-op resend, absent key, and insert per draw
    val dimGen = Gen.listOfN(10, Gen.choose(0, 3))
    val updGen = Gen.listOfN(8, Gen.zip(Gen.choose(0L, 14L), Gen.choose(0, 3)))
    samples(Gen.zip(dimGen, updGen), 6).foreach { case (attrs, updRaw) =>
      val upd = updRaw.groupBy(_._1).map(_._2.head).toSeq // one update per key
      val dim = attrs.zipWithIndex.map { case (a, k) =>
        (k.toLong, s"attr$a", "2022-01-01", null: String, true)
      }.toDF("k", "attr", "valid_from", "valid_to", "is_current")
      val updates = upd.map { case (k, a) => (k, s"attr$a") }.toDF("k", "attr")
      val got = Relational.scdType2(dim, updates, "k", Seq("attr"), lit("2022-02-28"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          Option(r.getString(3)), r.getBoolean(4))).toSet
      // brute-force reference
      val dimMap = attrs.zipWithIndex.map { case (a, k) => k.toLong -> s"attr$a" }.toMap
      val expect = scala.collection.mutable.Set[(Long, String, String, Option[String], Boolean)]()
      dimMap.foreach { case (k, a) =>
        upd.toMap.get(k) match {
          case Some(ua) if s"attr$ua" != a => // changed: close + reopen
            expect += ((k, a, "2022-01-01", Some("2022-02-28"), false))
            expect += ((k, s"attr$ua", "2022-02-28", None, true))
          case _ => // no-op resend or absent: untouched
            expect += ((k, a, "2022-01-01", None, true))
        }
      }
      upd.foreach { case (k, ua) =>
        if (!dimMap.contains(k)) expect += ((k, s"attr$ua", "2022-02-28", None, true))
      }
      assert(got == expect.toSet,
        s"scdType2 mismatch:\n extra=${got -- expect}\n missing=${expect.toSet -- got}")
    }
    // temporalJoin: facts before the first version or with unknown keys
    // KEEP their row with NULL dim columns; in-range facts pick exactly
    // the version whose interval covers them (valid_to exclusive)
    val tdim = Seq(
      (1L, "v1", "2000-01-01", "2001-01-01", false),
      (1L, "v2", "2001-01-01", null, true)
    ).toDF("dk", "seg", "valid_from", "valid_to", "is_current")
    val tfacts = Seq((10L, 1L, "1999-06-01"), (11L, 1L, "2000-06-01"),
      (12L, 1L, "2001-01-01"), (13L, 2L, "2000-06-01")).toDF("fid", "fk", "t")
    val tj = Relational.temporalJoin(tfacts, tdim, "fk", "dk", "t")
      .select("fid", "seg").collect().map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(tj == Map(10L -> None, 11L -> Some("v1"), 12L -> Some("v2"), 13L -> None), tj.toString)

    // duplicate batch keys are refused loudly, never silently multiplied
    val dim1 = Seq((1L, "a", "2022-01-01", null: String, true))
      .toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val dupBatch = Seq((1L, "b"), (1L, "c")).toDF("k", "attr")
    val e = intercept[Exception](
      Relational.scdType2(dim1, dupBatch, "k", Seq("attr"), lit("2022-02-28")).collect())
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("duplicate update-batch key"), msgs)

    // NULL keys refuse loudly on BOTH sides: a NULL-keyed current dim row
    // would otherwise silently vanish (the isNotNull survivor filter), and
    // a NULL-keyed batch row would silently open an unjoinable current row
    def deepMsgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val nullDim = Seq((Option.empty[Long], "a", "2022-01-01", Option.empty[String], true))
      .toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val okBatch = Seq((2L, "b")).toDF("k", "attr")
    val eDim = intercept[Exception](
      Relational.scdType2(nullDim, okBatch, "k", Seq("attr"), lit("2022-02-28")).collect())
    assert(deepMsgs(eDim).contains("NULL dimension key"), deepMsgs(eDim))
    val nullBatch = Seq((Option.empty[Long], "b")).toDF("k", "attr")
    val eBatch = intercept[Exception](
      Relational.scdType2(dim1, nullBatch, "k", Seq("attr"), lit("2022-02-28")).collect())
    assert(deepMsgs(eBatch).contains("NULL update-batch key"), deepMsgs(eBatch))
  }

  test("deleteWhereMor, deleteWhere, and brute force agree on random commit/key layouts") {
    import spark.implicits._
    // random commit partitionings of 24 keyed rows into 1-4 dirs, random
    // delete key sets (present, absent, and spanning multiple dirs): the
    // merge-on-read read path, the copy-on-write rewrite path, and a plain
    // in-memory filter must produce identical survivor sets
    val layoutGen = Gen.zip(
      Gen.listOfN(24, Gen.choose(0, 3)),           // dir assignment per row
      Gen.listOfN(6, Gen.choose(0L, 30L)))         // delete keys (some absent)
    samples(layoutGen, 5).zipWithIndex.foreach { case ((dirOf, delKeys), i) =>
      val rows = (0L until 24L).map(k => (k, s"v$k"))
      val byDir = rows.zip(dirOf).groupBy(_._2).toSeq.sortBy(_._1)
      val rootM = TestSpark.tmpDir(s"prop_mor_$i")
      val rootC = TestSpark.tmpDir(s"prop_cow_$i")
      byDir.foreach { case (d, rs) =>
        val df = rs.map(_._1).toDF("id", "s")
        graft.io.VersionedTable.commit(df, rootM, "append", s"c$d", statsCols = Seq("id"))
        graft.io.VersionedTable.commit(df, rootC, "append", s"c$d", statsCols = Seq("id"))
      }
      val keys = delKeys.distinct.toDF("id")
      graft.io.VersionedTable.deleteWhereMor(spark, rootM, keys, "id", "purge")
      graft.io.VersionedTable.deleteWhere(spark, rootC, keys, "id", "purge")
      val expect = rows.map(_._1).filterNot(delKeys.contains).toSet
      val gotM = graft.io.VersionedTable.read(spark, rootM).collect().map(_.getLong(0)).toSet
      val gotC = graft.io.VersionedTable.read(spark, rootC).collect().map(_.getLong(0)).toSet
      assert(gotM == expect, s"MOR mismatch (dirs=$dirOf del=$delKeys):\n $gotM\n $expect")
      assert(gotC == expect, s"COW mismatch (dirs=$dirOf del=$delKeys):\n $gotC\n $expect")
      // a post-delete append re-inserts identically on both paths
      graft.io.VersionedTable.commit(Seq((delKeys.head, "back")).toDF("id", "s"),
        rootM, "append", "re", statsCols = Seq("id"))
      graft.io.VersionedTable.commit(Seq((delKeys.head, "back")).toDF("id", "s"),
        rootC, "append", "re", statsCols = Seq("id"))
      val backM = graft.io.VersionedTable.read(spark, rootM)
        .filter(col("id") === delKeys.head).count()
      val backC = graft.io.VersionedTable.read(spark, rootC)
        .filter(col("id") === delKeys.head).count()
      assert(backM == backC && backM >= 1,
        s"re-insert must be visible on both paths: mor=$backM cow=$backC")
    }
  }

  test("temporalJoin resolves shared column names side-correctly") {
    import spark.implicits._
    // the common SCD2-consumer shape: fact key column named IDENTICALLY to
    // the dimension key, and facts carrying their own valid_from column —
    // unqualified references would be ambiguous or bind the wrong side
    val dim = Seq(
      (1L, "v1", "2000-01-01", "2001-01-01", false),
      (1L, "v2", "2001-01-01", null, true)
    ).toDF("k", "seg", "valid_from", "valid_to", "is_current")
    val facts = Seq(
      (10L, 1L, "2000-06-01", "1990-01-01"),
      (11L, 1L, "2002-06-01", "1990-01-01")
    ).toDF("fid", "k", "t", "valid_from") // k and valid_from collide with dim
    val got = Relational.temporalJoin(facts, dim, "k", "k", "t")
      .select(col("fid"), col("__tj_d.seg"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(10L -> "v1", 11L -> "v2"), got.toString)
  }

  test("weightedMedian refuses fractional and negative weights loudly") {
    import spark.implicits._
    def deepMsgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val frac = Seq(("g", 1L, 0.7), ("g", 2L, 1.0)).toDF("grp", "v", "w")
    val e1 = intercept[Exception](
      Relational.weightedMedian(frac, "grp", "v", "w").collect())
    assert(deepMsgs(e1).contains("non-integral or negative w"), deepMsgs(e1))
    val neg = Seq(("g", 1L, -2.0), ("g", 2L, 1.0)).toDF("grp", "v", "w")
    val e2 = intercept[Exception](
      Relational.weightedMedian(neg, "grp", "v", "w").collect())
    assert(deepMsgs(e2).contains("non-integral or negative w"), deepMsgs(e2))
    // integral-valued doubles still pass and weight the mass correctly
    val ok = Seq(("g", 1L, 1.0), ("g", 2L, 3.0)).toDF("grp", "v", "w")
    val r = Relational.weightedMedian(ok, "grp", "v", "w").collect()
    assert(r.length == 1 && r(0).getLong(1) == 2L && r(0).getLong(2) == 4L, r.mkString)
  }

  test("Hilbert curve: bijective, neighbor-continuous, and tighter-boxed than Morton") {
    import graft.functions.HilbertCurve
    // 2-D, full 10-bit grid (2^20 cells): the distance is a BIJECTION onto
    // [0, 2^20) and every consecutive pair of distances is a Manhattan-1
    // grid step — the defining Hilbert property (Morton fails it at every
    // power-of-two seam)
    val bits = 10; val side = 1 << bits; val n = side * side
    val xs = new Array[Short](n); val ys = new Array[Short](n)
    val seen = new java.util.BitSet(n)
    var x = 0
    while (x < side) {
      var y = 0
      while (y < side) {
        val h = HilbertCurve.compute(Array(x.toLong, y.toLong), bits)
        assert(h >= 0 && h < n, s"($x,$y) -> $h out of range")
        assert(!seen.get(h.toInt), s"collision at h=$h")
        seen.set(h.toInt)
        xs(h.toInt) = x.toShort; ys(h.toInt) = y.toShort
        y += 1
      }
      x += 1
    }
    var i = 1
    while (i < n) {
      val d = math.abs(xs(i) - xs(i - 1)) + math.abs(ys(i) - ys(i - 1))
      assert(d == 1,
        s"step $i: (${xs(i - 1)},${ys(i - 1)}) -> (${xs(i)},${ys(i)}) distance $d")
      i += 1
    }
    // locality vs Morton, same grid: split each curve into 100 equal-count
    // ranges (= the range-partitioned files of a TARGET 100 OPTIMIZE) and
    // sum the per-range bounding-box half-perimeters — the per-file
    // envelope width that decides min/max pruning. 100 is deliberately NOT
    // a power of 4: aligned power-of-4 splits carve BOTH curves into exact
    // square blocks (a tie by construction), while real repartitionByRange
    // boundaries land wherever the data quantiles fall — and any range
    // crossing a Morton power-of-two seam pays the jump in box width,
    // which the neighbor-continuous Hilbert curve never does.
    def boxSum(order: Array[Int]): Long = {
      (0 until 100).map { b =>
        var (xmn, xmx, ymn, ymx) = (Int.MaxValue, -1, Int.MaxValue, -1)
        var j = (b.toLong * n / 100).toInt
        val end = ((b + 1).toLong * n / 100).toInt
        while (j < end) {
          val c = order(j)
          val cx = c >> bits; val cy = c & (side - 1)
          if (cx < xmn) xmn = cx; if (cx > xmx) xmx = cx
          if (cy < ymn) ymn = cy; if (cy > ymx) ymx = cy
          j += 1
        }
        (xmx - xmn).toLong + (ymx - ymn).toLong
      }.sum
    }
    // order arrays: cell id (x<<bits | y) at position h along each curve
    val hilbertOrder = new Array[Int](n)
    var h2 = 0
    while (h2 < n) { hilbertOrder(h2) = (xs(h2).toInt << bits) | ys(h2).toInt; h2 += 1 }
    val mortonOrder = new Array[Int](n)
    var cx = 0
    while (cx < side) {
      var cy = 0
      while (cy < side) {
        var m = 0L; var j = 0
        while (j < bits) {
          m |= ((cx.toLong >> j) & 1L) << (2 * j)
          m |= ((cy.toLong >> j) & 1L) << (2 * j + 1)
          j += 1
        }
        mortonOrder(m.toInt) = (cx << bits) | cy
        cy += 1
      }
      cx += 1
    }
    val (hb, mb) = (boxSum(hilbertOrder), boxSum(mortonOrder))
    assert(hb < mb, s"hilbert box sum $hb must beat morton $mb")
    // 3-D, 4-bit grid (4096 cells): bijection + adjacency hold at k=3 too
    val s3 = 1 << 4; val n3 = s3 * s3 * s3
    val coords = new Array[Int](n3)
    val seen3 = new java.util.BitSet(n3)
    for (a <- 0 until s3; b <- 0 until s3; c <- 0 until s3) {
      val h = HilbertCurve.compute(Array(a.toLong, b.toLong, c.toLong), 4)
      assert(h >= 0 && h < n3 && !seen3.get(h.toInt), s"3-D bijection broken at ($a,$b,$c)")
      seen3.set(h.toInt)
      coords(h.toInt) = (a << 8) | (b << 4) | c
    }
    (1 until n3).foreach { j =>
      val (p, q) = (coords(j - 1), coords(j))
      val d = math.abs((p >> 8) - (q >> 8)) +
        math.abs(((p >> 4) & 15) - ((q >> 4) & 15)) + math.abs((p & 15) - (q & 15))
      assert(d == 1, s"3-D adjacency broken at step $j")
    }
  }

  test("schema lifecycle fuzz: random append/evolve/rename/drop/merge/widen/update/replace/cond-merge/set-layout sequences match an in-memory model") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    // random op sequences over one table: plain appends, add-column
    // evolution (string AND int columns), column renames (mapping),
    // metadata-only drops, copy-on-write merges, metadata-only TYPE
    // WIDENING of an int column, range UPDATEs, range-scoped REPLACE
    // backfills, and CONDITIONAL merges with a delete clause — after
    // EVERY op the full read must equal a dumb in-memory model, under
    // whatever interleaving the generator picked (widen-then-merge must
    // supply the widened type, update-after-rename SETs through the
    // logical name, replace-after-evolution backfills the widened shape,
    // drop-then-append, ...)
    // op 9 toggles PARTITION EVOLUTION (flat <-> partitioned-by-id):
    // every later op — appends in the new layout, rewrites crossing era
    // boundaries, reads unioning eras — must stay model-exact; op 10
    // adds a COLUMN DEFAULT (metadata-only), so pre-default rows must
    // read the default while every later batch carries explicit values
    val opGen = Gen.listOfN(10, Gen.choose(0, 10))
    samples(opGen, 3).zipWithIndex.foreach { case (ops, i) =>
      val root = TestSpark.tmpDir(s"prop_lifecycle_$i")
      var cols = Vector("id", "c0") // id: Long key
      var colType = Map("id" -> "long", "c0" -> "string") // long | int | string
      var fresh = 1
      var nextId = 0L
      var layout: Seq[String] = Nil // the table's CURRENT declared hive layout
      var defCols = Set.empty[String] // DEFAULT-bearing columns (rename refuses)
      var model = Vector.empty[Map[String, Any]]
      def valueFor(c: String, id: Long): Any = colType(c) match {
        case "string" => s"$c-$id"
        case "int"    => (id * 7).toInt
        case "long"   => id * 7
      }
      def mkRows(n: Int): Seq[Map[String, Any]] = (0 until n).map { _ =>
        val id = nextId; nextId += 1
        Map[String, Any]("id" -> id) ++ cols.drop(1).map(c => c -> valueFor(c, id))
      }
      def toDf(rows: Seq[Map[String, Any]], cs: Vector[String]) = {
        val schema = StructType(cs.map(c =>
          if (c == "id") StructField("id", LongType)
          else StructField(c, colType(c) match {
            case "int" => IntegerType; case "long" => LongType; case _ => StringType
          })))
        spark.createDataFrame(
          rows.map(r => Row.fromSeq(cs.map(c => r.getOrElse(c, null)))).asJava, schema)
      }
      val r0 = mkRows(3); model ++= r0
      graft.io.VersionedTable.commit(toDf(r0, cols), root, "append", s"l$i-init",
        statsCols = Seq("id"))
      // a table property set up front must survive EVERY op below — the
      // carriage guard for the manifest field (a publish path that forgets
      // to carry props fails here, not in production)
      graft.io.VersionedTable.setTableProperties(root,
        Map("fuzz.owner" -> "prop-spec"), s"l$i-props")
      var opIdx = 0
      ops.foreach { op =>
        opIdx += 1
        op match {
          case 0 =>
            val rs = mkRows(2); model ++= rs
            graft.io.VersionedTable.commit(toDf(rs, cols), root, "append",
              s"l$i-a$opIdx", statsCols = Seq("id"), partitionCols = layout)
          case 1 =>
            val kind = if (opIdx % 2 == 0) "int" else "string"
            val nc = s"c$fresh"; fresh += 1
            cols = cols :+ nc
            colType += (nc -> kind)
            val rs = mkRows(2); model ++= rs
            graft.io.VersionedTable.commit(toDf(rs, cols), root, "append",
              s"l$i-e$opIdx", statsCols = Seq("id"), partitionCols = layout)
          case 2 if cols.exists(c => c != "id" && !defCols(c)) =>
            val c = cols.reverse.find(c => c != "id" && !defCols(c)).get
            val nc = s"r$fresh"; fresh += 1
            graft.io.VersionedTable.renameColumn(root, c, nc, s"l$i-r$opIdx")
            cols = cols.updated(cols.indexOf(c), nc)
            colType = colType - c + (nc -> colType(c))
            model = model.map(m => m.get(c).fold(m)(v => m - c + (nc -> v)))
          case 3 if cols.size > 2 =>
            val c = cols(1 + (opIdx % (cols.size - 1)))
            graft.io.VersionedTable.dropColumn(root, c, s"l$i-d$opIdx")
            cols = cols.filterNot(_ == c)
            colType -= c
            model = model.map(_ - c)
          case 4 if model.nonEmpty =>
            val ids = model.map(_("id").asInstanceOf[Long]).distinct.take(2)
            val ups = ids.map(id =>
              Map[String, Any]("id" -> id) ++ cols.drop(1).map { c =>
                c -> (colType(c) match {
                  case "string" => s"$c-u$opIdx-$id"
                  case "int"    => (id * 7 + opIdx).toInt
                  case "long"   => id * 7 + opIdx
                })
              })
            graft.io.VersionedTable.mergeInto(spark, root, toDf(ups, cols), "id",
              s"l$i-m$opIdx", statsCols = Seq("id"))
            model = model.filterNot(m => ids.contains(m("id"))) ++ ups
          case 5 =>
            cols.find(c => colType(c) == "int") match {
              case Some(c) =>
                graft.io.VersionedTable.widenColumnType(root, c, "bigint", s"l$i-w$opIdx")
                colType += (c -> "long")
                model = model.map(m => m.get(c) match {
                  case Some(v: Int) => m + (c -> v.toLong)
                  case _ => m
                })
              case None => ()
            }
          case 6 if model.nonEmpty =>
            cols.filter(c => colType(c) == "string") match {
              case Vector() => ()
              case scs =>
                val sc = scs.last
                val ids = model.map(_("id").asInstanceOf[Long]).sorted
                val (lo, hi) = (ids.head, ids(ids.size / 2))
                graft.io.VersionedTable.updateRange(spark, root, "id", lo, hi,
                  Map(sc -> s"'u$opIdx'"), s"l$i-u$opIdx", statsCols = Seq("id"))
                // SET replaces the value for EVERY in-range row — including
                // rows that predate the column (NULL reads SET like any other)
                model = model.map { m =>
                  val id = m("id").asInstanceOf[Long]
                  if (id >= lo && id <= hi) m + (sc -> s"u$opIdx") else m
                }
            }
          case 7 if model.nonEmpty =>
            // RANGE-SCOPED REPLACE: backfill [lo, hi] with only the EVEN
            // in-range ids re-derived — odd in-range rows must disappear
            val ids = model.map(_("id").asInstanceOf[Long]).sorted
            val (lo, hi) = (ids.head, ids(ids.size / 2))
            val batch = ids.filter(id => id >= lo && id <= hi && id % 2 == 0)
              .map(id => Map[String, Any]("id" -> id) ++ cols.drop(1).map { c =>
                c -> (colType(c) match {
                  case "string" => s"$c-rr$opIdx-$id"
                  case "int"    => (id * 11 + opIdx).toInt
                  case "long"   => id * 11 + opIdx
                })
              })
            graft.io.VersionedTable.replaceRange(spark, root, "id", lo, hi,
              toDf(batch, cols), s"l$i-rr$opIdx", statsCols = Seq("id"))
            model = model.filterNot { m =>
              val id = m("id").asInstanceOf[Long]; id >= lo && id <= hi
            } ++ batch
          case 9 =>
            layout = if (layout.isEmpty) Seq("id") else Nil
            graft.io.VersionedTable.setPartitionLayout(root, layout, s"l$i-pl$opIdx")
          case 10 =>
            val nc = s"d$fresh"; fresh += 1
            graft.io.VersionedTable.addColumnWithDefault(spark, root, nc, "string",
              s"'dv$opIdx'", s"l$i-df$opIdx")
            cols = cols :+ nc
            colType += (nc -> "string")
            defCols += nc
            // every EXISTING row reads the default; later batches carry
            // explicit values (mkRows includes every column)
            model = model.map(_ + (nc -> s"dv$opIdx"))
          case 8 if model.nonEmpty =>
            // CONDITIONAL MERGE: matched ids with id % 3 == 0 DELETE (a
            // tgt-scoped clause), the rest take the source row
            val ids = model.map(_("id").asInstanceOf[Long]).distinct.take(3)
            val src = ids.map(id =>
              Map[String, Any]("id" -> id) ++ cols.drop(1).map { c =>
                c -> (colType(c) match {
                  case "string" => s"$c-cm$opIdx-$id"
                  case "int"    => (id * 13 + opIdx).toInt
                  case "long"   => id * 13 + opIdx
                })
              })
            graft.io.VersionedTable.mergeIntoConditional(spark, root,
              toDf(src, cols), "id", s"l$i-cm$opIdx",
              matchedDeleteCond = Some("tgt.id % 3 = 0"),
              statsCols = Seq("id"))
            model = model.flatMap { m =>
              val id = m("id").asInstanceOf[Long]
              if (!ids.contains(id)) Some(m)
              else if (id % 3 == 0) None
              else src.find(_("id") == id)
            }
          case _ => ()
        }
        val df = graft.io.VersionedTable.read(spark, root)
        assert(df.columns.toSeq == cols,
          s"seq=$ops op#$opIdx: columns ${df.columns.toSeq} != $cols")
        assert(graft.io.VersionedTable.tableProperties(root)
            == Map("fuzz.owner" -> "prop-spec"),
          s"seq=$ops op#$opIdx: table properties must survive every op")
        val got = df.collect().map { r =>
          cols.map(c => c -> (if (r.isNullAt(r.fieldIndex(c))) null
                              else r.get(r.fieldIndex(c)))).toMap
        }.toSet
        val want = model.map(m => cols.map(c => c -> m.getOrElse(c, null)).toMap).toSet
        assert(got == want, s"seq=$ops at op#$opIdx:\n got=$got\n want=$want")
      }
    }
  }
}
