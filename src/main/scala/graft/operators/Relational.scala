package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The generic relational surface: filters, sorts, top-k, set ops, joins,
  * windows (SURVEY.md §2.2-§2.8). All declarative — Catalyst handles pushdown,
  * pruning, partial aggregation, and TakeOrderedAndProject; nothing here
  * hand-schedules what the optimizer already does.
  */
object Relational {

  /** P1: IN-list filter (reference etl-vini-azure.py:78). Pushed to the scan. */
  def inFilter(df: DataFrame, column: String, values: Seq[Any]): DataFrame =
    df.filter(col(column).isin(values: _*))

  /** O1: global sort — range-partitioned exchange, not a single-task sort. */
  def sort(df: DataFrame, cols: Column*): DataFrame = df.orderBy(cols: _*)

  /** O2: top-k. orderBy+limit collapses to TakeOrderedAndProject: each
    * partition keeps k rows, the driver merges — no global sort at any scale.
    */
  def topK(df: DataFrame, k: Int, cols: Column*): DataFrame = df.orderBy(cols: _*).limit(k)

  /** U1: union-all of micro-batches, by name. */
  def unionAll(frames: Seq[DataFrame]): DataFrame = frames.reduce(_ unionByName _)

  /** U2: set intersection (DISTINCT semantics). Catalyst plans this as an
    * aggregate + left-semi join — one shuffle per side, no row explosion.
    */
  def intersectDistinct(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)

  /** U3: set difference (DISTINCT semantics) — aggregate + left-anti join. */
  def exceptDistinct(a: DataFrame, b: DataFrame): DataFrame = a.except(b)

  /** F1: regex extraction (codegen'd built-in, no UDF). */
  def regexpExtractCol(df: DataFrame, src: String, pattern: String, group: Int, as: String): DataFrame =
    df.withColumn(as, regexp_extract(col(src), pattern, group))

  /** J1: equi-join + aggregation. The dimension side is explicitly broadcast:
    * at 100 TB the fact table never shuffles for this join — each executor
    * streams its scan against the replicated dim.
    */
  def joinAgg(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
              groupCol: String, aggs: Seq[Column]): DataFrame =
    fact.join(broadcast(dim), col(factKey) === col(dimKey))
      .groupBy(col(groupCol))
      .agg(aggs.head, aggs.tail: _*)

  /** J2: left-semi join — existence filter, carries no payload from the right
    * side through the shuffle.
    */
  def semiJoin(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String): DataFrame =
    left.join(right, col(leftKey) === col(rightKey), "left_semi")

  /** W1: row_number per group over an explicit total order within the group. */
  def rowNumberPerGroup(df: DataFrame, partCols: Seq[String], orderCols: Seq[Column], as: String = "rn"): DataFrame =
    df.withColumn(as, row_number().over(
      Window.partitionBy(partCols.map(col): _*).orderBy(orderCols: _*)))

  /** W2: rolling min/max over a row frame per group. One shuffle on the
    * partition keys; the frame is evaluated streamingly within each group.
    */
  def rollingMinMax(df: DataFrame, valueCol: String, partCols: Seq[String],
                    orderCols: Seq[Column], preceding: Int): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(orderCols: _*)
      .rowsBetween(-preceding, Window.currentRow)
    df.withColumn("roll_min", min(col(valueCol)).over(w))
      .withColumn("roll_max", max(col(valueCol)).over(w))
  }

  /** X5: top-k per group = W1 + filter. Unlike global topK, this shuffles once
    * on the group key and never materializes more than the group's rows.
    */
  def topKPerGroup(df: DataFrame, partCols: Seq[String], orderCols: Seq[Column],
                   k: Int, as: String = "rk"): DataFrame =
    rowNumberPerGroup(df, partCols, orderCols, as).filter(col(as) <= k)

  /** X6: deterministic hash bucketing — the portable primitive behind
    * reproducible sampling and train/test splits. The bucket is derived from
    * md5 of the key (engine-portable, unlike rand()/TABLESAMPLE/xxhash64),
    * so "bucket < 5" is a stable 5% sample and "bucket < 90" a stable train
    * split — identical across runs, engines, and cluster sizes. Pure
    * codegen'd projection; no shuffle, pushes down with the scan.
    */
  def hashBucket(df: DataFrame, keyCol: String, buckets: Int = 100,
                 as: String = "bucket"): DataFrame =
    df.withColumn(as, expr(
      s"cast(conv(substring(md5(cast($keyCol as string)), 1, 8), 16, 10) as bigint) % $buckets"))

  /** X6: weighted mixture sampling (training-data mixtures): keep a
    * per-stratum percentage of rows, chosen by the same portable md5 bucket
    * as [[hashBucket]] — "50% of en, 25% of de, 10% of the rest" as one
    * deterministic filter. Reproducible across runs, engines, and cluster
    * sizes; pure codegen'd projection + filter, no shuffle, no rand().
    */
  def weightedMix(df: DataFrame, keyCol: String, stratumCol: String,
                  weights: Map[String, Int], defaultPct: Int): DataFrame = {
    val pct = weights.foldLeft(lit(defaultPct)) { case (acc, (k, p)) =>
      when(col(stratumCol) === k, p).otherwise(acc)
    }
    hashBucket(df, keyCol).filter(col("bucket") < pct)
  }

  /** X6: TEMPERATURE-weighted mixture (α = 0.5) — the standard multilingual
    * training mix: per-stratum sampling budgets proportional to √count, so
    * low-resource strata are up-weighted relative to proportional sampling
    * without drowning the high-resource mass (the α middle ground between
    * proportional α=1 and uniform α=0). A document survives iff its
    * within-stratum md5 rank r satisfies r · Σw ≤ budget · w_s — the exact
    * algebraic form of r ≤ floor(budget·w_s/Σw) with NO division: every
    * operand is a DECIMAL(20,10), so both sides are exact products and the
    * comparison is engine-portable. √count is the one float op and IEEE
    * requires sqrt correctly rounded, so the double (and its decimal
    * rounding) is bit-identical in any engine — which is why α is fixed at
    * 0.5 here: a general pow() is NOT correctly-rounded-guaranteed across
    * libms and would break the cross-engine hash.
    *
    * 100 TB shape: one count aggregate (stratum-cardinality-sized), one
    * rank window per stratum (the hash-order idiom every sampling op here
    * uses), broadcast of the stratum weight table; no data-sized shuffle
    * beyond the window's own.
    */
  def temperatureMix(df: DataFrame, keyCol: String, stratumCol: String,
                     budget: Int): DataFrame = {
    val dec = DecimalType(20, 10)
    val w = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__w", sqrt(col("__n").cast("double")).cast(dec))
    val tot = w.agg(sum("__w").cast(dec).as("__tw"))
    val wnd = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.select(col(keyCol), col(stratumCol))
      .withColumn("rk", row_number().over(wnd))
      .join(broadcast(w.select(col(stratumCol), col("__w"))), Seq(stratumCol))
      .crossJoin(broadcast(tot))
      .filter(col("rk").cast(dec) * col("__tw") <= lit(budget).cast(dec) * col("__w"))
      .select(col(keyCol), col(stratumCol), col("rk"))
  }

  /** W4: gap-based sessionization — the standard event-pipeline operator for
    * turning a raw click/event stream into sessions. A new session starts when
    * the gap to the previous event of the same key exceeds `gapNs`. Two
    * windows over the SAME (key, order) partitioning — Catalyst plans them in
    * one shuffle + one sort — then one aggregate per (key, session). Linear at
    * any scale; the only skew risk is a single hyperactive key, which is the
    * domain's own skew, not the plan's.
    *
    * `tsCol` must be a numeric epoch (integer arithmetic — no timestamp-type
    * drift between engines); `gapUs` is in the same unit as `tsCol`.
    * `tieCol` breaks ordering ties for a total order (SURVEY §7.4).
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
                 gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val newSession = when(
      lag(col(tsCol), 1).over(w).isNull ||
        col(tsCol) - lag(col(tsCol), 1).over(w) > gapUs, 1).otherwise(0)
    df.withColumn("__new", newSession)
      .withColumn("session_idx", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("session_idx"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** W8: ordered event FUNNEL — per entity, stage k completes at the FIRST
    * occurrence of its event type STRICTLY AFTER stage k-1's completion
    * time (same-instant events do not advance the funnel — strictness makes
    * the semantics unambiguous under ts ties). Returns one row per entity
    * that completed stage 0, with nullable per-stage completion times
    * `t0..t{k-1}` — the classic product-analytics sequence metric
    * (view → click → purchase), and for a training pipeline the
    * interaction-sequence filter (entities that actually traversed a flow).
    *
    * Shape: one conditional aggregate per stage, each a groupBy(entity)
    * min(ts) over rows pre-filtered map-side by event type, chained by
    * shuffle-hash joins ON THE SAME entity key — co-partitioned, so
    * Catalyst reuses the entity distribution instead of re-shuffling per
    * stage. Linear in events per stage; no windows, no per-entity sort.
    * `tsCol` must be a numeric epoch (integer comparisons, SURVEY §7.4).
    */
  def funnel(events: DataFrame, entityCol: String, typeCol: String,
             tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val ev = events.select(col(entityCol).as("entity"),
      col(typeCol).as("__typ"), col(tsCol).as("__ts"))
    var reached = ev.filter(col("__typ") === stages.head)
      .groupBy("entity").agg(min("__ts").as("t0"))
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      val nxt = ev.filter(col("__typ") === st)
        .join(reached.select(col("entity"), col(s"t${i - 1}")).hint("shuffle_hash"),
          Seq("entity"))
        .filter(col("__ts") > col(s"t${i - 1}"))
        .groupBy("entity").agg(min("__ts").as(s"t$i"))
      reached = reached.join(nxt.hint("shuffle_hash"), Seq("entity"), "left")
    }
    reached
  }

  /** W9: cohort RETENTION — the funnel's companion metric: bucket each
    * entity into the period of its FIRST event (its cohort), mark the
    * periods it was active in, and count per (cohort, periods-since) cell —
    * the retention matrix every product-analytics stack publishes, and for
    * a training pipeline the longitudinal-coverage report (how long do
    * entities keep contributing data after first appearance).
    *
    * All integer arithmetic: periods are epoch div periodUs, so cohort and
    * offset are exact in any engine. Shape: one min-aggregate (cohorts),
    * one distinct over (entity, period) — both partial-agg safe — joined
    * shuffle-hash on the entity key, then one final aggregate over the
    * (cohorts × offsets)-bounded cell space. The per-cell count needs no
    * countDistinct: the (entity, period) frame is already distinct, so each
    * entity hits a cell at most once.
    */
  def retention(events: DataFrame, entityCol: String, tsCol: String,
                periodUs: Long): DataFrame = {
    require(periodUs > 0, "periodUs must be positive")
    val ev = events.select(col(entityCol).as("entity"),
      expr(s"$tsCol div $periodUs").as("period"))
    val cohorts = ev.groupBy("entity").agg(min("period").as("cohort"))
    ev.distinct()
      .join(cohorts.hint("shuffle_hash"), Seq("entity"))
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("periods_since"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** P8: constraint QUARANTINE — the row-level routing form of P7's
    * aggregate report: evaluate named constraints per row and attach the
    * array of VIOLATED constraint names, so the caller splits the stream
    * into clean rows (`size(violations) = 0`) and a dead-letter side
    * carrying machine-readable reasons — the contract a production ingest
    * needs (P7 tells you THAT 3% failed; this routes WHICH rows and WHY
    * without a second pass). NULL-valued constraints count as violations,
    * matching P7's false-or-null discipline — silence is not compliance.
    * Pure map-side projection: no shuffle, codegen-friendly, linear.
    */
  def quarantine(df: DataFrame,
                 constraints: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(constraints.nonEmpty, "quarantine needs at least one constraint")
    val marks = constraints.map { case (name, c) =>
      when(!coalesce(c, lit(false)), lit(name))
    }
    df.withColumn("violations", filter(array(marks: _*), x => x.isNotNull))
  }

  /** W10: event TRANSITION matrix — per-entity consecutive event-type
    * bigrams under a TOTAL time order (ts, then `tieCol` — SURVEY §7.4: a
    * bare ts order is nondeterministic under same-instant events), counted
    * corpus-wide: the session-flow statistic (what follows what, how often)
    * behind Markov-chain UX models and behavioral-cloning data audits.
    * One lag window per entity + one (from, to) aggregate — a single key
    * exchange, then cells bounded by |event-type|². Exact integers.
    */
  def transitions(events: DataFrame, entityCol: String, typeCol: String,
                  tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** W11: interval COALESCING — merge each entity's overlapping-or-touching
    * [start, end] intervals into maximal disjoint spans, the coverage
    * primitive behind busy-time rollups, crawl-window consolidation, and
    * span-level dedup bookkeeping (X1's substring spans are merged with
    * exactly this sweep, there specialized to a fixed grid). A new span
    * opens where an interval's start exceeds the running maximum end of
    * everything before it — the classic sweep-line test, expressed as one
    * prefix-max window so Spark runs it with a single per-entity sort, no
    * self-join and no iteration.
    *
    * All comparisons are integer (epoch-µs starts/ends), so span boundaries
    * are exact in any engine. Shape: one hash exchange on the entity key +
    * one in-partition sort feeds BOTH windows (prefix-max and running span
    * id — same (key, order) spec, one Window physical node), then a partial-
    * agg groupBy on (entity, span) — linear in intervals, parallel across
    * entities at any corpus size. Requires end >= start on every row
    * (callers derive ends additively from starts, which guarantees it).
    */
  def coalesceIntervals(intervals: DataFrame, entityCol: String,
                        startCol: String, endCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col(startCol), col(endCol), col(tieCol))
    val prevMaxEnd = max(col(endCol)).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val newSpan = when(prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1).otherwise(0)
    intervals
      .withColumn("__new", newSpan)
      .withColumn("__span", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(entityCol), col("__span").as("span_idx"))
      .agg(min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_intervals"))
  }

  /** J5: range (band) join — each fact row lands in the band whose
    * [lo, hi) interval contains its value. The band table is small by
    * construction, so it is explicitly broadcast: Catalyst plans a
    * BroadcastNestedLoopJoin where the fact side streams once and never
    * shuffles — the only scalable plan for a non-equi join against a small
    * dimension. (A big-big range join would need bucketized interval
    * overlap instead; the band-dimension case is the one pipelines hit.)
    */
  def rangeJoin(fact: DataFrame, bands: DataFrame, valueCol: String,
                loCol: String, hiCol: String): DataFrame =
    fact.join(broadcast(bands), col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))

  /** J11: big-big INTERVAL OVERLAP join — the case [[rangeJoin]]'s doc
    * defers: when BOTH interval sets are large, a broadcast non-equi join
    * is impossible and a cartesian-with-filter is quadratic. The standard
    * rewrite buckets time into fixed `gridUs` cells: each interval explodes
    * to the cells it covers, candidates meet through a cell EQUI-join
    * (shuffle-hash, partition-parallel), and the overlap predicate verifies
    * exactly. Each overlapping pair is emitted EXACTLY ONCE with no
    * dedup pass — both intervals cover max(start_a, start_b), so they share
    * that instant's cell, and only that cell is made "responsible" for the
    * pair (the cell == max-start-cell filter). Closed-interval semantics:
    * touching endpoints overlap.
    *
    * Scale: shuffle carries Σ(len/grid + 1) cell rows per side — grid
    * trades replication (long intervals × fine grid) against per-cell
    * candidate mass (coarse grid × dense cells); pick grid ≈ typical
    * interval length. A pathological cell (many concurrent intervals) is
    * ordinary join skew — AQE's skew split or a [[saltedJoin]]-style salt
    * applies unchanged.
    */
  def intervalOverlapJoin(a: DataFrame, aId: String, aStart: String, aEnd: String,
                          b: DataFrame, bId: String, bStart: String, bEnd: String,
                          gridUs: Long): DataFrame = {
    require(gridUs > 0, "gridUs must be positive")
    def cells(df: DataFrame, id: String, s0: String, e0: String, p: String) =
      df.select(col(id).as(s"${p}_id"), col(s0).as(s"${p}_s"), col(e0).as(s"${p}_e"))
        .withColumn("cell", explode(expr(s"sequence(${p}_s div $gridUs, ${p}_e div $gridUs)")))
    cells(a, aId, aStart, aEnd, "a")
      .join(cells(b, bId, bStart, bEnd, "b").hint("shuffle_hash"), Seq("cell"))
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .filter(expr(s"cell = greatest(a_s, b_s) div $gridUs"))
      .select(col("a_id").as("id_a"), col("b_id").as("id_b"),
        greatest(col("a_s"), col("b_s")).as("overlap_start"),
        least(col("a_e"), col("b_e")).as("overlap_end"))
  }

  /** J9: skew-safe salted equi-join — the join-side counterpart of the salted
    * aggregate (a10). When one join key dominates the fact side, a plain
    * shuffle join lands the whole hot key in one task; AQE's skew-join split
    * is the first-line fix, but it cannot help when the hot key's rows must
    * still meet ONE dim row in ONE task group. The manual rewrite: spread
    * fact rows across `salts` sub-keys by hashing a per-row column (NOT the
    * join key — same-key rows must scatter), and replicate each dim row to
    * all `salts` sub-keys, so the hot key becomes `salts` independent tasks.
    * Replication costs dim×salts, which is why it applies to fact⋈dim, not
    * big⋈big; production variants salt only keys above a frequency threshold.
    * The result set is identical to the direct join — proven by the oracle.
    *
    * `rowCol`: any fact column (row-level, need not be unique) whose hash
    * spreads rows of one key across salts deterministically.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                 rowCol: String, salts: Int): DataFrame =
    fact.withColumn("__fsalt", pmod(hash(col(rowCol)), lit(salts)))
      .join(dim.withColumn("__dsalt", explode(sequence(lit(0), lit(salts - 1)))),
        col(factKey) === col(dimKey) && col("__fsalt") === col("__dsalt"))
      .drop("__fsalt", "__dsalt")

  /** A6 (scale form): EXACT grouped percentiles via distributed sort +
    * linear interpolation instead of Spark's `percentile()` aggregate.
    * `percentile()` is a non-codegen TypedImperativeAggregate that builds an
    * in-memory value→count map per group per partition — unbounded when the
    * value domain is near-unique (exactly the 100 TB case); this form is a
    * key-partitioned sort (spill-friendly, codegen'd window) + one grouped
    * aggregate, with memory bounded by the sort buffer.
    *
    * The interpolation replicates Spark's `Percentile.getPercentile`
    * bit-for-bit — pos = (n−1)·p; if floor(pos) == ceil(pos) take the row at
    * pos, else x_lo·(ceil(pos)−pos) + x_hi·(pos−floor(pos)) — so swapping
    * the implementation cannot move any oracle-checked digit. `ps` maps
    * output column name → fraction.
    *
    * Nulls follow `percentile()` exactly: null values are ignored within a
    * group, and a group whose values are ALL null is still emitted, with
    * NULL percentiles (rows rank nulls-last; `__n` counts only non-null, so
    * an all-null group has n = 0 and no border row ever matches).
    */
  def exactPercentiles(df: DataFrame, keyCol: String, valCol: String,
                       ps: Seq[(String, Double)]): DataFrame = {
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col("__x").asc_nulls_last)
    val wAll = Window.partitionBy(col(keyCol))
    val ranked = df.select(col(keyCol), col(valCol).cast("double").as("__x"))
      .withColumn("__rn", row_number().over(wOrd))
      .withColumn("__n", count(col("__x")).over(wAll))
    val aggs = ps.flatMap { case (name, p) =>
      val pos = (col("__n") - 1).cast("double") * lit(p)
      // pos, lo, frac are group-level constants (functions of __n alone), so
      // max() just selects "the" value; the when() picks the 1-2 border rows
      Seq(
        max(when((col("__rn") - 1).cast("double") === floor(pos), col("__x"))).as(s"__lo_$name"),
        max(when((col("__rn") - 1).cast("double") === floor(pos) + 1d, col("__x"))).as(s"__hi_$name"),
        max(pos).as(s"__pos_$name"))
    }
    ranked.groupBy(col(keyCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(keyCol) +: ps.map { case (name, _) =>
        val pos = col(s"__pos_$name")
        val lo = col(s"__lo_$name"); val hi = col(s"__hi_$name")
        when(floor(pos) === ceil(pos), lo)
          .otherwise(lo * (ceil(pos) - pos) + hi * (pos - floor(pos)))
          .as(name)
      }: _*)
  }

  /** A15: exact EQUI-DEPTH histogram — k buckets of (near-)equal row count
    * with exact [lo, hi] value bounds, the statistic behind range-join band
    * tables, skew diagnosis, and size-balanced range partitioning (a
    * data-derived replacement for j5's hand-written bands). Bucket of the
    * rank-r row (1-based, total order (value, ties...)) is
    * ((r-1)·k) div N — the same integer split Spark's own range partitioner
    * targets, exact and engine-portable.
    *
    * Scale shape: global ranks come from [[Medallion.withScalableSurrogateId]]
    * (one range exchange + in-partition sort + O(#partitions) driver prefix
    * sum — no single-task global window), then one partial-agg groupBy over
    * a k-bounded cell space. The N scalar is one bounded driver count on
    * the checkpointed sorted frame.
    */
  def equiDepthHistogram(df: DataFrame, valCol: String, tieCols: Seq[String],
                         buckets: Int): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    // internal names: the surrogate pass adds an `id` column, which must
    // not collide with whatever the caller's frame happens to carry
    val narrowed = df.select(col(valCol).as("__v") +:
      tieCols.zipWithIndex.map { case (c, i) => col(c).as(s"__t$i") }: _*)
    val ranked = graft.operators.Medallion.withScalableSurrogateId(
      narrowed, "__v" +: tieCols.indices.map(i => s"__t$i"))
    val n = ranked.count()
    require(n > 0, "equiDepthHistogram needs a non-empty input")
    ranked
      .withColumn("bucket", expr(s"((id - 1) * $buckets) div $n"))
      .groupBy("bucket")
      .agg(min(col("__v")).as("lo"), max(col("__v")).as("hi"),
        count(lit(1)).as("n_rows"))
  }

  /** X6: deterministic EPOCH-SHUFFLE order — the training-order generator:
    * each epoch needs a different but REPRODUCIBLE global permutation of
    * the corpus, sharded for the data loader. Hash md5(epoch:id) gives the
    * permutation (seeded, engine-portable, stable across cluster sizes —
    * everything rand() is not); shard = hash-bucket; position within shard
    * = rank in hash order. Different epochs decorrelate because the epoch
    * number is inside the hash.
    *
    * Shape: one map-side hash projection + one shard-key window (rank in
    * shard, co-partitioned) — no global sort, no single-partition window;
    * shards are the unit a 1000-loader job consumes in parallel.
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int, shards: Int): DataFrame = {
    require(shards >= 1, "shards must be >= 1")
    val h = expr(s"conv(substring(md5(concat('$epoch', ':', cast($idCol as string))), 1, 8), 16, 10)")
      .cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.select(col(idCol), h.as("__h"))
      .withColumn("shard", pmod(col("__h"), lit(shards)))
      .withColumn("pos", row_number().over(w))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** P9: column PROFILE report — the Deequ/Great-Expectations-style table
    * summary every ingest publishes before anyone writes constraints:
    * per column, row count, null count, distinct count, and min/max
    * (stringified, so one schema carries any column type and the report
    * stays engine-portable). Long-format output (one row per column) so
    * downstream checks diff profiles across loads.
    *
    * Shape: ONE pass over the table computing all per-column aggregates in
    * a single partial-agg HashAggregate (count/min/max are cheap;
    * count(distinct) per column rewrites through Catalyst's expand — cost
    * scales with the profiled column list, so callers profile the columns
    * they publish, not SELECT *), then a constant-size literal unpivot.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"__n_$c"),
        count(when(col(c).isNull, 1)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val pieces = cols.map { c =>
      struct(lit(c).as("column"), col(s"__n_$c").as("n_rows"),
        col(s"__null_$c").as("n_null"), col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"), col(s"__max_$c").as("max_s"))
    }
    row.select(explode(array(pieces: _*)).as("p")).select("p.*")
  }

  /** MERGE-style upsert (table maintenance): rows of `updates` replace base
    * rows with the same key; unmatched update rows are inserts; all other
    * base rows pass through. Expressed as anti-join + union — the CDC batch
    * is broadcast (it is small relative to the base by construction), so the
    * 100 TB base never shuffles: one streamed pass, no sort, no wide state.
    * Schemas must match by name (enforced by unionByName). CALLER CONTRACT:
    * the batch must carry at most one row per key — every copy of a
    * duplicated key would land (this op adds no per-key window so the base
    * pass stays exchange-free); feeds that can replay pre-collapse to
    * last-writer-wins first, or use VersionedTable.mergeInto, which
    * enforces uniqueness loudly.
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    base.join(broadcast(updates.select(keys.map(col): _*)), keys, "left_anti")
      .unionByName(updates)

  /** SCD TYPE 2 merge (slowly-changing-dimension history — the warehouse
    * lifecycle op beside [[upsert]]'s Type 1 overwrite): apply a batch of
    * updates to a versioned dimension while PRESERVING history. The
    * dimension carries (key, attrs..., valid_from, valid_to, is_current)
    * with `valid_to` NULL on current rows. Per key:
    *
    *  - update matches the current row and any attr differs → the current
    *    row CLOSES (valid_to = asOf, is_current = false) and a new current
    *    row opens (valid_from = asOf);
    *  - update matches with identical attrs → no-op (re-sending the same
    *    state must not spawn a version — the idempotence a CDC feed needs);
    *  - new key → a new current row opens;
    *  - keys absent from the batch, and ALL closed history rows, pass
    *    through untouched.
    *
    * 100 TB shape: history rows (the unbounded mass of a dimension — every
    * version ever) are a pure pass-through union, never joined, never
    * shuffled; only the CURRENT slice (bounded by live keys) joins the
    * batch, full-outer on the key, one exchange each side. Attr comparison
    * uses null-safe equality (`<=>`) per column so NULL attr values
    * neither spuriously close rows nor mask real changes.
    */
  def scdType2(dim: DataFrame, updates: DataFrame, keyCol: String,
               attrCols: Seq[String], asOf: Column): DataFrame = {
    require(attrCols.nonEmpty, "need at least one tracked attribute")
    val history = dim.filter(!col("is_current"))
    // NULL keys cannot participate in the key-equality join below: a
    // NULL-keyed current row would silently DROP from the output (the
    // isNotNull survivor selection can't see it) and a NULL-keyed batch row
    // would silently open a NULL-key current row that no later batch can
    // ever match. Refuse both loudly — same fail-loud policy as the
    // duplicate-key guard, and same filter-predicate shape so column
    // pruning can't elide the check.
    def nullKeyGuard(df: DataFrame, side: String): DataFrame =
      df.filter(when(col(keyCol).isNull,
          raise_error(lit(s"scdType2: NULL $side key (NULL keys cannot join; " +
            "filter or surrogate them upstream)")).cast("boolean"))
        .otherwise(lit(true)))
    val current = nullKeyGuard(dim.filter(col("is_current")), "dimension")
    // duplicate batch keys would multiply through the full-outer join into
    // duplicate closed rows AND multiple is_current=true rows per key —
    // refuse loudly (in a filter predicate, so pruning can't elide the
    // check) instead of corrupting every downstream current-slice read
    val dedupGuard = {
      val w = Window.partitionBy(col(keyCol))
      nullKeyGuard(updates, "update-batch")
        .withColumn("__n", count(lit(1)).over(w))
        .filter(when(col("__n") > 1,
            raise_error(concat(lit("scdType2: duplicate update-batch key "),
              col(keyCol).cast("string"))).cast("boolean"))
          .otherwise(lit(true)))
        .drop("__n")
    }
    val u = dedupGuard.select((keyCol +: attrCols).map(c => col(c).as(s"__u_$c")): _*)
    val j = current.join(u, col(keyCol) === col(s"__u_$keyCol"), "full")
    val matched = col(keyCol).isNotNull && col(s"__u_$keyCol").isNotNull
    val changed = matched &&
      !attrCols.map(c => col(c) <=> col(s"__u_$c")).reduce(_ && _)
    val dimCols = dim.columns.toSeq
    // surviving current rows: unchanged/no-update keys as-is, changed keys closed
    val kept = j.filter(col(keyCol).isNotNull).select(dimCols.map {
      case "valid_to"   => when(changed, asOf).otherwise(col("valid_to")).as("valid_to")
      case "is_current" => when(changed, lit(false)).otherwise(col("is_current")).as("is_current")
      case c            => col(c)
    }: _*)
    // newly-opened rows: changed keys' new state + brand-new keys
    val opened = j.filter(changed || col(keyCol).isNull)
      .select(dimCols.map {
        case `keyCol`     => col(s"__u_$keyCol").as(keyCol)
        case "valid_from" => asOf.as("valid_from")
        case "valid_to"   => lit(null).cast(dim.schema("valid_to").dataType).as("valid_to")
        case "is_current" => lit(true).as("is_current")
        case c if attrCols.contains(c) => col(s"__u_$c").as(c)
        case c            => col(c) // untracked payload carries over (null for new keys)
      }: _*)
    history.unionByName(kept).unionByName(opened)
  }

  /** [[scdType2]] committed into a [[graft.io.VersionedTable]] — where a
    * production dimension actually lives. Each merge reads the CURRENT
    * dimension snapshot, applies the batch, and commits the result as an
    * OVERWRITE under the caller's `commitId`, so:
    *
    *  - dimension history is time-travelable at TWO granularities: row
    *    level (the SCD2 valid_from/valid_to intervals) and snapshot level
    *    (`VersionedTable.read(asOf)` returns the dimension exactly as any
    *    past merge left it);
    *  - the merge is EXACTLY-ONCE under replay: re-running a committed
    *    `commitId` (a driver retry, a replayed micro-batch) returns the
    *    existing version without reading or writing anything — the same
    *    batchId-keyed idempotence contract as the streaming sinks.
    *
    * An empty log bootstraps: every batch row opens as the initial current
    * version (valid_from = `asOfDate`). Validity bounds are ISO date
    * STRINGS (lexicographically ordered, engine-portable). `attrCols` must
    * cover every non-key batch column — untracked batch columns would
    * arrive NULL on inserted rows. Each commit is O(current dimension),
    * never O(history of snapshots); vacuum retires old snapshots without
    * touching SCD2 row history, which lives inside every snapshot.
    */
  def scdType2Commit(spark: org.apache.spark.sql.SparkSession, root: String,
                     updates: DataFrame, keyCol: String, attrCols: Seq[String],
                     asOfDate: String, commitId: String): Long = {
    val log = graft.io.VersionedTable.history(root)
    log.find(_.commitId == commitId) match {
      case Some(prior) => prior.version // replayed merge: exactly-once no-op
      case None =>
        val dim =
          if (log.isEmpty)
            updates.limit(0)
              .withColumn("valid_from", lit(null).cast("string"))
              .withColumn("valid_to", lit(null).cast("string"))
              .withColumn("is_current", lit(true))
          else graft.io.VersionedTable.read(spark, root)
        val merged = scdType2(dim, updates, keyCol, attrCols, lit(asOfDate))
        graft.io.VersionedTable.commit(merged, root, "overwrite", commitId)
    }
  }

  /** POINT-IN-TIME (temporal) join — the standard consumer of an
    * [[scdType2]] dimension: each fact row joins the dimension VERSION in
    * effect at the fact's timestamp (valid_from ≤ t, and t < valid_to or
    * the version is still open). Shape: one equi-join on the key with the
    * validity predicate as a residual filter — correct and cheap because a
    * Type-2 dimension carries a BOUNDED number of versions per key (its
    * versions partition time), so the join fans out by that small factor
    * and the filter keeps exactly one; no range-join machinery, no
    * interval explosion. Facts with no version in effect (before the
    * key's first valid_from, or an unknown key) keep their row with NULL
    * dimension columns — dropping history-less facts silently is how
    * point-in-time bugs hide.
    */
  def temporalJoin(facts: DataFrame, dim: DataFrame, factKey: String,
                   dimKey: String, factTimeCol: String): DataFrame = {
    // every condition column is SIDE-QUALIFIED through the two aliases: the
    // common SCD2-consumer case has factKey == dimKey (and facts may carry
    // their own valid_from/valid_to), where unqualified col(...) references
    // are ambiguous at analysis — or worse, resolve against the wrong side
    // of the joined plan and silently join on the dimension to itself
    val (f, d) = (facts.as("__tj_f"), dim.as("__tj_d"))
    val t = col(s"__tj_f.$factTimeCol")
    val valid = t >= col("__tj_d.valid_from") &&
      (col("__tj_d.valid_to").isNull || t < col("__tj_d.valid_to"))
    f.join(d, col(s"__tj_f.$factKey") === col(s"__tj_d.$dimKey") && valid, "left")
  }

  /** Snapshot diff (CDC extract — the read-side complement of [[upsert]]):
    * compare two snapshots of a keyed table and emit one row per key that
    * was added, removed, or changed between them. Rows compare by an md5
    * fingerprint over per-column md5 digests: each column hashes
    * INDIVIDUALLY first (NULL → a non-hex marker token), and the
    * fixed-alphabet digests join with a separator no digest can contain.
    * That makes the combined fingerprint collision-free at the tuple level
    * (up to md5 collisions): no unescaped-separator shift — a value
    * containing any separator character cannot move content across column
    * boundaries, since only digests reach the concat — and no NULL/sentinel
    * collision, since the NULL marker is not a valid digest. The
    * fingerprint is engine-portable (md5 + concat), so the fingerprint
    * itself, not just the verdict, is oracle-checkable.
    *
    * 100 TB shape: each snapshot reduces map-side to (key, fingerprint) —
    * payload never shuffles; the full-outer sort-merge join on the key is
    * the one linear shuffle per side. That is the CDC idiom for table
    * formats without change feeds: diff at the fingerprint level, join
    * back to payloads only for the (small) changed set.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compare column")
    // md5(col) is NULL iff col is NULL; "null" contains non-hex chars, so it
    // can never equal a digest, and "|" never appears inside one
    def fp = md5(concat_ws("|",
      compareCols.map(c => coalesce(md5(col(c).cast("string")), lit("null"))): _*))
    val af = a.select(keys.map(col) :+ fp.as("fp_a"): _*)
    val bf = b.select(keys.map(col) :+ fp.as("fp_b"): _*)
    af.join(bf, keys, "full_outer")
      .withColumn("change",
        when(col("fp_a").isNull, "added")
          .when(col("fp_b").isNull, "removed")
          .when(col("fp_a") =!= col("fp_b"), "changed"))
      .filter(col("change").isNotNull)
      .select(keys.map(col) :+ col("change"): _*)
  }

  /** As-of join (an operator Spark lacks natively): for each left row, attach
    * the right-side value with the greatest time <= the left row's time,
    * per key. Implemented as the union + ordered-window idiom: tag both
    * sides, sort within each key by (time, side) with right rows first at
    * ties, and carry the last non-null right value forward. One shuffle on
    * the key — no range-condition join explosion, no per-row subquery —
    * which is what keeps it linear at 100 TB.
    *
    * The right side must be unique per (key, time) for determinism;
    * pre-aggregate it if it is not.
    *
    * Left columns: (keyCol, idCol, timeCol); right: (keyCol, timeCol, valCol).
    * Output: (idCol, keyCol, timeCol, asof_<valCol>), left rows only.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
               idCol: String, valCol: String): DataFrame = {
    val valType = right.schema(valCol).dataType
    val tagged = right
      .select(col(keyCol), col(timeCol), lit(0).as("__side"), col(valCol).as("__v"),
        lit(null).cast(left.schema(idCol).dataType).as(idCol))
      .unionByName(left.select(col(keyCol), col(timeCol), lit(1).as("__side"),
        lit(null).cast(valType).as("__v"), col(idCol)))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged.withColumn(s"asof_$valCol", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col(idCol), col(keyCol), col(timeCol), col(s"asof_$valCol"))
  }

  /** J12: NEAREST-in-time join — the bidirectional refinement of [[asOfJoin]]
    * (which only looks backward): each left row pairs with the right row of
    * the same key whose timestamp is closest in EITHER direction — the
    * sensor-fusion / measurement-alignment shape. Deterministic selection
    * rule, engine-portable: nearest by (|Δt|, then earlier t, then smaller
    * right id).
    *
    * Same union idiom as asOfJoin — no range explosion, no per-row scan:
    * one key exchange feeds two windows, then a three-way integer
    * comparison picks the side. BOTH lookups are running
    * unboundedPreceding..current frames — the forward lookup runs as
    * "backward last over DESCENDING time order", because Spark evaluates a
    * current..unboundedFollowing aggregate frame by rescanning to the
    * partition end for every row (O(n²) per key — measured 6.2× on 3× data
    * before the rewrite; running frames are O(n)). The two orders also
    * resolve equal-timestamp ties to the SAME row (smallest right id) in
    * both directions. Two in-partition sorts, one shuffle, linear.
    */
  def nearestJoin(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
                  leftIdCol: String, rightIdCol: String): DataFrame = {
    // integral time only: a raw cast("long") on TimestampType truncates to
    // whole seconds, silently coarsening |Δt| comparisons and tie-breaks —
    // callers with timestamps convert explicitly (unix_micros) first
    Seq(left -> "left", right -> "right").foreach { case (df, side) =>
      df.schema(timeCol).dataType match {
        case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType => ()
        case other => sys.error(
          s"nearestJoin requires an integral $timeCol on the $side side, got $other; " +
            "convert timestamps explicitly (e.g. unix_micros) so precision loss is a caller decision")
      }
    }
    val lIdT = left.schema(leftIdCol).dataType
    val rIdT = right.schema(rightIdCol).dataType
    val tagged = right
      .select(col(keyCol).as("__k"), col(timeCol).cast("long").as("__t"),
        lit(0).as("__side"), lit(null).cast(lIdT).as("__lid"), col(rightIdCol).as("__rid"))
      .unionByName(left.select(col(keyCol).as("__k"), col(timeCol).cast("long").as("__t"),
        lit(1).as("__side"), col(leftIdCol).as("__lid"), lit(null).cast(rIdT).as("__rid")))
    val rRow = when(col("__side") === 0, struct(col("__t").as("t"), col("__rid").as("id")))
    val wB = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__rid").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col("__k"))
      .orderBy(col("__t").desc, col("__side").desc, col("__rid").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val back = last(rRow, ignoreNulls = true).over(wB)
    val fwd = last(rRow, ignoreNulls = true).over(wF)
    tagged
      .withColumn("__b", back).withColumn("__f", fwd)
      .filter(col("__side") === 1)
      .withColumn("__near",
        when(col("__b").isNull, col("__f"))
          .when(col("__f").isNull, col("__b"))
          .when(col("__t") - col("__b.t") <= col("__f.t") - col("__t"), col("__b"))
          .otherwise(col("__f")))
      .select(col("__lid").as(leftIdCol), col("__k").as(keyCol), col("__t").as(timeCol),
        col("__near.id").as("nearest_id"), col("__near.t").as("nearest_t"))
  }

  /** Data-quality constraint report (the engine form of the reference DDL's
    * NOT NULL / type-width constraints, etl-vini-azure.py:87-90, generalized
    * to arbitrary row predicates): one pass over the table, one violation
    * counter per rule — a row violates when its predicate is false OR null
    * (SQL constraint semantics make nulls violations of anything but an
    * explicit IS NULL test). All counters partial-aggregate map-side, so the
    * 100 TB scan streams once and shuffles k counters.
    */
  def constraintReport(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val aggs = rules.map { case (name, pred) =>
      sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(name)
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = s"stack(${rules.size}, " +
      rules.map { case (n, _) => s"'$n', `$n`" }.mkString(", ") +
      ") as (rule, n_violations)"
    wide.select(expr(stackExpr)).orderBy("rule")
  }

  /** JOIN-KEY SKEW diagnostic — the report run BEFORE a big join to decide
    * whether it needs salting/AQE-skew treatment (the production
    * counterpart of the `salts` sizing rule on minhashLshPairs, which
    * needs n_max = the heaviest key's row count as its input): the top-k
    * heaviest keys of a column with exact counts and integer
    * parts-per-million share of the table, plus the table totals each row
    * carries for context. A key with share_ppm ≈ 1e6/k-partitions is
    * even; a key holding percent-level share serializes its join task and
    * the report names it before the join burns the cluster.
    *
    * 100 TB shape: one partial-aggregated groupBy(key) (shuffle bounded by
    * distinct keys), a TakeOrderedAndProject heap for the top-k, and the
    * 1-row total broadcast — the table streams once.
    */
  def skewReport(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum("cnt").as("n_rows"), count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .withColumn("share_ppm", expr("cnt * 1000000 div n_rows"))
      .orderBy(col("cnt").desc, col(keyCol)).limit(k)
      .withColumn("rk", row_number().over(Window.orderBy(col("cnt").desc, col(keyCol))))
      .select(col("rk"), col(keyCol), col("cnt"), col("share_ppm"), col("n_rows"), col("n_keys"))
  }

  /** Exact WEIGHTED MEDIAN per group — the robust central-tendency
    * aggregate (the 50 % point of the weight mass, not the row count):
    * smallest value v with cumWeight(≤ v) · 2 ≥ totalWeight. Integer-exact
    * by construction, so any engine agrees bit-for-bit — float-interpolated
    * percentile_approx cannot cross-check like this. Shape: one
    * (group, value) weight aggregate (partial map-side), one partitioned
    * cumulative window, one min — nothing global, state per group bounded
    * by distinct values.
    */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
                     weightCol: String): DataFrame = {
    // INTEGRAL values only, enforced at runtime: Spark's cast-to-long
    // TRUNCATES fractional values while SQL engines' CAST rounds, so a
    // silent cast on 2.7 would quietly desynchronize the engines the
    // operator promises agree bit-for-bit. Integral-VALUED doubles/decimals
    // (TPC-H quantities) cast losslessly and pass; anything fractional
    // raises with the offending value.
    val vLong = col(valueCol).cast("long")
    val vChecked = when(col(valueCol).isNotNull &&
        col(valueCol).cast("double") =!= vLong.cast("double"),
        raise_error(concat(lit(s"weightedMedian: non-integral $valueCol value: "),
          col(valueCol).cast("string"))).cast("long"))
      .otherwise(vLong)
    // the SAME integral guard applies to the weight column — a fractional
    // weight would silently truncate through cast-to-long (0.7 → 0) and a
    // negative weight would corrupt the cumulative-mass inequality without
    // any error; both raise loudly with the offending value instead
    val wLong = col(weightCol).cast("long")
    val wChecked = when(col(weightCol).isNotNull &&
        (col(weightCol).cast("double") =!= wLong.cast("double") || wLong < 0),
        raise_error(concat(lit(s"weightedMedian: non-integral or negative $weightCol value: "),
          col(weightCol).cast("string"))).cast("long"))
      .otherwise(wLong)
    val byVal = df.groupBy(col(groupCol), vChecked.as("__v"))
      .agg(sum(wChecked).as("__w"))
    val win = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
    byVal
      .withColumn("__cum", sum("__w").over(win))
      .withColumn("__tot", sum("__w").over(Window.partitionBy(col(groupCol))))
      .filter(col("__cum") * 2 >= col("__tot"))
      .groupBy(col(groupCol))
      .agg(min(col("__v")).as("weighted_median"), max(col("__tot")).as("total_weight"))
  }

  /** PARTITION CHECKSUM audit — the cross-replica/cross-engine consistency
    * check a replicated 100 TB table runs instead of comparing rows: per
    * partition, the row count and an ORDER-INDEPENDENT integer checksum
    * (sum of each row's md5-head integer over the [[snapshotDiff]]-style
    * per-column fingerprint, so no separator/NULL ambiguity and no sort is
    * ever needed — addition commutes, the aggregate partial-combines
    * map-side). Two replicas disagree on any row of any partition ⇔ that
    * partition's (n_rows, checksum) pair disagrees.
    */
  def partitionChecksum(df: DataFrame, partCol: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one checksummed column")
    val fp = md5(concat_ws("|",
      cols.map(c => coalesce(md5(col(c).cast("string")), lit("null"))): _*))
    df.groupBy(col(partCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(conv(substring(fp, 1, 8), 16, 10).cast("long")).as("checksum"))
  }

  /** Z-order (Morton) value of two non-negative integer dimensions, `bits`
    * bits each: bit j of x lands at position 2j, bit j of y at 2j+1. Rows
    * sorted/range-partitioned by this value cluster near in BOTH dimensions,
    * so min/max file statistics prune on either predicate — the
    * data-layout optimization behind multi-dimensional clustering of 100 TB
    * tables. Pure integer bit arithmetic (a 2·bits-term codegen'd sum), so
    * any engine computes the identical value.
    */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).flatMap { j =>
      Seq(
        shiftleft(shiftright(x.cast("long"), j).bitwiseAND(lit(1L)), 2 * j),
        shiftleft(shiftright(y.cast("long"), j).bitwiseAND(lit(1L)), 2 * j + 1))
    }.reduce(_ + _)
}
