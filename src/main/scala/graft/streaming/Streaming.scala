package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout,
  ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Structured Streaming treatment of the reference's ingest loop
  * (etl-vini-azure.py:61-77: a 180-second driver-side polling window).
  *
  * The batch engine treats that loop as micro-batch accumulate (sources/
  * Ingest.scala); here the same semantics are expressed as a proper stream:
  * parse → filter → event-time window with watermark, plus stateful
  * per-key session aggregation via flatMapGroupsWithState — the pieces a
  * streaming training-data feed needs (the reference never needs state, so
  * state here is [EXT] capability).
  *
  * All transforms are stream-static safe and tested with MemoryStream.
  */
object Streaming {

  /** Parse a stream of raw JSON ticker payloads into typed rows.
    * Input schema: (payload string, ingest_ts timestamp).
    */
  def parseTickStream(raw: DataFrame): DataFrame =
    raw.select(explode(from_json(col("payload"), graft.model.Schemas.tickerJson)).as("t"),
        col("ingest_ts"))
      .select(col("t.symbol").as("symbol"), col("t.price").as("price"), col("ingest_ts"))
      .filter(col("symbol").isin(graft.sources.Ingest.symbols: _*))

  /** Tumbling event-time window aggregate with a watermark: per-symbol
    * min/max per window — the streaming generalization of silver→gold.
    */
  def windowedMinMax(ticks: DataFrame, windowLen: String, watermark: String): DataFrame =
    ticks.withWatermark("ingest_ts", watermark)
      .groupBy(window(col("ingest_ts"), windowLen), col("symbol"))
      .agg(min("price").as("min_price"), max("price").as("max_price"))

  /** Tumbling event-time window count + id-sum in APPEND mode: the form
    * whose late-data contract is checkable — each window emits exactly once
    * (when the watermark passes its end), and rows arriving after their
    * window is finalized are DROPPED, counted by the state operator's
    * `numRowsDroppedByWatermark`. Integer aggregates (count, id sum) so the
    * emitted windows replay bit-for-bit against a batch oracle computing
    * the same watermark cutoffs.
    */
  def windowedIdSum(events: DataFrame, windowLen: String, watermark: String): DataFrame =
    events.withWatermark("ingest_ts", watermark)
      .groupBy(window(col("ingest_ts"), windowLen))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"))

  /** Native SESSION-WINDOW aggregation (the declarative alternative to the
    * [[sessionize]] flatMapGroupsWithState form): Spark's `session_window`
    * merges events whose gap stays under `gap` into one dynamic window per
    * key — state the engine manages and merges itself, vs the hand-written
    * GroupState. Split rule: a new session opens when the gap is >= `gap`
    * (windows are [first, last + gap) and merge only on true overlap) —
    * one boundary STRICTER than sessionize's `> gapUs`, which is why both
    * forms exist and both are oracle-pinned.
    */
  def sessionWindowAgg(events: DataFrame, keyCol: String, gap: String): DataFrame =
    events.groupBy(col(keyCol), session_window(col("ingest_ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"))

  /** Streaming dedup with bounded state: exact dedup on (symbol, price)
    * within the watermark horizon — X1's streaming form.
    */
  def streamDedup(ticks: DataFrame, watermark: String): DataFrame =
    ticks.withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("symbol", "price")

  /** Stream-stream interval join: each left event joined to right events of
    * the same key whose timestamp falls in [leftTs, leftTs + horizon]. Both
    * sides carry watermarks and the join condition bounds both timestamps,
    * so Spark can evict join state once the watermark passes the horizon —
    * the state stays proportional to (rate × horizon), not the stream's
    * history, which is what makes a continuous join viable. Column names on
    * the two sides must be disjoint (rename before calling).
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   watermark: String, horizon: String): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        expr(s"$leftKey = $rightKey AND $rightTs >= $leftTs " +
          s"AND $rightTs <= $leftTs + INTERVAL $horizon"))

  /** LEFT OUTER stream-stream interval join — [[intervalJoin]]'s
    * unmatched-preserving form (the funnel/attribution shape: every click
    * appears, purchased or not). Same state-eviction geometry as the inner
    * join — watermarks on both sides + the two-sided time bound keep state
    * ∝ rate × horizon — but with a second emission path the inner form
    * lacks: a left row whose join window [leftTs, leftTs + horizon] falls
    * wholly behind the watermark can provably never match a future right
    * row, so eviction EMITS it null-padded instead of dropping it. That
    * also defines the operator's honest tail contract: left rows whose
    * window the watermark never passes (the final `horizon + watermark`
    * of a stream's life) remain in state, matched-only — a consumer
    * draining a finite source sees null-padded rows only up to
    * `max(eventTime) - watermark - horizon`.
    */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame,
                            leftKey: String, rightKey: String,
                            leftTs: String, rightTs: String,
                            watermark: String, horizon: String): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        expr(s"$leftKey = $rightKey AND $rightTs >= $leftTs " +
          s"AND $rightTs <= $leftTs + INTERVAL $horizon"),
        "left_outer")

  /** FULL OUTER stream-stream interval join — the attribution-COMPLETE
    * watermarked-join shape (every click appears, purchased or not, AND
    * every purchase appears, attributed or not): unmatched rows from BOTH
    * sides emit null-padded at state eviction. Eviction geometry per side:
    * a LEFT row emits unmatched once the watermark passes its whole join
    * window `[leftTs, leftTs + horizon]` (identical to the left-outer
    * form); a RIGHT row at `rightTs` can only match lefts with
    * `leftTs ∈ [rightTs - horizon, rightTs]`, so it provably cannot match
    * any future left once the watermark passes `rightTs` itself — its
    * eviction bound is tighter by one horizon. Both bounds are part of the
    * operator's honest tail contract and both appear verbatim in the
    * batch oracle: left-unmatched rows appear up to
    * `max(eventTime) - watermark - horizon`, right-unmatched up to
    * `max(eventTime) - watermark`. State stays ∝ rate × horizon per side.
    */
  def intervalJoinFullOuter(left: DataFrame, right: DataFrame,
                            leftKey: String, rightKey: String,
                            leftTs: String, rightTs: String,
                            watermark: String, horizon: String): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        expr(s"$leftKey = $rightKey AND $rightTs >= $leftTs " +
          s"AND $rightTs <= $leftTs + INTERVAL $horizon"),
        "full_outer")

  /** LEFT SEMI stream-stream interval join — the existence-test form of
    * [[intervalJoin]] (the "which clicks converted" shape): each left row
    * emits AT MOST ONCE, when its first match arrives, with no right-side
    * columns. Same evictable-state geometry (watermarks on both sides +
    * the two-sided bound keep state ∝ rate × horizon), but unlike the
    * outer forms the emitted rows carry NO eviction-bound dependence —
    * matched-or-not is decided entirely by the data, so the batch oracle
    * is the plain EXISTS semi-join with no watermark term: the only
    * watermarked-join shape whose full output is tail-contract-free.
    */
  def intervalJoinSemi(left: DataFrame, right: DataFrame,
                       leftKey: String, rightKey: String,
                       leftTs: String, rightTs: String,
                       watermark: String, horizon: String): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        expr(s"$leftKey = $rightKey AND $rightTs >= $leftTs " +
          s"AND $rightTs <= $leftTs + INTERVAL $horizon"),
        "left_semi")

  /** Streaming corpus curation — the STATELESS curation stages applied to a
    * document stream: quality filter (the x3_quality_score thresholds) →
    * exact-fingerprint decontamination as a STREAM-STATIC left-anti join
    * against the held-out benchmark fingerprint table → weighted language
    * mixture (the deterministic md5-bucket filter — pure projection, stream-
    * safe). The stream-static join is the capability this operator exists
    * for: the benchmark table is a static frame joined into every
    * micro-batch with no state store, the streaming form of the batch
    * decontamination anti-join. Output rows are append-mode safe (no
    * aggregation, no watermark needed).
    *
    * `benchFps` must be a STATIC frame with a single `fp` column (in a real
    * deployment: the published benchmark fingerprint index).
    */
  def curateDocs(docs: DataFrame, benchFps: DataFrame,
                 weights: Map[String, Int], defaultPct: Int): DataFrame = {
    // quality thresholds live in ONE place (TextAnalysis.qualityKeepPred),
    // shared with the batch x9 pipeline — the two paths cannot drift
    val filtered = docs
      .filter(graft.operators.ext.TextAnalysis.qualityKeepPred("text"))
      .withColumn("fp", md5(col("text")))
      .join(benchFps, Seq("fp"), "left_anti")
    graft.operators.Relational.weightedMix(filtered, "doc_id", "lang", weights, defaultPct)
  }

  /** Streaming NEAR-DUP decontamination (stateless): drop every stream
    * document that lands in the same MinHash-LSH band bucket as any document
    * of a STATIC held-out benchmark set — the streaming form of the
    * x1_decontaminate_neardup batch pipeline. Signatures are computed
    * expression-level (Dedup.withBandKeys: one projection, no aggregation,
    * no state store), and the benchmark's distinct band keys collapse to
    * ONE static row (benchmark sets are small by nature) cross-joined into
    * every micro-batch; the drop test is `arrays_overlap` — entirely
    * map-side, so the stream never shuffles and output stays append-safe.
    *
    * RECALL-ORIENTED by design: any band collision drops the document,
    * with no exact-Jaccard verification — in decontamination a false drop
    * costs one training document while a false keep poisons an eval, so
    * the LSH bucket test alone is the right trade for the streaming path;
    * the batch x1_decontaminate_neardup remains the verified precision
    * form.
    */
  def decontamNearDup(docs: DataFrame, bench: DataFrame, bandSize: Int = 8): DataFrame = {
    import graft.operators.ext.Dedup
    val benchKeys = broadcast(Dedup.withBandKeys(bench, "text", bandSize, "__bands")
      .select(explode(col("__bands")).as("k")).distinct()
      .agg(collect_list(col("k")).as("__bkeys")))
    Dedup.withBandKeys(docs, "text", bandSize, "__bands")
      .crossJoin(benchKeys)
      .filter(!arrays_overlap(col("__bands"), col("__bkeys")))
      .drop("__bands", "__bkeys")
  }

  /** ST: streaming index MAINTENANCE — the corpus-growth loop's streaming
    * form. Each micro-batch of new documents appends its expression-level
    * band keys into the PERSISTED bucketed band index
    * ([[graft.operators.ext.Dedup.appendBandIndex]]) inside foreachBatch:
    * the append anti-joins the index's existing doc_ids, so the
    * at-least-once delivery foreachBatch actually has (a batch replayed
    * after a sink-side failure) inserts nothing, and the bucketBy layout
    * is preserved, so probe joins stay index-side-exchange-free while the
    * stream runs. This is the ingestion half of x1_incremental_neardup:
    * probe new docs against the index, then absorb them — continuously.
    */
  def maintainBandIndex(docs: DataFrame, table: String, idCol: String,
                        textCol: String, bandSize: Int,
                        buckets: Int): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.ext.Dedup.appendBandIndex(table, batch.toDF(), idCol,
          textCol, bandSize, buckets)
      }
      .start()

  /** ST: EXACTLY-ONCE streaming SKETCH maintenance — a count-min sketch
    * kept current by the stream, with the versioned table's idempotent
    * commit protocol carrying the exactly-once guarantee that COUNTER state
    * cannot get from anti-joins: counter merges are not idempotent (a
    * replayed batch would double-count), so each micro-batch commits the
    * MERGED sketch as an OVERWRITE under a batchId-derived commitId —
    * foreachBatch's at-least-once replay then degrades to
    * VersionedTable's committed-commitId no-op, and a crash between merge
    * and publish re-runs the whole read-merge-commit atomically against
    * the prior snapshot. State is the d×w counter table (a constant of the
    * sketch, ~KBs), so the per-batch overwrite is O(sketch), never O(data
    * seen); history/time travel of the sketch come free from the log.
    *
    * `appId` is the caller's durable query identity and is REQUIRED in the
    * commitId (the Delta txnAppId+txnVersion idempotent-writes pattern):
    * batch ids alone restart at 0 when a checkpoint is wiped/recreated or a
    * second query writes the same root, and a bare batch-id commitId would
    * then silently no-op FRESH batches against the old query's committed
    * ids. A new checkpoint must ship a new appId; same appId + same batch
    * id = the same logical write, which is exactly when the no-op is
    * correct.
    */
  def maintainCountMin(values: DataFrame, root: String, valueCol: String,
                       d: Int, w: Int, appId: String): org.apache.spark.sql.streaming.StreamingQuery =
    values.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], bid: Long) =>
        val spark = batch.sparkSession
        val delta = graft.operators.ext.Sketches.countMinSketch(batch.toDF(), valueCol, d, w)
        val merged =
          if (graft.io.VersionedTable.latestVersion(root).isEmpty) delta
          else graft.io.VersionedTable.read(spark, root)
            .unionByName(delta)
            .groupBy("r", "bucket").agg(sum("cnt").as("cnt"))
        graft.io.VersionedTable.commit(merged, root, "overwrite", s"$appId-b$bid")
        ()
      }
      .start()

  /** ST: the [[maintainBandIndex]] idiom for the COMPRESSED ANN index — each
    * micro-batch of new vectors is frozen-quantizer coded and appended into
    * the bucketed PQ code table (Similarity.appendPqIndex: idempotent under
    * foreachBatch's replay semantics via the anti-join on indexed vec_ids;
    * the quantizer/codebook stay pinned to `base`, so concurrent ADC probes
    * read a table whose every row remains valid mid-append).
    */
  def maintainPqIndex(vectors: DataFrame, table: String, base: DataFrame,
                      dim: Int, m: Int, ncodes: Int,
                      buckets: Int): org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.ext.Similarity.appendPqIndex(table, batch.toDF(), base,
          dim, m, ncodes, buckets)
      }
      .start()

  /** ST: the [[maintainBandIndex]] idiom for the LEXICAL index — each
    * micro-batch of new documents tokenizes into postings + a length row and
    * appends into both bucketed index tables
    * (TextAnalysis.appendLexicalIndex). Each table's append anti-joins its
    * OWN indexed doc_ids, so foreachBatch's at-least-once replay — including
    * a crash BETWEEN the two table writes — converges to exactly-once per
    * table; df/N/T derive at probe time, so BM25 scores shift continuously
    * as the stream absorbs documents with zero stats maintenance.
    */
  def maintainLexicalIndex(docs: DataFrame, postingsTable: String,
                           lengthsTable: String, idCol: String, textCol: String,
                           buckets: Int): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.ext.TextAnalysis.appendLexicalIndex(postingsTable,
          lengthsTable, batch.toDF(), idCol, textCol, buckets)
      }
      .start()

  /** ST: stream → versioned-table sink with EXACTLY-ONCE appends. foreachBatch
    * is at-least-once (a batch replays after a crash between sink write and
    * checkpoint commit); deriving the commitId from the deterministic batchId
    * turns the replay into VersionedTable.commit's idempotent-retry no-op —
    * the log gains exactly one version per batch no matter how many times the
    * batch fires. Downstream consumers then use
    * [[graft.io.VersionedTable.changesBetween]] to read each committed batch
    * exactly once — the two ends compose into an exactly-once pipeline over
    * a plain-Parquet table, no external transaction service.
    *
    * The (streamId, checkpoint) pair is a unit: batchIds are assigned by the
    * checkpoint, so restarting FROM the checkpoint replays with the same ids
    * (idempotent), while pointing a FRESH checkpoint at the same streamId
    * would reuse ids for different data — operator error by contract.
    */
  def versionedSink(rows: DataFrame, root: String, streamId: String,
                    checkpoint: Option[String] = None,
                    availableNow: Boolean = false): org.apache.spark.sql.streaming.StreamingQuery = {
    var w = rows.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.io.VersionedTable.commit(batch.toDF(), root, "append", s"$streamId-b$id"): Unit
      }
    checkpoint.foreach(c => w = w.option("checkpointLocation", c))
    if (availableNow) w = w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    w.start()
  }

  /** ST: streaming SOURCE over the versioned table — the read half of the
    * exactly-once pipeline whose write half is [[versionedSink]]
    * ([[VersionedTableSourceProvider]] carries the full contract): offsets
    * are commit versions, a fresh stream delivers the initial snapshot
    * then per-commit append deltas (or changes-only from `startingVersion`),
    * non-append commits refuse loudly unless `skipChangeCommits`, schema
    * changes always refuse (restart re-pins). Source-side state is ZERO —
    * the engine's offset checkpoint plus manifest immutability are the
    * whole exactly-once story, so a restart from checkpoint replays
    * bit-for-bit and never re-delivers a committed batch.
    */
  def versionedSource(spark: org.apache.spark.sql.SparkSession, root: String,
                      skipChangeCommits: Boolean = false,
                      startingVersion: Option[Long] = None,
                      maxVersionsPerTrigger: Option[Long] = None): DataFrame = {
    var r = spark.readStream.format("graft-versioned")
      .option("path", root)
      .option("skipChangeCommits", skipChangeCommits.toString)
    startingVersion.foreach(v => r = r.option("startingVersion", v.toString))
    maxVersionsPerTrigger.foreach(m => r = r.option("maxVersionsPerTrigger", m.toString))
    r.load()
  }

  /** ST: CHANGE-FEED streaming read of the versioned table (Delta's
    * `readChangeFeed` contract over this log): every row carries
    * `_change_type` ∈ {insert, update_preimage, update_postimage, delete},
    * merges/deletes/MOR coverage growth flow as row-level deltas computed
    * over only each commit's touched dirs, compaction emits nothing, and
    * the initial snapshot arrives as all-inserts (`startingVersion` for
    * the changes-only form). The downstream-materialization primitive: a
    * consumer applying the feed keyed by `keyCol` reconstructs every
    * snapshot exactly.
    */
  def versionedChangeFeed(spark: org.apache.spark.sql.SparkSession, root: String,
                          keyCol: String,
                          startingVersion: Option[Long] = None,
                          maxVersionsPerTrigger: Option[Long] = None): DataFrame = {
    var r = spark.readStream.format("graft-versioned")
      .option("path", root)
      .option("readChangeFeed", "true")
      .option("changeFeedKey", keyCol)
    startingVersion.foreach(v => r = r.option("startingVersion", v.toString))
    maxVersionsPerTrigger.foreach(m => r = r.option("maxVersionsPerTrigger", m.toString))
    r.load()
  }

  /** ST: streaming CDC MERGE sink — each micro-batch of upserts applies to
    * the versioned table through [[graft.io.VersionedTable.mergeInto]]'s
    * dir-level copy-on-write (an empty log bootstraps with the first batch
    * as v1). The exactly-once story is the appId+batchId commitId (the
    * [[maintainCountMin]] contract): foreachBatch's at-least-once replay
    * degrades to mergeInto's committed-commitId no-op, and a crash BETWEEN
    * data write and manifest publish re-runs the whole rewrite against the
    * same pinned parent into the same dir name — convergent, with the
    * orphan reclaimed by vacuum. Per batch the rewrite cost is
    * O(envelope/bloom-hit dirs + batch), never O(table), which is what
    * lets a CDC stream maintain a 100 TB keyed table continuously.
    *
    * CALLER CONTRACT (inherited from mergeInto, enforced loudly there):
    * each micro-batch carries at most one row per key — collapse
    * last-writer-wins upstream if the feed can replay a key within one
    * batch. Single-writer stream: a concurrent committer on the same root
    * fails the batch loudly (pinned parent) rather than losing either
    * write.
    */
  def versionedMergeSink(updates: DataFrame, root: String, keyCol: String,
                         appId: String, statsCols: Seq[String] = Nil,
                         bloomCols: Seq[String] = Nil): org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], bid: Long) =>
        val b = batch.toDF()
        if (graft.io.VersionedTable.latestVersion(root).isEmpty)
          // the bootstrap batch commits verbatim, so it takes the SAME
          // dup/NULL-key guard mergeInto applies — an unguarded first batch
          // would persist duplicate or NULL keys silently and every later
          // merge would update/anti-join ambiguously, breaking the sink's
          // one-row-per-key contract without the promised loud failure
          graft.io.VersionedTable.commit(
            graft.io.VersionedTable.guardMergeBatch(b, keyCol, "versionedMergeSink"),
            root, "append", s"$appId-b$bid",
            statsCols = statsCols, bloomCols = bloomCols): Unit
        else
          graft.io.VersionedTable.mergeInto(batch.sparkSession, root, b, keyCol,
            s"$appId-b$bid", statsCols = statsCols, bloomCols = bloomCols): Unit
      }
      .start()

  /** ST: streaming CDC APPLY sink — the tombstone-complete generalization
    * of [[versionedMergeSink]]: each micro-batch carries an `opCol`
    * discriminator ('u' = upsert, 'd' = delete) and BOTH op kinds apply to
    * the versioned table through
    * [[graft.io.VersionedTable.applyCdcBatch]] under ONE appId+batchId
    * commitId — one commit per batch, never a torn upsert/delete pair,
    * exactly-once under foreachBatch's at-least-once replay (a replayed
    * batch degrades to the committed-commitId no-op). This is the
    * Debezium-feed shape: a compacted CDC topic emits one final op per
    * key per batch; a key carrying both ops in one batch is refused
    * loudly (upstream bug), including on the bootstrap batch. Bootstrap
    * (empty log) commits the batch's guarded upserts — its deletes refer
    * to rows that never existed, which deleting is already a no-op.
    */
  def cdcApplySink(changes: DataFrame, root: String, keyCol: String, opCol: String,
                   appId: String, statsCols: Seq[String] = Nil,
                   bloomCols: Seq[String] = Nil): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], bid: Long) =>
        val b = batch.toDF()
        val ups = b.filter(col(opCol) === "u").drop(opCol)
        val dels = b.filter(col(opCol) === "d").select(keyCol)
        if (graft.io.VersionedTable.latestVersion(root).isEmpty) {
          graft.io.VersionedTable.requireDisjointOps(ups, dels, keyCol, "cdcApplySink")
          graft.io.VersionedTable.commit(
            graft.io.VersionedTable.guardMergeBatch(ups, keyCol, "cdcApplySink"),
            root, "append", s"$appId-b$bid",
            statsCols = statsCols, bloomCols = bloomCols): Unit
        } else
          graft.io.VersionedTable.applyCdcBatch(batch.sparkSession, root, ups, dels,
            keyCol, s"$appId-b$bid", statsCols = statsCols, bloomCols = bloomCols): Unit
      }
      .start()

  /** ST: streaming MAINTAINED MATERIALIZED VIEW — the serving-layer
    * composition: each micro-batch of upserts applies to the SOURCE table
    * through [[graft.io.VersionedTable.mergeInto]] (exactly-once under the
    * appId+batchId commitId, same contract as [[versionedMergeSink]]),
    * then [[graft.io.MatView.refresh]] folds the new source commits into
    * the view as signed change-feed deltas. BOTH halves are independently
    * idempotent (commitId per batch on the source; commitId per source
    * version on the view), so the pair needs no cross-table transaction:
    * a crash between the merge and the refresh leaves the view one
    * refresh behind, healed by the next batch's refresh or a standalone
    * one. Per-batch cost: O(hit dirs + batch) on the source, O(changed
    * rows) on the view — the pipeline that keeps a serving aggregate of a
    * 100 TB CDC-maintained table continuously fresh without ever
    * rescanning either table.
    */
  def matViewSink(updates: DataFrame, srcRoot: String, mvRoot: String, keyCol: String,
                  appId: String, statsCols: Seq[String] = Nil,
                  bloomCols: Seq[String] = Nil): org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], bid: Long) =>
        val b = batch.toDF()
        if (graft.io.VersionedTable.latestVersion(srcRoot).isEmpty)
          graft.io.VersionedTable.commit(
            graft.io.VersionedTable.guardMergeBatch(b, keyCol, "matViewSink"),
            srcRoot, "append", s"$appId-b$bid",
            statsCols = statsCols, bloomCols = bloomCols): Unit
        else
          graft.io.VersionedTable.mergeInto(batch.sparkSession, srcRoot, b, keyCol,
            s"$appId-b$bid", statsCols = statsCols, bloomCols = bloomCols): Unit
        graft.io.MatView.refresh(batch.sparkSession, mvRoot): Unit
      }
      .start()

  /** ST: per-micro-batch distribution-drift monitor — the foreachBatch
    * production idiom: every micro-batch is scored against the SAME static
    * reference profile with the exact integer TVD of
    * TextAnalysis.refDrift, and the per-slice report (a few rows) is
    * handed to `sink` with the batch id — a metrics table, an alert hook.
    * Stateless across batches (no state store, no watermark): the
    * reference is fixed, so alarms are comparable batch to batch; the
    * per-batch work is a bounded batch-mode aggregation, which is exactly
    * what foreachBatch exists for (multi-step aggregations are not
    * expressible as one incremental streaming plan).
    */
  def driftMonitor(docs: DataFrame, ref: DataFrame, sliceCol: String,
                   textCol: String)(
                   sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink(graft.operators.ext.TextAnalysis.refDrift(batch.toDF(), ref, sliceCol, textCol), id)
      }
      .start()

  final case class SessEv(user_id: Long, event_id: Long, ts_us: Long)
  final case class SessOut(user_id: Long, session_start: Long, session_end: Long,
                           n: Long, id_sum: Long)

  /** WATERMARK-FINALIZED SESSIONS via the stateful-v2 operator
    * (`transformWithState`, the public Spark 4 arbitrary-state API —
    * typed state variables + per-key EVENT-TIME TIMERS, the two things
    * `flatMapGroupsWithState` cannot express): per-user session windows
    * under a gap, where a session EMITS only when the watermark proves no
    * late row can still extend it — `handleInputRows` merges rows into a
    * `ListState` of open sessions (true interval-overlap merge, so late
    * rows can bridge two pending sessions back into one) and emits
    * NOTHING; a single per-key timer is kept at the earliest possible
    * finalization time, and `handleExpiredTimer` emits exactly the
    * sessions whose `[start, last+gap)` window closed under the current
    * watermark, re-arming for the remainder. Append-mode output with
    * native session semantics and no premature emission — the same
    * finalize-at-watermark discipline as the stream-stream outer joins.
    * State is O(open sessions per key); requires the RocksDB state store
    * (the stateful-v2 engine's backing store).
    */
  def timerSessions(ev: DataFrame, gapMinutes: Int, delay: String): Dataset[SessOut] = {
    val gapUs = gapMinutes * 60L * 1000000L
    implicit val outEnc = Encoders.product[SessOut]
    implicit val keyEnc = Encoders.scalaLong
    implicit val evEnc = Encoders.product[SessEv]
    ev.withWatermark("ingest_ts", delay)
      .withColumn("ts_us", expr("unix_micros(ingest_ts)"))
      .select("user_id", "event_id", "ts_us").as[SessEv]
      .groupByKey(_.user_id)
      .transformWithState(new TimerSessionProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append(), outEnc)
  }

  final case class Tick(symbol: String, price: java.math.BigDecimal, ingest_ts: Timestamp)
  final case class SymbolSession(symbol: String, n: Long, lo: java.math.BigDecimal, hi: java.math.BigDecimal)

  /** Custom state: running per-symbol tick count + price envelope maintained
    * across micro-batches. With idleTimeoutMs > 0, idle keys are expired via
    * a processing-time timeout (note: timeout-driven batches keep the query
    * busy, so tests that drain with processAllAvailable pass 0 = NoTimeout).
    */
  def sessionize(ticks: Dataset[Tick], idleTimeoutMs: Long): Dataset[SymbolSession] = {
    implicit val se = Encoders.product[SymbolSession]
    implicit val te = Encoders.STRING
    val timeout = if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
                  else GroupStateTimeout.NoTimeout()
    ticks.groupByKey(_.symbol)
      .flatMapGroupsWithState[SymbolSession, SymbolSession](
        OutputMode.Update(), timeout) {
        case (symbol, rows, state: GroupState[SymbolSession]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.toSeq
            state.remove()
            out.iterator
          } else {
            val prev = state.getOption.getOrElse(SymbolSession(symbol, 0L, null, null))
            val next = rows.foldLeft(prev) { (s, t) =>
              val lo = if (s.lo == null || t.price.compareTo(s.lo) < 0) t.price else s.lo
              val hi = if (s.hi == null || t.price.compareTo(s.hi) > 0) t.price else s.hi
              SymbolSession(symbol, s.n + 1, lo, hi)
            }
            state.update(next)
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            Iterator(next)
          }
      }
  }
}

/** The stateful-v2 processor behind [[Streaming.timerSessions]]. One state
  * variable (`sessions`: the key's open session windows as
  * (startUs, lastUs, n, idSum)) plus one pending event-time timer.
  *
  * Session discipline: a row's window is `[ts, ts+gap)`, a session's is
  * `[start, last+gap)`; a row absorbs EVERY session it overlaps (one
  * late row can bridge two pending sessions — the merge native
  * `session_window` performs, which per-row fold logic cannot). Rows are
  * processed in (ts, event_id) order inside a batch so the split is
  * engine-order-independent. Emission happens ONLY in
  * [[handleExpiredTimer]]: a session finalizes iff `last+gap <= wm` — the
  * watermark guarantee that no admissible late row can extend it. The
  * timer is registered at ceil((minLast+gap)/1ms), so it can fire at most
  * one batch early, in which case the wm check holds the session and the
  * timer re-arms; it can never fire late-and-miss.
  */
final class TimerSessionProcessor(gapUs: Long)
    extends StatefulProcessor[Long, Streaming.SessEv, Streaming.SessOut] {
  import Streaming.{SessEv, SessOut}

  private case class Sess(startUs: Long, lastUs: Long, n: Long, idSum: Long)
  @transient private var sessions: ListState[(Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sessions = getHandle.getListState("sessions",
      Encoders.product[(Long, Long, Long, Long)], TTLConfig.NONE)

  private def load(): Vector[Sess] =
    sessions.get().map(t => Sess(t._1, t._2, t._3, t._4)).toVector

  private def store(ss: Seq[Sess]): Unit =
    if (ss.isEmpty) sessions.clear()
    else sessions.put(ss.map(s => (s.startUs, s.lastUs, s.n, s.idSum)).toArray)

  private def armTimer(ss: Seq[Sess]): Unit = {
    getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
    if (ss.nonEmpty)
      getHandle.registerTimer((ss.map(_.lastUs).min + gapUs + 999L) / 1000L)
  }

  override def handleInputRows(key: Long, rows: Iterator[SessEv],
                               tv: TimerValues): Iterator[SessOut] = {
    var cur = load()
    rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      val (over, rest) = cur.partition(s =>
        e.ts_us < s.lastUs + gapUs && s.startUs < e.ts_us + gapUs)
      val merged =
        if (over.isEmpty) Sess(e.ts_us, e.ts_us, 1L, e.event_id)
        else Sess(math.min(over.map(_.startUs).min, e.ts_us),
          math.max(over.map(_.lastUs).max, e.ts_us),
          over.map(_.n).sum + 1L, over.map(_.idSum).sum + e.event_id)
      cur = rest :+ merged
    }
    store(cur)
    armTimer(cur)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, tv: TimerValues,
                                  info: ExpiredTimerInfo): Iterator[SessOut] = {
    val wmUs = tv.getCurrentWatermarkInMs * 1000L
    val (closed, open) = load().partition(s => s.lastUs + gapUs <= wmUs)
    store(open)
    armTimer(open)
    closed.sortBy(_.startUs).iterator.map(s =>
      SessOut(key, s.startUs, s.lastUs + gapUs, s.n, s.idSum))
  }
}
