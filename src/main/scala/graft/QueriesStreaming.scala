package graft

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, StructField, StructType, TimestampNTZType, TimestampType}

import graft.operators.{Medallion, Relational}
import graft.operators.ext.{Dedup, Multimodal, Similarity, Sketches, TextAnalysis}
import graft.sources.{Ingest, StubTickerFetcher}

/** The declared query registry: one entry per SURVEY.md §2 operator row, each
  * with DuckDB-equivalent oracle SQL where SQL-expressible.
  *
  * Determinism rules (SURVEY.md §7.4) hold for every query: explicit as-of
  * date (never current_date), row_number over total orders (never
  * monotonically_increasing_id), a trailing total-order orderBy, decimals
  * fixed-point on both sides, token hashes md5-derived (portable), cosines
  * rounded to DECIMAL(10,6) before any comparison.
  */

import QuerySupport._

/** Registry family: the declared Structured Streaming paths (ST) - watermarks, state, joins, index maintenance, exactly-once sinks. See [[Queries]] for the assembled registry
  * and [[QuerySupport]] for the shared helpers/oracle fragments.
  */
private[graft] object QueriesStreaming {
  val defs: Seq[Q] = Seq(

    // §2.9 — the streaming path as a correctness row: the same event-time
    // tumbling-window aggregate as event_window_agg, but executed through
    // Structured Streaming (file source → watermark + window → complete-mode
    // memory sink), drained to completion. The oracle is the batch SQL —
    // asserting stream/batch equivalence, the property Structured Streaming
    // guarantees and the one worth checking.
    Q("stream_window_agg",
      (s, dir) => {
        val batchSchema = rd(s, dir, "events").schema
        // the file stream source requires a directory; select just the events
        // table out of the shared sf dir with a glob filter
        val ticks = s.readStream.schema(batchSchema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
          .withColumn("ingest_ts", expr(tsStampSql(batchSchema)))
          .select(col("event_type").as("symbol"), col("value").as("price"), col("ingest_ts"))
        val name = s"graft_stream_sink_${streamSinkN.incrementAndGet()}"
        val q = graft.streaming.Streaming.windowedMinMax(ticks, "1 hour", "1 hour")
          .writeStream.format("memory").queryName(name).outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
        s.table(name)
          .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
            col("symbol").as("event_type"),
            col("min_price").as("min_value"), col("max_price").as("max_value"))
          .orderBy("window_start", "event_type")
      },
      Some("SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start, " +
        "event_type, min(value) AS min_value, max(value) AS max_value " +
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2")),


    // Streaming dedup-within-watermark executed through a real stream (file
    // source → dropDuplicatesWithinWatermark → append-mode memory sink),
    // oracle-checked against batch DISTINCT. Only the dedup keys are emitted:
    // which duplicate survives within a micro-batch is racy by nature, the
    // key set is not.
    Q("stream_dedup",
      (s, dir) => {
        val batchSchema = rd(s, dir, "events").schema
        val ticks = s.readStream.schema(batchSchema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
          .withColumn("ingest_ts", expr(tsStampSql(batchSchema)))
          .select(col("event_type").as("symbol"), col("value").as("price"), col("ingest_ts"))
        val name = s"graft_stream_sink_${streamSinkN.incrementAndGet()}"
        val q = graft.streaming.Streaming.streamDedup(ticks, "1 hour")
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        s.table(name)
          .select(col("symbol").as("event_type"), col("price").as("value"))
          .orderBy("event_type", "value")
      },
      Some("SELECT DISTINCT event_type, value FROM events ORDER BY 1, 2")),


    // NATIVE SESSION WINDOWS in Structured Streaming (thirteenth declared
    // streaming path): Spark's session_window merges events under a 30-min
    // gap into engine-managed dynamic windows — the declarative counterpart
    // of the flatMapGroupsWithState sessionizer (stream_stateful_agg), with
    // a one-boundary-stricter split (gap >= g opens a session: windows are
    // [first, last+gap) and merge only on true overlap). Complete-mode
    // drain; the oracle is the batch formulation of the same split rule.
    Q("stream_session_window",
      (s, dir) => {
        val batchSchema = rd(s, dir, "events").schema
        val ev = s.readStream.schema(batchSchema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
          .withColumn("ingest_ts", expr(tsStampSql(batchSchema)))
          .select("user_id", "event_id", "ingest_ts")
        val name = s"graft_stream_sink_${streamSinkN.incrementAndGet()}"
        val q = graft.streaming.Streaming.sessionWindowAgg(ev, "user_id", "30 minutes")
          .writeStream.format("memory").queryName(name).outputMode("complete").start()
        try q.processAllAvailable() finally q.stop()
        s.table(name)
          .select(col("user_id"),
            expr("unix_micros(sw.start)").as("session_start"),
            expr("unix_micros(sw.end)").as("session_end"),
            col("n"), col("id_sum"))
          .orderBy("user_id", "session_start")
      },
      Some("""WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |o AS (SELECT *, lag(tus) OVER w AS prev FROM x
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |g AS (SELECT *, CAST(sum(CASE WHEN prev IS NULL OR tus - prev >= 1800000000 THEN 1 ELSE 0 END)
        |  OVER (PARTITION BY user_id ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid FROM o)
        |SELECT user_id, min(tus) AS session_start, max(tus) + 1800000000 AS session_end,
        |  count(*) AS n, CAST(sum(event_id) AS BIGINT) AS id_sum
        |FROM g GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin)),


    // STATEFUL-v2 SESSIONS WITH EVENT-TIME TIMERS (transformWithState —
    // Spark 4's arbitrary-state API: typed ListState + per-key timers,
    // RocksDB-backed): same 30-min session split as stream_session_window,
    // but sessions EMIT only when the watermark proves closure — the timer
    // fires at the earliest possible finalization, handleExpiredTimer
    // emits exactly the sessions whose [start, last+gap) closed under the
    // current watermark, and still-open sessions stay in state. The
    // oracle therefore carries the SAME eviction bound as the outer-join
    // rows: emitted sessions are exactly those with
    // last + gap <= floor_ms(max event time) - 1h.
    Q("stream_timer_sessions",
      (s, dir) => {
        val batchSchema = rd(s, dir, "events").schema
        val ev = s.readStream.schema(batchSchema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
          .withColumn("ingest_ts", expr(tsStampSql(batchSchema)))
          .select("user_id", "event_id", "ingest_ts")
        val name = s"graft_stream_sink_${streamSinkN.incrementAndGet()}"
        val ck = "spark.sql.streaming.stateStore.providerClass"
        val prior = s.conf.getOption(ck)
        s.conf.set(ck,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          val q = graft.streaming.Streaming.timerSessions(ev, 30, "1 hour")
            .writeStream.format("memory").queryName(name).outputMode("append").start()
          try q.processAllAvailable() finally q.stop()
        } finally prior.fold(s.conf.unset(ck))(v => s.conf.set(ck, v))
        s.table(name).orderBy("user_id", "session_start")
      },
      Some("""WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
        |wmv AS (SELECT (max(tus) // 1000) * 1000 - 3600000000 AS wm FROM x),
        |o AS (SELECT *, lag(tus) OVER w AS prev FROM x
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |g AS (SELECT *, CAST(sum(CASE WHEN prev IS NULL OR tus - prev >= 1800000000 THEN 1 ELSE 0 END)
        |  OVER (PARTITION BY user_id ORDER BY tus, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid FROM o)
        |SELECT user_id, min(tus) AS session_start, max(tus) + 1800000000 AS session_end,
        |  count(*) AS n, CAST(sum(event_id) AS BIGINT) AS id_sum
        |FROM g, wmv GROUP BY user_id, sid, wm
        |HAVING max(tus) + 1800000000 <= wm
        |ORDER BY user_id, session_start""".stripMargin)),


    // STREAMING LATE-DATA ACCOUNTING (append-mode watermark discipline):
    // three ordered micro-batches through the file source
    // (maxFilesPerTrigger=1, mod-time ordered). Spark's state operator
    // filters LATE rows against the PREVIOUS batch's watermark and evicts/
    // emits against the current one (both calibrated empirically:
    // drop iff window_end <= lateWm, emit iff window_end <= evictWm, with
    // the watermark ms-floored from the max event time). Batch 1 (even ids)
    // anchors the watermark at max(even ts) - 1h; batch 2 (recent odd ids)
    // advances the late-filter horizon to that anchor; batch 3 (odd ids
    // >= 30 min older than the anchor) then loses every row whose hour
    // window closed under it — counted by numRowsDroppedByWatermark, the
    // driver-visible late-data ledger surfaced as a column. The state
    // operator sits above the partial+merge aggregation, so the ledger
    // counts dropped WINDOW GROUPS (one state row per closed window), not
    // raw input rows — the oracle counts DISTINCT closed windows. Emitted
    // windows are exactly those the final watermark closed, aggregating
    // accepted rows only — the oracle recomputes both cutoffs and the
    // accepted set from the raw table.
    Q("stream_late_data",
      (s, dir) => {
        // fixture = the three STAGED batch files (ordinary parquet writes,
        // not this row's claim; their mod-time ORDER — anchor, on-time,
        // late — is what the file source sequences on, and relative order
        // is stable however old the fixture gets); LIVE each pass = the
        // watermarked stream over them: 3 micro-batches, watermark
        // advancement, the late-drop accounting, and the windowed result
        val root = Fixtures.once(s, dir, "stream_late_stage") {
          val r = s"${System.getProperty("java.io.tmpdir")}/graft_stream_late_${dirTag(dir)}"
          rmrf(r)
          val ev = rd(s, dir, "events")
          val base = ev.withColumn("ts_us", expr(tsUsSql(ev.schema)))
            .withColumn("ingest_ts", expr(tsStampSql(ev.schema)))
            .select("event_id", "ts_us", "ingest_ts")
          // bounded scalar probe: the batch-1 watermark anchor
          val maxAUs = base.filter(col("event_id") % 2 === 0).agg(max("ts_us")).head().getLong(0)
          base.filter(col("event_id") % 2 === 0)
            .select("event_id", "ingest_ts").coalesce(1).write.parquet(s"$r/a")
          base.filter(col("event_id") % 2 === 1 && col("ts_us") > maxAUs - 1800000000L)
            .select("event_id", "ingest_ts").coalesce(1).write.parquet(s"$r/b")
          base.filter(col("event_id") % 2 === 1 && col("ts_us") <= maxAUs - 1800000000L)
            .select("event_id", "ingest_ts").coalesce(1).write.parquet(s"$r/c")
          val sd = new java.io.File(s"$r/stream"); sd.mkdirs()
          def stage(src: String, fname: String, ageMs: Long): Unit = {
            val part = new java.io.File(s"$r/$src").listFiles()
              .filter(_.getName.endsWith(".parquet")).head
            val dst = new java.io.File(sd, fname)
            java.nio.file.Files.copy(part.toPath, dst.toPath)
            dst.setLastModified(System.currentTimeMillis() - ageMs)
          }
          stage("a", "0001-anchor.parquet", 180000L)
          stage("b", "0002-on-time.parquet", 120000L)
          stage("c", "0003-late.parquet", 60000L)
          r
        }
        val st = s.readStream
          .schema(StructType(Seq(StructField("event_id", LongType),
            StructField("ingest_ts", TimestampType))))
          .option("maxFilesPerTrigger", "1").parquet(s"$root/stream")
        val name = s"graft_stream_sink_${streamSinkN.incrementAndGet()}"
        val q = graft.streaming.Streaming.windowedIdSum(st, "1 hour", "1 hour")
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        val dropped =
          try { q.processAllAvailable()
            q.recentProgress.flatMap(_.stateOperators).map(_.numRowsDroppedByWatermark).sum
          } finally q.stop()
        s.table(name)
          .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
            col("n"), col("id_sum"))
          .withColumn("late_dropped", lit(dropped))
          .orderBy("window_start")
      },
      Some("""WITH ev AS (SELECT event_id, ts, epoch_us(ts) AS tus,
        |  epoch_us(date_trunc('hour', ts)) + 3600000000 AS wend FROM events),
        |ma AS (SELECT max(tus) AS v FROM ev WHERE event_id % 2 = 0),
        |mb AS (SELECT max(tus) AS v FROM ev CROSS JOIN ma
        |  WHERE event_id % 2 = 1 AND tus > ma.v - 1800000000),
        |wml AS (SELECT (ma.v // 1000) * 1000 - 3600000000 AS v FROM ma),
        |wmf AS (SELECT greatest((ma.v // 1000) * 1000, (mb.v // 1000) * 1000) - 3600000000 AS v
        |  FROM ma CROSS JOIN mb),
        |acc AS (
        |  SELECT event_id, ts, wend FROM ev WHERE event_id % 2 = 0
        |  UNION ALL SELECT event_id, ts, wend FROM ev CROSS JOIN ma
        |    WHERE event_id % 2 = 1 AND tus > ma.v - 1800000000
        |  UNION ALL SELECT event_id, ts, wend FROM ev CROSS JOIN ma CROSS JOIN wml
        |    WHERE event_id % 2 = 1 AND tus <= ma.v - 1800000000 AND wend > wml.v),
        |late AS (SELECT count(DISTINCT wend) AS late_dropped FROM ev CROSS JOIN ma CROSS JOIN wml
        |  WHERE event_id % 2 = 1 AND tus <= ma.v - 1800000000 AND wend <= wml.v)
        |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  count(*) AS n, CAST(sum(event_id) AS BIGINT) AS id_sum,
        |  (SELECT late_dropped FROM late) AS late_dropped
        |FROM acc CROSS JOIN wmf WHERE wend <= wmf.v
        |GROUP BY 1 ORDER BY 1""".stripMargin)),


    // STREAM-STATIC JOIN (the fifth declared streaming path): the stateless
    // curation stages run over a document STREAM — quality filter →
    // exact-fingerprint decontamination as a stream-static left-anti join
    // against the (static) benchmark fingerprint table → weighted mixture.
    // No state store, no watermark: every micro-batch joins the static frame
    // directly. Oracle = the batch formulation of the same stages
    // (stream/batch equivalence, like the other streaming rows).
    Q("stream_curation",
      (s, dir) => {
        val batchSchema = rd(s, dir, "documents").schema
        val stream = s.readStream.schema(batchSchema)
          .option("pathGlobFilter", "documents.parquet").parquet(dir)
        val bench = rd(s, dir, "documents").filter(col("doc_id") < 100)
          .select(md5(col("text")).as("fp")).distinct()
        val name = s"graft_stream_sink_${streamSinkN.incrementAndGet()}"
        val q = graft.streaming.Streaming.curateDocs(stream, bench,
            Map("en" -> 50, "de" -> 25), defaultPct = 10)
          .select("doc_id", "lang", "bucket")
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        s.table(name).orderBy("doc_id")
      },
      Some("SELECT doc_id, lang, bucket FROM (" +
        s"SELECT doc_id, lang, ${duckHex("md5(CAST(doc_id AS VARCHAR))")} % 100 AS bucket " +
        s"FROM documents WHERE $duckQualityPred " +
        "AND md5(text) NOT IN (SELECT md5(text) FROM documents WHERE doc_id < 100)) " +
        s"WHERE bucket < $duckMixCase " +
        "ORDER BY doc_id")),


    // STREAMING NEAR-DUP DECONTAMINATION (the sixth declared streaming
    // path): expression-level MinHash band keys per micro-batch (no
    // aggregation, no state store) and a map-side arrays_overlap test
    // against the static benchmark's one-row key set — the streaming form
    // of x1_decontaminate_neardup, recall-oriented (any band collision
    // drops; no Jaccard verify — the batch path is the precision form).
    // Oracle = the batch band-collision formulation on the same tables.
    Q("stream_decontam_neardup",
      (s, dir) => {
        val batchSchema = rd(s, dir, "documents").schema
        val stream = s.readStream.schema(batchSchema)
          .option("pathGlobFilter", "documents.parquet").parquet(dir)
          .filter(col("doc_id") >= 100)
        val bench = rd(s, dir, "documents").filter(col("doc_id") < 100)
          .select("doc_id", "text")
        val name = s"graft_stream_sink_${streamSinkN.incrementAndGet()}"
        val q = graft.streaming.Streaming.decontamNearDup(stream, bench)
          .select("doc_id", "lang")
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        s.table(name).orderBy("doc_id")
      },
      Some(s"""WITH ${duckBandsCtes(duckToks, 8)},
        |bkeys AS (SELECT DISTINCT band, key FROM bands WHERE doc_id < 100),
        |flagged AS (SELECT DISTINCT b.doc_id FROM bands b
        |  JOIN bkeys k ON b.band = k.band AND b.key = k.key)
        |SELECT doc_id, lang FROM documents
        |WHERE doc_id >= 100 AND doc_id NOT IN (SELECT doc_id FROM flagged)
        |ORDER BY doc_id""".stripMargin)),


    // STREAMING DRIFT MONITOR (the seventh declared streaming path, and the
    // foreachBatch idiom's entry into the surface): each micro-batch's
    // per-source token distribution is scored against the STATIC reference
    // profile (docs < 100) with the exact integer TVD of
    // TextAnalysis.refDrift; the per-slice report reaches the driver as a
    // few scalar-sized rows per batch. The single-file source yields one
    // batch, so the oracle is the batch refDrift formulation.
    Q("stream_drift_monitor",
      (s, dir) => {
        val batchSchema = rd(s, dir, "documents").schema
        val stream = s.readStream.schema(batchSchema)
          .option("pathGlobFilter", "documents.parquet").parquet(dir)
          .filter(col("doc_id") >= 100)
        val ref = rd(s, dir, "documents").filter(col("doc_id") < 100)
        val buf = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
        val q = graft.streaming.Streaming.driftMonitor(stream, ref, "source", "text") {
          (report, _) =>
            buf ++= report.withColumn("l1_scaled", col("l1_scaled").cast("string"))
              .collect() // scalar-sized: one row per slice per batch
        }
        try q.processAllAvailable() finally q.stop()
        import org.apache.spark.sql.types._
        s.createDataFrame(s.sparkContext.parallelize(buf.toSeq, 1),
            StructType(Seq(StructField("slice", StringType),
              StructField("s_toks", LongType), StructField("l1_scaled", StringType))))
          .orderBy("slice")
      },
      Some("""WITH bt AS (SELECT source AS slice, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |  FROM documents WHERE doc_id >= 100),
        |st AS (SELECT slice, token, count(*) AS c_st FROM bt GROUP BY 1, 2),
        |rt0 AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |  FROM documents WHERE doc_id < 100),
        |rt AS (SELECT token, count(*) AS r_t FROM rt0 GROUP BY 1),
        |stot AS (SELECT slice, sum(c_st) AS s_tot FROM st GROUP BY 1),
        |rtot AS (SELECT sum(r_t) AS t_ref FROM rt)
        |SELECT slice, CAST(s_tot AS BIGINT) AS s_toks,
        |  CAST(CAST(sum(abs(c_st * t_ref - coalesce(r_t, 0) * s_tot))
        |    + CAST(s_tot AS HUGEINT) * t_ref - sum(coalesce(r_t, 0) * s_tot) AS DECIMAL(38,0)) AS VARCHAR) AS l1_scaled
        |FROM st LEFT JOIN rt USING (token) JOIN stot USING (slice) CROSS JOIN rtot
        |GROUP BY slice, s_tot, t_ref ORDER BY slice""".stripMargin)),


    // STREAMING INDEX MAINTENANCE (the eighth declared streaming path):
    // the corpus-growth loop closed in streaming form. The standing
    // corpus' band index is seeded once (bucketed by key, the
    // x1_incremental_neardup layout); each micro-batch of new documents
    // then appends its expression-level band keys through
    // Dedup.appendBandIndex inside foreachBatch — idempotent under the
    // replay semantics foreachBatch actually has (anti-join on indexed
    // doc_ids), bucket layout preserved so concurrent probes keep their
    // no-index-side-exchange plan. Result = the converged index; oracle =
    // the batch band-key formulation over the full corpus, so a dropped,
    // duplicated, or mis-keyed append breaks the hash gate.
    Q("stream_index_maintain",
      (s, dir) => {
        val docs = rd(s, dir, "documents")
        // fixture = the SEED index; LIVE each pass = the streaming
        // maintenance (fresh ephemeral checkpoint → the source re-flows,
        // appends stay idempotent) + the converged-table read
        val idx = Fixtures.once(s, dir, "stream_band_seed") {
          val name = s"graft_stream_band_index_${dirTag(dir)}"
          val root = freshDir(s, s"graft_stream_bandidx_${dirTag(dir)}")
          s.sql(s"DROP TABLE IF EXISTS $name")
          Dedup.withBandKeys(docs.filter(col("doc_id") < 200), "text", 8, "bands")
            .select(col("doc_id"), explode(col("bands")).as("key"))
            .write.bucketBy(8, "key").sortBy("key")
            .option("path", s"$root/idx").saveAsTable(name)
          name
        }
        val stream = s.readStream.schema(docs.schema)
          .option("pathGlobFilter", "documents.parquet").parquet(dir)
          .filter(col("doc_id") >= 200)
        val q = graft.streaming.Streaming.maintainBandIndex(stream,
          idx, "doc_id", "text", 8, 8)
        try q.processAllAvailable() finally q.stop()
        s.table(idx).orderBy("doc_id", "key")
      },
      Some(s"""WITH ${duckBandsCtes(duckToks, 8)}
        |SELECT doc_id, CAST(band AS VARCHAR) || ':' || key AS key FROM bands
        |ORDER BY doc_id, key""".stripMargin)),


    // ST — stream → versioned table with EXACTLY-ONCE appends
    // (streaming/Streaming.versionedSink): each micro-batch commits under a
    // batchId-derived commitId, so foreachBatch's at-least-once replay
    // degrades to VersionedTable's idempotent-retry no-op. The query then
    // PROVES the replay path inline: re-firing batch 0's commitId with
    // different content must not advance the log (replay_noop), and the full
    // cursor-0 incremental read must equal the batch formulation.
    // ST — EXACTLY-ONCE streaming SKETCH maintenance (Streaming
    // .maintainCountMin): a count-min sketch kept current by the stream,
    // with the versioned table's idempotent commits carrying the
    // exactly-once guarantee counter state cannot get from anti-joins —
    // counter merges are NOT idempotent, so each batch overwrites the
    // merged d×w table under a batchId-derived commitId and replays
    // degrade to committed-commitId no-ops. The replay path is proven
    // INLINE (re-firing batch 0's commitId with garbage must not advance
    // the log); the converged sketch must equal the batch count-min
    // formulation bit-for-bit, which the oracle recomputes in full.
    Q("stream_sketch_maintain",
      (s, dir) => {
        val root = freshDir(s, "graft_stream_cm")
        val schema = rd(s, dir, "events").schema
        val stream = s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
          .select(col("event_type"))
        val q = graft.streaming.Streaming.maintainCountMin(stream, root, "event_type", 4, 64,
          appId = "cm")
        try q.processAllAvailable() finally q.stop()
        val converged = graft.io.VersionedTable.latestVersion(root).get
        val replayed = graft.io.VersionedTable.commit(
          rd(s, dir, "events").limit(1).select(lit(0).as("r"), lit(0L).as("bucket"),
            lit(999999L).as("cnt")), root, "overwrite", "cm-b0")
        val noop = replayed <= converged &&
          graft.io.VersionedTable.latestVersion(root).contains(converged)
        graft.io.VersionedTable.read(s, root)
          .withColumn("replay_noop", lit(noop))
          .orderBy("r", "bucket")
      },
      Some(s"""WITH seeds AS (SELECT * FROM (VALUES (0), (1), (2), (3)) s(r)),
        |h AS (SELECT r, ${duckHex("md5(CAST(r AS VARCHAR) || ':' || event_type)")} % 64 AS bucket
        |  FROM events CROSS JOIN seeds)
        |SELECT r, bucket, count(*) AS cnt, TRUE AS replay_noop
        |FROM h GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("stream_versioned_sink",
      (s, dir) => {
        val root = freshDir(s, "graft_stream_versioned")
        val schema = rd(s, dir, "orders").schema
        val stream = s.readStream.schema(schema)
          .option("pathGlobFilter", "orders.parquet").parquet(dir)
          .filter(col("o_orderkey") % 5 === 0)
        val q = graft.streaming.Streaming.versionedSink(stream, root, "orders-feed")
        try q.processAllAvailable() finally q.stop()
        val converged = graft.io.VersionedTable.latestVersion(root).get
        val replayed = graft.io.VersionedTable.commit(
          rd(s, dir, "orders").limit(1), root, "append", "orders-feed-b0")
        val noop = replayed <= converged &&
          graft.io.VersionedTable.latestVersion(root).contains(converged)
        graft.io.VersionedTable.changesBetween(s, root, fromVersion = 0L, toVersion = converged)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
          .withColumn("replay_noop", lit(noop))
          .orderBy("o_orderpriority")
      },
      Some("SELECT o_orderpriority, count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum, " +
        "TRUE AS replay_noop " +
        "FROM orders WHERE o_orderkey % 5 = 0 GROUP BY 1 ORDER BY 1")),

    // ST — STREAMING SOURCE over the versioned table (the read half of the
    // exactly-once pipeline; Streaming.versionedSource → the graft-versioned
    // v1 Source): offsets ARE commit versions. Two appends seed the table;
    // the fresh stream's first batch is the INITIAL SNAPSHOT (both commits,
    // one snapshot read), then a third append lands WHILE THE STREAM RUNS
    // and arrives as that commit's dir-difference delta — the continuous
    // form of changesBetween, zero source-side state, manifest immutability
    // + the offset checkpoint carrying exactly-once. 'incremental' pins
    // that the post-start commit was really consumed from a live offset
    // (stream offset advanced to v3 after the second drain).
    Q("stream_versioned_source",
      (s, dir) => {
        val root = freshDir(s, "graft_stream_vsource")
        val o = rd(s, dir, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        graft.io.VersionedTable.commit(o.filter(col("o_orderkey") % 3 === 0),
          root, "append", "c0", statsCols = Seq("o_orderkey"))
        graft.io.VersionedTable.commit(o.filter(col("o_orderkey") % 3 === 1),
          root, "append", "c1", statsCols = Seq("o_orderkey"))
        val name = s"graft_stream_sink_${streamSinkN.incrementAndGet()}"
        val q = graft.streaming.Streaming.versionedSource(s, root)
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        val incremental = try {
          q.processAllAvailable()
          graft.io.VersionedTable.commit(o.filter(col("o_orderkey") % 3 === 2),
            root, "append", "c2", statsCols = Seq("o_orderkey"))
          q.processAllAvailable()
          q.lastProgress != null &&
            q.lastProgress.sources.exists(_.endOffset == "3")
        } finally q.stop()
        s.table(name)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
          .withColumn("incremental", lit(incremental))
          .orderBy("o_orderpriority")
      },
      Some("SELECT o_orderpriority, count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum, " +
        "TRUE AS incremental " +
        "FROM orders GROUP BY 1 ORDER BY 1")),

    // ST — CHANGE-FEED STREAMING READ (Streaming.versionedChangeFeed — the
    // Delta CDF contract over this log): two appends, a MERGE (updates +
    // inserts in one commit), and a copy-on-write DELETE all flow through
    // ONE stream as typed row changes — `_change_type` ∈ {insert,
    // update_preimage, update_postimage, delete} — with each rewrite
    // commit diffed over ONLY its touched dirs (O(rewritten data), never
    // O(table)). This is the read path that lets a downstream consumer
    // track a mutating 100 TB table continuously, where the plain source
    // must refuse. Oracle: the four change classes replayed as batch SQL.
    Q("stream_versioned_cdf",
      (s, dir) => {
        val root = freshDir(s, "graft_stream_cdf_src")
        val o = rd(s, dir, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        graft.io.VersionedTable.commit(o.filter(col("o_orderkey") % 3 === 0),
          root, "append", "f0", statsCols = Seq("o_orderkey"))
        graft.io.VersionedTable.commit(o.filter(col("o_orderkey") % 3 === 1),
          root, "append", "f1", statsCols = Seq("o_orderkey"))
        graft.io.VersionedTable.mergeInto(s, root,
          o.filter(col("o_orderkey") % 5 === 0)
            .select(col("o_orderkey"), lit("U-CDF").as("o_orderpriority"),
              col("o_totalprice")),
          "o_orderkey", "f2", statsCols = Seq("o_orderkey"))
        graft.io.VersionedTable.deleteWhere(s, root,
          o.filter(col("o_orderkey") % 7 === 0).select("o_orderkey"),
          "o_orderkey", "f3")
        val q = graft.streaming.Streaming.versionedChangeFeed(s, root, "o_orderkey",
            startingVersion = Some(0L))
          .writeStream.format("memory")
          .queryName(s"graft_stream_sink_${streamSinkN.incrementAndGet()}")
          .outputMode("append").start()
        val name = q.name
        try q.processAllAvailable() finally q.stop()
        s.table(name)
          .groupBy("_change_type")
          .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
          .orderBy("_change_type")
      },
      Some("""WITH present AS (
        |  SELECT o_orderkey FROM orders WHERE o_orderkey%3=0 OR o_orderkey%3=1
        |  UNION SELECT o_orderkey FROM orders WHERE o_orderkey%5=0),
        |ins AS (
        |  SELECT o_orderkey FROM orders WHERE o_orderkey%3=0 OR o_orderkey%3=1
        |  UNION ALL SELECT o_orderkey FROM orders WHERE o_orderkey%5=0 AND o_orderkey%3=2),
        |upd AS (SELECT o_orderkey FROM orders
        |  WHERE o_orderkey%5=0 AND (o_orderkey%3=0 OR o_orderkey%3=1)),
        |del AS (SELECT o_orderkey FROM present WHERE o_orderkey%7=0)
        |SELECT * FROM (
        |  SELECT 'delete' AS _change_type, count(*) AS n,
        |    CAST(sum(o_orderkey) AS BIGINT) AS key_sum FROM del
        |  UNION ALL SELECT 'insert', count(*), CAST(sum(o_orderkey) AS BIGINT) FROM ins
        |  UNION ALL SELECT 'update_postimage', count(*), CAST(sum(o_orderkey) AS BIGINT) FROM upd
        |  UNION ALL SELECT 'update_preimage', count(*), CAST(sum(o_orderkey) AS BIGINT) FROM upd
        |) ORDER BY 1""".stripMargin)),

    // ST — TABLE-TO-TABLE STREAMING PIPELINE (the exactly-once composition
    // capstone: versionedSource → transform → versionedSink). A source
    // table's commit log streams through a filter+projection into a DERIVED
    // versioned table; the checkpoint carries the source's version cursor
    // AND the sink's batch ids, so a RESTART (run 2, Trigger.AvailableNow)
    // delivers exactly the commits that landed in between — the initial
    // snapshot never replays, every derived row lands exactly once, and
    // the derived log gains exactly one commit per non-empty batch
    // ('log_shape' pins v2 = snapshot batch + delta batch). This is the
    // medallion chain (bronze table → silver table) as a CONTINUOUS
    // pipeline over two commit logs with no external transaction service.
    Q("stream_table_pipeline",
      (s, dir) => {
        val src = freshDir(s, "graft_stream_pipe_src")
        val dst = freshDir(s, "graft_stream_pipe_dst")
        val ckpt = freshDir(s, "graft_stream_pipe_ckpt")
        val o = rd(s, dir, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        graft.io.VersionedTable.commit(o.filter(col("o_orderkey") % 3 === 0),
          src, "append", "c0", statsCols = Seq("o_orderkey"))
        graft.io.VersionedTable.commit(o.filter(col("o_orderkey") % 3 === 1),
          src, "append", "c1", statsCols = Seq("o_orderkey"))
        def runOnce(): Unit = {
          val stream = graft.streaming.Streaming.versionedSource(s, src)
            .filter(col("o_orderkey") % 2 === 0)
            .select(col("o_orderkey"), upper(col("o_orderpriority")).as("prio"))
          val q = graft.streaming.Streaming.versionedSink(stream, dst, "pipe",
            Some(ckpt), availableNow = true)
          q.awaitTermination()
        }
        runOnce() // initial snapshot (v1..v2 of src) → dst v1
        graft.io.VersionedTable.commit(o.filter(col("o_orderkey") % 3 === 2),
          src, "append", "c2", statsCols = Seq("o_orderkey"))
        runOnce() // restart: only src v3's delta flows → dst v2
        val logShape = graft.io.VersionedTable.latestVersion(dst).contains(2L)
        graft.io.VersionedTable.read(s, dst)
          .groupBy("prio")
          .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
          .withColumn("log_shape", lit(logShape))
          .orderBy("prio")
      },
      Some("SELECT upper(o_orderpriority) AS prio, count(*) AS n, " +
        "CAST(sum(o_orderkey) AS BIGINT) AS key_sum, TRUE AS log_shape " +
        "FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1 ORDER BY 1")),


    // ST — NATIVE STREAMING READ THROUGH THE CATALOG:
    // `spark.readStream.table("gq.db.t")` — the public
    // V2TableWithV1Fallback route (Delta's DeltaTableV2 pattern): Spark's
    // analyzer resolves the catalog identifier onto the graft-versioned
    // source, so the SAME commit-version offsets / initial-snapshot /
    // per-commit-delta / exactly-once contract now needs no path or
    // format() spelling at all. The row drives a full restart cycle
    // exactly like stream_table_pipeline — snapshot run, new SQL INSERT,
    // second run delivering ONLY the delta into a versioned sink —
    // 'log_shape' pins the derived log at exactly v2 (snapshot batch +
    // delta batch; a snapshot re-delivery would make it v3+ and double
    // every count).
    Q("stream_catalog_source",
      (s, dir) => {
        val wh = s"${System.getProperty("java.io.tmpdir")}/graft_catalog_wh_${dirTag(dir)}"
        s.conf.set("spark.sql.catalog.gq", "graft.catalog.GraftCatalog")
        s.conf.set("spark.sql.catalog.gq.warehouse", wh)
        rmrf(s"$wh/cstr")
        s.sql("CREATE NAMESPACE IF NOT EXISTS gq.cstr")
        rd(s, dir, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
          .createOrReplaceTempView("cat_stream_orders")
        s.sql("CREATE TABLE gq.cstr.t (o_orderkey BIGINT, o_orderpriority STRING, " +
          "o_totalprice DOUBLE) TBLPROPERTIES ('graft.stats.columns' = 'o_orderkey')")
        s.sql("INSERT INTO gq.cstr.t SELECT * FROM cat_stream_orders WHERE o_orderkey % 3 = 0")
        s.sql("INSERT INTO gq.cstr.t SELECT * FROM cat_stream_orders WHERE o_orderkey % 3 = 1")
        val dst = freshDir(s, "graft_stream_cat_dst")
        val ckpt = freshDir(s, "graft_stream_cat_ckpt")
        def runOnce(): Unit = {
          val stream = s.readStream.table("gq.cstr.t")
            .filter(col("o_orderkey") % 2 === 0)
            .select(col("o_orderkey"), upper(col("o_orderpriority")).as("prio"))
          val q = graft.streaming.Streaming.versionedSink(stream, dst, "catpipe",
            Some(ckpt), availableNow = true)
          q.awaitTermination()
        }
        runOnce() // initial snapshot of gq.cstr.t (v1..v3) → dst v1
        s.sql("INSERT INTO gq.cstr.t SELECT * FROM cat_stream_orders WHERE o_orderkey % 3 = 2")
        runOnce() // restart: only the new commit's delta flows → dst v2
        val logShape = graft.io.VersionedTable.latestVersion(dst).contains(2L)
        graft.io.VersionedTable.read(s, dst)
          .groupBy("prio")
          .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
          .withColumn("log_shape", lit(logShape))
          .orderBy("prio")
      },
      Some("SELECT upper(o_orderpriority) AS prio, count(*) AS n, " +
        "CAST(sum(o_orderkey) AS BIGINT) AS key_sum, TRUE AS log_shape " +
        "FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1 ORDER BY 1")),

    // ST — FULL TABLE-NAME STREAMING PIPELINE: bronze → silver as two
    // CATALOG IDENTIFIERS and nothing else —
    // `spark.readStream.table("gq.cstp.src")` →
    // `writeStream.format("graft-versioned").toTable("gq.cstp.dst")` —
    // the stream_table_pipeline contract (snapshot once, per-commit
    // deltas, exactly-once restarts) with BOTH halves resolved through
    // the DSv2 catalog's V1 fallback: the source from
    // V2TableWithV1Fallback, the sink from StreamSinkProvider with
    // checkpoint-derived commitIds. 'log_shape' pins the derived table at
    // exactly v3 (create + snapshot batch + delta batch): a snapshot
    // re-delivery or a double-applied batch changes the version and every
    // count.
    Q("stream_catalog_pipeline",
      (s, dir) => {
        val wh = s"${System.getProperty("java.io.tmpdir")}/graft_catalog_wh_${dirTag(dir)}"
        s.conf.set("spark.sql.catalog.gq", "graft.catalog.GraftCatalog")
        s.conf.set("spark.sql.catalog.gq.warehouse", wh)
        rmrf(s"$wh/cstp")
        s.sql("CREATE NAMESPACE IF NOT EXISTS gq.cstp")
        rd(s, dir, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
          .createOrReplaceTempView("cat_pipe_orders")
        s.sql("CREATE TABLE gq.cstp.src (o_orderkey BIGINT, o_orderpriority STRING, " +
          "o_totalprice DOUBLE) TBLPROPERTIES ('graft.stats.columns' = 'o_orderkey')")
        s.sql("CREATE TABLE gq.cstp.dst (o_orderkey BIGINT, prio STRING) " +
          "TBLPROPERTIES ('graft.stats.columns' = 'o_orderkey')")
        s.sql("INSERT INTO gq.cstp.src SELECT * FROM cat_pipe_orders WHERE o_orderkey % 3 = 0")
        s.sql("INSERT INTO gq.cstp.src SELECT * FROM cat_pipe_orders WHERE o_orderkey % 3 = 1")
        val ckpt = freshDir(s, "graft_stream_catpipe_ckpt")
        def runOnce(): Unit = {
          val q = s.readStream.table("gq.cstp.src")
            .filter(col("o_orderkey") % 2 === 0)
            .select(col("o_orderkey"), upper(col("o_orderpriority")).as("prio"))
            .writeStream.format("graft-versioned")
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .toTable("gq.cstp.dst")
          q.awaitTermination()
        }
        runOnce() // initial snapshot of src → dst v2 (after the create)
        s.sql("INSERT INTO gq.cstp.src SELECT * FROM cat_pipe_orders WHERE o_orderkey % 3 = 2")
        runOnce() // restart: only the new commit's delta → dst v3
        val logShape = graft.io.VersionedTable.latestVersion(s"$wh/cstp/dst").contains(3L)
        s.table("gq.cstp.dst")
          .groupBy("prio")
          .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
          .withColumn("log_shape", lit(logShape))
          .orderBy("prio")
      },
      Some("SELECT upper(o_orderpriority) AS prio, count(*) AS n, " +
        "CAST(sum(o_orderkey) AS BIGINT) AS key_sum, TRUE AS log_shape " +
        "FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1 ORDER BY 1")),

    // Custom streaming state (flatMapGroupsWithState) oracle-checked: the
    // per-key running count/min/max session state, drained to completion —
    // the final update per key must equal the batch aggregate. Emission
    // order and intermediate updates are racy; the converged state is not.
    Q("stream_stateful_agg",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val batchSchema = rd(s, dir, "events").schema
        val ticks = s.readStream.schema(batchSchema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
          .withColumn("ingest_ts", expr(tsStampSql(batchSchema)))
          .select(col("event_type").as("symbol"),
            col("value").cast(DecimalType(10, 2)).as("price"), col("ingest_ts"))
        import s.implicits._
        val name = s"graft_stream_sink_${streamSinkN.incrementAndGet()}"
        val q = graft.streaming.Streaming.sessionize(
            ticks.as[graft.streaming.Streaming.Tick], idleTimeoutMs = 0)
          .toDF()
          .writeStream.format("memory").queryName(name).outputMode("update").start()
        try q.processAllAvailable() finally q.stop()
        // keep only each key's final update (largest n) in case the file
        // source split the input into several micro-batches
        val w = Window.partitionBy(col("symbol")).orderBy(col("n").desc)
        s.table(name).withColumn("__rk", row_number().over(w)).filter(col("__rk") === 1)
          .select(col("symbol").as("event_type"), col("n"),
            col("lo").cast(DecimalType(10, 2)).cast("string").as("lo"),
            col("hi").cast(DecimalType(10, 2)).cast("string").as("hi"))
          .orderBy("event_type")
      },
      Some("SELECT event_type, count(*) AS n, " +
        "CAST(min(CAST(value AS DECIMAL(10,2))) AS VARCHAR) AS lo, " +
        "CAST(max(CAST(value AS DECIMAL(10,2))) AS VARCHAR) AS hi " +
        "FROM events GROUP BY 1 ORDER BY 1")),


    // Stream-stream interval join executed through two real streams over the
    // same event file (clicks ⋈ purchases of the same user within 30
    // minutes), append-mode sink. Watermarks + the bounded time condition
    // keep join state finite — the only shape a continuous stream join can
    // take. Oracle = the identical interval self-join in batch SQL (µs
    // precision on both engines), asserting stream/batch join equivalence.
    Q("stream_stream_join",
      (s, dir) => {
        // Isolated session clone: a symmetric stream join keeps one state
        // store per shuffle partition per side, and each micro-batch pays a
        // commit per store — the dominant cost at this input rate. Partition
        // count should track throughput (state ∝ rate × horizon), so size it
        // to the actual stream rate on a private session instead of the
        // batch-wide default; nothing leaks into concurrently-running
        // queries (newSession shares the context, not runtime conf).
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "8")
        val batchSchema = rd(ss, dir, "events").schema
        def stream(kind: String, prefix: String) = ss.readStream.schema(batchSchema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
          .filter(col("event_type") === kind)
          .select(col("user_id").as(s"${prefix}_user"),
            col("event_id").as(s"${prefix}_id"),
            expr(tsStampSql(batchSchema)).as(s"${prefix}_ts"))
        val name = s"graft_stream_sink_${streamSinkN.incrementAndGet()}"
        val q = graft.streaming.Streaming.intervalJoin(
            stream("click", "c"), stream("purchase", "p"),
            "c_user", "p_user", "c_ts", "p_ts", "1 hour", "30 minutes")
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        ss.table(name).select(col("c_id").as("click_id"), col("p_id").as("purchase_id"))
          .orderBy("click_id", "purchase_id")
      },
      Some("SELECT a.event_id AS click_id, b.event_id AS purchase_id " +
        "FROM events a JOIN events b ON a.user_id = b.user_id " +
        "AND a.event_type = 'click' AND b.event_type = 'purchase' " +
        "AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE " +
        "ORDER BY 1, 2")),


    // ST — STREAMING CDC MERGE sink (Streaming.versionedMergeSink): each
    // micro-batch of upserts applies to the versioned table through
    // mergeInto's dir-level copy-on-write, exactly-once under the
    // appId+batchId commitId — the composition that lets a CDC stream
    // maintain a 100 TB keyed table continuously at O(hit dirs + batch)
    // per batch. The seed commit is the base orders table; the stream
    // re-prices every 10th order; the replay contract is proven inline
    // (re-firing batch 0's commitId with garbage must not advance the log
    // or touch rows). Oracle = the same upsert as batch CASE logic.
    Q("stream_versioned_merge",
      (s, dir) => {
        val root = freshDir(s, "graft_stream_vmerge")
        val o = rd(s, dir, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        graft.io.VersionedTable.commit(o, root, "append", "seed",
          statsCols = Seq("o_orderkey"))
        val schema = rd(s, dir, "orders").schema
        val stream = s.readStream.schema(schema)
          .option("pathGlobFilter", "orders.parquet").parquet(dir)
          .filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"), lit("U-STREAM").as("o_orderpriority"),
            col("o_totalprice"))
        val q = graft.streaming.Streaming.versionedMergeSink(stream, root,
          "o_orderkey", appId = "vm", statsCols = Seq("o_orderkey"))
        try q.processAllAvailable() finally q.stop()
        val converged = graft.io.VersionedTable.latestVersion(root).get
        val (rv, rh, _) = graft.io.VersionedTable.mergeInto(s, root,
          o.limit(1).select(col("o_orderkey"), lit("GARBAGE").as("o_orderpriority"),
            col("o_totalprice")), "o_orderkey", "vm-b0")
        val noop = rv <= converged && rh == -1 &&
          graft.io.VersionedTable.latestVersion(root).contains(converged)
        graft.io.VersionedTable.read(s, root)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
          .withColumn("replay_noop", lit(noop))
          .orderBy("o_orderpriority")
      },
      Some("""WITH m AS (SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 10 = 0 THEN 'U-STREAM' ELSE o_orderpriority END
        |    AS o_orderpriority FROM orders)
        |SELECT o_orderpriority, count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  TRUE AS replay_noop
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ST — STREAMING MAINTAINED MATERIALIZED VIEW (Streaming.matViewSink →
    // mergeInto + MatView.refresh): each micro-batch merges into the
    // SOURCE table exactly-once, then the view folds the new commits in as
    // signed change-feed deltas — the serving aggregate of a CDC-maintained
    // table stays fresh at O(hit dirs + batch) + O(changed rows) per
    // batch, never a rescan of either table. 'synced' pins the view's
    // sync point at the source head after convergence; the oracle is the
    // direct GROUP BY over the same upserted state, so incremental
    // maintenance == full recompute is hash-checked.
    Q("stream_matview",
      (s, dir) => {
        val root = freshDir(s, "graft_stream_mvsrc")
        val mv = freshDir(s, "graft_stream_mv")
        val o = rd(s, dir, "orders").select("o_orderkey", "o_orderpriority", "o_custkey")
        graft.io.VersionedTable.commit(o, root, "append", "seed",
          statsCols = Seq("o_orderkey"))
        graft.io.MatView.create(s, mv, root, "o_orderpriority",
          Seq("o_custkey"), "smv-create")
        val schema = rd(s, dir, "orders").schema
        val stream = s.readStream.schema(schema)
          .option("pathGlobFilter", "orders.parquet").parquet(dir)
          .filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"), lit("U-MV").as("o_orderpriority"),
            col("o_custkey"))
        val q = graft.streaming.Streaming.matViewSink(stream, root, mv,
          "o_orderkey", appId = "smv", statsCols = Seq("o_orderkey"))
        try q.processAllAvailable() finally q.stop()
        val synced = graft.io.VersionedTable.tableProperties(mv)("graft.mv.synced").toLong ==
          graft.io.VersionedTable.latestVersion(root).get
        graft.io.VersionedTable.read(s, mv)
          .withColumn("synced", lit(synced))
          .orderBy("o_orderpriority")
      },
      Some("""WITH m AS (SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 10 = 0 THEN 'U-MV' ELSE o_orderpriority END
        |    AS o_orderpriority, o_custkey FROM orders)
        |SELECT o_orderpriority, count(*) AS mv_rows,
        |  CAST(sum(o_custkey) AS BIGINT) AS o_custkey_sum, TRUE AS synced
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ST — STREAMING CDC APPLY sink (Streaming.cdcApplySink → VersionedTable
    // .applyCdcBatch): the tombstone-complete CDC shape — each micro-batch
    // carries BOTH upserts ('u': every 10th order re-priced) and deletes
    // ('d': every 7th-but-not-10th order tombstoned) and applies them in
    // ONE commit under the appId+batchId id, so the table never shows a
    // torn upsert/delete intermediate and a crash-replay of the batch
    // no-ops ('replay_noop' proven inline with garbage ops under batch
    // 0's commitId). 'one_commit' pins the log shape: seed + exactly one
    // version for the mixed batch. Oracle = the same CASE/anti-filter as
    // batch SQL.
    Q("stream_cdc_apply",
      (s, dir) => {
        val root = freshDir(s, "graft_stream_cdc")
        val o = rd(s, dir, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
        graft.io.VersionedTable.commit(o, root, "append", "seed",
          statsCols = Seq("o_orderkey"))
        val schema = rd(s, dir, "orders").schema
        val stream = s.readStream.schema(schema)
          .option("pathGlobFilter", "orders.parquet").parquet(dir)
          .filter(col("o_orderkey") % 10 === 0 || col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), lit("U-CDC").as("o_orderpriority"),
            col("o_totalprice"),
            when(col("o_orderkey") % 10 === 0, lit("u")).otherwise(lit("d")).as("__op"))
        val q = graft.streaming.Streaming.cdcApplySink(stream, root,
          "o_orderkey", "__op", appId = "cdc", statsCols = Seq("o_orderkey"))
        try q.processAllAvailable() finally q.stop()
        val converged = graft.io.VersionedTable.latestVersion(root).get
        val (rv, rh, _) = graft.io.VersionedTable.applyCdcBatch(s, root,
          o.limit(1).select(col("o_orderkey"), lit("GARBAGE").as("o_orderpriority"),
            col("o_totalprice")),
          o.limit(0).select("o_orderkey"), "o_orderkey", "cdc-b0")
        val noop = rv <= converged && rh == -1 &&
          graft.io.VersionedTable.latestVersion(root).contains(converged)
        graft.io.VersionedTable.read(s, root)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
          .withColumn("replay_noop", lit(noop))
          .withColumn("one_commit", lit(converged == 2L))
          .orderBy("o_orderpriority")
      },
      Some("""WITH m AS (SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 10 = 0 THEN 'U-CDC' ELSE o_orderpriority END
        |    AS o_orderpriority FROM orders
        |  WHERE NOT (o_orderkey % 7 = 0 AND o_orderkey % 10 <> 0))
        |SELECT o_orderpriority, count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  TRUE AS replay_noop, TRUE AS one_commit
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin)),

    // LEFT SEMI stream-stream interval join (intervalJoinSemi — the
    // conversion-test shape: WHICH clicks led to a purchase within the
    // horizon, each click at most once, no purchase columns). The one
    // watermarked-join form whose output carries NO eviction-bound term:
    // matched-or-not is decided by the data alone, so the oracle is the
    // plain batch EXISTS with no watermark arithmetic.
    Q("stream_stream_semi_join",
      (s, dir) => {
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "8")
        val batchSchema = rd(ss, dir, "events").schema
        def stream(kind: String, prefix: String) = ss.readStream.schema(batchSchema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
          .filter(col("event_type") === kind)
          .select(col("user_id").as(s"${prefix}_user"),
            col("event_id").as(s"${prefix}_id"),
            expr(tsStampSql(batchSchema)).as(s"${prefix}_ts"))
        val name = s"graft_stream_sink_${streamSinkN.incrementAndGet()}"
        val q = graft.streaming.Streaming.intervalJoinSemi(
            stream("click", "c"), stream("purchase", "p"),
            "c_user", "p_user", "c_ts", "p_ts", "1 hour", "30 minutes")
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        ss.table(name).select(col("c_id").as("click_id")).orderBy("click_id")
      },
      Some("SELECT DISTINCT a.event_id AS click_id " +
        "FROM events a JOIN events b ON a.user_id = b.user_id " +
        "AND a.event_type = 'click' AND b.event_type = 'purchase' " +
        "AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE " +
        "ORDER BY 1")),

    // LEFT OUTER stream-stream interval join (intervalJoinLeftOuter — the
    // funnel/attribution shape: every click appears, purchased or not).
    // Same evictable-state geometry as stream_stream_join plus the second
    // emission path: a click whose 30-minute window falls wholly behind
    // the watermark emits NULL-padded at state eviction. The honest tail
    // contract is part of the oracle: clicks whose window the watermark
    // never passes (the last watermark+horizon of the stream) stay in
    // state, so the oracle's unmatched branch carries the same
    // `ts + horizon < wm` bound the engine enforces, where wm is the
    // GLOBAL watermark = min of the two inputs' watermarks (each side
    // only sees its own event type, so the lagging side gates both) —
    // stream/batch equivalence INCLUDING the eviction boundary.
    Q("stream_stream_left_join",
      (s, dir) => {
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "8")
        val batchSchema = rd(ss, dir, "events").schema
        def stream(kind: String, prefix: String) = ss.readStream.schema(batchSchema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
          .filter(col("event_type") === kind)
          .select(col("user_id").as(s"${prefix}_user"),
            col("event_id").as(s"${prefix}_id"),
            expr(tsStampSql(batchSchema)).as(s"${prefix}_ts"))
        val name = s"graft_stream_sink_${streamSinkN.incrementAndGet()}"
        val q = graft.streaming.Streaming.intervalJoinLeftOuter(
            stream("click", "c"), stream("purchase", "p"),
            "c_user", "p_user", "c_ts", "p_ts", "1 minute", "30 minutes")
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        ss.table(name).select(col("c_id").as("click_id"), col("p_id").as("purchase_id"))
          .orderBy("click_id", "purchase_id")
      },
      Some("""WITH c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
        |w AS (SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
        |  - INTERVAL 1 MINUTE AS wm),
        |m AS (SELECT c.event_id AS click_id, p.event_id AS purchase_id
        |  FROM c JOIN p ON c.user_id = p.user_id
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE),
        |u AS (SELECT c.event_id AS click_id, CAST(NULL AS BIGINT) AS purchase_id
        |  FROM c CROSS JOIN w WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.user_id = c.user_id
        |    AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE)
        |  AND c.ts + INTERVAL 30 MINUTE < wm)
        |SELECT * FROM m UNION ALL SELECT * FROM u ORDER BY 1, 2""".stripMargin)),

    // FULL OUTER stream-stream interval join (intervalJoinFullOuter — the
    // attribution-COMPLETE form: every click appears, purchased or not,
    // AND every purchase appears, attributed or not). Each side has its
    // own eviction bound, and BOTH are part of the oracle: a click emits
    // null-padded once the watermark passes its whole [ts, ts+30min]
    // window (ts + horizon < max(ts) - watermark, as in the left-outer
    // row); a purchase can only match clicks in [ts-30min, ts], so it
    // emits null-padded once the watermark passes its OWN timestamp
    // (ts < max(ts) - watermark) — tighter by one horizon. Stream/batch
    // equivalence including both eviction boundaries.
    Q("stream_stream_full_join",
      (s, dir) => {
        val ss = s.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "8")
        val batchSchema = rd(ss, dir, "events").schema
        def stream(kind: String, prefix: String) = ss.readStream.schema(batchSchema)
          .option("pathGlobFilter", "events.parquet").parquet(dir)
          .filter(col("event_type") === kind)
          .select(col("user_id").as(s"${prefix}_user"),
            col("event_id").as(s"${prefix}_id"),
            expr(tsStampSql(batchSchema)).as(s"${prefix}_ts"))
        val name = s"graft_stream_sink_${streamSinkN.incrementAndGet()}"
        val q = graft.streaming.Streaming.intervalJoinFullOuter(
            stream("click", "c"), stream("purchase", "p"),
            "c_user", "p_user", "c_ts", "p_ts", "1 minute", "30 minutes")
          .writeStream.format("memory").queryName(name).outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        // NULLS LAST to match the oracle's ORDER BY (DuckDB default) —
        // click_id is nullable here, unlike the left-outer row
        ss.table(name).select(col("c_id").as("click_id"), col("p_id").as("purchase_id"))
          .orderBy(col("click_id").asc_nulls_last, col("purchase_id").asc_nulls_last)
      },
      Some("""WITH c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
        |w AS (SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
        |  - INTERVAL 1 MINUTE AS wm),
        |m AS (SELECT c.event_id AS click_id, p.event_id AS purchase_id
        |  FROM c JOIN p ON c.user_id = p.user_id
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE),
        |ul AS (SELECT c.event_id AS click_id, CAST(NULL AS BIGINT) AS purchase_id
        |  FROM c CROSS JOIN w WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.user_id = c.user_id
        |    AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE)
        |  AND c.ts + INTERVAL 30 MINUTE < wm),
        |ur AS (SELECT CAST(NULL AS BIGINT) AS click_id, p.event_id AS purchase_id
        |  FROM p CROSS JOIN w WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.user_id = p.user_id
        |    AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE)
        |  AND p.ts < wm)
        |SELECT * FROM m UNION ALL SELECT * FROM ul UNION ALL SELECT * FROM ur
        |ORDER BY 1, 2""".stripMargin)),

    // STREAMING PQ-INDEX MAINTENANCE (the ninth declared streaming path —
    // stream_index_maintain's compressed-ANN counterpart): the standing
    // corpus' frozen-quantizer codes are seeded once (bucketed by vec_id);
    // each micro-batch of new vectors appends its codes through
    // Similarity.appendPqIndex inside foreachBatch — idempotent under
    // foreachBatch's replay semantics, quantizer/codebook pinned to the
    // base so stored codes stay valid mid-append. Result = the converged
    // code table; oracle = the batch frozen-quantizer code formulation.
    Q("stream_pq_index_maintain",
      (s, dir) => {
        val emb = rd(s, dir, "embeddings")
        val base = emb.filter(col("vec_id") < 400)
        // fixture = the frozen-quantizer SEED codes; LIVE each pass = the
        // streaming maintenance (fresh ephemeral checkpoint → the source
        // re-flows, appends stay idempotent) + the converged-table read
        val idx = Fixtures.once(s, dir, "stream_pq_seed") {
          val name = s"graft_stream_pq_index_${dirTag(dir)}"
          val root = freshDir(s, s"graft_stream_pqidx_${dirTag(dir)}")
          s.sql(s"DROP TABLE IF EXISTS $name")
          Similarity.pqCodesFrozen(base, base, dim = 64, m = 8, ncodes = 16)
            .write.bucketBy(8, "vec_id").sortBy("vec_id")
            .option("path", s"$root/idx").saveAsTable(name)
          name
        }
        val stream = s.readStream.schema(emb.schema)
          .option("pathGlobFilter", "embeddings.parquet").parquet(dir)
          .filter(col("vec_id") >= 400 && col("vec_id") < 500)
        val q = graft.streaming.Streaming.maintainPqIndex(stream,
          idx, base, 64, 8, 16, 8)
        try q.processAllAvailable() finally q.stop()
        s.table(idx).orderBy("vec_id", "sub")
      },
      Some(s"""WITH ${duckFrozenPqCtes(400, 500, 50)}
        |SELECT vec_id, sub, code FROM fcodes ORDER BY vec_id, sub""".stripMargin)),


    // STREAMING LEXICAL-INDEX MAINTENANCE (the eleventh declared streaming
    // path, completing the index trio: band / PQ / lexical): the standing
    // corpus' postings + lengths are seeded once; each micro-batch of new
    // documents appends through TextAnalysis.appendLexicalIndex inside
    // foreachBatch — each table's anti-join makes the appends independently
    // idempotent under replay, and df/N/T derive at probe time, so scores
    // shift continuously as the stream absorbs documents. The result is the
    // BM25 PROBE of the converged index; oracle = the full-corpus batch
    // formulation, so the gate proves the streamed index ranks exactly as a
    // fresh corpus scan.
    Q("stream_lex_index_maintain",
      (s, dir) => {
        val docs = rd(s, dir, "documents")
        // fixture = the SEED index (standing corpus, not this row's claim);
        // LIVE each pass = the streaming maintenance itself — every
        // micro-batch re-flows through foreachBatch's idempotent appends
        // (a fresh ephemeral checkpoint per pass re-reads the source) —
        // plus the BM25 probe of the converged index
        val (post, len) = Fixtures.once(s, dir, "stream_lex_seed") {
          val t = dirTag(dir)
          val (p, l) = (s"graft_stream_lex_post_$t", s"graft_stream_lex_len_$t")
          val root = freshDir(s, s"graft_stream_lexidx_$t")
          s.sql(s"DROP TABLE IF EXISTS $p")
          s.sql(s"DROP TABLE IF EXISTS $l")
          TextAnalysis.buildLexicalIndex(p, l,
            docs.filter(col("doc_id") < 400), "doc_id", "text", 8, root)
          (p, l)
        }
        val stream = s.readStream.schema(docs.schema)
          .option("pathGlobFilter", "documents.parquet").parquet(dir)
          .filter(col("doc_id") >= 400)
        val q = graft.streaming.Streaming.maintainLexicalIndex(stream,
          post, len, "doc_id", "text", 8)
        try q.processAllAvailable() finally q.stop()
        val queries = docs.filter(col("doc_id") < 5)
          .select(col("doc_id").as("query_id"),
            expr("array_join(slice(filter(split(text, ' '), x -> x != ''), 1, 8), ' ')").as("qtext"))
        TextAnalysis.bm25IndexTopK(s, post, len,
            queries, "query_id", "qtext", 10)
          .orderBy("query_id", "rk")
      },
      Some("""WITH dl AS (SELECT doc_id, CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS dl FROM documents),
        |tot AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS t FROM dl),
        |qd AS (SELECT doc_id AS query_id, array_to_string((list_filter(string_split(text, ' '), x -> x <> ''))[1:8], ' ') AS qtext
        |  FROM documents WHERE doc_id < 5),
        |qt AS (SELECT DISTINCT query_id, unnest(list_filter(string_split(qtext, ' '), x -> x <> '')) AS term FROM qd),
        |post AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM post
        |  WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT q.query_id, f.doc_id,
        |  CAST(CAST(22000 AS HUGEINT) * (length(printf('%b', n // df)) - 1) * f.tf * t
        |    // (CAST(10 AS HUGEINT) * f.tf * t + CAST(3 AS HUGEINT) * t + CAST(9 AS HUGEINT) * dl.dl * n) AS BIGINT) AS s
        |  FROM tf f JOIN dfreq USING (term) JOIN qt q USING (term)
        |  JOIN dl ON f.doc_id = dl.doc_id CROSS JOIN tot),
        |agg AS (SELECT query_id, doc_id, CAST(sum(s) AS BIGINT) AS score FROM sc GROUP BY 1, 2),
        |r AS (SELECT query_id, doc_id, score,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INTEGER) AS rk FROM agg)
        |SELECT query_id, doc_id, score, rk FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin)),
  )
}
