package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, SupportsTriggerAvailableNow, Offset => ConnectorOffset}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftshim.GraftStreamingBridge
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider,
  DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.io.VersionedTable

/** Structured Streaming SOURCE over the versioned table — the read half of
  * the exactly-once pipeline whose write half is
  * [[Streaming.versionedSink]]: `spark.readStream.format("graft-versioned")
  * .option("path", root).load()` turns the commit log into a stream, the
  * public Delta-source contract re-expressed over this log.
  *
  * Offsets ARE commit versions: `getOffset` is the latest version (one tail
  * manifest parse through the checkpointed log — O(1) no matter how old the
  * table), and `getBatch(start, end)` delivers
  *
  *  - `start = None` (fresh stream): the FULL SNAPSHOT at `end` — one
  *    snapshot read, so a consumer starts from current state and then sees
  *    only increments (Delta's initial-snapshot semantics). With
  *    `startingVersion = v` the snapshot is skipped and the stream begins
  *    at the changes of version v+1 — the "changes feed only" form.
  *  - `start = Some(s)`: the per-commit walk of (s, end] — each version's
  *    dir-difference delta ([[VersionedTable.commitDelta]], the
  *    changesBetween core), one manifest parse per commit, emitted rows =
  *    exactly the appended dirs with that commit's merge-on-read coverage
  *    applied. Versions are immutable, so a checkpoint-replayed batch
  *    reproduces bit-for-bit — the engine's offset log plus manifest
  *    immutability compose into exactly-once delivery with no source-side
  *    state at all.
  *
  * NON-append commits (overwrite, copy-on-write merge/delete, compaction,
  * rollback) cannot be expressed as a row-append delta; by default the
  * stream FAILS LOUDLY on one (silently treating a rewrite as empty would
  * corrupt every downstream aggregate). `skipChangeCommits = true` opts
  * into Delta's escape hatch: such commits emit nothing — including any
  * rows they INSERTED, the documented Delta caveat — and the walk resumes
  * at the next append. A SCHEMA change mid-stream (rename, added column)
  * always refuses, even under skipChangeCommits: a v1 source's schema is
  * pinned at start, so evolution requires restarting the stream, which
  * re-pins to the latest schema (the Delta behavior).
  */
class VersionedTableSourceProvider extends StreamSourceProvider with RelationProvider
    with CreatableRelationProvider with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-versioned"

  /** The STREAMING SINK — `df.writeStream.format("graft-versioned")
    * .option("checkpointLocation", ck).toTable("cat.db.t")` (through the
    * catalog's V1 fallback) or `.start(root)`: every micro-batch is one
    * append COMMIT with a batchId-derived commitId, so the engine's
    * offset log and the manifest's commitId dedup compose into
    * exactly-once — a checkpoint-replayed batch finds its committed
    * version and no-ops, the [[graft.streaming.Streaming.versionedSink]]
    * contract without the foreachBatch spelling. The stream identity
    * comes from the checkpoint location (or an explicit `streamId`
    * option), so two different streams appending the same table can
    * never collide commitIds. The table's declared skipping index
    * (already-indexed columns + `graft.stats.columns` /
    * `graft.bloom.columns` properties) is maintained on every batch,
    * and hive layout follows the snapshot's partition columns.
    */
  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
                          partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    val root = rootOf(parameters)
    require(outputMode == OutputMode.Append(),
      s"graft-versioned sink supports Append output mode only (each micro-batch " +
        s"is one append commit); got $outputMode")
    val tag = parameters.get("streamId")
      .orElse(parameters.get("checkpointLocation").map { c =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(c.getBytes("UTF-8"))
        "ck" + md.take(6).map("%02x".format(_)).mkString
      })
      .getOrElse(throw new IllegalArgumentException(
        "graft-versioned sink requires 'checkpointLocation' (or an explicit " +
          "'streamId' option) — a stream-stable identity is what makes " +
          "checkpoint-replayed batches exactly-once"))
    new Sink {
      override def addBatch(batchId: Long, data: org.apache.spark.sql.DataFrame): Unit = {
        val parent = VersionedTable.latestCommit(root)
        val props = parent.map(_.props).getOrElse(Map.empty)
        def declared(key: String): Seq[String] = props.get(key)
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
        val (st, bl) = VersionedTable.indexedCols(root)
        val batch = GraftStreamingBridge.asBatchDf(data)
        VersionedTable.commit(batch, root, "append", s"$tag-b$batchId",
          statsCols = (st ++ declared("graft.stats.columns")).distinct
            .filter(batch.columns.contains),
          partitionCols = parent.map(_.partitionCols).getOrElse(
            partitionColumns),
          bloomCols = (bl ++ declared("graft.bloom.columns")).distinct
            .filter(batch.columns.contains))
        ()
      }
      override def toString: String = s"GraftVersionedSink[$root]"
    }
  }

  /** The BATCH read path of the same format name —
    * `spark.read.format("graft-versioned").load(root)` — with column
    * pruning and manifest-index filter pushdown ([[graft.io
    * .VersionedRelation]]); `versionAsOf`/`timestampAsOf` options give the
    * reader-API form of time travel.
    */
  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val root = rootOf(parameters)
    val asOf = parameters.get("versionAsOf").map(_.toLong)
      .orElse(parameters.get("timestampAsOf").map(ts =>
        VersionedTable.versionAsOfTimestamp(root, ts.toLong)))
    new graft.io.VersionedRelation(sqlContext, root, asOf)
  }

  /** The BATCH write path — `df.write.format("graft-versioned")
    * .mode(...).option("commitId", id).save(root)` — routed straight
    * through [[VersionedTable.commit]], so the writer-API form gets the
    * full commit contract: OCC publication, constraint enforcement,
    * schema-evolution checks, stats/bloom gathering (`statsCols` /
    * `bloomCols` / `partitionBy` options, comma-separated), and
    * idempotence under an explicit `commitId` (REQUIRED: exactly-once
    * retry semantics need a caller-stable identity; generating one here
    * would silently turn every retry into a duplicate append).
    * SaveMode mapping: Append/Overwrite are the two commit modes;
    * ErrorIfExists commits only a FIRST version and refuses otherwise;
    * Ignore is Delta-style create-if-absent (no-op when the table exists).
    */
  override def createRelation(sqlContext: SQLContext, mode: org.apache.spark.sql.SaveMode,
                              parameters: Map[String, String],
                              data: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row])
      : BaseRelation = {
    val root = rootOf(parameters)
    val commitId = parameters.getOrElse("commitId",
      throw new IllegalArgumentException("graft-versioned write requires option " +
        "'commitId' — a caller-stable identity is what makes retries exactly-once"))
    def cols(k: String): Seq[String] =
      parameters.get(k).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    import org.apache.spark.sql.SaveMode
    val exists = VersionedTable.latestVersion(root).isDefined
    val commitMode = mode match {
      case SaveMode.Append    => Some("append")
      case SaveMode.Overwrite => Some("overwrite")
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"graft-versioned table at $root already exists (SaveMode.ErrorIfExists)")
        Some("append")
      case SaveMode.Ignore => if (exists) None else Some("append")
    }
    commitMode.foreach(m => VersionedTable.commit(data.toDF(), root, m, commitId,
      statsCols = cols("statsCols"), partitionCols = cols("partitionBy"),
      bloomCols = cols("bloomCols")))
    new graft.io.VersionedRelation(sqlContext, root, None)
  }

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-versioned source requires option 'path'"))

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val base = VersionedTableSource.pinnedSchema(sqlContext, rootOf(parameters))
    // the schema is always DERIVED from the manifest; a caller-specified
    // one is accepted only when it matches — the catalog's streaming
    // fallback (`spark.readStream.table("cat.db.t")` through
    // V2TableWithV1Fallback) passes the table's schema back in, and that
    // round-trip must not refuse
    schema.foreach(s => require(
      s.map(f => (f.name, f.dataType)) == base.map(f => (f.name, f.dataType)),
      "graft-versioned source derives its schema from the table's latest manifest; " +
        s"the specified schema disagrees (specified ${s.simpleString}, " +
        s"manifest ${base.simpleString})"))
    val out = if (parameters.get("readChangeFeed").exists(_.toBoolean))
      base.add(VersionedTableSource.changeTypeCol, org.apache.spark.sql.types.StringType,
        nullable = false)
    else base
    (shortName(), out)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val maxV = parameters.get("maxVersionsPerTrigger").map(_.toLong)
    maxV.foreach(m => require(m > 0, s"maxVersionsPerTrigger must be positive, got $m"))
    val cdf = parameters.get("readChangeFeed").exists(_.toBoolean)
    val cdfKey = parameters.get("changeFeedKey")
    require(!cdf || cdfKey.nonEmpty,
      "readChangeFeed=true requires option 'changeFeedKey' (the table's row key, " +
        "used to split inserts from updates)")
    new VersionedTableSource(sqlContext, rootOf(parameters),
      skipChangeCommits = parameters.get("skipChangeCommits").exists(_.toBoolean),
      startingVersion = parameters.get("startingVersion").map(_.toLong),
      maxVersionsPerTrigger = maxV,
      changeFeedKey = if (cdf) cdfKey else None)
  }
}

private[streaming] object VersionedTableSource {
  val changeTypeCol = "_change_type"

  /** The stream's pinned schema: the LATEST snapshot's logical schema at
    * source-creation time (a zero-row plan — schema resolution only, no
    * scan job).
    */
  def pinnedSchema(sqlContext: SQLContext, root: String): StructType = {
    require(VersionedTable.latestVersion(root).nonEmpty,
      s"graft-versioned source at $root: the table has no commits yet — " +
        "commit a first version before starting the stream")
    VersionedTable.read(sqlContext.sparkSession, root).schema
  }
}

class VersionedTableSource(sqlContext: SQLContext, root: String,
                           skipChangeCommits: Boolean,
                           startingVersion: Option[Long],
                           maxVersionsPerTrigger: Option[Long] = None,
                           changeFeedKey: Option[String] = None)
    extends Source with SupportsTriggerAvailableNow {

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[VersionedTableSource])

  /** CHANGE FEED mode (`readChangeFeed=true` + `changeFeedKey`, the public
    * Delta CDF contract): every emitted row carries `_change_type` ∈
    * {insert, update_preimage, update_postimage, delete}, and the commits
    * the plain stream must refuse — merges, deletes, merge-on-read
    * coverage growth — flow as their row-level deltas instead, computed
    * over ONLY each commit's touched dirs
    * ([[VersionedTable.changeFeedOfCommit]]: O(rewritten data), never
    * O(table)). Compaction emits nothing (row set provably identical);
    * overwrite/rollback still refuse (or skip under skipChangeCommits).
    * The initial snapshot arrives as all-inserts; `startingVersion` gives
    * the changes-only form.
    */
  private val changeFeed = changeFeedKey.nonEmpty

  /** Trigger.AvailableNow support (the FileStreamSource shape): the trigger
    * snapshots the log's tip ONCE at query start, the run drains exactly up
    * to it and terminates, and commits landing mid-run wait for the next
    * run — the contract the pipeline capstone's restart semantics rely on.
    */
  private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = VersionedTable.latestVersion(root)

  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.map(m => ReadLimit.maxFiles(m.toInt))
      .getOrElse(ReadLimit.allAvailable())

  /** Admission control (`maxVersionsPerTrigger`, the Delta
    * maxFilesPerTrigger idea at this log's commit granularity): each
    * micro-batch advances the cursor at most N versions, so a stream
    * catching up on a long backlog — or bootstrapping with
    * `startingVersion` far behind the tip — processes it as bounded
    * batches instead of one giant one. Composes with Trigger.AvailableNow
    * (batches until the prepared cap, then terminates) and with the fresh
    * stream's initial snapshot (the snapshot lands at version
    * min(tip, N), and the walk proceeds from there).
    */
  override def latestOffset(startOffset: ConnectorOffset, limit: ReadLimit): ConnectorOffset = {
    val live = VersionedTable.latestVersion(root)
    val capped = availableNowCap.fold(live)(cap => live.map(math.min(_, cap)))
    val limited = maxVersionsPerTrigger match {
      case None => capped
      case Some(m) =>
        val base = Option(startOffset).map(o => o.json.trim.toLong)
          .orElse(startingVersion).getOrElse(0L)
        capped.map(math.min(_, base + m))
    }
    limited.map(LongOffset(_)).orNull
  }

  override val schema: StructType = {
    val base = VersionedTableSource.pinnedSchema(sqlContext, root)
    if (changeFeed)
      base.add(VersionedTableSource.changeTypeCol,
        org.apache.spark.sql.types.StringType, nullable = false)
    else base
  }

  override def getOffset: Option[Offset] =
    VersionedTable.latestVersion(root).map(LongOffset(_))

  /** Both live LongOffsets and checkpoint-restored SerializedOffsets carry
    * the version as their json body.
    */
  private def versionOf(o: Offset): Long = o.json.trim.toLong

  private def requirePinnedSchema(df: DataFrame, at: String): DataFrame = {
    val got = df.schema.map(f => (f.name, f.dataType))
    val want = schema.map(f => (f.name, f.dataType))
    if (got != want) sys.error(
      s"graft-versioned source at $root: schema changed at $at " +
        s"(stream pinned ${want.mkString(", ")}; found ${got.mkString(", ")}); " +
        "restart the stream to re-pin to the latest table schema")
    df
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = versionOf(end)
    val spark = sqlContext.sparkSession
    val batch = start.map(versionOf).orElse(startingVersion) match {
      case None =>
        // fresh stream, no startingVersion: the initial snapshot at endV
        // (in change-feed mode: the snapshot arrives as all-inserts)
        val snap = VersionedTable.read(spark, root, asOf = Some(endV))
        requirePinnedSchema(
          if (changeFeed)
            snap.withColumn(VersionedTableSource.changeTypeCol,
              org.apache.spark.sql.functions.lit("insert"))
          else snap,
          s"initial snapshot v$endV")
      case Some(s) if s >= endV =>
        // engine bookkeeping batch (restart replay of an empty range) —
        // built from the pinned schema, never a live read: the table may
        // have renamed since and an empty batch must still align
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      case Some(s) =>
        // per-commit walk of (s, endV] — one manifest parse per version;
        // each delta is that commit's appended dirs under ITS coverage
        var prev: Option[VersionedTable.Commit] =
          if (s == 0L) None
          else Some(VersionedTable.commitAt(root, s).getOrElse(
            sys.error(s"graft-versioned source at $root: version $s not in log " +
              "(vacuumed past the stream's cursor?)")))
        val parts = Seq.newBuilder[DataFrame]
        (s + 1) to endV foreach { v =>
          val c = VersionedTable.commitAt(root, v).getOrElse(
            sys.error(s"graft-versioned source at $root: version $v not in log"))
          val delta = changeFeedKey match {
            case Some(k) => VersionedTable.changeFeedOfCommit(spark, root, prev, c, k)
            case None => VersionedTable.commitDelta(spark, root, prev, c)
          }
          delta match {
            case Right(df) => parts += requirePinnedSchema(df, s"version $v")
            case Left(reason) if skipChangeCommits =>
              // Delta's skipChangeCommits: the whole commit — including any
              // rows it inserted — emits nothing; the walk resumes after it
              log.info(s"graft-versioned source at $root: skipping change commit " +
                s"v$v ($reason)")
            case Left(reason) => sys.error(
              s"graft-versioned source at $root: version $v is not append-shaped " +
                s"($reason); a streaming read cannot express it as row appends — " +
                "set readChangeFeed=true to consume it as row-level changes, " +
                "skipChangeCommits=true to skip such commits, or restart the " +
                "stream from the current snapshot")
          }
          prev = Some(c)
        }
        val dfs = parts.result()
        if (dfs.isEmpty)
          spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        else dfs.reduce(_.unionByName(_))
    }
    GraftStreamingBridge.asStreamingDf(batch)
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"VersionedTableSource[$root]"
}
