package graft.catalog

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.io.VersionedTable

/** NATIVE SQL `UPDATE` / `MERGE INTO` / row-level `DELETE` on catalog
  * tables — the public DataSource-V2 row-level-operation integration (the
  * same `SupportsRowLevelOperations` surface Iceberg registers), GROUP-based
  * copy-on-write at this table's natural group granularity: the commit DIR.
  *
  * How Spark drives it: the analyzer rewrites the DML into a `ReplaceData`
  * plan whose query computes the complete NEW content of the affected
  * groups (survivors + updated/merged rows) over [[GraftCowScan]]; the
  * optimizer's RowLevelOperationRuntimeGroupFiltering injects a dynamic
  * subquery on the scan's `_graft_dir` metadata column, so only dirs that
  * actually hold matched rows are read and rewritten — at 100 TB an UPDATE
  * touching one dir costs one dir, not the table (and when the filter
  * cannot run, the full-snapshot rewrite is merely slower, never wrong).
  * The write stages survivors under an attempt-unique data dir and
  * publishes through the same pinned-parent OCC rewrite path as every
  * programmatic copy-on-write verb — concurrent appends conflict LOUDLY
  * (an arbitrary UPDATE condition cannot prove disjointness), crash
  * debris is vacuum's age-gated orphan sweep, and the skipping index
  * rebuilds from the staged files over the table's declared columns.
  *
  * Scope (refusals are operational, with the verb that clears them):
  * snapshots with pending MOR vectors, column DEFAULTs, mixed layout eras,
  * or generated/identity/constraint declarations take the custom
  * `UPDATE/MERGE GRAFT` statements instead ([[VersionedTable.cowScanPlan]]
  * explains each). Hive-layout tables are supported: survivors are
  * written back in the SAME hive `k=v/...` layout (the per-task dynamic
  * partition writers below project the keys out of file contents exactly
  * as `partitionBy` does), so the rewritten dir is indistinguishable from
  * any other commit dir and no layout era is recorded.
  */
final class GraftRowLevelOperation(spark: SparkSession, root: String,
    cmd: Command) extends RowLevelOperation {

  @volatile private[catalog] var configuredScan: GraftCowScan = _

  override def command(): Command = cmd

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(GraftCowScan.DIR_COL))

  override def newScanBuilder(options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder with SupportsPushDownRequiredColumns {
    private val version = VersionedTable.latestVersion(root)
    private val plan = VersionedTable.cowScanPlan(root, version) match {
      case Right(p) => p
      case Left(reason) => throw new UnsupportedOperationException(
        s"$cmd on $root cannot take the DSv2 copy-on-write path: $reason")
    }
    private val inv = plan.nameMap.map(_.swap)
    private val logicalFull = StructType(
      plan.physSchema.fields.map(f => f.copy(name = inv.getOrElse(f.name, f.name))) :+
        StructField(GraftCowScan.DIR_COL, StringType, nullable = false))
    private var required: StructType = logicalFull

    override def pruneColumns(requiredSchema: StructType): Unit =
      required = StructType(logicalFull.fields.filter(f =>
        requiredSchema.fieldNames.contains(f.name)))

    override def build(): Scan = {
      val scan = new GraftCowScan(spark, root,
        version.getOrElse(sys.error(s"$cmd on $root: empty table")), plan, required)
      configuredScan = scan
      scan
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new GraftCowWrite(spark, root, GraftRowLevelOperation.this, info,
          cmd.toString.toLowerCase(java.util.Locale.ROOT))
    }

  override def description(): String = s"GraftRowLevelOperation $cmd $root"
}

/** The row-level scan: every live file of the pinned snapshot, one
  * InputPartition per file TAGGED with its dir — the group key Spark's
  * runtime group filter prunes on (`SupportsRuntimeFiltering` over the
  * `_graft_dir` metadata column). Reading reuses the keyed-batch reader:
  * hive key values (and the dir tag) ride `PartitionedFile.partitionValues`
  * into Spark's own vectorized parquet path, costing zero IO.
  */
final class GraftCowScan(spark: SparkSession, private val root: String,
    private[catalog] val version: Long, plan: VersionedTable.CowPlan,
    private val required: StructType)
    extends Scan with Batch with SupportsRuntimeFiltering
    with SupportsReportStatistics {

  import GraftCowScan.DIR_COL

  @volatile private var files: Seq[VersionedTable.CowFile] = plan.files

  /** The GROUPS the write must replace: the dirs this scan still reads
    * after runtime group filtering (all of them when the filter never ran
    * — a full rewrite, correct by construction).
    */
  private[catalog] def survivingDirs: Seq[String] = files.map(_.dir).distinct

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(DIR_COL))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case org.apache.spark.sql.sources.In(DIR_COL, values) =>
      val keep = values.iterator.filter(_ != null).map(String.valueOf).toSet
      files = files.filter(f => keep.contains(f.dir))
    case org.apache.spark.sql.sources.EqualTo(DIR_COL, v) if v != null =>
      files = files.filter(_.dir == String.valueOf(v))
    case _ => () // unknown shapes skip: group filtering is an optimization
  }

  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = math.max(1L, files.map(_.len).sum)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }

  private def physOf(logical: String): String =
    plan.nameMap.getOrElse(logical, logical)
  private val keyNames = plan.keyFields.map(_.name)
  private val reqData = required.fields.filter(f =>
    !keyNames.contains(f.name) && f.name != DIR_COL)
  // the reader appends the FULL partition schema (hive keys + dir tag) to
  // each row; project back to the declared read-schema order
  private val partFields = plan.keyFields :+
    StructField(DIR_COL, StringType, nullable = false)
  private val inputFields = reqData ++ partFields
  private val reorder: Array[Int] = required.fields.map(f =>
    inputFields.indexWhere(_.name == f.name))

  override def planInputPartitions(): Array[InputPartition] = {
    val conv = plan.keyFields.map(f =>
      CatalystTypeConverters.createToCatalystConverter(f.dataType))
    files.map { f =>
      val vals = f.keyVals.zip(conv).map { case (v, c) =>
        if (v == null) null else c(v) } :+
        org.apache.spark.unsafe.types.UTF8String.fromString(f.dir)
      GraftKeyedInputPartition(Seq((f.path, f.len)),
        new GenericInternalRow(vals.toArray[Any]),
        new GenericInternalRow(vals.toArray[Any])): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val physDataSchema = StructType(plan.physSchema.fields.filterNot(f =>
      keyNames.contains(f.name)))
    val physRequired = StructType(reqData.map(f => f.copy(name = physOf(f.name))))
    val readFunc = new ParquetFileFormat().buildReaderWithPartitionValues(
      spark, physDataSchema, StructType(partFields), physRequired, Nil,
      Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> "false"),
      spark.sessionState.newHadoopConfWithOptions(Map.empty))
    new GraftKeyedReaderFactory(readFunc, StructType(inputFields), reorder)
  }

  override def description(): String =
    s"GraftCowScan $root v$version files=${plan.files.size}"
}

object GraftCowScan {
  /** The metadata column carrying each row's commit dir — the rewrite
    * GROUP. Declared by the table (SupportsMetadataColumns), requested by
    * the operation (requiredMetadataAttributes), filtered at runtime.
    */
  val DIR_COL = "_graft_dir"

  /** The DST-safe TIMESTAMP partition-path spelling — identical to the
    * `date_format` pattern `VersionedTable.dstSafePartitions` applies on
    * every DataFrame-level hive write, so paths are byte-identical no
    * matter which writer produced them.
    */
  val DstSafeTsFormat: java.time.format.DateTimeFormatter =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSSxxx")
}

/** Hadoop Configuration is not Serializable; this is the standard Writable
  * round-trip wrapper every connector carries.
  */
final class GraftSerializableConf(@transient private var conf: Configuration)
    extends Serializable {
  def value: Configuration = conf
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new Configuration(false)
    conf.readFields(in)
  }
}

/** The copy-on-write WRITE half: tasks stream the ReplaceData query's rows
  * through Spark's own parquet OutputWriter into an attempt-unique staging
  * dir (files named per task ATTEMPT — a speculative retry can never
  * collide); commit() keeps exactly the files of COMMITTED tasks (stray
  * attempt debris is deleted before publication — a dir-granular manifest
  * makes every file in a published dir table data, so the registry prune
  * is load-bearing) and publishes one pinned-parent OCC rewrite of the
  * scan's surviving groups.
  */
final class GraftCowWrite(spark: SparkSession, root: String,
    op: GraftRowLevelOperation, info: LogicalWriteInfo, mode: String)
    extends Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {

  override def description(): String = s"GraftCowWrite $mode $root"

  /** Write placement, OPT-IN like the engine path's: a table that declared
    * 'graft.write.clusterByKeys' clusters its CoW rewrites by the hive
    * keys (one file per key, not per (key, task)), and a declared
    * `graft.write.orderedBy` adds a per-task sort so the rewritten
    * region's files keep tight envelopes. Both ADVISORY — Spark may skip
    * the exchange when the plan already satisfies it; correctness never
    * depends on placement. Tables declaring neither keep their previous
    * plans exactly (unspecified distribution, no sort).
    */
  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution = {
    val c = graft.io.VersionedTable.latestCommit(root)
    val partCols = c.map(_.partitionCols).getOrElse(Nil)
      .filter(info.schema().fieldNames.contains)
    val optIn = c.exists(_.props.get("graft.write.clusterByKeys").contains("true"))
    if (!optIn || partCols.isEmpty || info.schema().isEmpty)
      org.apache.spark.sql.connector.distributions.Distributions.unspecified()
    else org.apache.spark.sql.connector.distributions.Distributions.clustered(
      partCols.map(col =>
        org.apache.spark.sql.connector.expressions.Expressions.column(col):
          org.apache.spark.sql.connector.expressions.Expression).toArray)
  }

  override def distributionStrictlyRequired(): Boolean = false

  override def requiredOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    if (info.schema().isEmpty) return Array.empty
    val c = graft.io.VersionedTable.latestCommit(root)
    val order = c.map(x => graft.io.VersionedTable.writeOrderOf(x.props)).getOrElse(Nil)
    if (order.isEmpty) Array.empty
    else {
      val partCols = c.map(_.partitionCols).getOrElse(Nil)
      val fields = info.schema().fieldNames.toSet
      import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
      (partCols.map((_, true)) ++ order.filterNot(o => partCols.contains(o._1)))
        .filter(o => fields.contains(o._1))
        .map { case (cn, asc) => Expressions.sort(Expressions.column(cn),
          if (asc) SortDirection.ASCENDING else SortDirection.DESCENDING) }
        .toArray
    }
  }

  override def toBatch: BatchWrite = new BatchWrite {
    private val scan = {
      val s = op.configuredScan
      require(s != null, s"row-level $mode on $root: write built before its scan")
      s
    }
    private val commitId = s"catalog-$mode-${info.queryId()}"
    private val staged = VersionedTable.newAttemptDataDir(root, scan.version + 1, commitId)
    // derive the write layout from the SAME pinned snapshot the scan read —
    // a rename/layout change racing in between would otherwise make the
    // staged files incoherent with the version the publish pins (the OCC
    // rebase refuses such races loudly either way; this keeps the staged
    // bytes correct-by-construction)
    private val snapshot = graft.io.VersionedTable.commitAt(root, scan.version)
    private val partitionCols = snapshot.map(_.partitionCols).getOrElse(Nil)
    // the write receives LOGICAL column names; files store PHYSICAL ones
    // (hive keys are never renamed — the rename guard refuses them)
    private val nameMap = snapshot.map(_.nameMap).getOrElse(Map.empty)
    private val keyIdx: Array[Int] =
      partitionCols.map(k => info.schema().fieldIndex(k)).toArray
    private val fileSchema = StructType(info.schema().fields.zipWithIndex
      .filterNot { case (_, i) => keyIdx.contains(i) }
      .map { case (f, _) => f.copy(name = nameMap.getOrElse(f.name, f.name)) })

    override def createBatchWriterFactory(pInfo: PhysicalWriteInfo): DataWriterFactory = {
      val dir = new java.io.File(s"$root/$staged")
      dir.mkdirs()
      val conf = spark.sessionState.newHadoopConfWithOptions(Map.empty)
      val job = Job.getInstance(conf)
      val owFactory = new ParquetFileFormat().prepareWrite(
        spark, job, Map.empty, fileSchema)
      new GraftCowWriterFactory(dir.getAbsolutePath, info.schema(), fileSchema,
        partitionCols.toArray, keyIdx, owFactory,
        new GraftSerializableConf(job.getConfiguration),
        snapshot.map(VersionedTable.compileRowGuards(spark, _, info.schema()))
          .getOrElse(VersionedTable.RowWriteGuards(Nil, None)))
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val kept = messages.flatMap {
        case GraftCowCommitMessage(files) => files
      }.toSet
      val dir = new java.io.File(s"$root/$staged")
      // prune failed-attempt debris: a dir-granular manifest makes EVERY
      // file in a published dir table data, so only COMMITTED tasks'
      // files may survive — the registry prune is load-bearing
      def walk(f: java.io.File, rel: String): Unit =
        Option(f.listFiles()).getOrElse(Array.empty).foreach { c =>
          val r = if (rel.isEmpty) c.getName else s"$rel/${c.getName}"
          if (c.isDirectory) { walk(c, r); if (Option(c.list()).forall(_.isEmpty)) c.delete() }
          else if (!kept.contains(r)) c.delete()
        }
      walk(dir, "")
      val stagedOpt =
        if (kept.isEmpty) { dir.delete(); None } else Some(staged)
      VersionedTable.publishCowRewrite(spark, root, scan.version,
        scan.survivingDirs, stagedOpt, mode, commitId)
      ()
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      val dir = new java.io.File(s"$root/$staged")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
  }
}

final case class GraftCowCommitMessage(files: Seq[String])
    extends WriterCommitMessage

/** Per-task DYNAMIC-PARTITION writer (the FileFormatWriter idea, sized for
  * this path): rows route to one open OutputWriter per hive key tuple
  * (`k=v/...` subpaths, values hive-escaped, NULL → the default-partition
  * sentinel), key columns projected OUT of the file contents exactly as
  * `partitionBy` writes them. Files are named per task ATTEMPT, so a
  * speculative retry can never collide; the driver's commit-time registry
  * prune keeps only committed attempts' files.
  *
  * `guards` carry the snapshot's CHECK constraints (violating row → the
  * task throws, naming the constraint, BEFORE anything publishes) and
  * GENERATED-column recompute projection ([[VersionedTable.compileRowGuards]])
  * — applied to every row FIRST, so a generated partition key routes by
  * its recomputed value.
  */
final class GraftCowWriterFactory(stagedAbs: String, rowSchema: StructType,
    fileSchema: StructType, partitionCols: Array[String], keyIdx: Array[Int],
    owFactory: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    conf: GraftSerializableConf,
    guards: VersionedTable.RowWriteGuards = VersionedTable.RowWriteGuards(Nil, None))
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val writers = scala.collection.mutable.Map[String,
        (org.apache.spark.sql.execution.datasources.OutputWriter, String)]()
      private val dataProj = UnsafeProjection.create(
        rowSchema.fields.indices.filterNot(keyIdx.contains)
          .map(i => BoundReference(i, rowSchema.fields(i).dataType, nullable = true)))
      private val rewriteProj: UnsafeProjection =
        guards.rewrite.map(es => UnsafeProjection.create(es)).orNull
      // CHECK semantics: a row VIOLATES only when the expression evaluates
      // exactly FALSE (NULL passes, like every SQL engine's CHECK)
      private val checks = guards.constraints.map { case (n, sql, e) =>
        (n, sql, org.apache.spark.sql.catalyst.expressions.Predicate.create(
          org.apache.spark.sql.catalyst.expressions.EqualNullSafe(e,
            org.apache.spark.sql.catalyst.expressions.Literal(false,
              org.apache.spark.sql.types.BooleanType))))
      }
      private val attempt =
        Option(TaskContext.get()).map(_.taskAttemptId()).getOrElse(taskId)

      private def keyString(row: InternalRow, i: Int): String =
        rowSchema.fields(i).dataType match {
          case org.apache.spark.sql.types.LongType => String.valueOf(row.getLong(i))
          case org.apache.spark.sql.types.IntegerType => String.valueOf(row.getInt(i))
          // ISO yyyy-MM-dd — exactly how partitionBy spells DATE values,
          // and the exact round trip of hivePartValue's Date.valueOf
          case org.apache.spark.sql.types.DateType =>
            java.time.LocalDate.ofEpochDay(row.getInt(i).toLong).toString
          // OFFSET-SUFFIXED session-zone rendering — the DST-safe spelling
          // every engine hive write uses (VersionedTable.dstSafePartitions):
          // two distinct instants in a fall-back hour format identically
          // as plain local strings, so the offset disambiguates; the parse
          // side (hivePartValue / Spark's own inference) reads offsets
          // exactly
          case org.apache.spark.sql.types.TimestampType =>
            java.time.ZonedDateTime.ofInstant(
              org.apache.spark.sql.catalyst.util.DateTimeUtils
                .microsToInstant(row.getLong(i)),
              java.time.ZoneId.of(
                org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
              .format(GraftCowScan.DstSafeTsFormat)
          // NTZ spells zone-free: format the local datetime directly —
          // the exact inverse of hivePartValue's NTZ parse
          case org.apache.spark.sql.types.TimestampNTZType =>
            org.apache.spark.sql.catalyst.util.TimestampFormatter
              .getFractionFormatter(java.time.ZoneOffset.UTC)
              .format(org.apache.spark.sql.catalyst.util.DateTimeUtils
                .microsToLocalDateTime(row.getLong(i)))
          case _ => row.getUTF8String(i).toString
        }

      private def subPathOf(row: InternalRow): String =
        keyIdx.indices.map { j =>
          val i = keyIdx(j)
          if (row.isNullAt(i)) s"${partitionCols(j)}=__HIVE_DEFAULT_PARTITION__"
          else org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .getPartitionPathString(partitionCols(j), keyString(row, i))
        }.mkString("/")

      override def write(record0: InternalRow): Unit = {
        val record = if (rewriteProj != null) rewriteProj(record0) else record0
        checks.foreach { case (n, sql, p) =>
          if (p.eval(record)) throw new IllegalArgumentException(
            s"row-level write: CHECK constraint '$n' ($sql) violated by a " +
              "written row — statement refused, nothing published")
        }
        val sub = if (keyIdx.isEmpty) "" else subPathOf(record)
        val (w, _) = writers.getOrElseUpdate(sub, {
          val name = f"part-$partitionId%05d-$attempt-${UUID.randomUUID.toString.take(8)}.parquet"
          val rel = if (sub.isEmpty) name else s"$sub/$name"
          val abs = s"$stagedAbs/$rel"
          new java.io.File(abs).getParentFile.mkdirs()
          val ctx = new TaskAttemptContextImpl(conf.value,
            new TaskAttemptID("graft", 0, TaskType.MAP, partitionId,
              (attempt % Int.MaxValue).toInt))
          (owFactory.newInstance(abs, fileSchema, ctx), rel)
        })
        w.write(dataProj(record))
      }

      override def commit(): WriterCommitMessage = {
        writers.values.foreach(_._1.close())
        GraftCowCommitMessage(writers.values.map(_._2).toSeq)
      }

      override def abort(): Unit = writers.values.foreach { case (w, rel) =>
        w.close()
        new java.io.File(s"$stagedAbs/$rel").delete()
        ()
      }

      override def close(): Unit = ()
    }
}
