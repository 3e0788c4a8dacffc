package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, SupportsReportPartitioning, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch

import graft.io.VersionedTable

/** A TRUE DataSource-V2 batch over the versioned table that reports
  * `KeyGroupedPartitioning` — the public Iceberg storage-partitioned-join
  * surface, driven by Spark's OWN planner:
  *
  *  - one `InputPartition` per distinct hive key TUPLE, each implementing
  *    `HasPartitionKey` with the tuple as an `InternalRow`, so
  *    EnsureRequirements (with `spark.sql.sources.v2.bucketing.enabled`,
  *    default on in Spark 4) plans joins between two keyed scans — and
  *    aggregations above one — with ZERO Exchange: at 100 TB neither
  *    side of a key-aligned join shuffles a byte, because the hive
  *    layout already IS the clustering;
  *  - the partition-key columns are PATH-materialized: their values ride
  *    the `PartitionedFile.partitionValues` row into Spark's own parquet
  *    reader (`ParquetFileFormat.buildReaderWithPartitionValues` — the
  *    exact executor-side read path `FileSourceScanExec` uses, vectorized
  *    batches included), so the scan pays no IO for them;
  *  - dir envelopes/blooms/null-counts AND per-file footer envelopes have
  *    already pruned the file set on the driver
  *    ([[VersionedTable.keyedBatchPlan]]), and the pushable predicates
  *    are handed to the parquet reader for row-group skipping on top.
  *
  * Eligibility is decided by `keyedBatchPlan` (None → the V1 fallback
  * scan): snapshots with column DEFAULTs, MOR delete debt, mixed layout
  * eras, or non-path-round-trippable key types take the fallback, which
  * handles them all — correct-by-fallback, never correct-by-refusal.
  */
final class GraftKeyedScan(spark: SparkSession, private val root: String,
    private val plan: VersionedTable.KeyedPlan, private val required: StructType,
    private val pushed: Array[Filter])
    extends Scan with Batch with SupportsReportPartitioning
    with SupportsRuntimeFiltering {

  private val keyNames: Seq[String] = plan.keySchema.fieldNames.toSeq

  // RUNTIME FILTERING (dynamic partition pruning, the DSv2 way): the scan
  // declares its key columns filterable, and when a join's other side is
  // available at runtime (a reused broadcast, a completed subquery) Spark
  // hands back In/EqualTo filters on them — whole KEY GROUPS drop before a
  // single file opens. At 100 TB this is the difference between scanning
  // one joined-to partition and scanning the table: the classic DPP win,
  // served by Spark's own planner because the scan is a true DSv2 batch.
  // Purely an optimization — Spark re-applies every join predicate above.
  @volatile private var groups: Seq[VersionedTable.KeyedGroup] = plan.groups

  override def filterAttributes(): Array[NamedReference] =
    // only keys surviving column pruning: Spark resolves these against the
    // scan OUTPUT, and a pruned-away key cannot carry a join anyway
    keyNames.filter(n => required.fieldNames.contains(n))
      .map(n => Expressions.column(n)).toArray

  override def filter(filters: Array[Filter]): Unit = {
    // hive-path values vs runtime literals: normalize integral widths and
    // unwrap UTF8String so equality is by VALUE, not JVM class
    def norm(v: Any): Any = v match {
      case n: java.lang.Number => n.longValue
      case u: org.apache.spark.unsafe.types.UTF8String => u.toString
      case other => other
    }
    filters.foreach {
      case org.apache.spark.sql.sources.In(attr, values)
          if keyNames.contains(attr) =>
        val i = keyNames.indexOf(attr)
        val vs = values.iterator.filter(_ != null).map(norm).toSet
        groups = groups.filter(g => g.key(i) != null && vs.contains(norm(g.key(i))))
      case org.apache.spark.sql.sources.EqualTo(attr, v)
          if keyNames.contains(attr) && v != null =>
        val i = keyNames.indexOf(attr)
        groups = groups.filter(g => g.key(i) != null && norm(g.key(i)) == norm(v))
      case _ => () // unknown shapes skip: filtering is never a correctness input
    }
    GraftKeyedScan.lastRuntimeFilter = Some((plan.groups.size, groups.size))
  }

  // logical -> physical for data columns (keys are never renamed: the
  // hive guard refuses renaming a path-materialized column)
  private def physOf(logical: String): String =
    plan.nameMap.getOrElse(logical, logical)

  private val reqDataFields = required.fields.filterNot(f => keyNames.contains(f.name))
  private val reqKeyFields = required.fields.filter(f => keyNames.contains(f.name))
  // reader emits requiredData(phys) ++ requiredKeys; project back to the
  // declared readSchema order executor-side
  private val inputFields = reqDataFields ++ reqKeyFields
  private val reorder: Array[Int] = required.fields.map(f =>
    inputFields.indexWhere(_.name == f.name))

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      keyNames.map(n => Expressions.identity(n)).toArray, groups.size)

  override def planInputPartitions(): Array[InputPartition] = {
    // the same driver-visible seam the V1 paths feed: which columns and
    // how far the index pruned
    graft.io.VersionedRelation.lastScan = graft.io.VersionedRelation.ScanInfo(
      required.fieldNames.toSeq, 0, 0, plan.keptDirs, plan.totalDirs)
    val fullKeyConv = plan.keySchema.fields.map(f =>
      CatalystTypeConverters.createToCatalystConverter(f.dataType))
    val reqKeyIdx = reqKeyFields.map(f => keyNames.indexOf(f.name))
    groups.map { g =>
      val fullKey = new GenericInternalRow(
        g.key.zip(fullKeyConv).map { case (v, conv) =>
          if (v == null) null else conv(v) }.toArray[Any])
      val reqKey = new GenericInternalRow(
        reqKeyIdx.map(i => fullKey.values(i)).toArray[Any])
      GraftKeyedInputPartition(g.files, fullKey, reqKey): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val physRequired = StructType(reqDataFields.map(f =>
      f.copy(name = physOf(f.name))))
    // parquet row-group pushdown for filters whose names match the file
    // columns verbatim (no rename in play, references are data columns) —
    // purely additive: Spark re-applies every predicate above the scan
    val fileFilters: Seq[Filter] =
      if (plan.nameMap.nonEmpty) Nil
      else pushed.filter(_.references.forall(r =>
        plan.physDataSchema.fieldNames.contains(r))).toSeq
    val readFunc = new ParquetFileFormat().buildReaderWithPartitionValues(
      spark, plan.physDataSchema,
      StructType(reqKeyFields), physRequired, fileFilters,
      // row-returning mode: the reader stays vectorized inside but hands
      // back InternalRows, which the reorder projection consumes directly
      Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> "false"),
      spark.sessionState.newHadoopConfWithOptions(Map.empty))
    new GraftKeyedReaderFactory(readFunc,
      StructType(inputFields), reorder)
  }

  override def description(): String =
    s"GraftKeyedScan $root v${plan.version} keys=${keyNames.mkString(",")} " +
      s"groups=${plan.groups.size}"

  // VALUE equality on the scan's logical identity (root, pinned version,
  // projection, pushed filters) — what lets Spark's canonicalized plan
  // comparison recognize two builds of the same scan as THE SAME, which is
  // the precondition for exchange/subquery REUSE and hence for DPP: the
  // dynamic-pruning subquery duplicates the build side, and without reuse
  // AQE degenerates the runtime filter to `true`. (Iceberg's SparkScan
  // implements equals/hashCode for exactly this.) Runtime-filter state is
  // deliberately excluded: a filtered instance is the same logical scan.
  override def equals(other: Any): Boolean = other match {
    case o: GraftKeyedScan =>
      root == o.root && plan.version == o.plan.version &&
        required == o.required && pushed.toSeq == o.pushed.toSeq
    case _ => false
  }

  override def hashCode(): Int =
    (root, plan.version, required, pushed.toSeq).hashCode()
}

object GraftKeyedScan {
  /** Test seam: (groups before, groups after) of the most recent runtime
    * filter application — the driver-visible proof DPP actually pruned.
    */
  @volatile var lastRuntimeFilter: Option[(Int, Int)] = None

  /** The builder's entry: translate the pushed filters, plan the keyed
    * shape, refuse (None) anything the raw reader can't honor.
    */
  def ifEligible(spark: SparkSession, root: String, version: Option[Long],
                 required: StructType, pushed: Array[Filter]): Option[Scan] = {
    val (ranges, points, nullProbes) = graft.io.VersionedRelation.translate(pushed)
    VersionedTable.keyedBatchPlan(root, version, ranges, points, nullProbes)
      .map(p => new GraftKeyedScan(spark, root, p, required, pushed))
  }
}

/** One key group = one task: all files of one hive key tuple. */
final case class GraftKeyedInputPartition(files: Seq[(String, Long)],
    fullKey: GenericInternalRow, requiredKey: GenericInternalRow)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = fullKey
}

/** Executor-side: run Spark's own parquet read function per file (its
  * iterator yields vectorized `ColumnarBatch`es when the session config
  * allows — unwrap to rows), then reorder (data ++ keys) into the
  * declared read schema with one codegen'd `UnsafeProjection`.
  */
final class GraftKeyedReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    inputSchema: StructType, reorder: Array[Int])
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftKeyedInputPartition]
    new PartitionReader[InternalRow] {
      private val proj = UnsafeProjection.create(reorder.map(i =>
        BoundReference(i, inputSchema.fields(i).dataType, nullable = true)).toSeq)
      private var open: List[java.io.Closeable] = Nil
      private val rows: Iterator[InternalRow] =
        gp.files.iterator.flatMap { case (path, len) =>
          val it = readFunc(PartitionedFile(gp.requiredKey,
            org.apache.spark.paths.SparkPath.fromPathString(path),
            0L, len, Array.empty, 0L, len, Map.empty))
          it match {
            case c: java.io.Closeable => open ::= c
            case _ => ()
          }
          it.flatMap {
            case b: ColumnarBatch => b.rowIterator().asScala
            case r: InternalRow   => Iterator.single(r)
          }
        }
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { cur = proj(rows.next()); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = { open.foreach(_.close()); open = Nil }
    }
  }
}
