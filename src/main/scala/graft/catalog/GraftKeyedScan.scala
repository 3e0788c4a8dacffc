package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, SupportsReportPartitioning}
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
final class GraftKeyedScan(spark: SparkSession, root: String,
    plan: VersionedTable.KeyedPlan, required: StructType,
    pushed: Array[Filter])
    extends Scan with Batch with SupportsReportPartitioning {

  private val keyNames: Seq[String] = plan.keySchema.fieldNames.toSeq
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
      keyNames.map(n => Expressions.identity(n)).toArray, plan.groups.size)

  override def planInputPartitions(): Array[InputPartition] = {
    // the same driver-visible seam the V1 paths feed: which columns and
    // how far the index pruned
    graft.io.VersionedRelation.lastScan = graft.io.VersionedRelation.ScanInfo(
      required.fieldNames.toSeq, 0, 0, plan.keptDirs, plan.totalDirs)
    val fullKeyConv = plan.keySchema.fields.map(f =>
      CatalystTypeConverters.createToCatalystConverter(f.dataType))
    val reqKeyIdx = reqKeyFields.map(f => keyNames.indexOf(f.name))
    plan.groups.map { g =>
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
}

object GraftKeyedScan {
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
