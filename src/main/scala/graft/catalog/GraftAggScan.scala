package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, Statistics, SupportsReportStatistics}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** The scan of a COMPLETELY PUSHED aggregation (`SupportsPushDownAggregates`
  * on [[GraftScanBuilder]]): COUNT(* | col) / MIN / MAX — optionally grouped
  * by hive partition columns — answered at PLAN TIME on the driver from
  * commit metadata, `_filestats` side files, and parquet footers
  * ([[graft.io.VersionedTable.metadataAggregate]]), with ZERO data bytes
  * read and zero Spark tasks beyond replaying the precomputed rows.
  *
  * The plan Spark builds over this scan has NO Aggregate node and NO
  * Exchange — `SELECT p, count(*) FROM t GROUP BY p` on a 100 TB table
  * becomes a driver-side metadata walk. Exactness is decided by the
  * planner, never assumed: any snapshot shape it can't prove (MOR debt,
  * DEFAULT-evolved columns, truncatable string footers, stats-less
  * blocks) plans the ordinary scan instead.
  *
  * Row layout follows Spark's pushed-aggregate contract: grouping columns
  * first, then aggregate values, one row per group, FINAL values (the
  * builder reports `supportCompletePushDown`).
  */
final class GraftAggScan(private val root: String, private val version: Long,
    private val out: StructType, private val rows: Seq[Seq[Any]],
    private val pushedDesc: String)
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = out

  override def toBatch: Batch = this

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(math.max(1L, rows.size.toLong * out.defaultSize))
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows.size.toLong)
  }

  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftAggRows(rows.map(_.toArray).toArray))

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftAggReaderFactory

  override def description(): String =
    s"GraftAggScan $root v$version groups=${rows.size} " +
      s"PushedAggregation: [$pushedDesc]"

  // value equality for exchange/subquery reuse — see GraftKeyedScan.equals
  override def equals(other: Any): Boolean = other match {
    case o: GraftAggScan =>
      root == o.root && version == o.version && out == o.out &&
        pushedDesc == o.pushedDesc
    case _ => false
  }

  override def hashCode(): Int = (root, version, out, pushedDesc).hashCode()
}

/** The precomputed result rows, shipped whole in the single partition:
  * group values ++ aggregate values as plain JVM primitives/Strings.
  */
final case class GraftAggRows(rows: Array[Array[Any]]) extends InputPartition

private final class GraftAggReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rows = p.asInstanceOf[GraftAggRows].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow =
        new GenericInternalRow(rows(i).map {
          case s: String => UTF8String.fromString(s): Any
          // path-sourced DATE group/aggregate values → internal epoch
          // days; TIMESTAMP/NTZ values → internal epoch micros
          case v => graft.io.VersionedRelation.epochDay(v)
            .map(_.toInt: Any)
            .orElse(graft.io.VersionedRelation.tsMicros(v).map(x => x: Any))
            .orElse(graft.io.VersionedRelation.ntzMicros(v).map(x => x: Any))
            .getOrElse(v)
        })
      override def close(): Unit = ()
    }
  }
}
