package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, Partitioning}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan}

import graft.io.VersionedTable

/** STORAGE-PARTITIONED JOIN over the versioned table (the public Iceberg
  * SPJ idea, via Catalyst's planner-strategy extension point):
  *
  *   SELECT ... FROM graft_copart('<rootA>', '<key>', n) a
  *   JOIN graft_copart('<rootB>', '<key>', n) b ON a.key = b.key
  *
  * Each TVF resolves to [[GraftCoPartitionedRelation]], planned by
  * [[GraftCoPartitionStrategy]] into [[GraftCoPartitionedScanExec]] — a
  * leaf whose RDD has exactly `n` partitions, slot `i` holding precisely
  * the rows whose key hashes to `i` under Spark's own
  * `HashPartitioning.partitionIdExpression` (the slot assignment is that
  * catalyst expression, evaluated driver-side per hive partition VALUE,
  * so the declared partitioning is bit-exact by construction). Because
  * the scan TRUTHFULLY reports `HashPartitioning(key, n)`,
  * EnsureRequirements plans the join with ZERO Exchange on either side:
  * at 100 TB neither table shuffles a byte — the hive layout already IS
  * the clustering, exactly what Iceberg's storage-partitioned join
  * exploits through DSv2 `KeyGroupedPartitioning`.
  *
  * The execution model is one task per slot, each reading its values'
  * `key=v` subtrees (parallelism = n; value skew maps to slot skew — the
  * same trade SPJ makes everywhere, and the reason `n` is caller-chosen).
  * The snapshot VERSION is pinned at analysis, so a concurrent commit
  * between planning and execution cannot change the file set.
  */
case class GraftCoPartitionedRelation(output: Seq[Attribute], root: String,
    keyCol: String, numSlots: Int, version: Long,
    pruned: Boolean = false) extends LeafNode {
  // a co-partitioned scan exists to be JOINED co-located; advertising a
  // small size would let the planner broadcast it instead, silently
  // discarding the zero-exchange property — so never broadcast-eligible
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = BigInt(Long.MaxValue) / 16)
}

/** Column pruning for the co-partitioned scan: a Project of plain
  * attributes over the relation NARROWS the relation itself (key always
  * kept — the declared HashPartitioning references it), so each slot's
  * parquet scans read only the needed columns. At 100 TB the SPJ's win
  * is skipping the shuffle; without this rule it would pay the other
  * classic cost instead — reading every column of a wide table.
  */
object GraftCoPartitionPruning
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case p @ Project(projList, g: GraftCoPartitionedRelation)
        if !g.pruned && projList.forall(_.isInstanceOf[AttributeReference]) &&
          projList.size < g.output.size =>
      val wanted = projList.map(_.name).toSet + g.keyCol
      val kept = g.output.filter(a => wanted.contains(a.name))
      p.copy(child = g.copy(output = kept, pruned = true))
  }
}

case class GraftCoPartitionedScanExec(output: Seq[Attribute], root: String,
    keyCol: String, numSlots: Int, version: Long) extends LeafExecNode {
  override def outputPartitioning: Partitioning =
    HashPartitioning(Seq(output.find(_.name == keyCol).getOrElse(
      sys.error(s"graft_copart: key '$keyCol' not in output"))), numSlots)

  override protected def doExecute(): RDD[InternalRow] = {
    val spark = SparkSession.active
    val (_, _, thunks) = VersionedTable.coPartitionedSlotScans(
      spark, root, keyCol, numSlots, asOf = Some(version))
    val rdds = thunks.map { t =>
      val df0 = t()
      // pruned relation: narrow each slot's scan to the surviving columns
      // (the select collapses into the parquet ReadSchema)
      val df = if (df0.columns.sameElements(output.map(_.name))) df0
               else df0.select(
                 output.map(a => org.apache.spark.sql.functions.col(a.name)): _*)
      val r = df.queryExecution.toRdd
      r.getNumPartitions match {
        case 0 => spark.sparkContext.parallelize(Seq.empty[InternalRow], 1)
        case 1 => r
        case _ => r.coalesce(1) // merge a slot's scans without moving rows
      }
    }
    spark.sparkContext.union(rdds)
  }

  override def simpleString(maxFields: Int): String =
    s"GraftCoPartitionedScan $root key=$keyCol slots=$numSlots v$version"
}

object GraftCoPartitionStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GraftCoPartitionedRelation =>
      GraftCoPartitionedScanExec(g.output, g.root, g.keyCol, g.numSlots, g.version) :: Nil
    case _ => Nil
  }
}
