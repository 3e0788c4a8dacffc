package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}

import graft.io.VersionedTable

/** SQL front door for the versioned table's MAINTENANCE verbs, injected
  * through `SparkSessionExtensions.injectParser` (the public Catalyst
  * extension point — the same mechanism Delta uses for its OPTIMIZE /
  * VACUUM / DESCRIBE HISTORY statements):
  *
  * {{{
  *   DESCRIBE HISTORY GRAFT '<root>'
  *   OPTIMIZE GRAFT '<root>' [TARGET <n>]
  *       [WHERE <partCol> IN ('v' [, 'v']*)] [ZORDER BY (c1, c2 [, ...])]
  *   VACUUM GRAFT '<root>' RETAIN <n>
  * }}}
  *
  * The `GRAFT` keyword after the verb keeps the grammar disjoint from
  * anything Spark itself may parse now or later; every other statement
  * delegates untouched, so the parser is a pure superset. Statements
  * resolve to `LeafRunnableCommand`s — lazily executed like any Spark
  * command, driver-side by design (these are metadata verbs; the heavy
  * lifting inside compact/compactWhere is ordinary distributed Spark).
  * OPTIMIZE takes a fresh commitId per statement (SQL re-execution means
  * re-optimize, exactly Delta's semantics — idempotent retry is the
  * programmatic API's contract, not SQL's).
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseMaintenance(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(s: String): Expression = delegate.parseExpression(s)
  override def parseTableIdentifier(s: String): TableIdentifier = delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String): Seq[String] =
    delegate.parseMultipartIdentifier(s)
  override def parseTableSchema(s: String): StructType = delegate.parseTableSchema(s)
  override def parseDataType(s: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(s)
  override def parseRoutineParam(s: String): StructType = delegate.parseRoutineParam(s)
}

object GraftSqlParser {
  private val describeRe =
    """(?is)\s*DESCRIBE\s+HISTORY\s+GRAFT\s+'([^']+)'\s*;?\s*""".r
  private val vacuumRe =
    """(?is)\s*VACUUM\s+GRAFT\s+'([^']+)'\s+RETAIN\s+(\d+)\s*;?\s*""".r
  private val optimizeRe =
    """(?is)\s*OPTIMIZE\s+GRAFT\s+'([^']+)'(.*?);?\s*""".r
  private val targetRe = """(?is).*\bTARGET\s+(\d+).*""".r
  private val whereRe = """(?is).*\bWHERE\s+(\w+)\s+IN\s*\(([^)]*)\).*""".r
  private val zorderRe = """(?is).*\bZORDER\s+BY\s*\(([^)]*)\).*""".r

  def parseMaintenance(sqlText: String): Option[LogicalPlan] = sqlText match {
    case describeRe(root) => Some(GraftDescribeHistoryCommand(root))
    case vacuumRe(root, n) => Some(GraftVacuumCommand(root, n.toInt))
    case optimizeRe(root, rest) =>
      val target = rest match { case targetRe(n) => n.toInt; case _ => 32 }
      val zorder = rest match {
        case zorderRe(cs) => cs.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        case _ => Nil
      }
      val where = rest match {
        case whereRe(col, vs) =>
          Some((col, vs.split(",").map(_.trim.stripPrefix("'").stripSuffix("'"))
            .filter(_.nonEmpty).toSeq))
        case _ => None
      }
      Some(GraftOptimizeCommand(root, target, where, zorder))
    case _ => None
  }
}

case class GraftDescribeHistoryCommand(root: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("commit_id", StringType, nullable = false)(),
    AttributeReference("committed_at", LongType)(),
    AttributeReference("dirs_added", IntegerType, nullable = false)(),
    AttributeReference("dirs_removed", IntegerType, nullable = false)(),
    AttributeReference("rows_added", LongType)(),
    AttributeReference("rows_removed", LongType)(),
    AttributeReference("dv_rows_added", LongType)())

  override def run(spark: SparkSession): Seq[Row] =
    VersionedTable.describeHistory(spark, root).collect().toSeq
}

case class GraftVacuumCommand(root: String, retainLast: Int) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("removed", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] =
    VersionedTable.vacuum(root, retainLast).map(Row(_))
}

case class GraftOptimizeCommand(root: String, targetFiles: Int,
                                where: Option[(String, Seq[String])],
                                zorderBy: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("dirs_rewritten", IntegerType, nullable = false)(),
    AttributeReference("dirs_total", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val commitId = s"sql-optimize-${java.util.UUID.randomUUID().toString.take(12)}"
    where match {
      case Some((partCol, values)) =>
        require(zorderBy.isEmpty,
          "OPTIMIZE GRAFT: WHERE and ZORDER BY cannot combine (z-order applies " +
            "to flat snapshots; scoped compaction to hive-partitioned ones)")
        val (v, rw, tot) = VersionedTable.compactWhere(spark, root, commitId,
          targetFiles, partCol, values)
        Seq(Row(v, rw, tot))
      case None =>
        val before = VersionedTable.latestCommit(root)
          .map(_.dirs.size).getOrElse(0)
        val v = VersionedTable.compact(spark, root, commitId, targetFiles,
          zorderBy = zorderBy)
        Seq(Row(v, before, before))
    }
  }
}
