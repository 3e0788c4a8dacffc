package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CharNgrams, FloatDotProduct, HilbertIndex, PortableHllAgg, SortedOverlapCount, WordNgrams}

/** Library entry point for `spark.sql.extensions=graft.plans.GraftExtensions`:
  * injects graft's native expressions into every session built on the
  * context, so users get `float_dot` / `portable_hll` without calling a
  * register method. (The per-session `ArrayOps.register` path remains for
  * sessions built without the config; both are idempotent.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
      (exprs: Seq[Expression]) => FloatDotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("portable_hll"),
      new ExpressionInfo(classOf[PortableHllAgg].getName, "portable_hll"),
      (exprs: Seq[Expression]) => PortableHllAgg(exprs(0), p = 6)))
    ext.injectFunction((
      FunctionIdentifier("sorted_overlap"),
      new ExpressionInfo(classOf[SortedOverlapCount].getName, "sorted_overlap"),
      (exprs: Seq[Expression]) => SortedOverlapCount(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[CharNgrams].getName, "char_ngrams"),
      (exprs: Seq[Expression]) => CharNgrams(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (exprs: Seq[Expression]) => WordNgrams(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("hilbert_index"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "hilbert_index"),
      (exprs: Seq[Expression]) => HilbertIndex(exprs(0))))
    // SQL READ front door: snapshot / time-travel / change-feed relations
    // as table-valued functions — `FROM graft_table('<root>' [, v|ts])`,
    // `FROM graft_changes('<root>', from, to, '<key>')`. Resolves at
    // analysis to the exact plan the Scala read returns, so pushdown,
    // pruning, and MOR delete application all still apply.
    ext.injectTableFunction((
      FunctionIdentifier("graft_table"),
      new ExpressionInfo(GraftTableFunctions.getClass.getName, "graft_table"),
      (exprs: Seq[Expression]) => GraftTableFunctions.graftTable(exprs)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_changes"),
      new ExpressionInfo(GraftTableFunctions.getClass.getName, "graft_changes"),
      (exprs: Seq[Expression]) => GraftTableFunctions.graftChanges(exprs)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_history"),
      new ExpressionInfo(GraftTableFunctions.getClass.getName, "graft_history"),
      (exprs: Seq[Expression]) => GraftTableFunctions.graftHistory(exprs)))
    // storage-partitioned join: graft_copart('<root>', '<key>', n) scans
    // declare HashPartitioning(key, n) truthfully (hive layout = the
    // clustering), so joins of two plan with zero Exchange — the Iceberg
    // SPJ idea via the planner-strategy extension point
    ext.injectTableFunction((
      FunctionIdentifier("graft_copart"),
      new ExpressionInfo(GraftTableFunctions.getClass.getName, "graft_copart"),
      (exprs: Seq[Expression]) => GraftTableFunctions.graftCopart(exprs)))
    ext.injectPlannerStrategy(_ => GraftCoPartitionStrategy)
    ext.injectOptimizerRule(_ => GraftCoPartitionPruning)
    // SQL front door for the versioned table's maintenance verbs
    // (DESCRIBE HISTORY / OPTIMIZE / VACUUM ... GRAFT '<root>'); every
    // other statement delegates untouched — a pure grammar superset
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
  }
}
