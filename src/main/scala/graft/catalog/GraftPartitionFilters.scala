package graft.catalog

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, StringType, TimestampNTZType, TimestampType}

/** RESIDUAL-FREE partition predicates (the public Iceberg/Hive
  * semantics): [[GraftScanBuilder.pushFilters]] CLAIMS exact filter
  * shapes over hive partition columns — `=`, `IN`, `IS [NOT] NULL` with
  * literals of the key's declared type — so Spark drops its Filter node
  * entirely. A partition column's value authority is the file PATH
  * (`col=value/`), which every planner in this engine parses exactly
  * (escaping, NULL sentinel, declared types), so unlike the
  * envelope/bloom skipping index — which is advisory — these predicates
  * can be enforced, not just hinted.
  *
  * Enforcement is then a CORRECTNESS input and happens at every scan
  * shape the builder can produce:
  *  - keyed batch: key GROUPS drop by their typed tuple ([[passes]]);
  *  - V1 fallback: a DataFrame filter over the logical columns
  *    ([[toColumn]] — era-safe: the V1 scan materializes partition
  *    values correctly per layout era);
  *  - row-coordinate scans (cow/delta): per-FILE typed key values;
  *  - metadata aggregation: per-file path values.
  * A claimed column missing from an enforcement site's key map refuses
  * LOUDLY ([[passes]]) — a partition-evolution race must never silently
  * widen a result.
  *
  * What this buys at 100 TB: the per-row Filter evaluation disappears
  * from partition-restricted scans, and — because no Filter node blocks
  * Spark's aggregate pushdown — `SELECT count(*) FROM t WHERE p = v`
  * composes with the metadata aggregation into a plan with zero data
  * tasks. Kill switch: `spark.graft.partitionFilterPushdown=false`.
  */
private[graft] object GraftPartitionFilters {

  /** Is `f` a shape we can claim over the given partition-key types
    * (LOGICAL column name → declared type)? Only literal forms whose
    * runtime class matches the declared key type exactly — a cast-bearing
    * or type-coerced predicate stays residual.
    */
  def claimable(f: Filter, keyTypes: Map[String, DataType]): Boolean = f match {
    case EqualTo(a, v)  => keyTypes.contains(a) && v != null && typed(keyTypes(a), v)
    case In(a, vs)      => keyTypes.contains(a) && vs != null &&
      vs.forall(v => v == null || typed(keyTypes(a), v))
    case IsNull(a)      => keyTypes.contains(a)
    case IsNotNull(a)   => keyTypes.contains(a)
    // RANGE claims (r18): every row of a partition shares its key value,
    // so exact per-group/per-file evaluation of a range bound IS exact
    // row semantics — [[passes]]/[[toColumn]] compare long-normalized
    // temporals and UTF-8-ordered strings, the same total order Spark's
    // own comparison uses. Claiming a range removes Spark's Filter node
    // AND unblocks metadata aggregation under range predicates
    // (COUNT(*) WHERE day >= X composes into a zero-data-task plan).
    case GreaterThan(a, v)        => keyTypes.contains(a) && v != null && typed(keyTypes(a), v)
    case GreaterThanOrEqual(a, v) => keyTypes.contains(a) && v != null && typed(keyTypes(a), v)
    case LessThan(a, v)           => keyTypes.contains(a) && v != null && typed(keyTypes(a), v)
    case LessThanOrEqual(a, v)    => keyTypes.contains(a) && v != null && typed(keyTypes(a), v)
    case _              => false
  }

  private def typed(dt: DataType, v: Any): Boolean = dt match {
    case IntegerType => v.isInstanceOf[Int]
    case LongType    => v.isInstanceOf[Long]
    case StringType  => v.isInstanceOf[String]
    // the literal's JVM class depends on spark.sql.datetime.java8API.enabled
    case DateType    => v.isInstanceOf[java.sql.Date] ||
                        v.isInstanceOf[java.time.LocalDate]
    case TimestampType => v.isInstanceOf[java.sql.Timestamp] ||
                          v.isInstanceOf[java.time.Instant]
    case TimestampNTZType => v.isInstanceOf[java.time.LocalDateTime]
    case _           => false
  }

  /** DATE values normalize to epoch day, TIMESTAMP values to epoch
    * micros, before comparison: the claimed literal arrives as
    * `java.sql.Date`/`LocalDate` or `java.sql.Timestamp`/`Instant`
    * (session java8API setting), while the hive-path parse yields the
    * java.sql flavor — plain `==` across the representations would be
    * silently false and drop every matching partition.
    */
  private def norm(v: Any): Any =
    graft.io.VersionedRelation.epochDay(v)
      .orElse(graft.io.VersionedRelation.tsMicros(v))
      .orElse(graft.io.VersionedRelation.ntzMicros(v)).getOrElse(v)

  /** Total order over normalized key values — integral widths unify to
    * long, temporals are already epoch longs after [[norm]], strings
    * compare by UTF-8 bytes (Spark's own string order). A mixed-type
    * comparison is a loud refusal: it means a derived/claimed literal
    * and the path-parsed key disagree on type, which enforcement must
    * never paper over.
    */
  private def cmp(a: Any, b: Any): Int = (norm(a), norm(b)) match {
    case (x: Long, y: Long)     => java.lang.Long.compare(x, y)
    case (x: Int, y: Int)       => Integer.compare(x, y)
    case (x: Int, y: Long)      => java.lang.Long.compare(x.toLong, y)
    case (x: Long, y: Int)      => java.lang.Long.compare(x, y.toLong)
    case (x: String, y: String) => graft.io.VersionedTable.utf8Compare(x, y)
    case (x, y) => sys.error(
      s"partition filter comparison over incompatible values $x / $y")
  }

  /** Exact evaluation of every claimed filter against one key-value map
    * (LOGICAL column name → typed value, null = NULL partition). A
    * referenced column absent from the map is a loud refusal, never a
    * pass — enforcement is a correctness input here.
    */
  def passes(claimed: Seq[Filter], kv: Map[String, Any]): Boolean = {
    def value(a: String): Any = kv.getOrElse(a, sys.error(
      s"claimed partition filter references '$a', which is not a partition " +
        "key of the scanned snapshot (partition layout changed between " +
        "planning steps) — retry the query"))
    claimed.forall {
      case EqualTo(a, v) => val k = value(a); k != null && norm(k) == norm(v)
      case In(a, vs) =>
        val k = value(a)
        k != null && vs != null && vs.exists(x => x != null && norm(x) == norm(k))
      case IsNull(a)    => value(a) == null
      case IsNotNull(a) => value(a) != null
      // range shapes carry DERIVED transform bounds (GraftTransformFilters)
      // — never claimed residual-free, but enforced/pruned exactly here
      case GreaterThan(a, v)        => val k = value(a); k != null && cmp(k, v) > 0
      case GreaterThanOrEqual(a, v) => val k = value(a); k != null && cmp(k, v) >= 0
      case LessThan(a, v)           => val k = value(a); k != null && cmp(k, v) < 0
      case LessThanOrEqual(a, v)    => val k = value(a); k != null && cmp(k, v) <= 0
      case other        => sys.error(s"unclaimable filter reached enforcement: $other")
    }
  }

  /** DataFrame-level enforcement over LOGICAL columns (the V1 fallback —
    * which materializes partition values correctly for every layout era).
    */
  def toColumn(claimed: Seq[Filter]): Column = claimed.map {
    case EqualTo(a, v) => col(a) === lit(v)
    case In(a, vs) =>
      val nn = vs.filter(_ != null).toSeq
      if (nn.isEmpty) lit(false) else col(a).isin(nn: _*)
    case IsNull(a)    => col(a).isNull
    case IsNotNull(a) => col(a).isNotNull
    case GreaterThan(a, v)        => col(a) > lit(v)
    case GreaterThanOrEqual(a, v) => col(a) >= lit(v)
    case LessThan(a, v)           => col(a) < lit(v)
    case LessThanOrEqual(a, v)    => col(a) <= lit(v)
    case other        => sys.error(s"unclaimable filter reached enforcement: $other")
  }.reduce(_ && _)
}
