package graft.catalog

import java.time.{Instant, LocalDate, LocalDateTime, ZoneId, ZonedDateTime}
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, IsNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, StringType, TimestampNTZType, TimestampType}

/** TRANSFORM-AWARE partition pruning for hidden layouts — the second half
  * of the Iceberg contract: a user who writes `WHERE ts >= X` against a
  * `PARTITIONED BY (days(ts))` table never mentions `ts_day`, yet whole
  * partition directories must still drop. This module DERIVES
  * partition-key predicates from raw-source-column predicates by
  * recognizing the exact generation SQL [[GraftTransforms.desugar]]
  * emits (the strings are engine-authored, so recognition is a closed
  * set, not SQL parsing) and evaluating the transform on the literal at
  * the driver:
  *
  *   ts >= X          →  ts_day  >= days(X)         (monotone family)
  *   ts =  X          →  ts_day  =  days(X)
  *   id =  k          →  id_bucket = pmod(hash(k), n)
  *   s  >= 'ab…'      →  s_trunc >= substr('ab…')   (prefix order-preserving)
  *
  * Soundness: every derived predicate is IMPLIED by the raw predicate it
  * came from, and the raw predicate itself stays RESIDUAL (Spark keeps
  * its own Filter above the scan), so a derived prune can only drop
  * files whose rows could never match — dropping a group is always safe,
  * keeping one is never wrong. Strict bounds therefore derive to their
  * INCLUSIVE transform bound (ts > X still admits X's own day — rows
  * inside the boundary day are re-filtered by Spark), and any literal
  * whose JVM class does not match the source type derives nothing.
  * Time transforms on TIMESTAMP sources evaluate in the session zone —
  * exactly the zone Spark's date_trunc/year bound at analysis time.
  *
  * The derived predicates ride the builder's `claimed` set into every
  * enforcement/prune site (key-group drop, per-file key check, V1
  * DataFrame filter) — all of which evaluate them EXACTLY on parsed
  * path values — but are never returned to Spark as accepted, so they
  * change which files are read and nothing about query semantics.
  */
private[graft] object GraftTransformFilters {

  private sealed trait Xf {
    def key: String
    def src: String
    /** Transform the raw literal; None = class/type mismatch, skip. */
    def apply(v: Any): Option[Any]
    /** Order-preserving in the source ordering (admits range derivation)? */
    def monotone: Boolean
    /** transform(null) IS NULL (admits IsNull/IsNotNull derivation)? */
    def nullPreserving: Boolean = true
  }

  private def instantOf(v: Any): Option[Instant] = v match {
    case t: java.sql.Timestamp => Some(t.toInstant)
    case i: Instant            => Some(i)
    case _                     => None
  }
  private def dateOf(v: Any): Option[LocalDate] = v match {
    case d: java.sql.Date => Some(d.toLocalDate)
    case l: LocalDate     => Some(l)
    case _                => None
  }
  private def ntzOf(v: Any): Option[LocalDateTime] = v match {
    case l: LocalDateTime => Some(l)
    case _                => None
  }

  private final case class DaysTs(key: String, src: String, zone: ZoneId) extends Xf {
    def apply(v: Any): Option[Any] =
      instantOf(v).map(i => ZonedDateTime.ofInstant(i, zone).toLocalDate)
    def monotone = true
  }
  private final case class DaysNtz(key: String, src: String) extends Xf {
    def apply(v: Any): Option[Any] = ntzOf(v).map(_.toLocalDate)
    def monotone = true
  }
  private final case class DaysDate(key: String, src: String) extends Xf {
    def apply(v: Any): Option[Any] = dateOf(v)
    def monotone = true
  }
  private final case class HoursTs(key: String, src: String, zone: ZoneId) extends Xf {
    def apply(v: Any): Option[Any] = instantOf(v).map(i =>
      ZonedDateTime.ofInstant(i, zone).truncatedTo(ChronoUnit.HOURS).toInstant)
    def monotone = true
  }
  private final case class HoursNtz(key: String, src: String) extends Xf {
    def apply(v: Any): Option[Any] = ntzOf(v).map(_.truncatedTo(ChronoUnit.HOURS))
    def monotone = true
  }
  private final case class MonthsTs(key: String, src: String, zone: ZoneId) extends Xf {
    def apply(v: Any): Option[Any] =
      instantOf(v).map(i => ZonedDateTime.ofInstant(i, zone).toLocalDate.withDayOfMonth(1))
    def monotone = true
  }
  private final case class MonthsZoneFree(key: String, src: String) extends Xf {
    def apply(v: Any): Option[Any] =
      dateOf(v).orElse(ntzOf(v).map(_.toLocalDate)).map(_.withDayOfMonth(1))
    def monotone = true
  }
  private final case class Years(key: String, src: String, zone: ZoneId) extends Xf {
    def apply(v: Any): Option[Any] =
      instantOf(v).map(i => ZonedDateTime.ofInstant(i, zone).getYear)
        .orElse(dateOf(v).map(_.getYear)).orElse(ntzOf(v).map(_.getYear))
    def monotone = true
  }
  private final case class Bucket(key: String, src: String, n: Int,
                                  srcType: DataType) extends Xf {
    def apply(v: Any): Option[Any] = {
      import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
      // Spark's hash(col) = Murmur3 seed 42 over the INTERNAL value,
      // narrowed to int — the exact function the generation SQL applies
      val internal: Option[(Any, DataType)] = (srcType, v) match {
        case (LongType, x: Long)      => Some((x, LongType))
        case (IntegerType, x: Int)    => Some((x, IntegerType))
        case (StringType, x: String)  =>
          Some((org.apache.spark.unsafe.types.UTF8String.fromString(x), StringType))
        case _                        => None
      }
      internal.map { case (x, dt) =>
        val h = Murmur3HashFunction.hash(x, dt, 42L).toInt
        ((h % n) + n) % n
      }
    }
    def monotone = false
    // hash(NULL) folds to the seed, not NULL — a NULL source row lands in
    // a REAL bucket, so null probes must not derive
    override def nullPreserving = false
  }
  private final case class TruncLong(key: String, src: String, w: Long) extends Xf {
    def apply(v: Any): Option[Any] = v match {
      case x: Long => Some(x - java.lang.Math.floorMod(x, w))
      case _       => None
    }
    def monotone = true
  }
  private final case class TruncInt(key: String, src: String, w: Int) extends Xf {
    def apply(v: Any): Option[Any] = v match {
      case x: Int => Some(x - java.lang.Math.floorMod(x, w))
      case _      => None
    }
    def monotone = true
  }
  private final case class TruncStr(key: String, src: String, w: Int) extends Xf {
    def apply(v: Any): Option[Any] = v match {
      // CODE-POINT semantics, exactly Spark's substring (UTF8String
      // substringSQL), not Java's UTF-16 substring
      case x: String => Some(org.apache.spark.unsafe.types.UTF8String
        .fromString(x).substringSQL(1, w).toString)
      case _ => None
    }
    def monotone = true // prefix truncation preserves binary string order
  }

  // recognition patterns — EXACTLY the strings GraftTransforms.desugar emits
  private val reDaysTs    = """CAST\(date_trunc\('DAY', (\w+)\) AS DATE\)""".r
  private val reDaysFree  = """CAST\((\w+) AS DATE\)""".r
  private val reHoursTs   = """date_trunc\('HOUR', (\w+)\)""".r
  private val reHoursNtz  = ("""make_timestamp_ntz\(year\((\w+)\), month\(\1\), """ +
    """day\(\1\), hour\(\1\), 0, 0\)""").r
  private val reMonthsTs  = """CAST\(date_trunc\('MONTH', (\w+)\) AS DATE\)""".r
  private val reMonthsFree = """make_date\(year\((\w+)\), month\(\1\), 1\)""".r
  private val reYears     = """year\((\w+)\)""".r
  private val reBucket    = """pmod\(hash\((\w+)\), (\d+)\)""".r
  private val reTruncStr  = """substring\((\w+), 1, (\d+)\)""".r
  private val reTruncLong = """(\w+) - pmod\(\1, (\d+)L\)""".r
  private val reTruncInt  = """(\w+) - pmod\(\1, (\d+)\)""".r

  /** Recognize one partition column's generation SQL as a known
    * transform. Unrecognized expressions (user-authored GENERATED
    * columns) derive nothing — pruning is an optimization here.
    */
  private def recognize(key: String, sql: String, zone: ZoneId,
                        srcType: String => Option[DataType]): Option[Xf] =
    sql match {
      case reDaysTs(s)      => Some(DaysTs(key, s, zone))
      case reDaysFree(s)    => srcType(s) match {
        case Some(TimestampNTZType) => Some(DaysNtz(key, s))
        case Some(DateType)         => Some(DaysDate(key, s))
        case _                      => None
      }
      case reHoursTs(s)     => Some(HoursTs(key, s, zone))
      case reHoursNtz(s)    => Some(HoursNtz(key, s))
      case reMonthsTs(s)    => Some(MonthsTs(key, s, zone))
      case reMonthsFree(s)  => Some(MonthsZoneFree(key, s))
      case reYears(s)       => Some(Years(key, s, zone))
      case reBucket(s, n)   =>
        srcType(s).map(dt => Bucket(key, s, n.toInt, dt))
      case reTruncStr(s, w)  => Some(TruncStr(key, s, w.toInt))
      case reTruncLong(s, w) => Some(TruncLong(key, s, w.toLong))
      case reTruncInt(s, w)  => Some(TruncInt(key, s, w.toInt))
      case _ => None
    }

  /** Derive partition-key predicates from the residual raw-column
    * predicates of one scan, against one pinned snapshot. `partitionCols`
    * and `generated` come from the snapshot (single-era, rename-free —
    * the caller gates); `schema` types the source columns; `zone` is the
    * session zone the generation expressions were bound under.
    */
  def derive(filters: Seq[Filter], partitionCols: Seq[String],
             generated: Map[String, String],
             schema: org.apache.spark.sql.types.StructType,
             zone: ZoneId): Seq[Filter] = {
    def srcType(n: String): Option[DataType] =
      schema.fields.find(_.name == n).map(_.dataType)
    val xfs: Seq[Xf] = partitionCols.flatMap(p =>
      generated.get(p).flatMap(recognize(p, _, zone, srcType)))
    if (xfs.isEmpty) return Nil
    val bySrc: Map[String, Seq[Xf]] = xfs.groupBy(_.src)
    filters.flatMap {
      case EqualTo(a, v) if v != null => bySrc.getOrElse(a, Nil).flatMap(x =>
        x(v).map(EqualTo(x.key, _)))
      case In(a, vs) if vs != null && vs.nonEmpty =>
        bySrc.getOrElse(a, Nil).flatMap { x =>
          val keys = vs.filter(_ != null).map(x(_))
          // every non-null literal must transform, or the derived IN
          // would silently narrow
          if (keys.isEmpty || keys.exists(_.isEmpty)) None
          else Some(In(x.key, keys.map(_.get).distinct))
        }
      case GreaterThan(a, v) if v != null =>
        bySrc.getOrElse(a, Nil).filter(_.monotone).flatMap(x =>
          x(v).map(GreaterThanOrEqual(x.key, _)))
      case GreaterThanOrEqual(a, v) if v != null =>
        bySrc.getOrElse(a, Nil).filter(_.monotone).flatMap(x =>
          x(v).map(GreaterThanOrEqual(x.key, _)))
      case LessThan(a, v) if v != null =>
        bySrc.getOrElse(a, Nil).filter(_.monotone).flatMap(x =>
          x(v).map(LessThanOrEqual(x.key, _)))
      case LessThanOrEqual(a, v) if v != null =>
        bySrc.getOrElse(a, Nil).filter(_.monotone).flatMap(x =>
          x(v).map(LessThanOrEqual(x.key, _)))
      case IsNull(a) =>
        bySrc.getOrElse(a, Nil).filter(_.nullPreserving).map(x => IsNull(x.key))
      case IsNotNull(a) =>
        bySrc.getOrElse(a, Nil).filter(_.nullPreserving).map(x => IsNotNull(x.key))
      case _ => Nil
    }.distinct
  }
}
