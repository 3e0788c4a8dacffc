package graft.io

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** The BATCH half of the `graft-versioned` data source (the streaming half
  * is `graft.streaming.VersionedTableSourceProvider`): the versioned table
  * as a first-class `spark.read.format("graft-versioned")` relation, via
  * the stable V1 connector surface (`PrunedFilteredScan` — the same public
  * API classic external connectors build on).
  *
  * What the engine pushes INTO the manifest index:
  *  - COLUMN PRUNING: `requiredColumns` become a projection before the
  *    RDD materializes, so parquet reads only the requested columns.
  *  - FILTER PUSHDOWN: comparison/equality predicates over integral and
  *    timestamp columns become manifest range bounds (dir min/max
  *    envelopes + per-file footer stats) and bloom point probes, and
  *    `IS [NOT] NULL` predicates probe the null-count index
  *    ([[VersionedTable.planNull]]) — the same skipping
  *    [[VersionedTable.readRange]]/`readPoint`/`readWhereNull` give the
  *    programmatic caller, now automatic for any `df.filter(...)` or SQL
  *    WHERE over the relation. (Spark plants an implicit `IsNotNull` under
  *    most comparisons, so all-NULL dirs prune even on plain `>` scans.)
  *
  * Every filter is declared UNHANDLED ([[unhandledFilters]] returns all),
  * so Spark re-applies the full predicate above this scan: manifest
  * skipping stays an optimization, never a correctness input — exactly
  * the stats-may-be-absent contract of the rest of the table. Time travel
  * rides the reader options: `versionAsOf` (a version) or `timestampAsOf`
  * (epoch-ms, resolved by the commit ledger).
  *
  * Honest cost note: the V1 connector contract surfaces the scan as an
  * `RDD[Row]`, which re-enters Spark above the codegen boundary — the
  * skipping and projection still happen (the expensive 100 TB part), but
  * the row hand-off pays an extra (de)serialization the programmatic path
  * does not. This format is the COMPATIBILITY front door (SQL `USING`,
  * generic tooling); throughput-critical pipelines read via
  * [[VersionedTable.read]]/`readRange`, which stay whole-stage-codegen
  * parquet scans end to end.
  */
final class VersionedRelation(override val sqlContext: SQLContext,
                              root: String, asOf: Option[Long])
    extends BaseRelation with PrunedFilteredScan {

  private def spark = sqlContext.sparkSession

  override val schema: StructType = VersionedTable.read(spark, root, asOf).schema

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val (ranges, points, nullProbes) = VersionedRelation.translate(filters)
    val (df, keptDirs, totalDirs) =
      VersionedTable.scanForRelation(spark, root, asOf, ranges, points, nullProbes)
    VersionedRelation.lastScan =
      VersionedRelation.ScanInfo(requiredColumns.toSeq, ranges.size, points.size,
        keptDirs, totalDirs)
    df.select(requiredColumns.map(col).toSeq: _*).rdd
  }

  // default unhandledFilters already returns every filter — pruning is an
  // optimization; Spark keeps the authoritative predicate above the scan
}

object VersionedRelation {
  /** Driver-visible record of the LAST buildScan on this JVM — the test
    * seam proving that Spark's planner actually delivered the projection
    * and predicates into the relation (and how far they pruned).
    */
  final case class ScanInfo(columns: Seq[String], nRanges: Int, nPoints: Int,
                            dirsKept: Int, dirsTotal: Int)
  @volatile var lastScan: ScanInfo = ScanInfo(Nil, 0, 0, -1, -1)

  /** (columnName, micros) for a timestamp literal — footer envelopes and
    * manifest stats for timestamp columns are MICROS by the statsCols
    * contract, so pushed bounds translate the same way.
    */
  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000) / 1000L

  /** THE epoch-day reading of a DATE literal — both JVM flavors
    * (java.sql.Date when spark.sql.datetime.java8API is off, LocalDate
    * when on). Every DATE-normalizing site in the engine (claim
    * enforcement, DPP filters, key ordering, metadata aggregation,
    * delete routing) shares this one definition.
    */
  private[graft] def epochDay(v: Any): Option[Long] = v match {
    case d: java.sql.Date       => Some(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case _                      => None
  }

  /** THE epoch-micros reading of a TIMESTAMP literal — both JVM flavors
    * (java.sql.Timestamp when spark.sql.datetime.java8API is off, Instant
    * when on). The TIMESTAMP twin of [[epochDay]]: every
    * timestamp-normalizing site (claim enforcement, keyed-scan runtime
    * filters, top-N key ordering, metadata aggregation) shares this one
    * definition.
    */
  private[graft] def tsMicros(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp => Some(micros(t))
    case i: java.time.Instant  => Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case _                     => None
  }

  /** The epoch-micros reading of a TIMESTAMP_NTZ literal (always
    * `java.time.LocalDateTime` — NTZ has no java.sql flavor): the local
    * datetime read AS IF UTC, exactly Spark's internal NTZ encoding, so
    * claim normalization and path round trips stay zone-free like the
    * type itself.
    */
  private[graft] def ntzMicros(v: Any): Option[Long] = v match {
    case ldt: java.time.LocalDateTime =>
      Some(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000L)
    case _ => None
  }

  private[graft] def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int  => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    // TIMESTAMP envelopes are epoch MICROS (the statsCols contract);
    // DATE envelopes are epoch DAYS (INT32 footers); both literal
    // flavors of each (java8API off/on) translate
    case _ => tsMicros(v).orElse(ntzMicros(v)).orElse(epochDay(v))
  }

  /** Translate the pushable subset of `filters` into manifest range
    * bounds and bloom point probes; anything else is ignored here (Spark
    * re-applies it above the scan regardless). Shared by the DSv1
    * relation and the DSv2 catalog scan ([[graft.catalog.GraftCatalog]])
    * — one translation, one skipping-index contract.
    */
  private[graft] def translate(filters: Array[Filter])
      : (Seq[(String, Long, Long)], Seq[(String, Long)], Seq[(String, Boolean)]) = {
    val ranges = Seq.newBuilder[(String, Long, Long)]
    val points = Seq.newBuilder[(String, Long)]
    val nullProbes = Seq.newBuilder[(String, Boolean)]
    def walk(f: Filter): Unit = f match {
      case EqualTo(a, v) => asLong(v).foreach { l =>
        ranges += ((a, l, l)); points += ((a, l))
      }
      case GreaterThan(a, v)        => asLong(v).foreach(l => ranges += ((a, l + 1, Long.MaxValue)))
      case GreaterThanOrEqual(a, v) => asLong(v).foreach(l => ranges += ((a, l, Long.MaxValue)))
      case LessThan(a, v)           => asLong(v).foreach(l => ranges += ((a, Long.MinValue, l - 1)))
      case LessThanOrEqual(a, v)    => asLong(v).foreach(l => ranges += ((a, Long.MinValue, l)))
      case In(a, vs) if vs.nonEmpty && vs.forall(v => asLong(v).isDefined) =>
        val ls = vs.map(v => asLong(v).get)
        ranges += ((a, ls.min, ls.max))
      case IsNull(a)    => nullProbes += ((a, true))
      case IsNotNull(a) => nullProbes += ((a, false))
      case And(l, r) => walk(l); walk(r)
      case _         => () // unsupported shapes never prune — only re-applied
    }
    filters.foreach(walk)
    (ranges.result(), points.result(), nullProbes.result())
  }

  /** The subset of `filters` the manifest index can act on — reported as
    * the DSv2 scan's `pushedFilters()` so `.explain` shows exactly which
    * predicates reached the skipping index (all are ALSO re-applied by
    * Spark above the scan: skipping stays an optimization, never a
    * correctness input).
    */
  private[graft] def pushable(filters: Array[Filter]): Array[Filter] =
    filters.filter {
      case EqualTo(_, v)             => asLong(v).isDefined
      case GreaterThan(_, v)         => asLong(v).isDefined
      case GreaterThanOrEqual(_, v)  => asLong(v).isDefined
      case LessThan(_, v)            => asLong(v).isDefined
      case LessThanOrEqual(_, v)     => asLong(v).isDefined
      case In(_, vs)                 => vs.nonEmpty && vs.forall(v => asLong(v).isDefined)
      case IsNull(_) | IsNotNull(_)  => true
      case And(l, r) => pushable(Array(l)).nonEmpty && pushable(Array(r)).nonEmpty
      case _ => false
    }
}
