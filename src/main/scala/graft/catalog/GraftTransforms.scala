package graft.catalog

import org.apache.spark.sql.types.{DataType, DateType, DecimalType, IntegerType, LongType, StringType, TimestampNTZType, TimestampType}

/** THE hidden-partitioning transform desugar (Iceberg's partition
  * transforms, re-expressed as generated columns): `days/hours/months/
  * years(ts)`, `bucket(n, col)`, `truncate(w, col)` each synthesize ONE
  * generated column — `(name, generationSql, declaredType, sourceCol)` —
  * that the engine's proven generated-column machinery then materializes
  * on every write, so the partition layer only ever sees plain typed
  * keys. Shared verbatim by every entry point that accepts a transform
  * spelling: the DSv2 catalog's CREATE/CTAS/RTAS
  * ([[GraftCatalog.hiddenPartition]] adapts connector `Transform`s here)
  * and the GRAFT SQL parser's partition-evolution statement
  * (`ALTER GRAFT ... SET PARTITIONED BY (days(ts))`), so one table can
  * never end up with two subtly different derivations of the same
  * transform.
  *
  * Source-column typing is validated HERE, at declaration time — a
  * `days(typo_col)` or `hours(price)` refuses at CREATE/ALTER instead of
  * at first write — and the synthesized type follows the source family:
  * TIMESTAMP_NTZ sources stay zone-free (`hours` yields TIMESTAMP_NTZ,
  * never a manifest-vs-data TIMESTAMP disagreement), DATE sources admit
  * the day/month/year family but refuse `hours` (no sub-day information
  * exists to truncate).
  */
private[graft] object GraftTransforms {

  final case class Spec(name: String, sql: String, dataType: DataType,
                        source: String)

  /** Can the skipping index carry min/max envelopes for a column of this
    * type? (The long-normalized envelope family plus strings — mirrors
    * the stats machinery's accepted set.) Used by the CREATE-time
    * auto-index policy: transform SOURCE columns of these types get
    * `graft.stats.columns` entries automatically.
    */
  def statsIndexable(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | StringType | DateType | TimestampType |
         TimestampNTZType => true
    case org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.ShortType => true
    case _ => false
  }

  /** Desugar one transform application. `fn` is the lower-cased transform
    * name, `src` the referenced column, `arg` the integer literal of
    * bucket/truncate. Returns None for `identity` (plain columns pass
    * through); refuses loudly for unknown transforms, undeclared source
    * columns, and type-incompatible sources.
    */
  def desugar(fn: String, src: String, arg: Option[Int],
              colType: String => Option[DataType]): Option[Spec] = {
    def srcType(transform: String): DataType = colType(src).getOrElse(sys.error(
      s"GraftTransforms: $transform($src) references undeclared column '$src'"))
    def temporal(transform: String): DataType = srcType(transform) match {
      case t @ (TimestampType | TimestampNTZType | DateType) => t
      case other => sys.error(
        s"GraftTransforms: $transform($src) needs a TIMESTAMP/TIMESTAMP_NTZ/" +
          s"DATE source, got ${other.sql}")
    }
    fn match {
      case "identity" => None
      case "days" | "day" =>
        temporal("days") match {
          case TimestampType =>
            Some(Spec(s"${src}_day", s"CAST(date_trunc('DAY', $src) AS DATE)",
              DateType, src))
          // NTZ/DATE sources derive ZONE-FREE (date_trunc would coerce
          // through TIMESTAMP in the session zone — a DST-gap wall time
          // could shift the derived day)
          case _ =>
            Some(Spec(s"${src}_day", s"CAST($src AS DATE)", DateType, src))
        }
      case "hours" | "hour" =>
        temporal("hours") match {
          case TimestampType =>
            Some(Spec(s"${src}_hour", s"date_trunc('HOUR', $src)",
              TimestampType, src))
          // zone-free hour floor: date_trunc coerces NTZ to TIMESTAMP, so
          // the key is rebuilt from the NTZ field extractions — the
          // manifest schema and the stored data then agree on zone-ness
          case TimestampNTZType =>
            Some(Spec(s"${src}_hour",
              s"make_timestamp_ntz(year($src), month($src), day($src), " +
                s"hour($src), 0, 0)", TimestampNTZType, src))
          case DateType => sys.error(
            s"GraftTransforms: hours($src) on a DATE column has no sub-day " +
              "information to truncate — use days/months/years")
          case other => sys.error(s"GraftTransforms: unreachable $other")
        }
      case "months" | "month" =>
        temporal("months") match {
          case TimestampType =>
            Some(Spec(s"${src}_month", s"CAST(date_trunc('MONTH', $src) AS DATE)",
              DateType, src))
          case _ =>
            Some(Spec(s"${src}_month", s"make_date(year($src), month($src), 1)",
              DateType, src))
        }
      case "years" | "year" =>
        temporal("years")
        Some(Spec(s"${src}_year", s"year($src)", IntegerType, src))
      case "bucket" =>
        val n = arg.getOrElse(sys.error(
          s"GraftTransforms: bucket($src) carries no bucket count literal"))
        require(n >= 1, s"GraftTransforms: bucket($n, ...) needs n >= 1")
        srcType("bucket") // must exist; any hashable type is acceptable
        // Spark's Murmur3 hash — engine-stable, the same function a
        // co-partitioned writer would use; pmod keeps the key in [0, n)
        Some(Spec(s"${src}_bucket", s"pmod(hash($src), $n)", IntegerType, src))
      case "truncate" =>
        val w = arg.getOrElse(sys.error(
          s"GraftTransforms: truncate($src) carries no width literal"))
        require(w >= 1, s"GraftTransforms: truncate($w, ...) needs width >= 1")
        srcType("truncate") match {
          case StringType =>
            Some(Spec(s"${src}_trunc", s"substring($src, 1, $w)", StringType, src))
          case LongType =>
            // Iceberg's integral truncate: v - (v % W), pmod so negative
            // values truncate DOWN like the spec requires
            Some(Spec(s"${src}_trunc", s"$src - pmod($src, ${w}L)", LongType, src))
          case IntegerType =>
            Some(Spec(s"${src}_trunc", s"$src - pmod($src, $w)", IntegerType, src))
          case dec: DecimalType =>
            // Iceberg's decimal truncate: W applies to the UNSCALED value
            // (v' = v - (v mod W·10^-scale)); pmod keeps negatives
            // truncating DOWN; the CAST pins the declared precision (the
            // subtraction would otherwise widen it)
            val unit = java.math.BigDecimal.valueOf(w.toLong)
              .movePointLeft(dec.scale).toPlainString
            Some(Spec(s"${src}_trunc",
              s"CAST($src - pmod($src, ${unit}BD) AS DECIMAL(${dec.precision}," +
                s"${dec.scale}))", dec, src))
          case other => sys.error(
            s"GraftTransforms: truncate($w, $src) supports STRING/INT/BIGINT/" +
              s"DECIMAL columns, got ${other.sql}")
        }
      case other => sys.error(
        s"GraftTransforms: unsupported partition transform '$other' — supported: " +
          "identity columns, days/hours/months/years(ts), bucket(n, col), " +
          "truncate(w, col)")
    }
  }

  /** Parse ONE partition-spec entry as the GRAFT SQL parser spells it —
    * either a plain column name (`Left(col)`) or a transform application
    * (`Right(fn, src, arg)`): `days(ts)`, `bucket(4, id)`,
    * `truncate(10, s)`. Validation of the transform itself happens in
    * [[desugar]] when the caller supplies the schema.
    */
  private val fnRe = """(?i)\s*([a-z_]+)\s*\(\s*([^()]*)\s*\)\s*""".r

  def parseEntry(entry: String): Either[String, (String, String, Option[Int])] =
    entry.trim match {
      case fnRe(fn, inside) =>
        val parts = inside.split(",").map(_.trim).filter(_.nonEmpty)
        fn.toLowerCase(java.util.Locale.ROOT) match {
          case f @ ("bucket" | "truncate") =>
            require(parts.length == 2 && parts(0).toIntOption.isDefined,
              s"GraftTransforms: $f takes (n, col), got '$entry'")
            Right((f, parts(1), parts(0).toIntOption))
          case f =>
            require(parts.length == 1,
              s"GraftTransforms: $f takes one column, got '$entry'")
            Right((f, parts(0), None))
        }
      case plain => Left(plain)
    }

  /** Split a PARTITIONED BY body at TOP-LEVEL commas only — `days(ts),
    * bucket(4, id)` is two entries, not three (the SQL parser's regex
    * cannot see nesting).
    */
  def splitEntries(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case ch => cur += ch
    }
    if (cur.nonEmpty) out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** The CREATE/ALTER-time auto-index policy: merge the transform SOURCE
    * columns (stats-indexable types only) into a `graft.stats.columns`
    * declaration, so raw-column predicates over a hidden-partitioned
    * table prune through the skipping index WITHOUT the user knowing the
    * layout — the Iceberg contract. Opt out per table with
    * `graft.stats.auto = 'false'`; an existing user declaration is merged
    * with, never replaced.
    */
  def autoIndexProps(props: Map[String, String], specs: Seq[Spec],
                     colType: String => Option[DataType]): Map[String, String] = {
    if (specs.isEmpty || props.get("graft.stats.auto").contains("false")) return props
    val sources = specs.map(_.source).distinct
      .filter(s => colType(s).exists(statsIndexable))
    if (sources.isEmpty) return props
    val declared = props.get("graft.stats.columns")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    props + ("graft.stats.columns" -> (declared ++ sources).distinct.mkString(","))
  }
}
