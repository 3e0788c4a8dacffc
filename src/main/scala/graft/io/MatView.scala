package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL MATERIALIZED VIEWS over the versioned table's change feed —
  * the self-maintainable-aggregate design every warehouse's IVM feature
  * (and Delta Live Tables / Materialized Views on Databricks, Snowflake
  * dynamic tables) builds on, specialized to the aggregate shape that is
  * exactly decrementable:
  *
  * {{{  SELECT key, sum(c1) .., count(*) FROM src GROUP BY key  }}}
  *
  * sum and count form an abelian group under row insertion/deletion, so a
  * refresh needs ONLY the changed rows: each source commit's change feed
  * ([[VersionedTable.readChangeFeed]]) maps to signed deltas (+row for
  * insert/update_postimage, -row for delete/update_preimage), aggregates
  * per key — O(changed rows), never O(source) — and lands on the view
  * through ONE [[VersionedTable.applyCdcBatch]] commit: groups whose count
  * reaches zero are tombstoned, everything else upserts; avg = sum/count
  * at read time.
  *
  * min/max — NOT decrementable — maintain by the standard two-tier rule
  * every warehouse IVM uses: INSERTS tighten the extreme monotonically
  * (`least`/`greatest`, zero extra IO), and a refresh only falls back to
  * recomputation when a DELETED row's value ties the group's current
  * extreme — and then it recomputes ONLY the AFFECTED GROUPS' slices of
  * the source (bloom-gated point reads for a handful of integral keys, a
  * pushed `IN` filter otherwise), never the whole source. A duplicate
  * extreme recomputes conservatively (multiplicity isn't tracked); the
  * recompute reads the source AS OF the commit being folded, so the
  * one-version-per-view-commit exactly-once contract is untouched.
  *
  * Why this matters at 100 TB: the view maintains a serving aggregate of a
  * continuously-merged source for the cost of the DELTAS. A nightly full
  * `GROUP BY` over a 100 TB table rescans 100 TB; this refresh reads the
  * day's rewritten dirs only (the change feed's own cost contract) and
  * rewrites only the view dirs whose key envelope the delta hits.
  *
  * Exactly-once without a transaction across two tables: the refresh
  * applies source versions ONE AT A TIME, each under the deterministic
  * commitId `mv-refresh-<srcVersion>` — a crash anywhere replays to a
  * no-op ([[VersionedTable]] commitId idempotence), and the
  * `graft.mv.synced` property is only a fast-forward HINT (re-deriving it
  * low replays already-applied versions into no-ops). A source overwrite/
  * rollback has no row-level change form; the change feed refuses loudly
  * and [[rebuild]] re-materializes from the snapshot under one commit.
  */
object MatView {

  private val P_SRC = "graft.mv.src"
  private val P_KEY = "graft.mv.key"
  private val P_SUMS = "graft.mv.sums"
  private val P_MINMAX = "graft.mv.minmax"
  private val P_SYNCED = "graft.mv.synced"

  private def sumName(c: String) = s"${c}_sum"
  private def minName(c: String) = s"${c}_min"
  private def maxName(c: String) = s"${c}_max"

  private def aggregate(src: DataFrame, keyCol: String, sumCols: Seq[String],
                        minMaxCols: Seq[String]): DataFrame =
    src.groupBy(col(keyCol))
      .agg(count(lit(1)).as("mv_rows"),
        sumCols.map(c => sum(col(c)).as(sumName(c))) ++
          minMaxCols.flatMap(c => Seq(min(col(c)).as(minName(c)),
            max(col(c)).as(maxName(c)))): _*)
      .select(col(keyCol) +: col("mv_rows") +: (sumCols.map(c => col(sumName(c))) ++
        minMaxCols.flatMap(c => Seq(col(minName(c)), col(maxName(c))))): _*)

  /** CREATE MATERIALIZED VIEW `mvRoot` AS SELECT keyCol, count(*),
    * sum(sumCols..) FROM srcRoot GROUP BY keyCol — one full aggregation of
    * the CURRENT source snapshot (the only full-scan this view ever needs),
    * committed as a versioned table of its own (so the view itself has
    * time travel, a skipping index on the group key, and OCC) with the
    * view definition and sync point recorded as table properties.
    * Idempotent under `commitId` retry. `sumCols` must be integral —
    * exactly-decrementable and engine-exact (no float drift accumulating
    * over thousands of incremental refreshes).
    */
  def create(spark: SparkSession, mvRoot: String, srcRoot: String, keyCol: String,
             sumCols: Seq[String], commitId: String,
             minMaxCols: Seq[String] = Nil): Long = {
    require(sumCols.nonEmpty, "MatView.create: no sum columns")
    val srcV = VersionedTable.latestVersion(srcRoot).getOrElse(
      sys.error(s"MatView.create: no commits at $srcRoot"))
    val src = VersionedTable.read(spark, srcRoot)
    sumCols.foreach { c =>
      val dt = src.schema(c).dataType
      require(dt == org.apache.spark.sql.types.LongType ||
        dt == org.apache.spark.sql.types.IntegerType,
        s"MatView.create: sum column '$c' is $dt — only integral columns are " +
          "exactly decrementable (incremental refresh must not accumulate float drift)")
    }
    minMaxCols.foreach { c =>
      val dt = src.schema(c).dataType
      require(dt == org.apache.spark.sql.types.LongType ||
        dt == org.apache.spark.sql.types.IntegerType ||
        dt == org.apache.spark.sql.types.StringType,
        s"MatView.create: min/max column '$c' is $dt — integral or string only " +
          "(the affected-group recompute compares engine-exact orderings)")
    }
    val view = aggregate(src, keyCol, sumCols, minMaxCols)
    val v = VersionedTable.commit(view, mvRoot, "append", commitId,
      statsCols = Seq(keyCol))
    VersionedTable.setTableProperties(mvRoot, Map(
      P_SRC -> java.nio.file.Paths.get(srcRoot).toAbsolutePath.normalize.toString,
      P_KEY -> keyCol,
      P_SUMS -> sumCols.mkString(","),
      P_SYNCED -> srcV.toString) ++
      (if (minMaxCols.isEmpty) Map.empty[String, String]
       else Map(P_MINMAX -> minMaxCols.mkString(","))), s"$commitId--props")
    v
  }

  /** REFRESH: fold every source commit past the sync point into the view,
    * one source version per view commit (the exactly-once unit — see the
    * object doc). Returns the source version the view is now synced to.
    * Cost: O(changed rows) per source commit + an envelope-gated rewrite
    * of only the view dirs holding touched keys. A replayed refresh (or a
    * crash mid-loop) is a no-op per already-applied version.
    */
  def refresh(spark: SparkSession, mvRoot: String): Long = {
    val props = VersionedTable.tableProperties(mvRoot)
    val srcRoot = props.getOrElse(P_SRC, sys.error(
      s"MatView.refresh: $mvRoot carries no $P_SRC property — not a materialized view"))
    val keyCol = props(P_KEY)
    val sumCols = props(P_SUMS).split(",").toSeq
    val mmCols = props.get(P_MINMAX).map(_.split(",").toSeq).getOrElse(Nil)
    val synced = props(P_SYNCED).toLong
    val srcLatest = VersionedTable.latestVersion(srcRoot).getOrElse(
      sys.error(s"MatView.refresh: source $srcRoot has no commits"))
    require(srcLatest >= synced,
      s"MatView.refresh: source $srcRoot is at v$srcLatest, BEHIND the view's sync " +
        s"point v$synced — the source was rolled back or replaced; rebuild() the view")
    ((synced + 1) to srcLatest).foreach { v =>
      val commitId = s"mv-refresh-$v"
      if (VersionedTable.findCommitVersion(mvRoot, commitId).isEmpty) {
        // one commit's feed: empty for metadata-only commits (skipped — no
        // view commit needed; idempotence comes from re-deriving the same
        // decision), refused loudly for overwrite/rollback (rebuild())
        val cf = VersionedTable.readChangeFeed(spark, srcRoot, v - 1, v, keyCol)
        val sign = when(col("_change_type").isin("insert", "update_postimage"), 1L)
          .when(col("_change_type").isin("delete", "update_preimage"), -1L)
          .otherwise(raise_error(concat(lit("MatView.refresh: unknown change type "),
            col("_change_type"))).cast("long"))
        // per touched key: signed count/sum deltas; for each min/max column
        // the inserted rows' extremes (tighten monotonically) and the
        // deleted rows' extremes (detect removal of the current extreme)
        val delta = cf.withColumn("__sign", sign)
          .groupBy(col(keyCol))
          .agg(sum(col("__sign")).as("__rows_d"),
            sumCols.map(c => sum(col("__sign") * col(c)).as(s"__${c}_d")) ++
              mmCols.flatMap(c => Seq(
                min(when(col("__sign") === 1L, col(c))).as(s"__${c}_imin"),
                max(when(col("__sign") === 1L, col(c))).as(s"__${c}_imax"),
                min(when(col("__sign") === -1L, col(c))).as(s"__${c}_dmin"),
                max(when(col("__sign") === -1L, col(c))).as(s"__${c}_dmax"))): _*)
        if (!delta.isEmpty) {
          // current view rows for the touched keys + signed deltas → new
          // values. Two broadcast joins keep the big side stream-only: the
          // view scan reduces to O(touched groups) through a broadcast
          // SEMI-join (never hash-built, never shuffled), and the outer
          // combine then runs between two delta-sized frames
          val cur = VersionedTable.read(spark, mvRoot)
          val touched = cur.join(broadcast(delta.select(col(keyCol))),
            Seq(keyCol), "left_semi")
          // provisional extremes: least/greatest skip NULLs, so a brand-new
          // group takes the inserted extreme and an insert-only refresh
          // tightens for free. The DELETE-side hazard — a removed value
          // TYING the group's current extreme — flags the group for the
          // affected-slice recompute below (ties are conservative:
          // multiplicity is not tracked)
          val mmAffected: Column =
            if (mmCols.isEmpty) lit(false)
            else mmCols.map(c =>
              coalesce(col(s"__${c}_dmin") <= col(minName(c)), lit(false)) ||
                coalesce(col(s"__${c}_dmax") >= col(maxName(c)), lit(false)))
              .reduce(_ || _)
          val combined = delta.join(broadcast(touched), Seq(keyCol), "left_outer")
            .select(
              col(keyCol) +:
                (coalesce(col("mv_rows"), lit(0L)) + col("__rows_d")).as("mv_rows") +:
                (sumCols.map(c => (coalesce(col(sumName(c)), lit(0L)) +
                  col(s"__${c}_d")).as(sumName(c))) ++
                  mmCols.flatMap(c => Seq(
                    least(col(minName(c)), col(s"__${c}_imin")).as(minName(c)),
                    greatest(col(maxName(c)), col(s"__${c}_imax")).as(maxName(c)))) :+
                  mmAffected.as("__mm_affected")): _*)
          val negative = combined.filter(col("mv_rows") < 0).limit(1).collect()
          require(negative.isEmpty, s"MatView.refresh: group ${negative.headOption.orNull} " +
            "reached a negative row count — the change feed and the view disagree " +
            "(was the view written to directly?); rebuild() the view")
          val upserts0 = combined.filter(col("mv_rows") > 0)
          val upserts =
            if (mmCols.isEmpty) upserts0.drop("__mm_affected")
            else {
              // AFFECTED-GROUP recompute: groups that lost an extreme re-read
              // ONLY their slice of the source — as of the version being
              // folded — through the skipping index; O(hit dirs of the
              // affected keys), never O(source)
              val affectedKeys = upserts0.filter(col("__mm_affected"))
                .select(col(keyCol)).collect().map(_.get(0)).toSeq
              if (affectedKeys.isEmpty) upserts0.drop("__mm_affected")
              else {
                val slice = sourceSlice(spark, srcRoot, v, keyCol, affectedKeys)
                val rAggs = mmCols.flatMap(c => Seq(min(col(c)).as(s"__r_${c}_min"),
                  max(col(c)).as(s"__r_${c}_max")))
                val recomputed = slice.groupBy(col(keyCol)).agg(rAggs.head, rAggs.tail: _*)
                upserts0.join(broadcast(recomputed), Seq(keyCol), "left_outer")
                  .select(
                    col(keyCol) +: col("mv_rows") +:
                      (sumCols.map(c => col(sumName(c))) ++
                        mmCols.flatMap(c => Seq(
                          coalesce(col(s"__r_${c}_min"), col(minName(c))).as(minName(c)),
                          coalesce(col(s"__r_${c}_max"), col(maxName(c))).as(maxName(c))))): _*)
              }
            }
          val deletes = combined.filter(col("mv_rows") === 0).select(col(keyCol))
          VersionedTable.applyCdcBatch(spark, mvRoot, upserts, deletes, keyCol,
            commitId, statsCols = Seq(keyCol))
        }
      }
    }
    if (srcLatest > synced)
      VersionedTable.setTableProperties(mvRoot,
        Map(P_SYNCED -> srcLatest.toString), s"mv-sync-$srcLatest")
    srcLatest
  }

  /** The source rows of `keys` as of source version `v` — the
    * affected-group recompute's read path. A handful of integral keys go
    * through [[VersionedTable.readPoint]] (bloom + envelope dir pruning —
    * O(dirs actually holding each key)); otherwise one snapshot read with
    * an `IN` filter the parquet scan pushes down to row-group stats.
    */
  private def sourceSlice(spark: SparkSession, srcRoot: String, v: Long,
                          keyCol: String, keys: Seq[Any]): DataFrame = {
    val integral = keys.forall(_.isInstanceOf[java.lang.Number])
    if (integral && keys.size <= 32)
      keys.map(k => VersionedTable.readPoint(spark, srcRoot, keyCol,
        k.asInstanceOf[java.lang.Number].longValue, asOf = Some(v)))
        .reduce(_.unionByName(_))
    else
      VersionedTable.read(spark, srcRoot, asOf = Some(v))
        .filter(col(keyCol).isin(keys: _*))
  }

  /** Full re-materialization — the escape hatch for source histories the
    * change feed cannot express (overwrite, rollback): recompute the
    * aggregate from the source's CURRENT snapshot and OVERWRITE the view
    * in one commit, resetting the sync point. Idempotent per source
    * version (commitId derives from it).
    */
  def rebuild(spark: SparkSession, mvRoot: String): Long = {
    val props = VersionedTable.tableProperties(mvRoot)
    val srcRoot = props.getOrElse(P_SRC, sys.error(
      s"MatView.rebuild: $mvRoot carries no $P_SRC property — not a materialized view"))
    val keyCol = props(P_KEY)
    val sumCols = props(P_SUMS).split(",").toSeq
    val mmCols = props.get(P_MINMAX).map(_.split(",").toSeq).getOrElse(Nil)
    val srcV = VersionedTable.latestVersion(srcRoot).getOrElse(
      sys.error(s"MatView.rebuild: source $srcRoot has no commits"))
    val view = aggregate(VersionedTable.read(spark, srcRoot), keyCol, sumCols, mmCols)
    VersionedTable.commit(view, mvRoot, "overwrite", s"mv-rebuild-$srcV",
      statsCols = Seq(keyCol))
    // overwrite resets table properties? No — properties are carried by the
    // parent; re-assert the sync point explicitly either way
    VersionedTable.setTableProperties(mvRoot,
      Map(P_SYNCED -> srcV.toString) ++
        (if (VersionedTable.tableProperties(mvRoot).contains(P_SRC)) Map.empty[String, String]
         else Map(P_SRC -> props(P_SRC), P_KEY -> keyCol, P_SUMS -> props(P_SUMS)) ++
           props.get(P_MINMAX).map(P_MINMAX -> _)),
      s"mv-rebuild-$srcV--props")
    srcV
  }
}
