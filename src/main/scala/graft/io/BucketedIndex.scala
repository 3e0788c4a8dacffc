package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Maintenance for append-grown BUCKETED index tables (the band index of
  * Dedup.appendBandIndex, the PQ code index of Similarity.appendPqIndex,
  * the lexical postings/lengths of TextAnalysis.appendLexicalIndex):
  * every bucketed append adds one file per bucket, so a long-running ingest
  * loop grows per-bucket file counts linearly — and small files are the
  * classic scan killer at 100 TB (open/seek per file, footer reads,
  * scheduler pressure).
  */
object BucketedIndex {

  /** The shared APPEND-IDEMPOTENCE contract every graft index maintains —
    * one implementation so the next index cannot fork the pattern (three
    * call sites had grown three anti-join variants; VERDICT r10 #6):
    *
    *  1. anti-join the incoming batch against the ids the table already
    *     holds (shuffle-hash — the index is corpus-sized, never broadcast),
    *  2. derive the batch's index rows from the SURVIVORS only (keys/codes
    *     are never computed for rows that will be dropped — the transform
    *     is per-row, so filtering first cannot change its output),
    *  3. append under the table's standing bucketBy/sortBy spec.
    *
    * A replay of the same batch — foreachBatch's at-least-once delivery, a
    * driver retry after a timeout, a crash between a multi-table index's
    * two appends — re-runs the anti-join, finds nothing (or exactly the
    * missing half), and inserts nothing else: appends are independently
    * idempotent per table, which is what turns at-least-once delivery into
    * exactly-once index contents.
    *
    * `batch` must already carry `idCol` under the TABLE's column name;
    * `transform` maps surviving batch rows to index rows (identity for
    * tables indexed by their own id).
    */
  def appendIdempotent(table: String, batch: DataFrame, idCol: String,
                       buckets: Int, bucketCol: String)
                      (transform: DataFrame => DataFrame): Unit = {
    val spark = batch.sparkSession
    val seen = spark.table(table).select(col(idCol)).distinct()
    val fresh = batch.join(seen.hint("shuffle_hash"), Seq(idCol), "left_anti")
    transform(fresh)
      .write.mode("append").format("parquet")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol).saveAsTable(table)
  }

  /** Rewrite `table` ONCE under the same bucketBy/sortBy spec on `bucketCol`
    * into `newPath`, then swap the catalog entry atomically (metadata-only
    * DROP + RENAME) — readers keep their no-index-side-exchange plans across
    * the swap and forever after.
    *
    * The rewrite is SHUFFLE-FREE: with the bucketed scan forced
    * (`autoBucketedScan.enabled=false` for the duration — by default Spark's
    * planner disables bucketed reads when no operator "needs" the
    * distribution, which would ALSO elide the repartition and leave
    * file-split tasks straddling buckets, fanning out one file per
    * (task, bucket)), each scan task reads exactly the accumulated files of
    * ONE bucket, the `repartition(buckets, bucketCol)` collapses as
    * redundant against the scan's own HashPartitioning, and each task
    * writes exactly one file — file count returns to ≤ `buckets` regardless
    * of how many appends accumulated, for one linear read + one linear
    * write and zero exchanges. Idempotent: compacting a compacted index
    * rewrites identical content.
    *
    * Returns the OLD table location: the swap is metadata-only, so the old
    * files are orphaned, not deleted — the caller deletes them after the
    * swap commits (a crash between DROP and RENAME leaves
    * `<table>__compacting` intact for manual recovery or a simple re-run;
    * the index is never half-written).
    */
  def compact(spark: SparkSession, table: String, buckets: Int,
              bucketCol: String, newPath: String): String = {
    val oldLoc = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .location.toString
    val tmp = table + "__compacting"
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val autoPrev = spark.conf.get(autoKey)
    spark.conf.set(autoKey, "false")
    try {
      spark.table(table)
        .repartition(buckets, col(bucketCol))
        .write.mode("overwrite").format("parquet")
        .bucketBy(buckets, bucketCol).sortBy(bucketCol)
        .option("path", newPath).saveAsTable(tmp)
    } finally spark.conf.set(autoKey, autoPrev)
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    oldLoc
  }
}
