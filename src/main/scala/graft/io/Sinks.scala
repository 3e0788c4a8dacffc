package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Serving-store sinks.
  *
  * WarehouseSink models the reference's Synapse staged bulk load
  * (codes/goldToSynapse.scala:10-17,39-46: write to a blob `tempDir`, then the
  * connector issues a DW bulk load). The local implementation keeps the same
  * two-phase shape — stage as Parquet, then commit files into the table
  * directory — so the cloud JDBC/DW implementation is a configuration swap,
  * not a logic change.
  *
  * DocumentSink models the Cosmos document append (codes/goldToCosmosdb.scala:37):
  * one JSON document per row.
  *
  * 100 TB notes: both sinks write with full executor parallelism (no
  * coalesce(1)); the staged commit is file moves on the driver (metadata-only,
  * O(#files) not O(bytes)).
  */
trait WarehouseSink {
  def append(df: DataFrame, table: String): Unit
}

/** Two-phase staged load into a directory-per-table local warehouse. */
final class StagedWarehouseSink(stagingRoot: String, warehouseRoot: String) extends WarehouseSink {
  override def append(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    val staging = s"$stagingRoot/$table-${java.util.UUID.randomUUID().toString.take(8)}"
    // Phase 1: stage with full parallelism (the reference's blob tempDir).
    df.write.mode(SaveMode.Overwrite).parquet(staging)
    // Phase 2: commit staged files into the table directory (the bulk load).
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dest = new Path(s"$warehouseRoot/$table")
    fs.mkdirs(dest)
    fs.listStatus(new Path(staging)).filter(_.getPath.getName.startsWith("part-"))
      .foreach { st =>
        fs.rename(st.getPath, new Path(dest, st.getPath.getName))
      }
    fs.delete(new Path(staging), true)
  }

  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(s"$warehouseRoot/$table")
}

/** Cloud-profile warehouse sink: batched JDBC append (never row-at-a-time —
  * the reference's iterrows() INSERT loop at etl-vini-azure.py:94-104 becomes
  * a parallel batched write). Unexercised offline (no JDBC server).
  */
final class JdbcWarehouseSink(url: String, props: java.util.Properties) extends WarehouseSink {
  override def append(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Append).option("batchsize", 10000).jdbc(url, table, props)
}

trait DocumentSink {
  def write(df: DataFrame, path: String): Unit
}

/** One JSON document per row, written as text with full parallelism. */
object JsonDocumentSink extends DocumentSink {
  override def write(df: DataFrame, path: String): Unit =
    df.toJSON.write.mode(SaveMode.Overwrite).text(path)
}
