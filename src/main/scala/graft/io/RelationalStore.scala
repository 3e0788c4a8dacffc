package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Relational-store abstraction covering the reference's SQL Server roundtrip:
  * DDL recreate (etl-vini-azure.py:83-92), batch insert (:94-104 — there
  * row-at-a-time; here always batched), and the ADF copy relational→Parquet
  * extract (k8s/resources/resources_2/datafactory.tf:18-61).
  *
  * The local implementation is directory-per-table Parquet so the pipeline is
  * fully testable offline; JdbcRelationalStore is the cloud profile and shows
  * the partitioned-extract knobs that replace ADF's `partitionOption: "None"`
  * single-stream copy at scale.
  */
trait RelationalStore {
  /** DROP TABLE IF EXISTS + CREATE semantics: table is emptied/recreated. */
  def recreate(spark: SparkSession, table: String): Unit
  def appendBatch(df: DataFrame, table: String): Unit
  def readTable(spark: SparkSession, table: String): DataFrame
  /** The extract step (S5): relational table → snappy Parquet in bronze. */
  def extractToParquet(spark: SparkSession, table: String, bronzePath: String): Unit =
    readTable(spark, table).write.mode(SaveMode.Overwrite)
      .option("compression", "snappy").parquet(bronzePath)
}

final class LocalParquetStore(root: String) extends RelationalStore {
  private def path(table: String) = s"$root/$table"
  override def recreate(spark: SparkSession, table: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path(table)), true)
  }
  override def appendBatch(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path(table))
  override def readTable(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(path(table))
}

/** Cloud profile (unexercised offline — no JDBC endpoint in this container).
  * The read side is a partitioned parallel extract: at 100 TB the single-stream
  * ADF copy becomes `numPartitions` concurrent range scans on `partitionCol`.
  */
final class JdbcRelationalStore(url: String, props: java.util.Properties,
                                partitionCol: String, lowerBound: Long, upperBound: Long,
                                numPartitions: Int) extends RelationalStore {
  override def recreate(spark: SparkSession, table: String): Unit = {
    // DDL via a direct connection; mirrors etl-vini-azure.py:83-92.
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      st.execute(s"DROP TABLE IF EXISTS $table")
      st.execute(s"CREATE TABLE $table (symbol varchar(10) NOT NULL, price decimal(10,2) NOT NULL)")
    } finally conn.close()
  }
  override def appendBatch(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Append).option("batchsize", 10000).jdbc(url, table, props)
  override def readTable(spark: SparkSession, table: String): DataFrame =
    spark.read
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lowerBound).option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .jdbc(url, table, props)
}
