package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The registry itself lives in [[Queries]]; this object is the stable facade
  * the driver invokes.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001: the reference's silver→gold
    * aggregation (codes/silverToGold.scala:10-26) over lineitem.
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.queries("silver_to_gold")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}
