package graft.model

import org.apache.spark.sql.types._

/** Stage schemas for the medallion pipeline (reference:
  * k8s/dags/etl-vini-azure.py:87-90, k8s/resources/notebooks/codes/silverToGold.scala:12-26,
  * codes/goldToSynapse.scala:27-34). Explicit StructTypes so every stage is
  * schema-checked instead of inferred.
  */
object Schemas {

  /** Ingested ticker row (reference dbo.crypto: symbol varchar(10), price decimal(10,2)).
    * `ingest_ts` is carried from day one so watermarked/event-time operators can be
    * added without a schema migration (SURVEY.md §2.9).
    */
  val bronze: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("price", DecimalType(10, 2), nullable = false),
    StructField("ingest_ts", TimestampType, nullable = true)
  ))

  /** Silver = deduplicated bronze, same columns. */
  val silver: StructType = bronze

  /** Gold = per-symbol min/max/spread + as-of date partition columns
    * (reference silverToGold.scala:12-26).
    */
  val gold: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("min_value_by_crypto", DecimalType(10, 2), nullable = true),
    StructField("max_value_by_crypto", DecimalType(10, 2), nullable = true),
    StructField("difference_between_min_max", DecimalType(11, 2), nullable = true),
    StructField("year", IntegerType, nullable = false),
    StructField("month", IntegerType, nullable = false),
    StructField("day", IntegerType, nullable = false)
  ))

  /** Serving = gold + surrogate id, every column stringified
    * (reference goldToSynapse.scala:27-34; rationale README.md:1259).
    */
  val serving: StructType = StructType(
    StructField("id", StringType, nullable = false) +:
      gold.fields.map(f => StructField(f.name, StringType, f.nullable)).toSeq
  )

  /** JSON payload schema of one poll of the ticker feed (reference
    * etl-vini-azure.py:72-79: `[{"symbol": ..., "price": ...}]`).
    */
  val tickerJson: ArrayType = ArrayType(StructType(Seq(
    StructField("symbol", StringType, nullable = true),
    StructField("price", DecimalType(10, 2), nullable = true)
  )))
}

/** Typed facade for the core model. */
final case class Ticker(symbol: String, price: java.math.BigDecimal)
