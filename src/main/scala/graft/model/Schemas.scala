package graft.model

import org.apache.spark.sql.types._

/** Stage schemas for the medallion pipeline (reference:
  * k8s/dags/etl-vini-azure.py:87-90, k8s/resources/notebooks/codes/silverToGold.scala:12-26,
  * codes/goldToSynapse.scala:27-34). Explicit StructTypes so every stage is
  * schema-checked instead of inferred.
  */
object Schemas {

  /** Ingested ticker row (reference dbo.crypto: symbol varchar(10), price
    * decimal(10,2)) — exactly what [[graft.sources.Ingest.parseBatches]]
    * produces.
    */
  val bronze: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = true),
    StructField("price", DecimalType(10, 2), nullable = true)
  ))

  /** Streaming bronze = bronze + ingest_ts, as produced by
    * [[graft.streaming.Streaming.parseTickStream]]; the event-time column is
    * what watermarked/event-time operators key on (SURVEY.md §2.9).
    */
  val bronzeStreaming: StructType = StructType(
    bronze.fields.toSeq :+ StructField("ingest_ts", TimestampType, nullable = true))

  /** Silver = deduplicated bronze, same columns. */
  val silver: StructType = bronze

  /** Gold = per-key min/max/spread + as-of date partition columns, exactly as
    * [[graft.operators.Medallion.silverToGold]] emits them (the reference's
    * column names — min_value_by_crypto etc., silverToGold.scala:12-26 — are
    * domain-bound to crypto; the engine uses the generic names).
    */
  val gold: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = true),
    StructField("min_value", DecimalType(12, 2), nullable = true),
    StructField("max_value", DecimalType(12, 2), nullable = true),
    StructField("diff", DecimalType(12, 2), nullable = true),
    StructField("as_of_year", IntegerType, nullable = false),
    StructField("as_of_month", IntegerType, nullable = false),
    StructField("as_of_day", IntegerType, nullable = false)
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
