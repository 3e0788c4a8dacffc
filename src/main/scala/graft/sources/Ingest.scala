package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** Ingest stage (reference etl-vini-azure.py:61-104): a bounded polling loop
  * fetches JSON ticker batches, accumulates them, filters to the tracked
  * symbols, sorts, and hands off to the relational store / bronze layer.
  *
  * The HTTP fetch is abstracted behind [[TickerFetcher]] so tests and the
  * offline profile inject a deterministic stub; the driver-side fetch is
  * unavoidable (the feed is a single REST endpoint), but everything after
  * `parseBatches` is distributed.
  */
trait TickerFetcher {
  /** One poll → one JSON array payload `[{"symbol":..,"price":..},..]`. */
  def fetch(): String
}

/** Deterministic stub standing in for the Binance REST endpoint. */
final class StubTickerFetcher(batches: Seq[String]) extends TickerFetcher {
  private val it = Iterator.continually(batches).flatten
  override def fetch(): String = synchronized(it.next())
}

object Ingest {
  /** The reference's tracked symbols (etl-vini-azure.py:78). */
  val symbols: Seq[String] = Seq("BTCUSDT", "ADAUSDT", "ETHUSDT", "BNBUSDT", "LTCUSDT")

  /** Two deterministic poll payloads used by the offline stub and the declared
    * `ingest_micro_batch` query (values arbitrary but fixed; DOGEUSDT/XRPUSDT
    * exercise the IN-list filter's negative path).
    */
  val stubBatches: Seq[String] = Seq(
    """[{"symbol":"BTCUSDT","price":38277.23},{"symbol":"ETHUSDT","price":2641.17},
       {"symbol":"ADAUSDT","price":1.18},{"symbol":"BNBUSDT","price":377.40},
       {"symbol":"LTCUSDT","price":129.99},{"symbol":"DOGEUSDT","price":0.14}]""",
    """[{"symbol":"BTCUSDT","price":38310.50},{"symbol":"ETHUSDT","price":2650.00},
       {"symbol":"ADAUSDT","price":1.19},{"symbol":"BNBUSDT","price":378.01},
       {"symbol":"LTCUSDT","price":130.25},{"symbol":"XRPUSDT","price":0.81}]"""
  )

  /** S2: parse JSON array payloads into (symbol, price decimal(10,2)) rows. */
  def parseBatches(spark: SparkSession, payloads: Seq[String]): DataFrame = {
    import spark.implicits._
    val raw: Dataset[String] = spark.createDataset(payloads)
    raw.toDF("payload")
      .select(explode(from_json(col("payload"), Schemas.tickerJson)).as("t"))
      .select(col("t.symbol").as("symbol"), col("t.price").as("price"))
  }

  /** S1+U1+P1+O1: poll `polls` times, union the micro-batches, keep tracked
    * symbols, total-order. The union is by name so batch column order can
    * drift without corrupting the accumulate.
    */
  def ingest(spark: SparkSession, fetcher: TickerFetcher, polls: Int): DataFrame = {
    val frames = (0 until polls).map(_ => parseBatches(spark, Seq(fetcher.fetch())))
    frames.reduce(_ unionByName _)
      .filter(col("symbol").isin(symbols: _*))
      .orderBy(col("symbol"), col("price"))
  }
}
