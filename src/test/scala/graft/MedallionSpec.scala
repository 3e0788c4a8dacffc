package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.operators.Medallion

class MedallionSpec extends SparkSpec {
  import TestSpark.sf

  private lazy val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
  private val asOf = LocalDate.of(2022, 2, 28)

  test("silverToGold: min <= max and diff = max - min for every group") {
    val gold = Medallion.silverToGold(lineitem, "l_returnflag", "l_extendedprice", asOf).collect()
    assert(gold.nonEmpty)
    gold.foreach { r =>
      val mn = r.getDecimal(1); val mx = r.getDecimal(2); val diff = r.getDecimal(3)
      assert(mn.compareTo(mx) <= 0)
      assert(mx.subtract(mn).compareTo(diff) == 0)
      assert(r.getInt(4) == 2022 && r.getInt(5) == 2 && r.getInt(6) == 28)
    }
  }

  test("bronzeToSilver: distinct is idempotent and sorted") {
    val df = lineitem.select("l_returnflag", "l_linestatus")
    val once = Medallion.bronzeToSilver(df, Seq("l_returnflag", "l_linestatus"))
    val twice = Medallion.bronzeToSilver(once, Seq("l_returnflag", "l_linestatus"))
    assert(once.collect().toSeq == twice.collect().toSeq)
    assert(once.count() == df.distinct().count())
  }

  test("stringify preserves DECIMAL(_,2) scale in rendered strings") {
    import spark.implicits._
    val df = Seq(("x", new java.math.BigDecimal("0.88")), ("y", new java.math.BigDecimal("12.30")))
      .toDF("k", "v").select(col("k"), col("v").cast("decimal(10,2)").as("v"))
    val rows = Medallion.stringify(df).orderBy("k").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("0.88", "12.30"))
  }

  test("withSurrogateId: dense 1..n ids in key order") {
    val gold = Medallion.silverToGold(lineitem, "l_returnflag", "l_extendedprice", asOf)
    val ids = Medallion.withSurrogateId(gold, Seq("l_returnflag"))
      .select("id").collect().map(_.getString(0)).toSeq
    assert(ids == (1 to gold.count().toInt).map(_.toString))
  }

  test("withScalableSurrogateId matches the window-based id assignment") {
    val df = lineitem.select("l_orderkey", "l_linenumber").limit(500)
    val windowed = Medallion.withSurrogateId(df, Seq("l_orderkey", "l_linenumber"))
      .select(col("id").cast("long"), col("l_orderkey"), col("l_linenumber"))
    val scalable = Medallion.withScalableSurrogateId(df, Seq("l_orderkey", "l_linenumber"))
      .select(col("id"), col("l_orderkey"), col("l_linenumber"))
    assert(windowed.orderBy("id").collect().toSeq == scalable.orderBy("id").collect().toSeq)
  }
}
