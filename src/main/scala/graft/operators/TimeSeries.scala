package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: regularize an irregular event stream onto a fixed
  * calendar (gap filling + forward fill) — the feature-engineering step that
  * turns sparse per-entity events into dense daily panels.
  *
  * No reference citation ([EXT]): the reference's pipeline stops at daily
  * batch aggregates; this is the operator a training-data pipeline needs to
  * build per-entity time features at scale.
  */
object TimeSeries {

  /** Daily gap-fill with forward fill, per key.
    *
    * 1. Aggregate to one row per (key, day) — max of the value, fixed-point.
    * 2. Build the dense spine: every key × every day in the GLOBAL [min, max]
    *    day range (sequence + explode — no driver loop; the range aggregate
    *    is a 2-value broadcast).
    * 3. Forward-fill without any non-portable IGNORE NULLS construct: a
    *    running count of non-null observations per key (`grp`) stamps each
    *    gap row with the index of the observation it follows; the fill value
    *    is then the single non-null value in its (key, grp) frame. Rows
    *    before a key's first observation stay null (grp = 0).
    *
    * Scale: one shuffle for the daily aggregate, one per-key window (both on
    * the key — co-partitioned), and the spine explode is map-side. Keys fill
    * independently in parallel; nothing is proportional to the global
    * calendar except the tiny min/max broadcast.
    */
  def gapFillDaily(events: DataFrame, keyCol: String, dayCol: Column,
                   valueCol: Column): DataFrame = {
    val daily = events
      .select(col(keyCol).as("key"), dayCol.as("day"), valueCol.as("v"))
      .groupBy("key", "day").agg(max(col("v")).as("v"))
    val bounds = daily.agg(min("day").as("d0"), max("day").as("d1"))
    val spine = daily.select("key").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("key"), explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val wCum = Window.partitionBy("key").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("key", "day"), "left")
      .withColumn("grp", count(col("v")).over(wCum))
      .withColumn("v_filled", max(col("v")).over(Window.partitionBy("key", "grp")))
      .select(col("key"), col("day"), col("v"), col("v_filled"))
  }
}
