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
  /** W13: TIME-WEIGHTED average as an exact RATIONAL — the sensor/price
    * metric a plain mean gets wrong (a value held for an hour must weigh
    * 3600× one held a second). Each observation is weighted by its holding
    * time (until the next observation; the last one contributes none —
    * the standard left-continuous step-function convention), and the
    * result ships as the exact integer pair (num, den): num = Σ
    * milli-value × Δt-µs, den = observed span — so the quotient is the
    * caller's choice of precision and the operator itself replays
    * bit-for-bit (a float average could not). Values quantize through
    * DECIMAL(15,3) (the engine-portable rounding used across the repo).
    *
    * One key exchange: the lead window and the final aggregate share the
    * key partitioning. Keys with one observation surface with den 0 /
    * num 0 rather than vanishing.
    */
  def timeWeighted(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
                   tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    df.select(col(keyCol), col(tsCol), col(tieCol),
        (col(valCol).cast(org.apache.spark.sql.types.DecimalType(15, 3)) * 1000)
          .cast("long").as("__vm"))
      .withColumn("__nt", lead(col(tsCol), 1).over(w))
      .groupBy(col(keyCol))
      .agg(
        coalesce(sum(when(col("__nt").isNotNull,
          col("__vm") * (col("__nt") - col(tsCol)))), lit(0L)).as("twa_num"),
        (max(col(tsCol)) - min(col(tsCol))).as("twa_den"),
        count(lit(1)).as("n_obs"))
  }

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
