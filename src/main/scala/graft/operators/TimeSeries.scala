package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series warehouse operators over keyed event/measurement logs:
  * calendar resampling with forward fill (the gap-filling every
  * sensor/price/metrics pipeline needs before joins or models) and
  * drawdown (the running-peak shortfall curve). Both are exact integer /
  * per-row arithmetic — fully oracle-replayable.
  *
  * Scale notes: resampling explodes each key's OWN [first, last] day
  * span (map-only `sequence`, the q189 idiom — no range join) and every
  * window is keyed, so cost is Σ_key span-days with one hash shuffle on
  * the key. Drawdown's running max over an unpartitioned frame is
  * applied to the per-DAY aggregate — calendar-bounded (the
  * [[Behavior.rateCusum]] argument), never event-sized. */
object TimeSeries {

  /** Daily forward-fill resample: per key, one row for EVERY calendar
    * day in that key's [first-observation, last-observation] span, each
    * carrying the key's most recent observed value at or before that
    * day (`filled`) plus whether the day had its own observation
    * (`observed`). The day's representative value is the LAST
    * observation of the day by (ts, tie) — deterministic under the
    * unique tie column (max of the (ts, tie, value) struct — one
    * aggregate, no window). Gap days join nothing and inherit via
    * `last(..., ignoreNulls)` over the key's day order — rows-frame,
    * key-sized partitions. NULL-valued observations are treated as
    * gaps, not resets. */
  def resampleDailyFfill(df: DataFrame, key: String, ts: String,
      tie: String, value: String): DataFrame = {
    val daily = df
      .select(col(key).as("k"), Behavior.epochDay(col(ts)).as("d"),
        col(ts).as("t"), col(tie).as("tk"), col(value).as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("k"), col("d"))
      .agg(max(struct(col("t"), col("tk"), col("v"))).getField("v")
        .as("day_v"))
    val spans = daily.groupBy(col("k"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val grid = spans
      .withColumn("d", explode(sequence(col("d0"), col("d1"))))
      .select(col("k"), col("d"))
    val w = Window.partitionBy(col("k")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("k", "d"), "left")
      .withColumn("filled", last(col("day_v"), ignoreNulls = true).over(w))
      .select(col("k"), col("d"),
        col("day_v").isNotNull.cast("int").as("observed"), col("filled"))
  }

  /** Drawdown curve of a daily total: per day, the running peak of the
    * cumulative-to-date daily aggregate and the shortfall from it —
    * drawdown_d = max_{j≤d}(v_j) − v_d, the classic "how far below the
    * best day are we" monitor (finance equity curves, throughput
    * regressions). `value` is quantized to integer cents (×100) before
    * the day sum, so peaks and shortfalls are exact 64-bit integers.
    * Both windows run on the days-sized aggregate — calendar-bounded,
    * not data-bounded ([[Behavior.rateCusum]]'s regime). */
  def dailyDrawdown(df: DataFrame, ts: String, value: Column): DataFrame = {
    val daily = df
      .select(Behavior.epochDay(col(ts)).as("d"),
        round(value * 100, 0).cast("long").as("cents"))
      .groupBy(col("d")).agg(sum(col("cents")).as("revenue_cents"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("peak_cents", max(col("revenue_cents")).over(w))
      .withColumn("drawdown_cents",
        col("peak_cents") - col("revenue_cents"))
  }
}
