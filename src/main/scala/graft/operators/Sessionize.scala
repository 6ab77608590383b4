package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands sessionization (SURVEY.md §2.10 T7 batch analog): assign
  * a per-key session id that increments whenever the gap to the previous
  * event exceeds `gapSeconds` (strictly greater — an exactly-gap-sized pause
  * stays in the session; Spark's built-in `session_window` uses the strict
  * complement, see [[graft.queries.Temporal.sessionWindow]]).
  *
  * Scale: one shuffle on the key + in-partition sort, O(1) window state.
  */
object Sessionize {

  /** Adds an IntegerType `session_id` column (1-based per key). */
  def sessionize(events: DataFrame, key: String, ts: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts))
    val wRun = w.rowsBetween(Window.unboundedPreceding, 0)
    val gapToPrev = col(ts).cast("double") - lag(col(ts), 1).over(w).cast("double")
    events
      .withColumn("__new", when(gapToPrev.isNull || gapToPrev > gapSeconds, 1)
        .otherwise(0))
      .withColumn("session_id", sum(col("__new")).over(wRun).cast("int"))
      .drop("__new")
  }
}
