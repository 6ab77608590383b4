package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A6 as-of join (SURVEY.md §2.4): for each left row, attach the payload of
  * the most recent right row with `rightTs <= leftTs` within the same key —
  * the natural join for this time-series domain (price as of event time;
  * reference data model at etl.py:96-99).
  *
  * Spark has no built-in; this is the union + ordered `last(_, ignoreNulls)`
  * window formulation: tag sides, union, then within each key scan in
  * (ts, side) order carrying the latest right payload forward.
  *
  * Tie semantics: at equal timestamps the right row sorts BEFORE the left row
  * (side 0 < 1), so a left row sees a right row with the exact same ts —
  * matching DuckDB `ASOF JOIN ... ON l.ts >= r.ts`.
  *
  * Scale: ONE shuffle on the key + one in-partition sort — the same cost
  * shape as a sort-merge join; no pairwise expansion, no broadcast of the
  * (potentially huge) right side. Skewed keys behave like any window: salt
  * upstream if one key dominates.
  */
object AsOfJoin {

  /** @param payload right-side columns to carry; they appear on the output as
    *                `prefix + name`. Left columns pass through unchanged. */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val leftOther = left.columns.filterNot(_ == key).toSeq
    val outPayload = payload.map(prefix + _)
    val rightType = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftType = left.schema.fields.map(f => f.name -> f.dataType).toMap

    val lSide = left.select(
      col(key) +: col(leftTs).cast("timestamp").as("__ts") +: lit(1).as("__side") +:
        (leftOther.map(col) ++
          payload.map(p => lit(null).cast(rightType(p)).as(prefix + p))): _*)
    val rSide = right.select(
      col(key) +: col(rightTs).cast("timestamp").as("__ts") +: lit(0).as("__side") +:
        (leftOther.map(c => lit(null).cast(leftType(c)).as(c)) ++
          payload.map(p => col(p).as(prefix + p))): _*)

    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = lSide.unionByName(rSide).select(
      col(key) +: col("__side") +: (leftOther.map(col) ++
        outPayload.map(p => last(col(p), ignoreNulls = true).over(w).as(p))): _*)
    carried.filter(col("__side") === 1).drop("__side")
  }

  /** FORWARD as-of: for each left row, the payload of the EARLIEST right
    * row with `rightTs >= leftTs` in the same key — the "next event"
    * direction (next signup after a click, next quote after an order).
    * Mirror image of [[asOf]]: left rows sort BEFORE right rows at equal
    * ts (so an exact-ts right row still matches), and the window scans the
    * FOLLOWING frame with `first(_, ignoreNulls)`. Matches DuckDB
    * `ASOF JOIN ... ON l.ts <= r.ts`. Same scale shape: one shuffle on the
    * key + one in-partition sort. */
  def asOfForward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val leftOther = left.columns.filterNot(_ == key).toSeq
    val outPayload = payload.map(prefix + _)
    val rightType = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftType = left.schema.fields.map(f => f.name -> f.dataType).toMap

    val lSide = left.select(
      col(key) +: col(leftTs).cast("timestamp").as("__ts") +: lit(0).as("__side") +:
        (leftOther.map(col) ++
          payload.map(p => lit(null).cast(rightType(p)).as(prefix + p))): _*)
    val rSide = right.select(
      col(key) +: col(rightTs).cast("timestamp").as("__ts") +: lit(1).as("__side") +:
        (leftOther.map(c => lit(null).cast(leftType(c)).as(c)) ++
          payload.map(p => col(p).as(prefix + p))): _*)

    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(0, Window.unboundedFollowing)
    val carried = lSide.unionByName(rSide).select(
      col(key) +: col("__side") +: (leftOther.map(col) ++
        outPayload.map(p => first(col(p), ignoreNulls = true).over(w).as(p))): _*)
    carried.filter(col("__side") === 0).drop("__side")
  }
}
