package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A6 as-of join (SURVEY.md §2.4): for each left row, attach the payload of
  * the nearest right row within the same key — backward ([[asOf]]: most
  * recent `rightTs <= leftTs`) or forward ([[asOfForward]]: earliest
  * `rightTs >= leftTs`) — the natural join for this time-series domain
  * (price as of event time; reference data model at etl.py:96-99).
  *
  * Spark has no built-in; this is the union + ordered window formulation:
  * tag sides, union, then within each key scan in (ts, side) order carrying
  * the nearest right payload.
  *
  * Tie semantics: at equal timestamps the right row sorts on the MATCHING
  * side of the left row (before it for backward, after it for forward), so
  * an exact-ts right row is visible in both directions — matching DuckDB
  * `ASOF JOIN ... ON l.ts >= r.ts` / `ON l.ts <= r.ts`.
  *
  * Null timestamps match NOTHING (same as the DuckDB inequality, which a
  * null ts fails): the carried payload is masked to null for null-ts left
  * rows, and null-ts right rows contribute nothing. Without the mask the
  * window's nulls-first ordering would silently hand null-ts rows the
  * partition's edge payload.
  *
  * Scale: ONE shuffle on the key + one in-partition sort — the same cost
  * shape as a sort-merge join; no pairwise expansion, no broadcast of the
  * (potentially huge) right side. Skewed keys behave like any window: salt
  * upstream if one key dominates.
  */
object AsOfJoin {

  /** Backward as-of: latest right row at-or-before each left row.
    *
    * @param payload right-side columns to carry; they appear on the output as
    *                `prefix + name`. Left columns pass through unchanged. */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      prefix: String = "asof_"): DataFrame =
    joined(left, right, key, leftTs, rightTs, payload, prefix,
      forward = false)

  /** FORWARD as-of: earliest right row at-or-after each left row — the
    * "next event" direction (next signup after a click, next quote after
    * an order). Mirror image of [[asOf]]. */
  def asOfForward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      prefix: String = "asof_"): DataFrame =
    joined(left, right, key, leftTs, rightTs, payload, prefix,
      forward = true)

  /** The shared union+window plan. The two directions differ only in the
    * side tags (which side of a ts tie the right rows land on), the frame
    * direction, and the edge aggregate (last of preceding vs first of
    * following). */
  private def joined(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      prefix: String, forward: Boolean): DataFrame = {
    val leftOther = left.columns.filterNot(_ == key).toSeq
    val outPayload = payload.map(prefix + _)
    val rightType = right.schema.fields.map(f => f.name -> f.dataType).toMap
    val leftType = left.schema.fields.map(f => f.name -> f.dataType).toMap
    val (lTag, rTag) = if (forward) (0, 1) else (1, 0)

    val lSide = left.select(
      col(key) +: col(leftTs).cast("timestamp").as("__ts") +:
        lit(lTag).as("__side") +:
        (leftOther.map(col) ++
          payload.map(p => lit(null).cast(rightType(p)).as(prefix + p))): _*)
    val rSide = right
      // a null-ts right row must never be the carried neighbor
      .filter(col(rightTs).isNotNull)
      .select(
        col(key) +: col(rightTs).cast("timestamp").as("__ts") +:
          lit(rTag).as("__side") +:
          (leftOther.map(c => lit(null).cast(leftType(c)).as(c)) ++
            payload.map(p => col(p).as(prefix + p))): _*)

    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"))
    val (frame, edge) =
      if (forward)
        (w.rowsBetween(0, Window.unboundedFollowing),
          (c: Column) => first(c, ignoreNulls = true))
      else
        (w.rowsBetween(Window.unboundedPreceding, 0),
          (c: Column) => last(c, ignoreNulls = true))
    val carried = lSide.unionByName(rSide).select(
      col(key) +: col("__side") +: (leftOther.map(col) ++
        outPayload.map(p =>
          // null-ts LEFT rows sort at the partition head (nulls first) and
          // would otherwise see the edge payload; they match nothing
          when(col("__ts").isNotNull, edge(col(p)).over(frame)).as(p))): _*)
    carried.filter(col("__side") === lTag).drop("__side")
  }
}
