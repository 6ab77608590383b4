package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{EvalMode, IntegralDivide}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Large-large range (band) join via bucketing (SURVEY.md §2.4 A5).
  *
  * `q28_range_join` covers the small-dim case (broadcast nested-loop is the
  * right plan there). When BOTH sides are large, BroadcastNestedLoopJoin is
  * O(|P|·|I|) predicate evaluations and a broadcast of a whole table — the
  * classic non-equi-join cliff at scale. The standard rewrite (the same
  * binning behind Databricks' range-join hint and Flink's interval join)
  * turns the band predicate into an equi-join:
  *
  *   - each point `p` falls in exactly ONE bucket `floor(p / w)`;
  *   - each interval `[lo, hi)` is replicated into every bucket it covers
  *     (`sequence(floor(lo/w), floor(hi/w))` — ~len/w + 1 copies);
  *   - equi-join on the bucket id, then re-check the exact predicate.
  *
  * Every qualifying (point, interval) pair meets in exactly one bucket (the
  * point's), so no post-join dedup is needed and the result is EXACTLY the
  * naive theta join (RangeJoinSpec proves equality on fixture + adversarial
  * data). Cost: one shuffle of each side on the bucket id + interval
  * replication; pick `bucketWidth` ≈ the typical interval length so the
  * replication factor stays ~2 and each bucket pairs only nearby rows.
  * Skewed buckets (hot time ranges) split under AQE skew-join handling.
  */
object RangeJoinOps {

  /** Inner-joins `points` to `intervals` on `lo <= point < hi` (half-open).
    * `pointCol`/`loCol`/`hiCol` are LongType value columns (callers convert
    * timestamps via `unix_micros`); column names of the two inputs must be
    * disjoint. Intervals with `hi <= lo` are empty and drop out naturally.
    */
  def bucketedRangeJoin(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val w = lit(bucketWidth)
    // Exact integer floor-div for every long (SQL `div` truncates toward
    // zero; a double floor() loses exactness past 2^53): subtract the
    // nonnegative pmod remainder, then IntegralDivide is exact.
    def bucketOf(c: org.apache.spark.sql.Column) = ColumnBridge.column(
      IntegralDivide(
        ColumnBridge.expression((c.cast("long") - pmod(c.cast("long"), w)).cast("long")),
        ColumnBridge.expression(w.cast("long")), evalMode = EvalMode.LEGACY))
    val p = points.withColumn("__bucket", bucketOf(col(pointCol)))
    val i = intervals
      .filter(col(hiCol) > col(loCol))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol) - lit(1L)))))
    p.join(i, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }

  /** Inner-joins two interval sets on STRICT overlap
    * (`aLo < bHi && bLo < aHi` — touching endpoints do not overlap).
    * Column names must be disjoint; all four are LongType values.
    *
    * Both sides replicate into every covered bucket (inclusive of the
    * bucket holding `hi`: a zero-length interval still overlaps intervals
    * that strictly contain it), so a qualifying pair can meet in SEVERAL
    * shared buckets. Exactly-once emission without a dedup shuffle: keep
    * the pair only in the FIRST shared bucket,
    * `greatest(bucket(aLo), bucket(bLo))` — if the intervals overlap, that
    * bucket is within both ranges (were `bucket(bLo) > bucket(aHi)`, then
    * `bLo > aHi` and they could not overlap), and equality with a single
    * canonical bucket holds in exactly one joined row. */
  def bucketedOverlapJoin(left: DataFrame, right: DataFrame,
      aLo: String, aHi: String, bLo: String, bHi: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val w = lit(bucketWidth)
    def bucketOf(c: org.apache.spark.sql.Column) = ColumnBridge.column(
      IntegralDivide(
        ColumnBridge.expression((c.cast("long") - pmod(c.cast("long"), w)).cast("long")),
        ColumnBridge.expression(w.cast("long")), evalMode = EvalMode.LEGACY))
    def spread(df: DataFrame, lo: String, hi: String): DataFrame = df
      .filter(col(hi) >= col(lo))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(lo)), bucketOf(col(hi)))))
    spread(left, aLo, aHi).join(spread(right, bLo, bHi), Seq("__bucket"))
      .filter(col(aLo) < col(bHi) && col(bLo) < col(aHi) &&
        col("__bucket") === greatest(bucketOf(col(aLo)), bucketOf(col(bLo))))
      .drop("__bucket")
  }
}
