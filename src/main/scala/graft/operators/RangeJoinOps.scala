package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * An interval spanning vastly more buckets than the width anticipates
  * would replicate into a huge `sequence` array (Spark hard-caps sequence
  * length) — both operators guard it with an explicit per-row error
  * (`maxBucketsPerInterval`, default 100k) naming the offending span, so a
  * mis-sized width fails with a diagnosis instead of an opaque codegen
  * error mid-shuffle. Skewed buckets (hot time ranges) split under AQE
  * skew-join handling.
  */
object RangeJoinOps {

  /** Replication cap: an interval covering more than this many buckets
    * fails fast with a descriptive error — see the width-selection note
    * above. 100k × 8-byte bucket ids is already a pathological 800 KB row;
    * a correct `bucketWidth` keeps the factor near 2. */
  val maxBucketsPerInterval: Long = 100000L

  /** Exact floor(c / w) for EVERY long (w > 0): truncate-toward-zero
    * IntegralDivide, then step one down when a negative dividend had a
    * remainder. `q·w` cannot overflow (|q·w| ≤ |c| for truncating
    * division), unlike the former `c - pmod(c, w)` prescaling, which
    * wrapped for values within `w` of Long.MinValue (ADVICE r4). */
  private def floorDivBucket(c: Column, w: Column): Column = {
    val cl = c.cast("long")
    val wl = w.cast("long")
    val q = ColumnBridge.column(IntegralDivide(
      ColumnBridge.expression(cl), ColumnBridge.expression(wl),
      evalMode = EvalMode.LEGACY))
    when(cl < 0 && cl =!= q * wl, q - 1).otherwise(q)
  }

  /** `sequence(bucket(lo), bucket(hi))` with the replication-cap guard:
    * emits the bucket-id array, or raises a descriptive error when the
    * span exceeds [[maxBucketsPerInterval]]. Callers guarantee bHi ≥ bLo
    * (they filter hi ≥ lo first), but the difference itself can OVERFLOW
    * for astronomically wide intervals (lo near Long.MinValue, hi near
    * Long.MaxValue): under ANSI mode a plain subtraction would throw
    * ARITHMETIC_OVERFLOW before the guard even evaluates, and with ANSI
    * off the wrapped (negative) span would sneak past a `< cap` check —
    * `try_subtract` returns NULL on overflow, which fails the `when`
    * conjuncts and routes to the same descriptive error either way. */
  private def bucketSeq(bLo: Column, bHi: Column): Column = {
    val span = try_subtract(bHi, bLo)
    when(span.isNotNull && span >= 0 && span < lit(maxBucketsPerInterval),
        sequence(bLo, bHi))
      .otherwise(raise_error(concat(
        lit("range-join interval spans "),
        coalesce(try_add(span, lit(1L)).cast("string"),
          lit("more than Long.MaxValue")),
        lit(s" buckets (cap $maxBucketsPerInterval) — bucketWidth is far " +
          "smaller than this interval; pick a width near the typical " +
          "interval length"))))
  }

  private def requireNoBucketCol(df: DataFrame, side: String): Unit =
    require(!df.columns.contains("__bucket"),
      s"$side input already has a `__bucket` column — the bucketed join " +
        "injects and later drops that name, which would silently destroy " +
        "the user column; rename it first")

  /** Inner-joins `points` to `intervals` on `lo <= point < hi` (half-open).
    * `pointCol`/`loCol`/`hiCol` are LongType value columns (callers convert
    * timestamps via `unix_micros`); column names of the two inputs must be
    * disjoint, and neither side may already contain `__bucket` (asserted).
    * Intervals with `hi <= lo` are empty and drop out naturally.
    */
  def bucketedRangeJoin(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    requireNoBucketCol(points, "points")
    requireNoBucketCol(intervals, "intervals")
    val w = lit(bucketWidth)
    val p = points.withColumn("__bucket", floorDivBucket(col(pointCol), w))
    val i = intervals
      .filter(col(hiCol) > col(loCol))
      .withColumn("__bucket", explode(bucketSeq(
        floorDivBucket(col(loCol), w),
        floorDivBucket(col(hiCol) - lit(1L), w))))
    p.join(i, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }

  /** Inner-joins two interval sets on STRICT overlap
    * (`aLo < bHi && bLo < aHi` — touching endpoints do not overlap).
    * Column names must be disjoint, neither side may already contain
    * `__bucket` (asserted), and all four are LongType values.
    *
    * PRECONDITION: intervals are well-formed (`hi >= lo`). Inverted rows
    * (`hi < lo`) are DROPPED before bucketing — the naive theta predicate
    * can technically match an inverted interval (e.g. a=(5,3) against
    * b=(2,6)), so on malformed input this operator is the theta join
    * restricted to well-formed rows, not the raw theta join
    * (RangeJoinSpec pins the chosen semantics).
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
    requireNoBucketCol(left, "left")
    requireNoBucketCol(right, "right")
    val w = lit(bucketWidth)
    def spread(df: DataFrame, lo: String, hi: String): DataFrame = df
      .filter(col(hi) >= col(lo))
      .withColumn("__bucket", explode(bucketSeq(
        floorDivBucket(col(lo), w), floorDivBucket(col(hi), w))))
    spread(left, aLo, aHi).join(spread(right, bLo, bHi), Seq("__bucket"))
      .filter(col(aLo) < col(bHi) && col(bLo) < col(aHi) &&
        col("__bucket") === greatest(
          floorDivBucket(col(aLo), w), floorDivBucket(col(bLo), w)))
      .drop("__bucket")
  }
}
