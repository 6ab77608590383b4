package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One observation for the candle aggregate: a value `v` with a composite
  * ordering key (`ord1`, `ord2`) — e.g. (epoch day, orderkey) — so
  * first/last are deterministic even when timestamps tie. */
case class PricePoint(key: Long, ord1: Long, ord2: Long, v: Double)

case class CandleBuf(
    firstOrd1: Long, firstOrd2: Long, first: Double,
    lastOrd1: Long, lastOrd2: Long, last: Double,
    lo: Double, hi: Double, total: Double, n: Long)

case class Candle(open: Double, high: Double, low: Double, close: Double,
    total: Double, n: Long)

/** G5 typed custom aggregate (SURVEY.md §2.5): the OHLC "candle merge" —
  * first-open / max-high / min-low / last-close / sum-volume when
  * re-bucketing a price series, generalizing the reference's daily rows
  * (etl.py:89-99) to arbitrary buckets.
  *
  * Implemented as a public `Aggregator[IN, BUF, OUT]`: `reduce` and `merge`
  * are both associative-with-order-keys, so Spark plans a partial (map-side)
  * aggregate followed by a final merge — the same two-phase shape as a
  * built-in `sum`, which is what makes it safe at 100 TB (no per-key row
  * buffering, constant-size state).
  */
class CandleAggregator extends Aggregator[PricePoint, CandleBuf, Candle] {

  private def before(a1: Long, a2: Long, b1: Long, b2: Long): Boolean =
    a1 < b1 || (a1 == b1 && a2 < b2)

  override def zero: CandleBuf =
    CandleBuf(Long.MaxValue, Long.MaxValue, 0.0, Long.MinValue, Long.MinValue,
      0.0, Double.PositiveInfinity, Double.NegativeInfinity, 0.0, 0L)

  override def reduce(b: CandleBuf, p: PricePoint): CandleBuf = {
    val takesFirst = b.n == 0L || before(p.ord1, p.ord2, b.firstOrd1, b.firstOrd2)
    val takesLast = b.n == 0L || !before(p.ord1, p.ord2, b.lastOrd1, b.lastOrd2)
    CandleBuf(
      if (takesFirst) p.ord1 else b.firstOrd1,
      if (takesFirst) p.ord2 else b.firstOrd2,
      if (takesFirst) p.v else b.first,
      if (takesLast) p.ord1 else b.lastOrd1,
      if (takesLast) p.ord2 else b.lastOrd2,
      if (takesLast) p.v else b.last,
      math.min(b.lo, p.v), math.max(b.hi, p.v), b.total + p.v, b.n + 1L)
  }

  override def merge(a: CandleBuf, b: CandleBuf): CandleBuf = {
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else {
      val firstFromA = before(a.firstOrd1, a.firstOrd2, b.firstOrd1, b.firstOrd2)
      val lastFromA = !before(a.lastOrd1, a.lastOrd2, b.lastOrd1, b.lastOrd2)
      CandleBuf(
        if (firstFromA) a.firstOrd1 else b.firstOrd1,
        if (firstFromA) a.firstOrd2 else b.firstOrd2,
        if (firstFromA) a.first else b.first,
        if (lastFromA) a.lastOrd1 else b.lastOrd1,
        if (lastFromA) a.lastOrd2 else b.lastOrd2,
        if (lastFromA) a.last else b.last,
        math.min(a.lo, b.lo), math.max(a.hi, b.hi), a.total + b.total, a.n + b.n)
    }
  }

  override def finish(b: CandleBuf): Candle =
    Candle(b.first, b.hi, b.lo, b.last, b.total, b.n)

  override def bufferEncoder: Encoder[CandleBuf] = Encoders.product[CandleBuf]
  override def outputEncoder: Encoder[Candle] = Encoders.product[Candle]
}
