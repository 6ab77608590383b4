package graft.plans

import org.apache.datasketches.kll.KllLongsSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** KLL quantile-sketch algebra (Karnin, Lang & Liberty, "Optimal
  * quantile approximation in streams", FOCS 2016; the Apache
  * DataSketches implementation Spark itself ships for its HLL
  * functions) — the MERGEABLE percentile summary the sketch ladder
  * (HLL q196 distinct, KMV q176) was missing: exact quantiles
  * ([[graft.operators.Profiling.exactQuantiles]]) are the batch
  * answer, but a streaming p50/p99 monitor needs a bounded state that
  * merges, and a quantile has no additive sufficient statistic — the
  * sketch IS the state. Spark 4.1 exposes no KLL SQL functions, so
  * these are the repo's own, built exactly like Spark's internal
  * `HllSketchAgg`: a [[TypedImperativeAggregate]] whose buffer is the
  * sketch itself — partials sketch map-side and MERGE in the shuffle
  * (k-bounded bytes per group travel, never values), the aggregation
  * shape a 100 TB rollup needs.
  *
  * Determinism note, minuted for the oracle convention: KLL compaction
  * flips unseeded random bits, so the sketch BYTES (and, at large n,
  * the estimates) are not run-reproducible — unlike everything else in
  * this repo. The error is BOUNDED regardless (normalized rank error
  * ε(k), 99% per query), so readouts are oracled the q191 way: the
  * emitted row carries exact-side values (counts are exact in KLL —
  * n adds deterministically) plus an in-query envelope check the
  * DuckDB side pins to its literal-true value; the estimate itself
  * never leaves the engine unchecked. */
case class KllSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllLongsSketch] {
  require(k >= 8 && k <= 65535, s"k=$k")
  override def createAggregationBuffer(): KllLongsSketch =
    KllLongsSketch.newHeapInstance(k)
  override def update(buffer: KllLongsSketch,
      input: InternalRow): KllLongsSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }
  override def merge(buffer: KllLongsSketch,
      other: KllLongsSketch): KllLongsSketch = {
    buffer.merge(other); buffer
  }
  override def eval(buffer: KllLongsSketch): Any = buffer.toByteArray
  override def serialize(buffer: KllLongsSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllLongsSketch =
    KllLongsSketch.heapify(Memory.wrap(bytes))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KllSketchAgg = copy(child = c.head)
  override def prettyName: String = "kll_sketch_agg"
}

/** Union of SERIALIZED KLL sketches (binary column → merged binary) —
  * the rollup half of the algebra: state tables store sketch bytes,
  * and readouts merge a window of them without touching raw values. */
case class KllUnionAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllLongsSketch] {
  require(k >= 8 && k <= 65535, s"k=$k")
  override def createAggregationBuffer(): KllLongsSketch =
    KllLongsSketch.newHeapInstance(k)
  override def update(buffer: KllLongsSketch,
      input: InternalRow): KllLongsSketch = {
    val v = child.eval(input)
    if (v != null) buffer.merge(
      KllLongsSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }
  override def merge(buffer: KllLongsSketch,
      other: KllLongsSketch): KllLongsSketch = {
    buffer.merge(other); buffer
  }
  override def eval(buffer: KllLongsSketch): Any = buffer.toByteArray
  override def serialize(buffer: KllLongsSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllLongsSketch =
    KllLongsSketch.heapify(Memory.wrap(bytes))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(n: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KllUnionAgg = copy(child = c.head)
  override def prettyName: String = "kll_union_agg"
}

/** Quantile readout from a serialized sketch: value at normalized rank
  * `permille`/1000 (INCLUSIVE search — the DataSketches default).
  * Scalar over state-table rows (day-grain — k-bounded row counts),
  * so CodegenFallback costs nothing measurable. */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "kll_quantile"
  override protected def nullSafeEval(sk: Any, p: Any): Any = {
    val s = KllLongsSketch.heapify(Memory.wrap(sk.asInstanceOf[Array[Byte]]))
    if (s.isEmpty) null
    else s.getQuantile(p.asInstanceOf[Long] / 1000.0,
      QuantileSearchCriteria.INCLUSIVE)
  }
  override def nullable: Boolean = true
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): KllQuantile = copy(left = l, right = r)
}

/** Exact stream length of a serialized sketch — n adds
  * DETERMINISTICALLY across updates and merges (no randomness on this
  * axis), so readouts can emit it as an oracle-checkable exact count. */
case class KllN(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "kll_n"
  override protected def nullSafeEval(sk: Any): Any =
    KllLongsSketch.heapify(
      Memory.wrap(sk.asInstanceOf[Array[Byte]])).getN
  override protected def withNewChildInternal(c: Expression): KllN =
    copy(child = c)
}

/** The sketch's own one-sided normalized rank error bound ε (99%
  * confidence, non-PMF) in DOUBLE — read from the sketch so envelope
  * checks never hardcode a constant that drifts from the library. */
case class KllRankError(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_rank_error"
  override protected def nullSafeEval(sk: Any): Any =
    KllLongsSketch.heapify(
      Memory.wrap(sk.asInstanceOf[Array[Byte]]))
      .getNormalizedRankError(false)
  override protected def withNewChildInternal(c: Expression): KllRankError =
    copy(child = c)
}

object KllExpressions {
  /** Map-side sketching aggregate over a long column. */
  def kll_sketch_agg(v: Column, k: Int): Column =
    ColumnBridge.column(
      KllSketchAgg(ColumnBridge.expression(v), k).toAggregateExpression())

  /** Union aggregate over serialized sketches. */
  def kll_union_agg(sk: Column, k: Int): Column =
    ColumnBridge.column(
      KllUnionAgg(ColumnBridge.expression(sk), k).toAggregateExpression())

  def kll_quantile(sk: Column, permille: Column): Column =
    ColumnBridge.column(KllQuantile(
      ColumnBridge.expression(sk), ColumnBridge.expression(permille)))

  def kll_n(sk: Column): Column =
    ColumnBridge.column(KllN(ColumnBridge.expression(sk)))

  def kll_rank_error(sk: Column): Column =
    ColumnBridge.column(KllRankError(ColumnBridge.expression(sk)))
}
