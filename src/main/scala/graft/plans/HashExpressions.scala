package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The four big-endian 32-bit words of a string's MD5 digest, as
  * `array<bigint>` — the batched deterministic-draw primitive behind
  * [[graft.operators.Profiling.bootstrapMeanCI]] (north-star X14;
  * SURVEY.md §4.2's "native Expression where built-ins cost multiples"
  * rule).
  *
  * Word j is EXACTLY `conv(substring(md5(s), 8*j+1, 8), 16, 10)` — the
  * hex rendering is just the digest bytes in order, so each aligned
  * 8-hex-char slice IS one big-endian 4-byte word — which is how the
  * DuckDB oracle replays every value. The built-in chain pays for that
  * equivalence three times over: md5() renders 16 bytes to a 32-char
  * hex string, substring() slices it, conv() parses hex back to a
  * number — measured 15.5 ns per WORD beside 20 ns for the whole
  * digest (200M-row microbench, round 15), i.e. the parse costs 3× the
  * hash it parses. This expression digests the UTF8 bytes once and
  * emits the words numerically: no hex string, no substring, no conv,
  * and one expression invocation per digest instead of four.
  *
  * Nulls: null input → null output (standard unary null-safety); the
  * output array itself never contains nulls. */
case class Md5Words(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_words"

  override def checkInputDataTypes() = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got " +
        child.dataType.simpleString)
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5WordsUtil.words(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Md5WordsUtil.words($c);")

  override protected def withNewChildInternal(c: Expression): Md5Words =
    copy(child = c)
}

/** Static helper [[Md5Words]]'s generated code calls (top-level object
  * → the compiler emits a static forwarder the Janino-compiled code
  * can reference as a plain static method). */
object Md5WordsUtil {
  // MessageDigest is stateful and not thread-safe; one per task thread
  private val local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** The calling thread's digest instance (callers reset it). */
  def digestFor(): MessageDigest = local.get()

  def words(s: UTF8String): ArrayData = {
    val md = local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val out = new Array[Long](4)
    var j = 0
    while (j < 4) {
      out(j) = ((d(4 * j) & 0xffL) << 24) | ((d(4 * j + 1) & 0xffL) << 16) |
        ((d(4 * j + 2) & 0xffL) << 8) | (d(4 * j + 3) & 0xffL)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** ONE-PASS Poisson-bootstrap sufficient statistics — the whole
  * [[graft.operators.Profiling.bootstrapMeanCI]] fan-out
  * (B replicates × n rows of md5-derived Poisson(1) weights) folded
  * into a single aggregate: per input row, ceil(B/4) digests are
  * computed in a tight loop and each replicate's (Σ w·v, Σ w) pair is
  * accumulated into a 2B-long buffer — no exploded rows exist at all.
  * The declarative form (explode × B → weight → groupBy(r)) is
  * plan-equivalent but pays generator/filter/projection machinery on
  * B·n intermediate rows; at 1.5B (row, replicate) pairs that
  * machinery dominated the arithmetic it carried (measured: the
  * [[Md5Words]]-batched explode form read ~24 s on the 100× slice
  * where this aggregate reads the scan + 375M digests). Buffer is
  * 2B longs (1.6 KB at B=100): map-side partials merge by element-wise
  * add — the shuffle carries ONE buffer per partition.
  *
  * Replicate r's uniform draw is word (r mod 4) of
  * md5(id ++ ":" ++ (r div 4)) mod 10⁶ — identical to the
  * [[Md5Words]] form and to the oracle's hex replay; the weight is
  * #{thresholds ≤ u} over the caller's cumulative-Poisson table.
  * Null contract mirrors the declarative form exactly: null id → the
  * row contributes nothing (its weights were all 0); null v with
  * non-null id → weights still count toward Σw, nothing toward Σw·v
  * (sum() skips the null product) — so both engines replay either
  * degenerate input identically. */
case class PoissonBootstrapAgg(id: Expression, v: Expression, b: Int,
    cumPpm: Seq[Long],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.aggregate
      .TypedImperativeAggregate[Array[Long]] {
  require(b >= 1 && b <= 10000, s"b=$b")
  private val thresholds = cumPpm.toArray
  private val groups = (b + 3) / 4

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](2 * b)

  override def update(buffer: Array[Long],
      input: InternalRow): Array[Long] = {
    val idv = id.eval(input)
    if (idv == null) return buffer
    val vv = v.eval(input)
    val hasV = vv != null
    val vl = if (hasV) vv.asInstanceOf[Long] else 0L
    val idBytes = idv.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .getBytes
    val md = Md5WordsUtil.digestFor()
    var g = 0
    while (g < groups) {
      md.reset()
      md.update(idBytes)
      md.update(':'.toByte)
      md.update(java.lang.Integer.toString(g)
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val d = md.digest()
      var j = 0
      while (j < 4) {
        val r = 4 * g + j
        if (r < b) {
          val word = ((d(4 * j) & 0xffL) << 24) |
            ((d(4 * j + 1) & 0xffL) << 16) |
            ((d(4 * j + 2) & 0xffL) << 8) | (d(4 * j + 3) & 0xffL)
          val u = word % 1000000L
          var w = 0L
          var t = 0
          while (t < thresholds.length && u >= thresholds(t)) {
            w = t + 1L; t += 1
          }
          if (hasV) buffer(2 * r) += w * vl
          buffer(2 * r + 1) += w
        }
        j += 1
      }
      g += 1
    }
    buffer
  }

  override def merge(buffer: Array[Long],
      other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    val rows = Array.tabulate(b) { r =>
      InternalRow(r.toLong, buffer(2 * r), buffer(2 * r + 1))
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.length)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("r", LongType,
          nullable = false),
        org.apache.spark.sql.types.StructField("s", LongType,
          nullable = false),
        org.apache.spark.sql.types.StructField("nw", LongType,
          nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(id, v)
  override def withNewMutableAggBufferOffset(n: Int): PoissonBootstrapAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): PoissonBootstrapAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): PoissonBootstrapAgg =
    copy(id = c(0), v = c(1))
  override def prettyName: String = "poisson_bootstrap_agg"
}

object HashExpressions {
  /** Column form of [[Md5Words]]; input must be a string column. */
  def md5_words(s: Column): Column =
    ColumnBridge.column(Md5Words(ColumnBridge.expression(s)))

  /** Column form of [[PoissonBootstrapAgg]] — array of (r, s, nw)
    * per-replicate sufficient statistics. */
  def poisson_bootstrap_agg(id: Column, v: Column, b: Int,
      cumPpm: Seq[Long]): Column =
    ColumnBridge.column(PoissonBootstrapAgg(
      ColumnBridge.expression(id), ColumnBridge.expression(v), b,
      cumPpm).toAggregateExpression())
}
