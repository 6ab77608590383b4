package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
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

object HashExpressions {
  /** Column form of [[Md5Words]]; input must be a string column. */
  def md5_words(s: Column): Column =
    ColumnBridge.column(Md5Words(ColumnBridge.expression(s)))
}
