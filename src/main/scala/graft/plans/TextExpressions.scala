package graft.plans

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{column => _, _}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the text-fingerprinting operators that
  * have no built-in composition (SURVEY.md §2.11, north-star X2/X4).
  *
  * Both are deterministic pure functions → Catalyst can constant-fold,
  * push, and reuse them. They use `CodegenFallback` (a virtual call per row);
  * acceptable here because they run once per document, not per token — the
  * per-token hot paths (minhash, shingles) stay in codegen'd built-ins.
  */

/** 64-bit SimHash over an array of tokens: per token a 64-bit hash votes
  * ±1 on each bit position; the sign of the tally forms the output bit.
  * Near-duplicate docs differ in few token votes → small Hamming distance.
  * (Charikar, "Similarity estimation techniques from rounding algorithms",
  * STOC 2002.) */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    require(child.dataType.isInstanceOf[ArrayType])
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val tally = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).toString
        val h1 = MurmurHash3.stringHash(s, 0x9747b28c)
        val h2 = MurmurHash3.stringHash(s, 0x85ebca6b)
        val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
        var b = 0
        while (b < 64) {
          tally(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (tally(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** Polynomial rolling hash of a string's character codes, seeded by the
  * first code: acc_0 = c_0; acc_i = (acc_{i-1} * 31 + c_i) mod (2^31 - 1).
  * Chosen to be exactly DuckDB's
  * `list_reduce(codes, (a, b) -> (CAST(a AS BIGINT) * 31 + b) % 2147483647)`
  * so the oracle can verify it. */
case class RollingHash(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.isEmpty) 0L
    else {
      var acc = s.charAt(0).toLong
      var i = 1
      while (i < s.length) {
        acc = (acc * 31L + s.charAt(i).toLong) % 2147483647L
        i += 1
      }
      acc
    }
  }
  override protected def withNewChildInternal(c: Expression): RollingHash = copy(c)
}

object TextExpressions {
  import org.apache.spark.sql.graft.ColumnBridge

  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
}
