package graft.plans

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the text-fingerprinting operators that
  * have no built-in composition (SURVEY.md §2.11, north-star X2/X4).
  *
  * Both are deterministic pure functions → Catalyst can constant-fold,
  * push, and reuse them. Codegen emits a static call into the companion's
  * `compute` (no per-row virtual dispatch or boxing, and the expression
  * stays inside the whole-stage-codegen span instead of forcing a
  * CodegenFallback break). */

object SimHash64 {
  /** The whole-array kernel, shared by eval and generated code. */
  def compute(arr: ArrayData): Long = {
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
}

/** 64-bit SimHash over an array of tokens: per token a 64-bit hash votes
  * ±1 on each bit position; the sign of the tally forms the output bit.
  * Near-duplicate docs differ in few token votes → small Hamming distance.
  * (Charikar, "Similarity estimation techniques from rounding algorithms",
  * STOC 2002.) */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def checkInputDataTypes() = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      // compute() reads elements as UTF8String — a non-string element
      // type would reinterpret raw bytes at runtime
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string> tokens, got ${other.simpleString}")
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash64$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

object RollingHash {
  def compute(s: UTF8String): Long = {
    val str = s.toString
    if (str.isEmpty) 0L
    else {
      var acc = str.charAt(0).toLong
      var i = 1
      while (i < str.length) {
        acc = (acc * 31L + str.charAt(i).toLong) % 2147483647L
        i += 1
      }
      acc
    }
  }
}

/** Polynomial rolling hash of a string's character codes, seeded by the
  * first code: acc_0 = c_0; acc_i = (acc_{i-1} * 31 + c_i) mod (2^31 - 1).
  * Chosen to be exactly DuckDB's
  * `list_reduce(codes, (a, b) -> (CAST(a AS BIGINT) * 31 + b) % 2147483647)`
  * so the oracle can verify it. */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.RollingHash$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(c: Expression): RollingHash = copy(c)
}

object ShingleHashes {
  private val SPACE = UTF8String.fromString(" ")

  /** Distinct, SORTED 64-bit hashes of the width-gram shingles of a token
    * array — the whole per-document kernel of the near-dup pipeline in one
    * compiled loop. The SQL composition (transform + sequence + concat +
    * xxhash64 + array_distinct + array_sort) runs the higher-order lambdas
    * interpreted with per-element boxing; this does one static call per
    * ROW. Hash: XXH64 over the shingle's UTF-8 bytes, seed 42 (the
    * identity of hash values is internal — Jaccard counts are invariant
    * under any injective token→hash map). */
  def compute(toks: ArrayData, width: Int): ArrayData = {
    val n = toks.numElements()
    if (n < width) return new GenericArrayData(Array.emptyLongArray)
    val m = n - width + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      var s = if (toks.isNullAt(i)) UTF8String.EMPTY_UTF8 else toks.getUTF8String(i)
      var j = 1
      while (j < width) {
        val t = if (toks.isNullAt(i + j)) UTF8String.EMPTY_UTF8
          else toks.getUTF8String(i + j)
        s = UTF8String.concat(s, SPACE, t)
        j += 1
      }
      hs(i) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var out = 1
    i = 1
    while (i < m) { // in-place dedupe of the sorted run
      if (hs(i) != hs(out - 1)) { hs(out) = hs(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, out))
  }
}

/** [[ShingleHashes.compute]] as an expression over `array<string>` tokens;
  * produces `array<bigint>` (distinct sorted shingle hashes). */
case class ShingleHashes(child: Expression, width: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def checkInputDataTypes() = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) if width >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string> tokens and width >= 1, got " +
          s"${other.simpleString}, width=$width")
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.ShingleHashes$$.MODULE$$.compute($c, $width)")

  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
}

object SortedIntersectCount {
  /** Two-pointer merge walk over two SORTED long arrays, counting common
    * elements. Duplicate-free inputs (the [[ShingleHashes]] contract)
    * make the count exactly |A ∩ B|; with duplicates it counts matched
    * positions instead — callers own the sortedness/distinctness
    * invariant, it is NOT checked per row. */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** |A ∩ B| of two sorted distinct `array<bigint>` columns in one merge
  * walk — what `size(array_intersect(a, b))` computes, minus the per-row
  * hash-set build and the intermediate result-array allocation that
  * built-in takes to handle UNSORTED inputs. This sits in the inner loop
  * of every near-dup verify join (candidate pairs × array length), where
  * the allocation-free walk is the difference between memory-bandwidth-
  * bound and GC-bound at corpus scale. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sorted_intersect_count"
  override def checkInputDataTypes() = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<bigint>, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.SortedIntersectCount$$.MODULE$$.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object TextExpressions {
  import org.apache.spark.sql.graft.ColumnBridge

  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
  def shingle_hashes(c: Column, width: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(c), width))
  def sorted_intersect_count(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
