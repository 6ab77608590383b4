package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Linear-time per-key scans for the exact-integer EWMA family
  * ([[graft.operators.TimeSeries.ewmaDaily]] / `ewmaDailyAppend` /
  * `ewmaControlChart`; SURVEY.md §4.2 X16).
  *
  * Why not SQL `aggregate(...)`: Catalyst's fold builds the result with
  * `acc || array(step)`, which COPIES the accumulator array every step —
  * O(span²) struct copies per key (a key observed daily for 10 years does
  * ~6.7M copies per evaluation; VERDICT r11 #2). A scan is inherently
  * sequential per key, but it is O(span): these expressions run the same
  * recursion as a primitive `long` loop over the sorted (d, x) array,
  * appending to a pre-sized buffer. Evaluation cost is one interpreted
  * call PER KEY (not per row) on a calendar-bounded array — the regime
  * where CodegenFallback dispatch is noise — so `doGenCode` is
  * deliberately omitted.
  *
  * Semantics are EXACTLY the SQL fold they replace, step by step: all
  * arithmetic is 64-bit integer, `div` on the non-negative operands the
  * callers enforce equals Java `/` (truncation), and rows are emitted in
  * the input array's order (callers sort by day). Oracle hashes are
  * unaffected (q269/q270/q272 pinned).
  *
  * Null handling: a null input array → null (never produced by the
  * `collect_list` callers, but propagated for safety); array ELEMENTS are
  * non-null by the callers' filter contract. */
case class EwmaScan(arr: Expression, prior: Expression, num: Int, den: Int)
    extends Expression with CodegenFallback {
  require(num >= 1 && den > num, s"alpha needs 1 <= num < den, got $num/$den")

  override def children: Seq[Expression] = Seq(arr, prior)
  override def nullable: Boolean = arr.nullable
  override def prettyName: String = "ewma_scan"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("x", LongType, nullable = false),
    StructField("s", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (arr.dataType,
      prior.dataType) match {
    case (ArrayType(StructType(Array(d, x)), _), LongType)
        if d.dataType == LongType && x.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case (a, p) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<struct<bigint,bigint>>, bigint), got " +
        s"${a.simpleString}, ${p.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val a = arr.eval(input)
    if (a == null) return null
    val ad = a.asInstanceOf[ArrayData]
    val n = ad.numElements()
    val p = prior.eval(input)
    var hasPrev = p != null
    var prev = if (hasPrev) p.asInstanceOf[Long] else 0L
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val e = ad.getStruct(i, 2)
      val d = e.getLong(0)
      val x = e.getLong(1)
      val s =
        if (!hasPrev) x
        else (num * x + (den - num) * prev) / den
      out(i) = new GenericInternalRow(Array[Any](d, x, s))
      prev = s
      hasPrev = true
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): EwmaScan =
    copy(arr = newChildren(0), prior = newChildren(1))
}

/** The control-chart sibling of [[EwmaScan]]: level, residual against the
  * PRIOR level, adaptive deviation, and a flag against the PRIOR deviation
  * (so a spike cannot inflate its own gate) — the
  * [[graft.operators.TimeSeries.ewmaControlChart]] recursion as one linear
  * scan. Step-identical to the SQL fold it replaces. */
case class EwmaChartScan(arr: Expression, num: Int, den: Int, devNum: Int,
    devDen: Int, kSigma: Int, warmup: Int)
    extends Expression with CodegenFallback {
  require(num >= 1 && den > num, s"alpha needs 1 <= num < den, got $num/$den")
  require(devNum >= 1 && devDen > devNum,
    s"dev alpha needs 1 <= devNum < devDen, got $devNum/$devDen")
  require(kSigma >= 1 && warmup >= 1, s"kSigma=$kSigma warmup=$warmup")

  override def children: Seq[Expression] = Seq(arr)
  override def nullable: Boolean = arr.nullable
  override def prettyName: String = "ewma_chart_scan"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("x", LongType, nullable = false),
    StructField("s", LongType, nullable = false),
    StructField("r", LongType, nullable = false),
    StructField("dev", LongType, nullable = false),
    StructField("flag", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = arr.dataType match {
    case ArrayType(StructType(Array(d, x)), _)
        if d.dataType == LongType && x.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case a => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<struct<bigint,bigint>>, got ${a.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val a = arr.eval(input)
    if (a == null) return null
    val ad = a.asInstanceOf[ArrayData]
    val n = ad.numElements()
    val out = new Array[Any](n)
    var prevS = 0L
    var prevDev = 0L
    var i = 0
    while (i < n) {
      val e = ad.getStruct(i, 2)
      val d = e.getLong(0)
      val x = e.getLong(1)
      var s = x
      var r = 0L
      var dev = 0L
      var flag = 0
      if (i > 0) {
        r = math.abs(x - prevS)
        s = (num * x + (den - num) * prevS) / den
        dev = (devNum * r + (devDen - devNum) * prevDev) / devDen
        if (i >= warmup && prevDev > 0L && r > kSigma * prevDev) flag = 1
      }
      out(i) = new GenericInternalRow(Array[Any](d, x, s, r, dev, flag))
      prevS = s
      prevDev = dev
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): EwmaChartScan =
    copy(arr = newChildren(0))
}

/** HOLT LINEAR TREND (double exponential smoothing) as one linear scan —
  * the level+trend sibling of [[EwmaScan]] (Holt 1957; the standard
  * "level is drifting, follow the drift" forecaster an EWMA lags on):
  *
  *   f_t = l_{t−1} + b_{t−1}                      (one-step forecast)
  *   l_t = tdiv(aNum·x_t + (aDen−aNum)·f_t, aDen) (level)
  *   b_t = tdiv(bNum·(l_t − l_{t−1}) + (bDen−bNum)·b_{t−1}, bDen)
  *
  * seeded l₁ = x₁, b₁ = 0, f₁ = x₁ (zero first-step error). All-integer
  * like the EWMA family, with one extra care: the TREND (and hence a
  * forecast or level) can be NEGATIVE, and truncating vs flooring
  * division diverge there across engines — so every division is the
  * SIGN-SAFE truncation tdiv(v, den) = sign(v)·(|v| div den), which
  * Java's `/` computes directly and an oracle reproduces portably as
  * CASE WHEN v >= 0 THEN v // den ELSE -((-v) // den) END (both
  * branches divide non-negative operands, where `//` and `div` agree
  * everywhere). Same calendar-bounded per-key evaluation regime and
  * null handling as [[EwmaScan]]. */
case class HoltScan(arr: Expression, priorL: Expression,
    priorB: Expression, aNum: Int, aDen: Int, bNum: Int,
    bDen: Int) extends Expression with CodegenFallback {
  require(aNum >= 1 && aDen > aNum,
    s"level alpha needs 1 <= aNum < aDen, got $aNum/$aDen")
  require(bNum >= 1 && bDen > bNum,
    s"trend beta needs 1 <= bNum < bDen, got $bNum/$bDen")

  override def children: Seq[Expression] = Seq(arr, priorL, priorB)
  override def nullable: Boolean = arr.nullable
  override def prettyName: String = "holt_scan"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("x", LongType, nullable = false),
    StructField("l", LongType, nullable = false),
    StructField("b", LongType, nullable = false),
    StructField("f", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (arr.dataType,
      priorL.dataType, priorB.dataType) match {
    case (ArrayType(StructType(Array(d, x)), _), LongType, LongType)
        if d.dataType == LongType && x.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case (a, pl, pb) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<struct<bigint,bigint>>, bigint, " +
        s"bigint), got ${a.simpleString}, ${pl.simpleString}, " +
        s"${pb.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val a = arr.eval(input)
    if (a == null) return null
    val ad = a.asInstanceOf[ArrayData]
    val n = ad.numElements()
    // prior (level, trend) seed the continuation ([[graft.operators
    // .TimeSeries.holtDailyAppend]]); both NULL means a fresh key
    val pl = priorL.eval(input)
    val pb = priorB.eval(input)
    var hasPrev = pl != null
    var prevL = if (hasPrev) pl.asInstanceOf[Long] else 0L
    var prevB = if (hasPrev && pb != null) pb.asInstanceOf[Long] else 0L
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val e = ad.getStruct(i, 2)
      val d = e.getLong(0)
      val x = e.getLong(1)
      var l = x
      var b = 0L
      var f = x
      if (hasPrev) {
        f = prevL + prevB
        // Java `/` truncates toward zero for either sign — exactly tdiv
        l = (aNum * x + (aDen - aNum) * f) / aDen
        b = (bNum * (l - prevL) + (bDen - bNum) * prevB) / bDen
      }
      out(i) = new GenericInternalRow(Array[Any](d, x, l, b, f))
      prevL = l
      prevB = b
      hasPrev = true
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HoltScan =
    copy(arr = newChildren(0), priorL = newChildren(1),
      priorB = newChildren(2))
}

/** HOLT–WINTERS ADDITIVE (triple exponential smoothing, Winters 1960)
  * as one linear scan — the seasonal rung above [[HoltScan]] (a Holt
  * forecast permanently mis-times a weekly cycle; the seasonal term
  * absorbs it). State = level, trend, and `period` seasonal slots
  * indexed by d mod period (slot-keyed, not position-keyed, so gaps
  * in the calendar stay aligned to their weekday):
  *
  *   sd  = seas[d mod m]                      (this day's stored slot)
  *   f_t = l_{t−1} + b_{t−1} + sd             (one-step forecast)
  *   l_t = tdiv(aNum·(x_t − sd) + (aDen−aNum)·(l_{t−1} + b_{t−1}), aDen)
  *   b_t = tdiv(bNum·(l_t − l_{t−1}) + (bDen−bNum)·b_{t−1}, bDen)
  *   s_t = tdiv(gNum·(x_t − l_t) + (gDen−gNum)·sd, gDen)  → seas[d mod m]
  *
  * seeded l₁ = x₁, b₁ = 0, seas = 0 (the first seasonal update is then
  * exactly 0, so the seed and the uniform update agree). Every division
  * is the sign-safe truncation (trend and seasonals are signed) — Java
  * `/` directly, the portable CASE form in the oracle. Same
  * calendar-bounded per-key evaluation regime as [[EwmaScan]]. */
case class HoltWintersScan(arr: Expression, priorL: Expression,
    priorB: Expression, priorSeas: Expression, aNum: Int, aDen: Int,
    bNum: Int, bDen: Int, gNum: Int, gDen: Int, period: Int)
    extends Expression with CodegenFallback {
  require(aNum >= 1 && aDen > aNum,
    s"level alpha needs 1 <= aNum < aDen, got $aNum/$aDen")
  require(bNum >= 1 && bDen > bNum,
    s"trend beta needs 1 <= bNum < bDen, got $bNum/$bDen")
  require(gNum >= 1 && gDen > gNum,
    s"seasonal gamma needs 1 <= gNum < gDen, got $gNum/$gDen")
  require(period >= 2 && period <= 366, s"period=$period")

  override def children: Seq[Expression] =
    Seq(arr, priorL, priorB, priorSeas)
  override def nullable: Boolean = arr.nullable
  override def prettyName: String = "holt_winters_scan"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d", LongType, nullable = false),
    StructField("x", LongType, nullable = false),
    StructField("l", LongType, nullable = false),
    StructField("b", LongType, nullable = false),
    StructField("s", LongType, nullable = false),
    StructField("f", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (arr.dataType,
      priorL.dataType, priorB.dataType, priorSeas.dataType) match {
    case (ArrayType(StructType(Array(d, x)), _), LongType, LongType,
        ArrayType(LongType, _))
        if d.dataType == LongType && x.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case (a, pl, pb, ps) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<struct<bigint,bigint>>, bigint, " +
        s"bigint, array<bigint>), got ${a.simpleString}, " +
        s"${pl.simpleString}, ${pb.simpleString}, ${ps.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val a = arr.eval(input)
    if (a == null) return null
    val ad = a.asInstanceOf[ArrayData]
    val n = ad.numElements()
    val seas = new Array[Long](period)
    // prior (level, trend, seasonal ring) seed the continuation
    // ([[graft.operators.TimeSeries.holtWintersDailyAppend]]); a NULL
    // priorL means a fresh key, a NULL ring means all-zero slots
    val pl = priorL.eval(input)
    val pb = priorB.eval(input)
    val ps = priorSeas.eval(input)
    var hasPrev = pl != null
    var prevL = if (hasPrev) pl.asInstanceOf[Long] else 0L
    var prevB = if (hasPrev && pb != null) pb.asInstanceOf[Long] else 0L
    if (ps != null) {
      val pr = ps.asInstanceOf[ArrayData]
      require(pr.numElements() == period,
        s"$prettyName: prior seasonal ring has ${pr.numElements()} " +
          s"slots, period is $period")
      var j = 0
      while (j < period) { seas(j) = pr.getLong(j); j += 1 }
    }
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val e = ad.getStruct(i, 2)
      val d = e.getLong(0)
      val x = e.getLong(1)
      val dow = (d % period).toInt
      var l = x
      var b = 0L
      var f = x
      if (hasPrev) {
        val sd = seas(dow)
        f = prevL + prevB + sd
        // Java `/` truncates toward zero for either sign — exactly tdiv
        l = (aNum * (x - sd) + (aDen - aNum) * (prevL + prevB)) / aDen
        b = (bNum * (l - prevL) + (bDen - bNum) * prevB) / bDen
      }
      val s = (gNum * (x - l) + (gDen - gNum) * seas(dow)) / gDen
      seas(dow) = s
      out(i) = new GenericInternalRow(Array[Any](d, x, l, b, s, f))
      prevL = l
      prevB = b
      hasPrev = true
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HoltWintersScan =
    copy(arr = newChildren(0), priorL = newChildren(1),
      priorB = newChildren(2), priorSeas = newChildren(3))
}

object ScanExpressions {
  /** Column form of [[EwmaScan]]: `a` is the sorted (d, x) array, `s0`
    * the nullable prior level (NULL ⇒ s₁ = x₁). */
  def ewma_scan(a: Column, s0: Column, num: Int, den: Int): Column =
    ColumnBridge.column(EwmaScan(ColumnBridge.expression(a),
      ColumnBridge.expression(s0), num, den))

  /** Column form of [[EwmaChartScan]]. */
  def ewma_chart_scan(a: Column, num: Int, den: Int, devNum: Int,
      devDen: Int, kSigma: Int, warmup: Int): Column =
    ColumnBridge.column(EwmaChartScan(ColumnBridge.expression(a),
      num, den, devNum, devDen, kSigma, warmup))

  /** Column form of [[HoltWintersScan]]: `l0`/`b0`/`seas0` the
    * nullable prior (level, trend, seasonal ring) seed (NULL l0 ⇒
    * fresh key; NULL ring ⇒ all-zero slots). */
  def holt_winters_scan(a: Column, l0: Column, b0: Column,
      seas0: Column, aNum: Int, aDen: Int, bNum: Int,
      bDen: Int, gNum: Int, gDen: Int, period: Int): Column =
    ColumnBridge.column(HoltWintersScan(ColumnBridge.expression(a),
      ColumnBridge.expression(l0), ColumnBridge.expression(b0),
      ColumnBridge.expression(seas0),
      aNum, aDen, bNum, bDen, gNum, gDen, period))

  /** Column form of [[HoltScan]]: `l0`/`b0` the nullable prior
    * (level, trend) seed (both NULL ⇒ fresh key: l₁ = x₁, b₁ = 0). */
  def holt_scan(a: Column, l0: Column, b0: Column, aNum: Int, aDen: Int,
      bNum: Int, bDen: Int): Column =
    ColumnBridge.column(HoltScan(ColumnBridge.expression(a),
      ColumnBridge.expression(l0), ColumnBridge.expression(b0),
      aNum, aDen, bNum, bDen))
}
