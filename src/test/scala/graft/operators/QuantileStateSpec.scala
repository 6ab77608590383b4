package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.KllExpressions

/** [[QuantileState]] (the KLL day-state family, VERDICT r14 #4):
  * merge == rebuild on the exact axis (stream lengths add) and within
  * the sketch's own envelope on the estimate axis; below compaction
  * capacity the sketch is lossless, so small-state readouts are
  * EXACTLY the sample quantile; the rolling readout windows correctly. */
class QuantileStateSpec extends SparkSpec {

  private def ts(day: Long) = day * 86400L

  test("below capacity: state quantiles are exact; merge(split) == " +
      "rebuild(full) exactly") {
    import spark.implicits._
    // 40 values per day, k=200 → no compaction: sketch retains all
    val rows = for (d <- 0L to 2L; i <- 1L to 40L)
      yield (ts(d), i * 10 + d)
    val df = rows.toDF("sec", "v")
      .select(timestamp_seconds($"sec").as("ts"), $"v")
    val full = QuantileState.kllDayState(df, "ts", $"v", 200)
    val p50 = full.select($"d",
        KllExpressions.kll_n($"sk").as("n"),
        KllExpressions.kll_quantile($"sk", lit(500L)).as("q"))
      .as[(Long, Long, Long)].collect().toList.sortBy(_._1)
    // inclusive rank 0.5 over 1..40 scaled: the 20th value = 200 + d
    assert(p50 == List((0L, 40L, 200L), (1L, 40L, 201L), (2L, 40L, 202L)))
    // split by parity of v, merge, compare per-day (n, p50) exactly
    val a = QuantileState.kllDayState(df.filter($"v" % 2 === 0),
      "ts", $"v", 200)
    val b = QuantileState.kllDayState(df.filter($"v" % 2 =!= 0),
      "ts", $"v", 200)
    val merged = QuantileState.mergeKllDayState(a, b, 200)
    val got = merged.select($"d",
        KllExpressions.kll_n($"sk").as("n"),
        KllExpressions.kll_quantile($"sk", lit(500L)).as("q"))
      .as[(Long, Long, Long)].collect().toList.sortBy(_._1)
    assert(got == p50)
  }

  test("forced compaction (k=8, n=5000): n stays exact, p50 within " +
      "the sketch's own 3-epsilon rank envelope, merged or rebuilt") {
    import spark.implicits._
    // deterministic scramble of 0..4999 in one day
    val rows = (0L until 5000L).map(i => (ts(1), (i * 2654435761L) % 5000L))
    val df = rows.toDF("sec", "v")
      .select(timestamp_seconds($"sec").as("ts"), $"v")
    def readout(state: org.apache.spark.sql.DataFrame) =
      state.select(KllExpressions.kll_n($"sk").as("n"),
          KllExpressions.kll_quantile($"sk", lit(500L)).as("q"),
          KllExpressions.kll_rank_error($"sk").as("e"))
        .as[(Long, Long, Double)].collect().head
    val (n1, q1, e1) = readout(QuantileState.kllDayState(df, "ts", $"v", 8))
    assert(n1 == 5000L)
    // values are a permutation of 0..4999: true rank of value q is
    // (q+1)/5000; |rank − 0.5| must sit inside 3ε
    assert(math.abs((q1 + 1) / 5000.0 - 0.5) <= 3 * e1,
      s"p50 estimate $q1 outside 3*$e1")
    val m = QuantileState.mergeKllDayState(
      QuantileState.kllDayState(df.filter($"v" < 2500), "ts", $"v", 8),
      QuantileState.kllDayState(df.filter($"v" >= 2500), "ts", $"v", 8), 8)
    val (n2, q2, e2) = readout(m)
    assert(n2 == 5000L)
    assert(math.abs((q2 + 1) / 5000.0 - 0.5) <= 3 * e2,
      s"merged p50 estimate $q2 outside 3*$e2")
  }

  test("rollingQuantileFromState: exact window counts and exact " +
      "quantiles over observed end days (no-compaction regime)") {
    import spark.implicits._
    // day 0: values 1..5; day 1: 101..105; day 3: 1001..1005
    val rows = Seq(0L -> (1L to 5L), 1L -> (101L to 105L),
      3L -> (1001L to 1005L)).flatMap { case (d, vs) =>
      vs.map(v => (ts(d), v)) }
    val df = rows.toDF("sec", "v")
      .select(timestamp_seconds($"sec").as("ts"), $"v")
    val st = QuantileState.kllDayState(df, "ts", $"v", 200)
    val got = QuantileState.rollingQuantileFromState(st, 2, 500, 200)
      .select($"end_day", $"n_window", $"q_approx")
      .as[(Long, Long, Long)].collect().toList.sortBy(_._1)
    // window 2: end 0 = day 0 (n 5, p50 3); end 1 = days 0-1 (n 10,
    // inclusive-rank 0.5 → 5th of 1,2,3,4,5,101..105 = 5); end 3 =
    // day 3 alone (day 2 unobserved → no end_day 2 row... day 1
    // contributes to end 2 but end 2 is not an observed day; day 3
    // window covers days 2-3 = values 1001..1005 only)
    assert(got == List((0L, 5L, 3L), (1L, 10L, 5L), (3L, 5L, 1003L)))
  }
}
