package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.KllExpressions

/** PERSISTED MERGEABLE QUANTILE STATE — the percentile rung of the
  * sketch ladder (HLL distinct q196, KMV join-size q176), VERDICT r14
  * #4: a (day, KLL sketch) state table + union merge + window rollup,
  * exactly [[Behavior.dauState]]'s pattern on the quantile axis.
  * [[Profiling.exactQuantiles]] is the batch answer (exact, but each
  * readout re-scans values); a streaming p50/p99 monitor instead
  * maintains one k-bounded sketch per day at O(batch) cost and any
  * window readout merges ≤ window sketches — kilobytes of state at
  * 10^12 events, never the log. Readout counts (kll_n) stay EXACT
  * through updates and merges; quantile estimates carry the sketch's
  * own ±ε(k) normalized-rank envelope, which the q325 readout checks
  * in-query against the exact window values (the q191 oracle
  * pattern).
  *
  * Scale shape: state build = one (day)-keyed aggregate whose
  * partials sketch map-side (TypedImperativeAggregate — k-bounded
  * bytes travel the shuffle, not values); merge = day-keyed union of
  * byte columns; rollup = the q196 map-only window expansion over
  * |days| sketch rows. */
object QuantileState {

  /** Day-grain KLL state over a long-valued metric: (d, sk). NULL
    * day/value rows drop (the family null contract). */
  def kllDayState(events: DataFrame, ts: String, value: Column,
      k: Int = 200): DataFrame =
    events
      .select(Behavior.epochDay(col(ts)).as("d"), value.cast("long").as("v"))
      .filter(col("d").isNotNull && col("v").isNotNull)
      .groupBy(col("d"))
      .agg(KllExpressions.kll_sketch_agg(col("v"), k).as("sk"))

  /** Merge two day-grain states (disjoint or overlapping batches):
    * sketch union per day. Stream lengths (kll_n) ADD exactly;
    * estimate error stays within the k envelope ([[graft.plans
    * .KllExpressions]] scaladoc) — merge(split) vs rebuild(full) is
    * spec-pinned on both axes. */
  def mergeKllDayState(a: DataFrame, b: DataFrame,
      k: Int = 200): DataFrame =
    a.unionByName(b).groupBy(col("d"))
      .agg(KllExpressions.kll_union_agg(col("sk"), k).as("sk"))

  /** Rolling-window quantile readout FROM the state: per observed end
    * day, union the trailing `window` day sketches and read the
    * `permille`/1000 quantile — (end_day, n_window, q_approx, eps).
    * n_window is the exact value count in the window (oracle-
    * checkable); eps is the merged sketch's own normalized rank error
    * bound, for in-query envelope checks. */
  def rollingQuantileFromState(state: DataFrame, window: Int,
      permille: Int, k: Int = 200): DataFrame = {
    require(window >= 1, s"window=$window")
    require(permille >= 1 && permille <= 999, s"permille=$permille")
    val days = state.select(col("d").as("end_day")).distinct()
    state
      .withColumn("end_day",
        explode(sequence(col("d"), col("d") + lit(window - 1))))
      .join(broadcast(days), Seq("end_day"), "left_semi")
      .groupBy(col("end_day"))
      .agg(KllExpressions.kll_union_agg(col("sk"), k).as("msk"))
      .select(col("end_day"),
        KllExpressions.kll_n(col("msk")).as("n_window"),
        KllExpressions.kll_quantile(col("msk"), lit(permille.toLong))
          .as("q_approx"),
        KllExpressions.kll_rank_error(col("msk")).as("eps"))
  }

  /** PER-KEY day-grain KLL state — [[kllDayState]] at the grain a
    * production monitor actually queries (VERDICT r15 #2): one
    * k-bounded sketch per (key, day), e.g. per-event-type latency.
    * State size is |keys|·|days| sketch rows — bounded by the key
    * cardinality and the calendar, never the event count. NULL
    * key/day/value rows drop (the family null contract). */
  def kllKeyDayState(events: DataFrame, keyCol: String, ts: String,
      value: Column, k: Int = 200): DataFrame =
    events
      .select(col(keyCol).cast("string").as("key"),
        Behavior.epochDay(col(ts)).as("d"), value.cast("long").as("v"))
      .filter(col("key").isNotNull && col("d").isNotNull &&
        col("v").isNotNull)
      .groupBy(col("key"), col("d"))
      .agg(KllExpressions.kll_sketch_agg(col("v"), k).as("sk"))

  /** Merge two per-key day-grain states: sketch union per (key, day).
    * Same exactness contract as [[mergeKllDayState]] — kll_n adds
    * exactly; estimates stay within the k envelope. */
  def mergeKllKeyDayState(a: DataFrame, b: DataFrame,
      k: Int = 200): DataFrame =
    a.unionByName(b).groupBy(col("key"), col("d"))
      .agg(KllExpressions.kll_union_agg(col("sk"), k).as("sk"))

  /** Per-key rolling-window quantile readout FROM the per-key state:
    * for each (key, observed end day OF THAT KEY), union the key's
    * trailing `window` day sketches and read the `permille`/1000
    * quantile — (key, end_day, n_window, q_approx, eps). The
    * end-day frame is per key (a key silent on a day emits no row —
    * absence is data, the q332 convention), matched by the window
    * explode on (key, end_day).
    *
    * Scale shape: the state is |keys|·|days| sketch rows, so the
    * explode is ≤ window·|state| rows of k-bounded bytes; the join
    * with the observed-day frame is key-day-sized on both sides
    * (broadcast — it is bounded by the state, not the data); the
    * rollup shuffles sketch bytes only. The event log is never
    * touched. */
  def rollingQuantileByKeyFromState(state: DataFrame, window: Int,
      permille: Int, k: Int = 200): DataFrame = {
    require(window >= 1, s"window=$window")
    require(permille >= 1 && permille <= 999, s"permille=$permille")
    val days = state.select(col("key"), col("d").as("end_day")).distinct()
    state
      .withColumn("end_day",
        explode(sequence(col("d"), col("d") + lit(window - 1))))
      .join(broadcast(days), Seq("key", "end_day"), "left_semi")
      .groupBy(col("key"), col("end_day"))
      .agg(KllExpressions.kll_union_agg(col("sk"), k).as("msk"))
      .select(col("key"), col("end_day"),
        KllExpressions.kll_n(col("msk")).as("n_window"),
        KllExpressions.kll_quantile(col("msk"), lit(permille.toLong))
          .as("q_approx"),
        KllExpressions.kll_rank_error(col("msk")).as("eps"))
  }
}
