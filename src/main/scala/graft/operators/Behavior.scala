package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral / product-analytics operators over an event log — the
  * warehouse queries every event pipeline serves daily (cohort retention,
  * sequential conversion funnels). Both are pure relational algebra:
  * integer epoch-day arithmetic under the session's UTC clock, exact
  * counts, no UDFs — so the DuckDB oracle replays every row.
  *
  * Scale notes: both operators reduce the raw event log to per-user /
  * per-day frames as their FIRST move (distinct or min-aggregate with
  * map-side partials), so everything after the first shuffle is bounded
  * by |users|·|days|, not |events|. At 10^12 events the cost is the
  * unavoidable hash shuffles on user_id — the same shape any funnel
  * engine pays — and each is key-sized. */
object Behavior {

  /** UTC epoch-day bucketing — the ONE determinism-critical expression
    * shared by every day-granular operator ([[cohortRetention]],
    * [[funnel]], [[Learn.trendStats]]) and mirrored by the oracle idiom
    * `floor(epoch(ts) / 86400)`; keep all of them in lockstep. */
  private[operators] def epochDay(c: org.apache.spark.sql.Column) =
    floor(unix_timestamp(c) / 86400).cast("long")

  /** Cohort retention triangle: users bucketed by their FIRST active
    * epoch-day (the cohort), then counted on every later active day as
    * an offset from it — the classic retention matrix, here in long
    * form (cohort_day, day_offset, n_users). Three shuffles, all
    * key-sized: distinct (user, day), min-day per user, and the final
    * (cohort, offset) aggregate. */
  def cohortRetention(events: DataFrame, user: String, ts: String)
      : DataFrame = {
    val acts = events
      .select(col(user).as("u"), epochDay(col(ts)).as("d")).distinct()
    val first = acts.groupBy(col("u")).agg(min(col("d")).as("cohort_day"))
    acts.join(first, "u")
      .groupBy(col("cohort_day"),
        (col("d") - col("cohort_day")).as("day_offset"))
      // acts is distinct on (u, d) and d is determined by the group
      // keys, so u cannot repeat in a group: a plain count equals the
      // distinct count without the extra distinct-aggregate phase
      .agg(count(lit(1)).as("n_users"))
  }

  /** Gaps-and-islands activity streaks: per user, maximal runs of
    * CONSECUTIVE active days (the tabibitosan idiom — day − row_number
    * is constant exactly within a consecutive run, so one window + one
    * aggregate finds every island; no iterative logic, no self-join).
    * Returns per user: number of streaks, longest streak, total active
    * days. One shuffle on user, windows and aggregates all user-sized. */
  def activityStreaks(events: DataFrame, user: String, ts: String)
      : DataFrame = {
    val acts = events
      .select(col(user).as("u"), epochDay(col(ts)).as("d")).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u")).orderBy(col("d"))
    acts
      .withColumn("grp", col("d") - row_number().over(w))
      .groupBy(col("u"), col("grp")).agg(count(lit(1)).as("len"))
      .groupBy(col("u"))
      .agg(count(lit(1)).as("n_streaks"), max(col("len")).as("longest"),
        sum(col("len")).as("active_days"))
  }

  /** Rolling-window DISTINCT users (e.g. 7-day rolling DAU): distinct
    * counts are NOT additive, so a per-day count cannot be summed into
    * a window — the exact answer re-counts each window. Here: the
    * distinct (user, day) frame joins to the OBSERVED end-days within
    * [end−window+1, end] (a ≤ window-fold key-sized blow-up — the
    * honest exact cost), then one distinct-count per end day. At
    * register-sketch scale you'd swap HLL partials (mergeable) for the
    * exact count; this operator is the exact baseline that validates
    * such sketches. Days with no activity produce no row. */
  def rollingDistinct(events: DataFrame, user: String, ts: String,
      window: Int): DataFrame = {
    require(window >= 1, s"window=$window")
    val acts = events
      .select(col(user).as("u"), epochDay(col(ts)).as("d")).distinct()
    val days = acts.select(col("d").as("end_day")).distinct()
    acts.join(broadcast(days),
        col("d") >= col("end_day") - (window - 1) &&
          col("d") <= col("end_day"))
      .groupBy(col("end_day"))
      .agg(countDistinct(col("u")).as("n_users"))
  }

  /** Strictly-ordered conversion funnel: per user, t₁ = first `steps(0)`
    * event, tᵢ₊₁ = first `steps(i+1)` event STRICTLY AFTER tᵢ (the
    * first-matching-subsequence semantics of product funnels). Returns
    * per cohort day of t₁: users reaching each stage + ppm conversion
    * to the last stage (integer µ-share — engine-exact). A user who
    * never reaches stage i has tᵢ NULL, and the `et > NULL` filter
    * makes every later stage unreachable — no special-casing.
    *
    * One min-aggregate per stage over the (pre-filtered) step events
    * joined to the survivors so far — |steps| key-sized shuffles; the
    * event log is scanned once per stage but filtered to that stage's
    * type before the join (predicate reaches the scan). */
  def funnel(events: DataFrame, user: String, ts: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"funnel needs >= 2 steps, got $steps")
    var cur = events.filter(col(typeCol) === steps.head)
      .groupBy(col(user).as("u")).agg(min(col(ts)).as("t1"))
    var i = 1
    steps.drop(1).foreach { st =>
      val prev = s"t$i"; i += 1
      val reached = events.filter(col(typeCol) === st)
        .select(col(user).as("u"), col(ts).as("et"))
        .join(cur.select(col("u"), col(prev)), "u")
        .filter(col("et") > col(prev))
        .groupBy(col("u")).agg(min(col("et")).as(s"t$i"))
      cur = cur.join(reached, Seq("u"), "left")
    }
    val stageCounts = (1 to steps.size).map(j =>
      count(col(s"t$j")).as(s"n_step$j"))
    cur.groupBy(epochDay(col("t1")).as("cohort_day"))
      .agg(stageCounts.head, stageCounts.tail: _*)
      .withColumn("conv_ppm",
        expr(s"n_step${steps.size} * 1000000 div n_step1"))
  }
}
