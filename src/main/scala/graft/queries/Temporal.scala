package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOfJoin, RangeJoinOps, Sessionize}

/** Time-series / event-time queries (SURVEY.md §2.4 A6, §2.10 T6–T7 batch
  * analogs). Streaming formulations of the same operators live in
  * [[graft.streaming]]; these batch versions are the DuckDB-oracled ones. */
object Temporal {

  /** A6 as-of join: each event gets the timestamp of the user's most recent
    * signup at-or-before it (DuckDB oracle: ASOF LEFT JOIN). */
  def asOfJoin(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, d)
    val signups = ev.filter($"event_type" === "signup").select($"user_id", $"ts")
    AsOfJoin.asOf(ev, signups, key = "user_id", leftTs = "ts", rightTs = "ts",
        payload = Seq("ts"))
      .select($"user_id", $"event_id", $"asof_ts".as("last_signup_ts"))
      .orderBy($"user_id", $"event_id")
  }

  /** A6 FORWARD as-of join: each event gets the timestamp of the user's
    * NEXT signup at-or-after it (DuckDB oracle: ASOF LEFT JOIN with
    * `e.ts <= s.ts`) — the mirror direction of [[asOfJoin]]. */
  def asOfForwardJoin(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, d)
    val signups = ev.filter($"event_type" === "signup").select($"user_id", $"ts")
    AsOfJoin.asOfForward(ev, signups, key = "user_id", leftTs = "ts",
        rightTs = "ts", payload = Seq("ts"))
      .select($"user_id", $"event_id", $"asof_ts".as("next_signup_ts"))
      .orderBy($"user_id", $"event_id")
  }

  /** A6 as-of join through the NATIVE Catalyst operator
    * ([[graft.plans.AsOfJoinNative]]: custom LogicalPlan + Strategy +
    * SparkPlan) — same semantics and oracle as [[asOfJoin]], different
    * physical path (co-partitioned streaming merge instead of
    * union+window). */
  def asOfJoinNative(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, d)
    val signups = ev.filter($"event_type" === "signup").select($"user_id", $"ts")
    graft.plans.AsOfJoinNative.asOf(ev, signups, "user_id", "ts", "ts", Seq("ts"))
      .select($"user_id", $"event_id", $"asof_ts".as("last_signup_ts"))
      .orderBy($"user_id", $"event_id")
  }

  /** Time-series gap fill (resample-to-daily): per user, one row for EVERY
    * calendar day between their first and last event — missing days get
    * n=0 — via a sequence() date spine exploded per user and left-joined
    * back. The financial-domain daily-bar regularization (the reference's
    * payloads skip non-trading days; a spine join is how you densify).
    * Scale: the spine explode is proportional to output rows (no cross
    * join); the join shuffles on (user, day) once. */
  def gapFill(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, d)
      .filter($"user_id" <= 200)
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n"))
    val spine = daily.groupBy($"user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
      .select($"user_id",
        explode(sequence($"d0", $"d1", expr("interval 1 day"))).as("day"))
    spine.join(daily, Seq("user_id", "day"), "left")
      .select($"user_id", $"day", coalesce($"n", lit(0L)).as("n"))
      .orderBy($"user_id", $"day")
  }

  /** T7 batch sessionization via the gaps-and-islands library op. */
  def sessionize(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Sessionize.sessionize(Tables.events(spark, d), "user_id", "ts", 1800L)
      .groupBy($"user_id", $"session_id")
      .agg(min($"ts").as("session_start"), max($"ts").as("session_end"),
        count(lit(1)).as("n_events"), round(sum($"value"), 4).as("sum_value"))
      .orderBy($"user_id", $"session_id")
  }

  /** T6 tumbling event-time window (1 h) — batch analog of the streaming
    * windowed aggregation; window start == date_trunc('hour'). */
  def tumblingWindow(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, d)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("sum_value"))
      .select($"window.start".as("hour_start"), $"event_type", $"n", $"sum_value")
      .orderBy($"hour_start", $"event_type")
  }

  /** T6 sliding event-time window (1 h every 15 min): each event lands in
    * exactly 4 windows. */
  def slidingWindow(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, d)
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("window_start"), $"event_type", $"n")
      .orderBy($"window_start", $"event_type")
  }

  /** T6 built-in session_window (30 min gap; a new session starts when the
    * gap is >= the threshold — the strict complement of [[sessionize]]). */
  def sessionWindow(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, d)
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"session_window.start".as("session_start"),
        $"session_window.end".as("session_end"), $"n_events")
      .orderBy($"user_id", $"session_start")
  }

  /** Event funnel: signup → first purchase at-or-after it, reported as
    * one conversion row (users, conversions, rate, mean hours-to-convert).
    * Two per-user min-aggregations + one key join — the standard funnel
    * shape that stays two shuffles at any event volume (never a per-user
    * window over the full history). */
  def eventFunnel(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, d)
    val signups = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("signup_ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(min($"ts").as("first_purchase_ts"))
    signups.join(purchases, Seq("user_id"), "left")
      .withColumn("converted",
        $"first_purchase_ts".isNotNull && $"first_purchase_ts" >= $"signup_ts")
      .agg(
        count(lit(1)).as("n_signup_users"),
        sum(when($"converted", 1L).otherwise(0L)).as("n_converted"),
        // sum exact integer microseconds, divide ONCE at the end: a
        // double avg() is summed in partition order (nondeterministic
        // across runs) and a trailing round() flips at the boundary —
        // integer sums are order-free and the single division chain is
        // IEEE-identical in Spark and DuckDB, so no round() is needed
        sum(when($"converted",
          unix_micros($"first_purchase_ts") - unix_micros($"signup_ts")))
          .as("convert_us"))
      .select(
        $"n_signup_users", $"n_converted",
        ($"n_converted" * 100.0 / $"n_signup_users").as("conversion_pct"),
        ($"convert_us".cast("double") / $"n_converted" / 3600000000.0)
          .as("avg_hours_to_convert"))
  }

  /** Day-N retention: of the users whose first event fell on day 0, the
    * share seen again exactly N days later, for N in 1..7 — the activation
    * curve every event pipeline reports. Cohort = min-date per user
    * (one shuffle); return visits join on (user, date) against the
    * distinct active days. */
  def retentionCurve(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, d)
      .select($"user_id", to_date($"ts").as("day"))
    val firstDay = ev.groupBy($"user_id").agg(min($"day").as("day0"))
    val activeDays = ev.distinct()
    firstDay
      .join(activeDays, Seq("user_id"))
      .withColumn("n", datediff($"day", $"day0"))
      .filter($"n".between(1, 7))
      .select($"user_id", $"n").distinct()
      .groupBy($"n")
      .agg(count(lit(1)).as("n_retained"))
      .join(broadcast(firstDay.agg(count(lit(1)).as("cohort"))))
      .select($"n".as("day_n"), $"n_retained",
        (round($"n_retained" / $"cohort" * 100, 4) + lit(0.0))
          .as("retention_pct"))
      .orderBy($"day_n")
  }

  /** A5 at scale — large-large band join via
    * [[graft.operators.RangeJoinOps.bucketedRangeJoin]]: every (error,
    * click) pair where the click lands inside the 5-minute window after the
    * error, histogrammed by minute of lag. Both sides are fact-sized (~20%
    * of events each), so the q28 broadcast-nested-loop shape would be
    * O(|errors|·|clicks|) comparisons (~4·10^8 at sf0.1, unbounded at
    * 100 TB); the bucket rewrite makes it one equi-shuffle per side.
    * Avg lag follows the q92 rule: exact integer µs sums, one trailing
    * IEEE-identical division chain, no round(). */
  def rangeJoinBucketed(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, d)
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), unix_micros($"ts").as("p_us"))
    val errors = ev.filter($"event_type" === "error")
      .select(unix_micros($"ts").as("lo_us"),
        (unix_micros($"ts") + lit(300000000L)).as("hi_us"))
    RangeJoinOps.bucketedRangeJoin(clicks, errors,
        pointCol = "p_us", loCol = "lo_us", hiCol = "hi_us",
        bucketWidth = 300000000L)
      .selectExpr("(p_us - lo_us) div 60000000 as lag_min",
        "p_us - lo_us as lag_us")
      .groupBy($"lag_min")
      .agg(count(lit(1)).as("n_pairs"), sum($"lag_us").as("sum_lag_us"))
      .select($"lag_min", $"n_pairs",
        ($"sum_lag_us".cast("double") / $"n_pairs" / 1000000.0)
          .as("avg_lag_s"))
      .orderBy($"lag_min")
  }

  /** Interval-overlap self-join at scale: concurrent-session pairs across
    * users ([[graft.operators.RangeJoinOps.bucketedOverlapJoin]] — both
    * sides fact-sized, ~95k sessions at sf0.1). Sessions come from the q33
    * gaps-and-islands operator; 96% are single-event points, so a 30-min
    * bucket keeps replication ≈ 1. The canonical-bucket rule makes the
    * result EXACTLY the naive theta join (the oracle). */
  def sessionOverlap(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val sessions = Sessionize
      .sessionize(Tables.events(spark, d), "user_id", "ts", 1800)
      .groupBy($"user_id", $"session_id")
      .agg(min(unix_micros($"ts")).as("lo"), max(unix_micros($"ts")).as("hi"))
    val a = sessions.select($"user_id".as("a_uid"), $"lo".as("a_lo"),
      $"hi".as("a_hi"))
    val b = sessions.select($"user_id".as("b_uid"), $"lo".as("b_lo"),
      $"hi".as("b_hi"))
    RangeJoinOps.bucketedOverlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
        bucketWidth = 1800000000L)
      .filter($"a_uid" < $"b_uid") // same-user sessions are disjoint by construction
      .select((least($"a_hi", $"b_hi") - greatest($"a_lo", $"b_lo"))
        .as("overlap_us"))
      .agg(count(lit(1)).as("n_pairs"), sum($"overlap_us").as("sum_us"),
        max($"overlap_us").as("max_us"))
      .select($"n_pairs",
        ($"sum_us".cast("double") / $"n_pairs" / 1000000.0)
          .as("avg_overlap_s"),
        ($"max_us".cast("double") / 1000000.0).as("max_overlap_s"))
  }
}
