package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Behavior

/** EVENT-TIME (watermarked) variant of [[SurvivalStateStream]] — the
  * one axis the batch-grain maintainer doesn't cover: LATE events.
  * The foreachBatch form folds whatever rows arrive in a batch, so an
  * event arriving days after its timestamp silently extends spans
  * with no bound on how much reprocessing a replay must tolerate. This
  * wiring puts the lateness contract INTO the engine: events pass
  * through `withWatermark(ts, delayDays)` into a per-(user, 1-day
  * event-time window) aggregate, so
  *
  *   - an event later than its timestamp but INSIDE the watermark
  *     updates its day's group and flows into the state (late-but-
  *     in-watermark events count — spec-pinned), and
  *   - an event whose timestamp has expired past the watermark is
  *     dropped by the stateful aggregate BEFORE it can touch the
  *     state (expired events don't count — spec-pinned),
  *
  * exactly Structured Streaming's documented late-data semantics; the
  * operator adds nothing bespoke on top. The aggregate runs in UPDATE
  * mode: each micro-batch emits the (u, day) groups it changed, and
  * because the downstream merge is (min f, max l, max g) — idempotent
  * on re-emission of the same group — fresh days reach the state
  * immediately instead of waiting out the watermark the way append
  * mode would, and a group re-emitted after absorbing a late event
  * merges to the identical span it would have produced had the event
  * been on time. The q311 merge identity therefore survives the
  * watermarked path: the maintained state over any in-watermark
  * arrival order equals [[graft.operators.Behavior.survivalSpanState]]
  * rebuilt from the same (non-expired) events, and every state
  * readout (KM q227, Nelson–Aalen q308, log-rank q293, FH q310, RMST
  * q301) is unchanged (spec re-asserts the KM readout).
  *
  * Scale shape: the engine's windowed-agg state is (user-day)-keyed
  * but WATERMARK-BOUNDED — expired windows evict, so in-flight state
  * is O(active users × delayDays), not O(history); the persisted
  * span state stays users-sized; per batch the sink reduces emitted
  * day-spans to per-user rows (O(batch)) before one
  * [[StateCommit.mergeCommit]] snapshot. */
object WatermarkedSurvivalStream {

  /** The watermarked streaming transform: event rows → updated
    * per-(user, epoch-day) span rows (u, f, l, g) with f = l = the
    * day. NULL user/ts/arm rows drop first — the
    * [[graft.operators.Behavior.survivalSpanState]] family contract.
    * Compose with `writeStream.outputMode("update")` into [[sink]]. */
  def dailySpans(events: DataFrame, user: String, ts: String,
      arm: Column = lit(0), delayDays: Int = 2): DataFrame = {
    require(delayDays >= 0, s"delayDays=$delayDays")
    val day = floor(unix_timestamp(col("w.start")) / 86400).cast("long")
    events
      .filter(col(user).isNotNull && col(ts).isNotNull &&
        arm.cast("int").isNotNull)
      .withWatermark(ts, s"$delayDays days")
      .groupBy(col(user).as("u"), window(col(ts), "1 day").as("w"))
      .agg(max(arm.cast("int")).as("g"))
      .select(col("u"), day.as("f"), day.as("l"), col("g"))
  }

  /** `writeStream.foreachBatch` sink over [[dailySpans]] update rows:
    * reduce the batch's day-spans per user, then one txn-marked
    * atomic merge-commit — replays are no-ops, re-emitted groups
    * merge idempotently. */
  def sink(stateDir: String, streamId: String)(
      batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    StateCommit.mergeCommit(stateDir,
      batch.groupBy(col("u"))
        .agg(min(col("f")).as("f"), max(col("l")).as("l"),
          max(col("g")).as("g")),
      Behavior.mergeSurvivalSpanState, s"$streamId-$batchId")
  }
}
