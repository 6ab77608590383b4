package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.lit

import graft.operators.Behavior

/** Streaming maintenance of the SURVIVAL SPAN STATE
  * ([[graft.operators.Behavior.survivalSpanState]]): each micro-batch
  * of event rows reduces to its per-user (first, last, arm) activity
  * spans — the whole survival family's mergeable sufficient statistic
  * (q311's identity) — merges into the persisted state by
  * (min f, max l, max g) and commits ONE atomic snapshot carrying the
  * batch's txn marker via [[StateCommit.mergeCommit]] (the
  * [[graft.sources.ManifestTable]] protocol, same as
  * [[DauStateStream]]): a replayed batch after restart is a no-op,
  * so the state is exactly-once. Downstream, every survival readout —
  * KM curve (q227), Nelson–Aalen (q308), log-rank (q293),
  * Fleming–Harrington (q310), RMST (q301) — runs from the state alone
  * ([[graft.operators.Behavior.survivalCurveFromState]] and friends),
  * never re-reading the log: always-on churn monitoring at O(batch)
  * ingest cost with a users-sized state table. NOTE the one
  * semantic the seam inherits from the censor rule: the horizon is
  * the STATE's max last-active day, so a readout between commits uses
  * the data it has — exactly what the one-pass form would say over
  * the same events. */
object SurvivalStateStream {

  /** `writeStream.foreachBatch` sink over event rows; `arm` is the
    * survival family's per-row arm expression (NULL rows drop — the
    * [[graft.operators.Behavior.survivalSpanState]] contract);
    * `streamId` scopes txn markers. Empty micro-batches are
    * short-circuited before any state work. */
  def sink(stateDir: String, user: String, ts: String, streamId: String,
      arm: Column = lit(0))(batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    StateCommit.mergeCommit(stateDir,
      Behavior.survivalSpanState(batch, user, ts, arm),
      Behavior.mergeSurvivalSpanState, s"$streamId-$batchId")
  }
}
