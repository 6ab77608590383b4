package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Labeling

/** Streaming maintenance of the Dawid–Skene PATTERN-HISTOGRAM state
  * ([[graft.operators.Labeling.dsPatternState]]): each micro-batch of
  * unit rows reduces to its (vote-pattern → count) histogram — the
  * EM's exact sufficient statistic, ≤ 3^k rows for k raters — merges
  * into the persisted state by summing pattern weights
  * ([[graft.operators.Labeling.mergeDsPatternState]]), and commits ONE
  * atomic snapshot carrying the batch's txn marker via
  * [[StateCommit.mergeCommit]] (the [[graft.sources.ManifestTable]]
  * protocol, same as [[LabelStateStream]]): a replayed batch after
  * restart is a no-op, so the state is exactly-once, and a concurrent
  * writer is absorbed by re-read-merge-retry. Downstream, rater
  * quality is refit from the state alone — [[graft.operators.Labeling
  * .dawidSkeneFromState]] is arithmetic-IDENTICAL to the full-corpus
  * fit (q297's identity: the histogram is sufficient, not a sketch),
  * so the always-on form pays O(batch) per commit and a ≤ 3^k-row
  * refit whenever the dashboard asks. This is q287/q297 in always-on
  * form. */
object DsPatternStateStream {

  /** `writeStream.foreachBatch` sink over unit rows; `raters` are the
    * 2..4 vote expressions evaluated per row (the
    * [[graft.operators.Labeling.dawidSkene]] contract — int votes,
    * NULL = abstain); `streamId` scopes txn markers. Empty
    * micro-batches are short-circuited before any state work — the
    * [[DauStateStream]] empty-snapshot rule. */
  def sink(stateDir: String, raters: Seq[Column], streamId: String)
      (batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    StateCommit.mergeCommit(stateDir,
      Labeling.dsPatternState(batch, raters),
      Labeling.mergeDsPatternState, s"$streamId-$batchId")
  }
}
