package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.TextAnalysis
import graft.sources.ManifestTable

/** Streaming maintenance of the VOCABULARY-GROWTH state
  * ([[graft.operators.TextAnalysis.vocabState]] +
  * [[graft.operators.TextAnalysis.vocabDocStats]]): each micro-batch
  * of document rows reduces to its two exact sufficient statistics —
  * the (token → first-seen doc id) table, merged into the persisted
  * state by token-keyed `min(fid)` ([[graft.operators.TextAnalysis
  * .mergeVocabState]], q307's identity), and the per-doc (id, token
  * count) rows, which are new-doc-disjoint and therefore APPEND-ONLY
  * (no merge, no rewrite — the state dir grows by O(batch) rows per
  * commit, never rewrites O(corpus)). Both commits carry the batch's
  * txn marker ([[StateCommit.mergeCommit]] for the merge side,
  * [[graft.sources.ManifestTable.appendWithRetry]] for the append
  * side), each checked independently — a replayed batch is a no-op on
  * both dirs even if a crash landed between the two commits.
  * Downstream, [[graft.operators.TextAnalysis.vocabCurve]] reads the
  * two states and reproduces q299's Heaps-law curve exactly — the
  * always-on "is more of this source buying coverage or redundancy"
  * monitor at O(batch) ingest cost. */
object VocabStateStream {

  /** `writeStream.foreachBatch` sink over document rows (`doc_id`,
    * `text`); `streamId` scopes txn markers. Empty micro-batches are
    * short-circuited before any state work. */
  def sink(firstSeenDir: String, docStatsDir: String, streamId: String)
      (batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val txn = s"$streamId-$batchId"
    StateCommit.mergeCommit(firstSeenDir,
      TextAnalysis.vocabState(batch),
      TextAnalysis.mergeVocabState, txn)
    ManifestTable.create(docStatsDir)
    if (!ManifestTable.hasCommittedTxn(docStatsDir, txn))
      ManifestTable.appendWithRetry(batch.sparkSession, docStatsDir,
        TextAnalysis.vocabDocStats(batch), txn = Some(txn))
  }

  /** The q299 curve from the maintained states — the read side of the
    * seam ([[graft.operators.TextAnalysis.vocabCurve]] over the two
    * committed snapshots). */
  def curve(spark: org.apache.spark.sql.SparkSession,
      firstSeenDir: String, docStatsDir: String,
      buckets: Int): DataFrame =
    TextAnalysis.vocabCurve(
      ManifestTable.read(spark, docStatsDir)._2,
      ManifestTable.read(spark, firstSeenDir)._2, buckets)
}
