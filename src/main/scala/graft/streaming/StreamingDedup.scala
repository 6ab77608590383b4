package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Dedup
import graft.sources.ManifestTable

/** X7 — the incremental-dedup maintenance loop as a STREAMING sink: each
  * micro-batch of documents is deduplicated against the persisted corpus
  * (exact text + cross-set near-dup probing the corpus shingle index),
  * survivors are committed to the corpus table, and the index is brought
  * up to date — `Dedup.dropIncomingDuplicatesIndexed`'s batch API wired
  * into `foreachBatch` the way a production ingest runs it forever.
  *
  * Two ManifestTables:
  *   - `corpusDir`: the accepted documents (doc_id, text, …);
  *   - `indexDir`: their [[Dedup.shingleArrays]] rows (doc_id, arr, n_sh).
  *
  * Exactly-once + crash convergence: the CORPUS commit carries the
  * `#txn=<streamId>-<batchId>` marker ([[ManifestTable.streamingSink]]'s
  * primitive), so a replayed batch is a no-op on the corpus (detected
  * up-front, before any probe work is spent). The INDEX is maintained by
  * CATCH-UP, not by a paired commit: shingles are appended for exactly
  * the corpus docs missing from the index (anti-join on doc_id). The
  * catch-up runs BEFORE the probe (healing any corpus-ahead-of-index gap
  * a crash or external append left, so the probe never consults a stale
  * index) and again after the commit (indexing this batch's survivors) —
  * deliberately chosen over a two-table transactional dance, which plain
  * manifests cannot make atomic. Each catch-up's anti-join scans only
  * the two tables' doc_id columns (narrow projections); the shingling it
  * triggers is proportional to the MISSING docs — zero in steady state
  * for the pre-probe pass, one batch for the post-commit pass.
  *
  * In-batch duplicates: exact text dups inside one micro-batch collapse to
  * the lowest doc_id before the cross-set pass (a batch must not admit
  * two copies just because neither is in the corpus yet). Near-dup pairs
  * WITHIN one batch are intentionally not removed here — that is the
  * batch-global [[Dedup.dropNearDuplicates]]' job and its cost profile;
  * at micro-batch sizes the cross-set gate dominates.
  *
  * Usage:
  * {{{
  * docsStream.writeStream
  *   .foreachBatch(StreamingDedup.dedupSink(corpusDir, indexDir, 0.8, "ingest") _)
  *   .start()
  * }}}
  */
object StreamingDedup {

  def dedupSink(corpusDir: String, indexDir: String, threshold: Double,
      streamId: String)(batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.functions._
    val spark = batch.sparkSession
    ManifestTable.create(corpusDir)
    ManifestTable.create(indexDir)
    // Replay short-circuit: the corpus commit below would no-op on the
    // txn marker anyway, but only after paying the full (eager) dedup
    // probe for a result guaranteed to be discarded — skip straight to
    // the index catch-up, which is what a replayed batch may still owe.
    if (ManifestTable.hasCommittedTxn(corpusDir, s"$streamId-$batchId")) {
      catchUpIndex(spark, corpusDir, indexDir)
      return
    }
    // Heal FIRST: if a prior crash (or external append) left the corpus
    // ahead of a NON-empty index, probing that stale index would admit
    // near-dups of the unindexed docs permanently. A current index makes
    // this a cheap doc_id anti-join no-op.
    catchUpIndex(spark, corpusDir, indexDir)
    val inBatch = batch
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("text")).orderBy(col("doc_id"))))
      .filter(col("__rk") === 1).drop("__rk")
    val corpusEmpty =
      ManifestTable.files(corpusDir, ManifestTable.currentVersion(corpusDir)).isEmpty
    val survivors =
      if (corpusEmpty) inBatch
      else {
        val (_, corpus) = ManifestTable.read(spark, corpusDir)
        val idxEmpty =
          ManifestTable.files(indexDir, ManifestTable.currentVersion(indexDir)).isEmpty
        if (idxEmpty)
          // index lost/never built: the exact gate still applies; the
          // near gate falls back to building against the corpus in-line
          Dedup.dropIncomingDuplicates(corpus, inBatch, threshold)
        else {
          val (_, idx) = ManifestTable.read(spark, indexDir)
          Dedup.dropIncomingDuplicatesIndexed(idx, corpus, inBatch, threshold)
        }
      }
    ManifestTable.appendWithRetry(spark, corpusDir, survivors,
      txn = Some(s"$streamId-$batchId"))
    catchUpIndex(spark, corpusDir, indexDir)
  }

  /** Append [[Dedup.shingleArrays]] rows for every corpus doc missing from
    * the index. Idempotent and self-healing: safe after any crash point,
    * a no-op when the index is current. O(doc_id columns) to find the gap,
    * O(missing docs) to shingle. */
  def catchUpIndex(spark: org.apache.spark.sql.SparkSession,
      corpusDir: String, indexDir: String): Unit = {
    import org.apache.spark.sql.functions.col
    if (ManifestTable.files(corpusDir,
        ManifestTable.currentVersion(corpusDir)).isEmpty) return
    val (_, corpus) = ManifestTable.read(spark, corpusDir)
    val idxEmpty = ManifestTable.files(indexDir,
      ManifestTable.currentVersion(indexDir)).isEmpty
    val missing =
      if (idxEmpty) corpus
      else corpus.join(
        ManifestTable.read(spark, indexDir)._2.select(col("doc_id")),
        Seq("doc_id"), "left_anti")
    // docs under 3 tokens have no trigram shingles (shingleArrays drops
    // them); they stay "missing" harmlessly — shingling them is O(0) and
    // the empty append is skipped
    val rows = Dedup.shingleArrays(missing)
    if (!rows.isEmpty)
      ManifestTable.appendWithRetry(spark, indexDir, rows)
  }
}
