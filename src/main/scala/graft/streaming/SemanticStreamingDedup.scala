package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Similarity
import graft.sources.ManifestTable

/** X7 — SEMANTIC (embedding-space) incremental dedup as a streaming sink:
  * the SemDeDup recipe of [[graft.operators.Similarity.semDedup]] wired
  * into `foreachBatch` against a persisted corpus, the way
  * [[StreamingDedup]] runs the text-shingle recipe.
  *
  * State:
  *   - `corpusDir` (ManifestTable): accepted vectors
  *     (vec_id, embedding array<double>, cid);
  *   - `centroidDir` (ManifestTable): the k×d codebook (cid, c), TRAINED
  *     ONCE on the first non-empty batch and FROZEN. A frozen quantizer is
  *     what makes incremental semantics stable: retraining moves cell
  *     boundaries, and a vector pair that once shared a cell could later
  *     not — silently changing which dups are catchable. (Production
  *     refreshes the codebook with an offline re-cluster + full re-dedup,
  *     not in-stream.)
  *
  * Per batch: assign incoming vectors to cells (map-only probe of the
  * stored centroids — broadcast state, no shuffle), prune the corpus to
  * the touched cells, then [[Similarity.semDedupIncoming]]: drop a vector
  * when any corpus cell-mate, or any smaller-id batch cell-mate, has
  * round(cos, 4) ≥ threshold. Survivors commit under a
  * `#txn=<streamId>-<batchId>` marker, so a replayed micro-batch is
  * detected up-front and costs nothing — exactly-once without a paired
  * write-ahead log.
  *
  * Usage:
  * {{{
  * vecStream.writeStream
  *   .foreachBatch(SemanticStreamingDedup.sink(corpusDir, centroidDir,
  *     k = 8, threshold = 0.9, streamId = "emb-ingest") _)
  *   .start()
  * }}}
  */
object SemanticStreamingDedup {

  def sink(corpusDir: String, centroidDir: String, k: Int,
      threshold: Double, streamId: String)(
      batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.functions._
    val spark = batch.sparkSession
    import spark.implicits._
    ManifestTable.create(corpusDir)
    ManifestTable.create(centroidDir)
    if (ManifestTable.hasCommittedTxn(corpusDir, s"$streamId-$batchId"))
      return // replayed micro-batch: nothing owed
    if (batch.isEmpty) return // nothing to admit; replay re-checks cheaply
    // Codebook: train-once on the first data-carrying batch, then frozen.
    val centroids: Array[(Long, Array[Double])] = {
      val empty = ManifestTable.files(centroidDir,
        ManifestTable.currentVersion(centroidDir)).isEmpty
      if (empty) {
        val trained = Similarity.kmeansCentroids(batch, k, 2)
        ManifestTable.appendWithRetry(spark, centroidDir,
          trained.toSeq.map { case (cid, c) => (cid, c.toSeq) }
            .toDF("cid", "c"))
        trained
      } else {
        ManifestTable.read(spark, centroidDir)._2
          .select(col("cid"), col("c")).collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
          .sortBy(_._1)
      }
    }
    val assigned = batch
      .join(Similarity.assignWith(batch, centroids), "vec_id")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"), col("cid"))
    val corpusEmpty = ManifestTable.files(corpusDir,
      ManifestTable.currentVersion(corpusDir)).isEmpty
    val survivors =
      if (corpusEmpty)
        Similarity.semDedupIncoming(
          assigned.limit(0), assigned, "cid", threshold)
      else {
        val (_, corpus) = ManifestTable.read(spark, corpusDir)
        // prune the corpus scan to the batch's touched cells — the probe
        // cost is batch-proportional, not corpus-proportional
        val touched = assigned.select(col("cid")).distinct()
        Similarity.semDedupIncoming(
          corpus.join(broadcast(touched), "cid"),
          assigned, "cid", threshold)
      }
    ManifestTable.appendWithRetry(spark, corpusDir, survivors,
      txn = Some(s"$streamId-$batchId"))
  }
}
