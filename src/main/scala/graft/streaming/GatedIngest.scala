package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.sources.ManifestTable

/** X7 capstone — the full gated-ingest pipeline as ONE `foreachBatch`
  * sink: a (stream-side watermark-deduped) micro-batch of documents
  * carrying (doc_id, text, embedding) passes, in order,
  *
  *   1. the TEXT gate — in-batch exact collapse to the lowest doc_id,
  *      then [[graft.operators.Dedup.dropIncomingDuplicatesIndexed]]
  *      probing the persisted shingle index (batch-proportional; the
  *      accepted corpus is never re-shingled);
  *   2. the SEMANTIC gate — cell assignment against the train-once
  *      FROZEN codebook, then
  *      [[graft.operators.Similarity.semDedupIncoming]] against the
  *      accepted corpus pruned to the batch's touched cells;
  *
  * and the final survivors commit ONCE to the accepted table under a
  * `#txn=<streamId>-<batchId>` marker — one atomic admission decision
  * per batch, exactly-once under replay and restart.
  *
  * State (all [[graft.sources.ManifestTable]]s):
  *   - `acceptedDir`: accepted documents (doc_id, text, embedding, cid)
  *     — the ONLY txn-marked table; the other two are derived from it;
  *   - `textIndexDir`: shingle arrays of the accepted docs, maintained
  *     by [[StreamingDedup.catchUpIndex]]'s idempotent catch-up, healed
  *     BEFORE every probe so a crash between the accepted commit and
  *     the index append can never admit a near-dup of an unindexed doc;
  *   - `centroidDir`: the k×d codebook, trained once on the first
  *     data-carrying batch and FROZEN ([[SemanticStreamingDedup]]'s
  *     stability argument: retraining moves cell boundaries and
  *     silently changes which dups are catchable).
  *
  * Replay: the txn check short-circuits before any probe work; the only
  * thing a replayed batch may still owe is the index catch-up (a cheap
  * doc_id anti-join no-op in steady state). This is the
  * bronze→silver→gold admission shape of a training-data lakehouse —
  * the reference's duplicate payload (raw_data/AAPL_2025-10-05.json ==
  * AAPL_2025-10-06.json, same bytes cached under two days) must land
  * exactly once no matter which job, run, or replay delivers it —
  * generalized to any corpus with ids, text, and embeddings.
  *
  * Scale shape per batch: the txt gate is the indexed incremental-dedup
  * plan (prefix-filtered probe of the inverted index, candidates
  * verified exactly); the semantic gate is map-only assignment +
  * cell-equi-joins with the corpus side pruned to touched cells; both
  * are proportional to the BATCH, never the corpus. The commit is one
  * append. Usage:
  * {{{
  * docsWithVectors.writeStream
  *   .foreachBatch(GatedIngest.sink(accepted, txtIdx, centroids,
  *     k = 64, textThreshold = 0.8, cosThreshold = 0.95, "ingest") _)
  *   .trigger(Trigger.AvailableNow()).start()
  * }}}
  */
object GatedIngest {

  def sink(acceptedDir: String, textIndexDir: String, centroidDir: String,
      k: Int, textThreshold: Double, cosThreshold: Double,
      streamId: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    ManifestTable.create(acceptedDir)
    ManifestTable.create(textIndexDir)
    ManifestTable.create(centroidDir)
    if (ManifestTable.hasCommittedTxn(acceptedDir, s"$streamId-$batchId")) {
      StreamingDedup.catchUpIndex(spark, acceptedDir, textIndexDir)
      return // replayed micro-batch: nothing owed but the catch-up
    }
    if (batch.isEmpty) return
    // heal the text index BEFORE probing (see the crash-window argument)
    StreamingDedup.catchUpIndex(spark, acceptedDir, textIndexDir)
    // in-batch exact text collapse to the lowest doc_id
    val inBatch = batch
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("text")).orderBy(col("doc_id"))))
      .filter(col("__rk") === 1).drop("__rk")
      .persist()
    // set as each stage materializes; released in the finally
    var textSurvivorsP: DataFrame = null
    var assignedP: DataFrame = null
    try {
      val acceptedEmpty = ManifestTable.files(acceptedDir,
        ManifestTable.currentVersion(acceptedDir)).isEmpty
      // ---- gate 1: exact + near text dedup against the accepted corpus
      val textSurvivors =
        if (acceptedEmpty) inBatch
        else {
          val (_, accepted) = ManifestTable.read(spark, acceptedDir)
          val idxEmpty = ManifestTable.files(textIndexDir,
            ManifestTable.currentVersion(textIndexDir)).isEmpty
          if (idxEmpty)
            // index lost/never built: fall back to the in-line build
            Dedup.dropIncomingDuplicates(accepted, inBatch, textThreshold)
          else {
            val (_, idx) = ManifestTable.read(spark, textIndexDir)
            Dedup.dropIncomingDuplicatesIndexed(idx, accepted, inBatch,
              textThreshold)
          }
        }
      // persist: textSurvivors feeds tsVecs (twice via the assign
      // self-join), the touched-cell prune, and finalRows — without the
      // pin each reference replays the gate-1 inverted-index probe
      textSurvivorsP = textSurvivors.persist()
      // ---- gate 2: semantic dedup in frozen-codebook cells
      val centroids: Array[(Long, Array[Double])] = {
        val empty = ManifestTable.files(centroidDir,
          ManifestTable.currentVersion(centroidDir)).isEmpty
        // A lost codebook with a NON-empty accepted corpus is fatal, not
        // recoverable: retraining here would produce cids incomparable
        // with the cid column stored on accepted rows, so gate 2 would
        // silently admit near-duplicates (the text index has a safe
        // inline-rebuild fallback; cell ids do not — the whole frozen-
        // codebook contract rests on never re-deriving them).
        require(!(empty && !acceptedEmpty),
          s"centroid table $centroidDir is empty but accepted corpus " +
            s"$acceptedDir is not — refusing to retrain a codebook whose " +
            "cids would not match the accepted rows' stored cid column; " +
            "restore the centroid table or rebuild accepted from scratch")
        if (empty) {
          // train-once on the first data-carrying batch, then frozen
          val trained = Similarity.kmeansCentroids(
            inBatch.select(col("doc_id").as("vec_id"), col("embedding")),
            k, 2)
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
      val tsVecs = textSurvivorsP.select(col("doc_id").as("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      // persist: assigned feeds semDedupIncoming (which references the
      // incoming side twice) plus the touched-cell distinct
      val assigned = tsVecs
        .join(Similarity.assignWith(tsVecs, centroids), "vec_id")
        .persist()
      assignedP = assigned
      val vecSurvivors =
        if (acceptedEmpty)
          Similarity.semDedupIncoming(
            assigned.limit(0), assigned, "cid", cosThreshold)
        else {
          val (_, accepted) = ManifestTable.read(spark, acceptedDir)
          val corpusVecs = accepted.select(col("doc_id").as("vec_id"),
            col("embedding").cast("array<double>").as("embedding"),
            col("cid"))
          // corpus probe pruned to the batch's touched cells
          val touched = assigned.select(col("cid")).distinct()
          Similarity.semDedupIncoming(
            corpusVecs.join(broadcast(touched), "cid"),
            assigned, "cid", cosThreshold)
        }
      // ---- single txn-marked commit, then index catch-up
      val finalRows = textSurvivorsP
        .join(vecSurvivors.select(col("vec_id").as("doc_id"), col("cid")),
          "doc_id")
        .select(col("doc_id"), col("text"),
          col("embedding").cast("array<double>").as("embedding"),
          col("cid"))
      ManifestTable.appendWithRetry(spark, acceptedDir, finalRows,
        txn = Some(s"$streamId-$batchId"))
      StreamingDedup.catchUpIndex(spark, acceptedDir, textIndexDir)
    } finally {
      if (assignedP != null) assignedP.unpersist(false)
      if (textSurvivorsP != null) textSurvivorsP.unpersist(false)
      inBatch.unpersist()
    }
  }
}
