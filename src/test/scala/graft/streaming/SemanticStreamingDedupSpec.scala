package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.sources.ManifestTable

/** The streaming SEMANTIC dedup loop (X7): train-once frozen codebook,
  * per-batch cell assignment, cell-pruned cross-set SemDeDup gate,
  * txn-marked exactly-once commits. Fixture geometry (2D): cluster A
  * around (1, 0), cluster B around (0, 1); threshold 0.95 so only
  * same-cluster near-parallel vectors collide. */
class SemanticStreamingDedupSpec extends SparkSpec {

  private def dirs(): (String, String) = {
    val base = Files.createTempDirectory("semdedup").toString
    (s"$base/corpus", s"$base/centroids")
  }

  test("first batch trains the codebook, dedups in-batch, commits; " +
      "later batches dedup against the corpus; replay is a no-op") {
    import spark.implicits._
    val (corpusDir, centroidDir) = dirs()
    val sink = SemanticStreamingDedup.sink(
      corpusDir, centroidDir, k = 2, threshold = 0.95, streamId = "spec") _

    // batch 0 (hand-traced Lloyd run): init = vecs 1,2; trained frozen
    // codebook c1 = (1.005, 0), c2 = (0.25, 1). In-batch gate: v3 ≈ v1
    // in cell 1 (cos 1.0 -> dropped); v4 shares cell 2 with v2 but
    // cos((0,1),(0.5,1)) = 0.894 < 0.95 -> kept.
    sink(Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(1.01f, 0f)),
      (4L, Seq(0.5f, 1f)))
      .toDF("vec_id", "embedding"), 0L)
    val c0 = ManifestTable.read(spark, corpusDir)._2
    assert(c0.select($"vec_id").as[Long].collect().toSet == Set(1L, 2L, 4L))
    val codebook = ManifestTable.read(spark, centroidDir)._2
    assert(codebook.count() == 2)

    // replay of batch 0: txn marker short-circuits, corpus unchanged
    sink(Seq((9L, Seq(1f, 0f))).toDF("vec_id", "embedding"), 0L)
    assert(ManifestTable.read(spark, corpusDir)._2.count() == 3)

    // batch 1: (2,0) lands in cell 1, cos vs corpus vec 1 = 1.0 ->
    // dropped; (-1,1) lands in cell 2, cos vs mates 2 and 4 is 0.707 /
    // 0.316 -> kept
    sink(Seq(
      (10L, Seq(2f, 0f)), (11L, Seq(-1f, 1f)))
      .toDF("vec_id", "embedding"), 1L)
    val c1 = ManifestTable.read(spark, corpusDir)._2
    assert(c1.select($"vec_id").as[Long].collect().toSet ==
      Set(1L, 2L, 4L, 11L))

    // batch 2: near-dup of BATCH 1's survivor 11 (cos 0.9997, same cell)
    // — caught against the corpus as of now; codebook FROZEN (2 rows)
    sink(Seq((20L, Seq(-1f, 1.05f))).toDF("vec_id", "embedding"), 2L)
    assert(ManifestTable.read(spark, corpusDir)._2
      .select($"vec_id").as[Long].collect().toSet == Set(1L, 2L, 4L, 11L))
    assert(ManifestTable.read(spark, centroidDir)._2.count() == 2)
  }

  test("wired through a real writeStream.foreachBatch query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (corpusDir, centroidDir) = dirs()
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch(SemanticStreamingDedup.sink(
        corpusDir, centroidDir, k = 2, threshold = 0.95, "wire") _)
      .start()
    mem.addData((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)))
    q.processAllAvailable()
    mem.addData((10L, Seq(3f, 0f)),  // near-dup of 1 (cos 1.0) — dropped
      (11L, Seq(-1f, 1f)))           // novel — kept
    q.processAllAvailable()
    q.stop()
    assert(ManifestTable.read(spark, corpusDir)._2
      .select($"vec_id").as[Long].collect().toSet == Set(1L, 2L, 11L))
  }
}
