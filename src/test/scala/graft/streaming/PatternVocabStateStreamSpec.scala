package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Labeling, TextAnalysis}
import graft.sources.ManifestTable

/** The round-14 always-on state maintainers: the Dawid–Skene pattern
  * histogram (q287/q297) and the vocabulary-growth pair (q299/q307)
  * maintained FROM REAL STREAMS. Contracts per maintainer: (1) the
  * readout over the streamed state is VALUE-IDENTICAL to the full-log
  * form (the states are exact sufficient statistics), (2) a replayed
  * batch is a no-op on every state dir (exactly-once across restart),
  * (3) an empty micro-batch commits nothing. */
class PatternVocabStateStreamSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toList.sortBy(_.mkString("|"))

  test("DsPatternStateStream: streamed histogram refit == full-corpus " +
      "dawidSkene; replay + empty batches are no-ops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("dsstate").toString + "/t"
    val raters = Seq(col("a"), col("b"), col("c"))
    val mem = MemoryStream[(Int, Int, Int)]
    val q = mem.toDF().toDF("a", "b", "c")
      .writeStream
      .foreachBatch(DsPatternStateStream.sink(dir, raters, "ds") _)
      .start()
    val b1 = Seq((1, 1, 1), (1, 1, 0), (1, 0, 1))
    val b2 = Seq((0, 0, 0), (0, 1, 0), (1, 1, 1))
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val all = (b1 ++ b2).toDF("a", "b", "c")
    val state = ManifestTable.read(spark, dir)._2
    assert(rows(state) == rows(Labeling.dsPatternState(all, raters)))
    assert(rows(Labeling.dawidSkeneFromState(state, 2)) ==
      rows(Labeling.dawidSkene(all, raters, 2)))
    // replayed batch: version frozen, state identical
    val v = ManifestTable.currentVersion(dir)
    DsPatternStateStream.sink(dir, raters, "ds")(
      b1.toDF("a", "b", "c"), 0L)
    assert(ManifestTable.currentVersion(dir) == v)
    assert(rows(ManifestTable.read(spark, dir)._2) == rows(state))
    // empty batch: no snapshot
    DsPatternStateStream.sink(dir, raters, "ds")(
      Seq.empty[(Int, Int, Int)].toDF("a", "b", "c"), 99L)
    assert(ManifestTable.currentVersion(dir) == v)
  }

  test("SurvivalStateStream: streamed span state drives every survival " +
      "readout identically to the full log; replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("survstate").toString + "/t"
    val arm = org.apache.spark.sql.functions.pmod(
      col("user_id"), org.apache.spark.sql.functions.lit(2L))
    val mem = MemoryStream[(Long, Long)]
    val q = mem.toDF().toDF("user_id", "day")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_seconds(col("day") * 86400L))
      .writeStream
      .foreachBatch(
        SurvivalStateStream.sink(dir, "user_id", "ts", "surv", arm) _)
      .start()
    // spans straddle batches: users re-appear with later days
    val b1 = (1L to 12L).map(u => (u, u % 4))
    val b2 = (1L to 12L).filter(_ % 2 == 0).map(u => (u, u % 4 + 3))
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val all = (b1 ++ b2).toDF("user_id", "day")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_seconds(col("day") * 86400L))
    val state = ManifestTable.read(spark, dir)._2
    def r(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toList.sortBy(_.mkString("|"))
    assert(r(state) ==
      r(graft.operators.Behavior.survivalSpanState(all, "user_id",
        "ts", arm)))
    assert(r(graft.operators.Behavior.survivalCurveFromState(state, 2))
      == r(graft.operators.Behavior.survivalCurve(all, "user_id",
        "ts", 2)))
    assert(r(graft.operators.Behavior.logRankFromState(state, 2)) ==
      r(graft.operators.Behavior.logRankTest(all, "user_id", "ts", 2,
        arm)))
    assert(r(graft.operators.Behavior
        .flemingHarringtonFromState(state, 2)) ==
      r(graft.operators.Behavior.flemingHarringtonTest(all, "user_id",
        "ts", 2, arm)))
    // replayed batch: version frozen, state identical
    val v = ManifestTable.currentVersion(dir)
    SurvivalStateStream.sink(dir, "user_id", "ts", "surv", arm)(
      b1.toDF("user_id", "day").withColumn("ts",
        org.apache.spark.sql.functions
          .timestamp_seconds(col("day") * 86400L)), 0L)
    assert(ManifestTable.currentVersion(dir) == v)
    assert(r(ManifestTable.read(spark, dir)._2) == r(state))
  }

  test("VocabStateStream: streamed curve == vocabGrowth over the full " +
      "corpus; replay is a no-op on BOTH state dirs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("vocabstate").toString
    val fsDir = base + "/first_seen"
    val dsDir = base + "/doc_stats"
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(VocabStateStream.sink(fsDir, dsDir, "vocab") _)
      .start()
    val b1 = Seq((0L, "a b a"), (1L, "b c"), (2L, "c d e"))
    val b2 = Seq((3L, "a e f"), (4L, "f g"), (5L, "h"))
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val all = (b1 ++ b2).toDF("doc_id", "text")
    // streamed states == full-corpus reductions
    assert(rows(ManifestTable.read(spark, fsDir)._2) ==
      rows(TextAnalysis.vocabState(all)))
    assert(rows(ManifestTable.read(spark, dsDir)._2) ==
      rows(TextAnalysis.vocabDocStats(all)))
    // curve from the maintained states == the one-pass q299 curve
    assert(rows(VocabStateStream.curve(spark, fsDir, dsDir, 3)) ==
      rows(TextAnalysis.vocabGrowth(all, 3)))
    // replayed batch: both dirs frozen
    val vFs = ManifestTable.currentVersion(fsDir)
    val vDs = ManifestTable.currentVersion(dsDir)
    VocabStateStream.sink(fsDir, dsDir, "vocab")(
      b1.toDF("doc_id", "text"), 0L)
    assert(ManifestTable.currentVersion(fsDir) == vFs)
    assert(ManifestTable.currentVersion(dsDir) == vDs)
    // empty batch: nothing commits
    VocabStateStream.sink(fsDir, dsDir, "vocab")(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), 99L)
    assert(ManifestTable.currentVersion(fsDir) == vFs)
    assert(ManifestTable.currentVersion(dsDir) == vDs)
  }
}
