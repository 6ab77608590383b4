package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.QuantileState
import graft.plans.KllExpressions
import graft.sources.ManifestTable

/** [[KllStateStream]] contracts (the [[DauStateStream]] triple on the
  * quantile axis): (1) the streamed state matches the full-log rebuild
  * on the exact axis (per-day n) and exactly on quantiles in the
  * no-compaction regime, (2) a replayed batch is a no-op, (3) an empty
  * batch commits nothing. */
class KllStateStreamSpec extends SparkSpec {

  test("streamed day-state == full rebuild (n exact, quantiles exact " +
      "below capacity); replay + empty batches are no-ops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("kllstate").toString + "/t"
    val mem = MemoryStream[(Long, Long)]
    val q = mem.toDF().toDF("day", "v")
      .withColumn("ts", timestamp_seconds($"day" * 86400L))
      .writeStream
      .foreachBatch(KllStateStream.sink(dir, "ts", col("v"), 200, "kll") _)
      .start()
    val b1 = for (d <- 0L to 1L; i <- 1L to 15L) yield (d, i * 10 + d)
    val b2 = for (d <- 1L to 2L; i <- 16L to 30L) yield (d, i * 10 + d)
    mem.addData(b1: _*)
    q.processAllAvailable()
    mem.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    def readout(st: org.apache.spark.sql.DataFrame) =
      st.select($"d", KllExpressions.kll_n($"sk").as("n"),
          KllExpressions.kll_quantile($"sk", lit(500L)).as("p50"))
        .as[(Long, Long, Long)].collect().toList.sortBy(_._1)
    val state = ManifestTable.read(spark, dir)._2
    val all = (b1 ++ b2).toDF("day", "v")
      .withColumn("ts", timestamp_seconds($"day" * 86400L))
    val rebuilt = QuantileState.kllDayState(all, "ts", $"v", 200)
    assert(readout(state) == readout(rebuilt))
    // replayed batch: version frozen, readout identical
    val v = ManifestTable.currentVersion(dir)
    KllStateStream.sink(dir, "ts", col("v"), 200, "kll")(
      b1.toDF("day", "v")
        .withColumn("ts", timestamp_seconds($"day" * 86400L)), 0L)
    assert(ManifestTable.currentVersion(dir) == v)
    assert(readout(ManifestTable.read(spark, dir)._2) == readout(state))
    // empty batch: no snapshot
    KllStateStream.sink(dir, "ts", col("v"), 200, "kll")(
      Seq.empty[(Long, Long)].toDF("day", "v")
        .withColumn("ts", timestamp_seconds($"day" * 86400L)), 99L)
    assert(ManifestTable.currentVersion(dir) == v)
  }
}
