package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.v2.StockDataSource

class StockDataSourceV2Spec extends SparkSpec {
  private val fixtures = getClass.getResource("/raw_data").getPath
  private val fmt = "graft.sources.v2.StockDataSource"

  test("DSv2 source matches the read-json ingest path row for row") {
    import spark.implicits._
    val v2 = spark.read.format(fmt).option("path", fixtures).load()
      .select($"symbol", $"date".cast("string"), $"open", $"close", $"volume")
      .as[(String, String, Double, Double, Long)].collect().toSet
    val classic = AlphaVantage.ingest(spark, s"$fixtures/*.json")
      .toDF()
      .select($"symbol", $"date".cast("string"), $"open", $"close", $"volume")
      .as[(String, String, Double, Double, Long)].collect().toSet
    assert(v2 == classic)
    assert(v2.nonEmpty)
  }

  test("symbol filter pushdown prunes whole files at planning time") {
    import spark.implicits._
    val df = spark.read.format(fmt).option("path", fixtures).load()
      .filter($"symbol" === "GOOG")
    StockDataSource.filesOpened.set(0)
    val syms = df.select($"symbol").distinct().as[String].collect().toSeq
    assert(syms == Seq("GOOG"))
    // only GOOG_*.json opened — not the AAPL/MSFT/ERR files
    assert(StockDataSource.filesOpened.get() == 1,
      s"opened ${StockDataSource.filesOpened.get()} files")
    // and the plan records the pushdown
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("StockScan") || plan.contains("BatchScan"), plan)
  }

  test("limit pushdown caps each file reader; global result stays exact") {
    import spark.implicits._
    val df = spark.read.format(fmt).option("path", fixtures).load().limit(3)
    // the scan description records the pushed limit (partial pushdown:
    // Spark's Limit stays on top for cross-file exactness)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("limit=3"), plan)
    assert(df.count() == 3)
    // correctness under the cap: limited rows are a subset of the full read
    val full = spark.read.format(fmt).option("path", fixtures).load()
      .select($"symbol", $"date".cast("string")).as[(String, String)]
      .collect().toSet
    val limited = df.select($"symbol", $"date".cast("string"))
      .as[(String, String)].collect().toSet
    assert(limited.subsetOf(full) && limited.size == 3)
  }

  test("non-pushable filters still apply after the scan") {
    import spark.implicits._
    val rows = spark.read.format(fmt).option("path", fixtures).load()
      .filter($"symbol" === "AAPL" && $"close" > 255.0)
      .select($"close").as[Double].collect()
    assert(rows.nonEmpty && rows.forall(_ > 255.0))
  }

  test("malformed payloads yield zero rows (whole-payload reject)") {
    import spark.implicits._
    val bad = spark.read.format(fmt).option("path", fixtures).load()
      .filter($"symbol" === "ERR") // no file starts with ERR_ matching meta
    assert(bad.count() == 0)
  }

  test("filename/Meta-Data symbol mismatch quarantines the whole file") {
    import spark.implicits._
    // A payload whose internal symbol differs from its cache-key filename
    // would make filename-based file pruning non-conservative (the file is
    // skipped for the internal symbol's filter); the reader quarantines it
    // entirely and counts the event, so pruning stays exact.
    val dir = java.nio.file.Files.createTempDirectory("mismatch")
    val src = java.nio.file.Paths.get(fixtures, "AAPL_d1.json")
    java.nio.file.Files.copy(src,
      dir.resolve("MSFT_d1.json")) // AAPL payload under an MSFT name
    StockDataSource.symbolMismatches.set(0)
    val rows = spark.read.format(fmt).option("path", dir.toString).load()
    assert(rows.count() == 0)
    assert(StockDataSource.symbolMismatches.get() == 1)
  }
}
