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

  test("aggregate pushdown: global count/min/max/sum partials match the " +
      "unpushed ingest result; the plan records the push") {
    import spark.implicits._
    val pushed = spark.read.format(fmt).option("path", fixtures).load()
      .agg(count(lit(1)).as("n"), min($"date").cast("string").as("d0"),
        max($"close").as("mx"), sum($"volume").as("sv"))
    val plan = pushed.queryExecution.executedPlan.toString
    assert(plan.contains("pushedAggregates=[count(*),min(date),max(close)," +
      "sum(volume)]"), plan)
    val got = pushed.as[(Long, String, Double, Long)].collect().head
    val ref = AlphaVantage.ingest(spark, s"$fixtures/*.json").toDF()
      .agg(count(lit(1)), min($"date").cast("string"), max($"close"),
        sum($"volume"))
      .as[(Long, String, Double, Long)].collect().head
    assert(got == ref)
  }

  test("aggregate pushdown: group-by-symbol partials merge to the exact " +
      "per-symbol aggregates") {
    import spark.implicits._
    val pushed = spark.read.format(fmt).option("path", fixtures).load()
      .groupBy($"symbol")
      .agg(count(lit(1)).as("n"), max($"high").as("mx"))
    assert(pushed.queryExecution.executedPlan.toString
      .contains("pushedGroupBy=[symbol]"))
    val got = pushed.as[(String, Long, Double)].collect().toSet
    val ref = AlphaVantage.ingest(spark, s"$fixtures/*.json").toDF()
      .groupBy($"symbol").agg(count(lit(1)).as("n"), max($"high").as("mx"))
      .as[(String, Long, Double)].collect().toSet
    assert(got == ref && got.nonEmpty)
  }

  test("aggregate pushdown declines under a residual filter and on " +
      "string min/max; results stay exact") {
    import spark.implicits._
    // a residual (non-pushed-exact) filter keeps a Filter node above the
    // scan, so Spark never offers the aggregate to the source
    val filtered = spark.read.format(fmt).option("path", fixtures).load()
      .filter($"close" > 0.0).agg(count(lit(1)))
    assert(!filtered.queryExecution.executedPlan.toString
      .contains("pushedAggregates"))
    assert(filtered.as[Long].collect().head > 0)
    // min(symbol) is a string aggregate — pushAggregation must refuse it
    // (collation is Spark's, not the source's) and Spark aggregates rows
    val strAgg = spark.read.format(fmt).option("path", fixtures).load()
      .agg(min($"symbol"), count(lit(1)))
    assert(!strAgg.queryExecution.executedPlan.toString
      .contains("pushedAggregates"))
    val (s0, n0) = strAgg.as[(String, Long)].collect().head
    assert(s0 == "AAPL" && n0 > 0)
  }

  test("pushLimit after a pushed aggregation is ignored — the partial " +
      "agg must see every day-row") {
    import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
    val b = new graft.sources.v2.StockScanBuilder(fixtures)
    assert(b.pushAggregation(new Aggregation(
      Array(new CountStar()), Array.empty)))
    b.pushLimit(3) // must NOT cap the reader under the aggregation
    val scan = b.build()
    assert(!scan.description().contains("limit="), scan.description())
    // and the reverse order still refuses the aggregation (existing rule)
    val b2 = new graft.sources.v2.StockScanBuilder(fixtures)
    b2.pushLimit(3)
    assert(!b2.pushAggregation(new Aggregation(
      Array(new CountStar()), Array.empty)))
  }
}
