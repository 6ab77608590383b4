package graft

import org.apache.spark.sql.SparkSession

import graft.sources.{AlphaVantage, ParquetWarehouse, RawCache, RunLog}
import graft.streaming.avsource.FakeAlphaVantageServer

/** The reference's `main()` (etl.py:183-216) end-to-end, Spark-first:
  *
  *   cache-or-fetch raw payloads → validate/quarantine → tabularize →
  *   idempotent warehouse append → catalog + last-5 inspection → run log
  *
  * Run: `sbt "runMain graft.DemoPipeline /tmp/graft_demo 2025-10-05"`.
  * Re-running with the same args is a no-op on the warehouse (the
  * reference's INSERT IGNORE + per-day cache semantics) — the second run
  * fetches nothing and appends nothing.
  *
  * The fetch is the deterministic stub standing in for the Alpha Vantage
  * HTTP GET (zero-egress environment); everything downstream is the real
  * engine. */
object DemoPipeline {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft_demo")
    val today = args.lift(1).getOrElse("2025-10-05")
    val symbols = Seq("AAPL", "GOOG", "MSFT") // etl.py:205

    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 1. extract: per-day cache, fetch on miss (etl.py:33-70)
    val cache = new RawCache(s"$base/raw_data")
    val fetched = symbols.count { sym =>
      val miss = !cache.contains(sym, today)
      cache.getOrFetch(sym, today)(s => Some(FakeAlphaVantageServer.fetch(s, today)))
      miss
    }
    println(s"[extract] $fetched fetched, ${symbols.size - fetched} cache hits")

    // 2. validate + transform: one lazy plan over the whole lake
    val (valid, quarantined) =
      AlphaVantage.validate(AlphaVantage.readRaw(spark, s"$base/raw_data"))
    val rows = AlphaVantage.tabularize(valid)
    println(s"[transform] ${rows.count()} rows, ${quarantined.count()} payloads quarantined")

    // 3. load: idempotent keyed append (etl.py:110-158)
    val warehouse = new ParquetWarehouse(spark, s"$base/warehouse/stock_daily_data")
    warehouse.append(rows.toDF())

    // 4. inspect (etl.py:161-180)
    println("[inspect] columns: " + warehouse.describe()
      .map { case (n, t) => s"$n:$t" }.mkString(", "))
    warehouse.readBack(5).show(truncate = false)

    // 5. audit line (etl.py:222-223)
    new RunLog(s"$base/etl_log.txt")
      .append(s"ETL run at ${java.time.Instant.now()} ($today, ${symbols.size} symbols)")

    spark.stop()
  }
}
