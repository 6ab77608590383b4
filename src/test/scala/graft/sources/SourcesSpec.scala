package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class SourcesSpec extends SparkSpec {

  test("RawCache fetches once, replays verbatim, skips on fetcher failure") {
    val dir = Files.createTempDirectory("cache").toString
    val cache = new RawCache(dir)
    var fetches = 0
    val fetch = (s: String) => { fetches += 1; Some(s"""{"sym": "$s"}""") }

    assert(!cache.contains("AAPL", "2025-10-05"))
    val first = cache.getOrFetch("AAPL", "2025-10-05")(fetch)
    assert(first.contains("""{"sym": "AAPL"}""") && fetches == 1)
    // cache hit: byte-identical replay, no second fetch (etl.py:42-45)
    val second = cache.getOrFetch("AAPL", "2025-10-05")(fetch)
    assert(second == first && fetches == 1)
    // fetcher failure (rate limit): no cache entry, None, not fatal
    val failed = cache.getOrFetch("GOOG", "2025-10-05")(_ => None)
    assert(failed.isEmpty && !cache.contains("GOOG", "2025-10-05"))
  }

  test("RunLog appends one line per run (etl.py:222-223)") {
    val path = Files.createTempDirectory("log").toString + "/etl_log.txt"
    val log = new RunLog(path)
    log.append("ETL run at 2026-08-12 10:00:00")
    log.append("ETL run at 2026-08-13 10:00:00")
    assert(log.lines() == Seq(
      "ETL run at 2026-08-12 10:00:00", "ETL run at 2026-08-13 10:00:00"))
  }

  test("catalog inspection surfaces tables and columns (S6)") {
    graft.Tables.nation(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("nation_view")
    val tables = spark.catalog.listTables().collect().map(_.name)
    assert(tables.contains("nation_view"))
    val cols = spark.catalog.listColumns("nation_view").collect().map(_.name)
    assert(cols.toSet == Set("n_nationkey", "n_name", "n_regionkey"))
  }
}
