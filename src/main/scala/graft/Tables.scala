package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's read-only parquet tables
  * (`/root/testdata/sf*`, schemas in FIXTURES.md §2).
  *
  * Parquet scans are the engine's S8 source (SURVEY.md §2.1). All
  * correctness/bench queries read through here so that filter pushdown and
  * column pruning apply uniformly (verify with `.explain("formatted")`:
  * `PushedFilters` / `ReadSchema` must reflect the query, not the table).
  *
  * 100 TB note: at cluster scale these would be partitioned/bucketed external
  * tables; the API stays the same — a `DataFrame` per table — so every
  * operator in this library is agnostic to physical layout.
  */
object Tables {
  // Resolving a parquet DataFrame costs a driver-side listing + footer
  // read; at one-query-per-call granularity (Verify/Bench run 60+ queries,
  // several touching all 10 tables) that fixed cost dominates small-SF
  // runs. DataFrames are immutable logical plans, so memoizing the
  // resolved relation per (session, dir, table) is safe — Catalyst still
  // applies per-query pushdown/pruning on top of the shared relation.
  // CONTRACT: the driver's test tables are read-only for a session's
  // lifetime (TESTDATA.md); a mutable dataset would need invalidation
  // (spark.catalog.refreshByPath) and this cache would not fit.
  // Only the MOST RECENT session's relations are retained: the cached
  // DataFrames strongly reference their session, so any map keyed by
  // session (even a WeakHashMap — values referencing their key is the
  // documented defeat of weak keys) would pin every stopped test session
  // for the JVM lifetime. Sessions take the cache strictly in turns here
  // (Verify/Bench use one; test suites run sequentially), so evict-on-
  // session-change keeps the memoization win with at most one session
  // pinned — the live one.
  private var current: SparkSession = _
  private var relations =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val perSession = synchronized {
      if (current ne spark) {
        current = spark
        relations =
          new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
      }
      relations
    }
    perSession.computeIfAbsent((sfDir, name),
      _ => spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")

  /** `events.ts` has shipped as two parquet types across testdata
    * generations: TIMESTAMP(NANOS) (no native Spark type — sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true`, the column arrives as
    * LongType nanos and we truncate to micros, exactly what DuckDB does
    * reading the same file) and plain TIMESTAMP(MICROS) (arrives as
    * TIMESTAMP_NTZ; cast to the session-zone TimestampType — value-identical
    * under the UTC sessions Verify/Bench pin). Dispatch on the READ type so
    * either generation yields the same TimestampType column. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.LongType
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _        => raw.withColumn("ts", expr("cast(ts as timestamp)"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
