/** graft — a Spark-native (Scala) analytics engine with the query and
  * data-processing capabilities of the reference ETL pipeline
  * (KristineNinua/ETL-Pipeline-with-Alpha-Vantage, read-only snapshot at
  * /root/reference), generalized per the north star into a reusable
  * operator library plus LLM-training-data operators.
  *
  * Map of the engine (details: README.md, blueprint: SURVEY.md):
  *
  *  - [[graft.SparkEntry]] — the driver contract: `entry`, 57 `queries`,
  *    and per-query DuckDB `oracleSql` (53 oracled; 4 approximate ops are
  *    rows-only). [[graft.Verify]] dumps results for the oracle gate,
  *    [[graft.Bench]] emits the one-line bench JSON, [[graft.Explain]]
  *    regenerates EXPLAIN.md, [[graft.DemoPipeline]] runs the reference's
  *    `main()` end-to-end.
  *  - [[graft.queries]] — one object per operator family (Relational,
  *    Windows, SetsAndAggs, Scalars, Temporal, Advanced, SqlSurface,
  *    NorthStar) wiring the library into oracled queries.
  *  - [[graft.operators]] — the library itself: AsOfJoin, Upsert,
  *    Sessionize, Dedup (exact / prefix-filtered Jaccard / MinHash+LSH /
  *    SimHash), Similarity (exact / LSH / IVF), TextAnalysis, Multimodal,
  *    Salt.
  *  - [[graft.functions]] — CandleAggregator (typed two-phase UDAF) and
  *    Money (exact integer-cents aggregation).
  *  - [[graft.plans]] — custom Catalyst expressions (codegen'd DotProduct,
  *    SimHash64, RollingHash) and the FuseDotProduct optimizer rule +
  *    SparkSessionExtensions wiring.
  *  - [[graft.sources]] — AlphaVantage ingest (schema-on-read, quarantine),
  *    Parquet/Jdbc warehouses (DECIMAL at-rest, idempotent append),
  *    RawCache, RunLog.
  *  - [[graft.streaming]] — file-drop ingest with exactly-once checkpoint,
  *    watermarked dedup, windowed aggs, flatMapGroupsWithState
  *    sessionizer, stream-static enrichment, and the custom
  *    DataSource-V2 rate-limited source in
  *    [[graft.streaming.avsource]].
  */
package object graft
