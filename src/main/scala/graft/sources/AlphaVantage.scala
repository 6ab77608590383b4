package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One validated, typed daily bar — the engine's mirror of the reference's
  * Pydantic `DailyStockData` + warehouse row (etl.py:15-20, 115-129). */
case class StockDaily(symbol: String, date: java.sql.Date, open: Double,
    high: Double, low: Double, close: Double, volume: Long,
    daily_change_percentage: Double)

/** The Alpha Vantage ingest pipeline (SURVEY.md §1, §3.2), Spark-first.
  *
  * Reference semantics reproduced (citations into /root/reference):
  *  - payload shape: map-of-date→OHLCV-struct with string numerics and
  *    ordinal-prefixed field names (raw_data/AAPL_2025-10-05.json:1-16)
  *  - validation: payloads missing required keys are skipped, never fatal
  *    (etl.py:52-56, 73-77); non-numeric fields reject the record
  *    (etl.py:15-20 via Pydantic coercion)
  *  - transform chain: unpivot → rename → cast → derive → tag symbol →
  *    sort (etl.py:80-99)
  *
  * Spark-first differences (by design): the whole chain is ONE lazy plan —
  * explode on the MapType does the unpivot, casts are Catalyst expressions,
  * the symbol comes from the payload's own metadata, and per-payload
  * validation is a DataFrame split (valid/quarantine), not a try/except.
  * At 100 TB this reads any number of payload files in parallel, prunes the
  * untouched `Meta Data` column at the scan, and never touches the driver.
  */
object AlphaVantage {

  val ohlcvSchema: StructType = StructType(Seq(
    StructField("1. open", StringType), StructField("2. high", StringType),
    StructField("3. low", StringType), StructField("4. close", StringType),
    StructField("5. volume", StringType)))

  val payloadSchema: StructType = StructType(Seq(
    StructField("Meta Data", MapType(StringType, StringType)),
    StructField("Time Series (Daily)", MapType(StringType, ohlcvSchema))))

  /** S2: read raw cached payloads (pretty-printed → multiLine) with the
    * explicit schema — never inferSchema (SURVEY.md §1.4). */
  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(payloadSchema).option("multiLine", true).json(path)

  /** P5: split payloads into (valid, quarantined). A payload is valid iff
    * both required keys parsed non-null (error/rate-limit payloads lack
    * them, etl.py:27-29) AND every record casts cleanly ([[castClean]] —
    * the Pydantic whole-response validation, etl.py:73-77). The split
    * PARTITIONS the input: a cast-dirty payload is OBSERVABLE in the
    * quarantine side, not silently dropped downstream. */
  def validate(raw: DataFrame): (DataFrame, DataFrame) = {
    val ok = col("Meta Data").isNotNull &&
      col("`Time Series (Daily)`").isNotNull &&
      element_at(col("Meta Data"), "2. Symbol").isNotNull &&
      castClean
    (raw.filter(ok), raw.filter(!coalesce(ok, lit(false))))
  }

  /** A payload is cast-clean iff EVERY record parses: date key and all five
    * numeric fields. One bad record anywhere rejects the WHOLE payload —
    * the reference validates the full response object in one shot
    * (`AlphaVantageResponse(**raw_data)`, etl.py:73-77) and `continue`s
    * past the entire symbol on any ValidationError. */
  private val castClean = expr(
    """forall(map_entries(`Time Series (Daily)`), e ->
      |  try_cast(e.key AS date) IS NOT NULL AND
      |  try_cast(e.value.`1. open` AS double) IS NOT NULL AND
      |  try_cast(e.value.`2. high` AS double) IS NOT NULL AND
      |  try_cast(e.value.`3. low` AS double) IS NOT NULL AND
      |  try_cast(e.value.`4. close` AS double) IS NOT NULL AND
      |  try_cast(e.value.`5. volume` AS bigint) IS NOT NULL)""".stripMargin)

  /** R1+P1-P4: map-explode, prefix-strip renames, string→number casts, the
    * derived daily change, and the symbol tag — one lazy plan. A payload
    * with ANY malformed record is quarantined WHOLE (the Pydantic
    * whole-response rejection, etl.py:73-77) — the [[castClean]] guard runs
    * per-payload BEFORE the explode, so clean payloads pay one vectorized
    * map scan and dirty ones never fan out. */
  def tabularize(valid: DataFrame): Dataset[StockDaily] = {
    val spark = valid.sparkSession
    import spark.implicits._
    valid
      .filter(castClean)
      .select(
        element_at(col("Meta Data"), "2. Symbol").as("symbol"),
        explode(col("`Time Series (Daily)`")).as(Seq("date_str", "ohlcv")))
      .select(
        col("symbol"),
        to_date(col("date_str"), "yyyy-MM-dd").as("date"),
        // try_cast: ANSI mode would THROW on malformed numerics; the
        // reference instead rejects the record (Pydantic, etl.py:15-20)
        col("ohlcv.`1. open`").try_cast(DoubleType).as("open"),
        col("ohlcv.`2. high`").try_cast(DoubleType).as("high"),
        col("ohlcv.`3. low`").try_cast(DoubleType).as("low"),
        col("ohlcv.`4. close`").try_cast(DoubleType).as("close"),
        col("ohlcv.`5. volume`").try_cast(LongType).as("volume"))
      .filter(col("date").isNotNull && col("open").isNotNull &&
        col("high").isNotNull && col("low").isNotNull &&
        col("close").isNotNull && col("volume").isNotNull)
      .withColumn("daily_change_percentage",
        (col("close") - col("open")) / col("open") * 100.0)
      .as[StockDaily]
  }

  /** The full batch pipeline: read → validate → tabularize. */
  def ingest(spark: SparkSession, path: String): Dataset[StockDaily] =
    tabularize(validate(readRaw(spark, path))._1)
}
