package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.Tables

/** Scalar-function queries (SURVEY.md §2.9 F1–F6) + pivot restructuring
  * (§2.3 R1 generalized).
  *
  * All functions here are built-in Catalyst expressions — whole-stage
  * codegen'd, no UDFs (the reference's Pydantic coercions and f-string
  * formatting map onto cast/concat/regexp, etl.py:15-29, 39, 82-95).
  */
object Scalars {

  /** F6 conditional aggregation (when/otherwise): urgent-order revenue share
    * per month — the CASE WHEN pattern of TPC-H Q12/Q14. */
  def conditionalAgg(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Money
    Tables.orders(spark, d)
      .groupBy(date_trunc("month", $"o_orderdate").cast("date").as("month"))
      .agg(
        sum(when($"o_orderpriority" === "1-URGENT", Money.cents($"o_totalprice"))
          .otherwise(lit(0L))).as("__uc"),
        sum(Money.cents($"o_totalprice")).as("__tc"),
        count(lit(1)).as("n"))
      .select($"month",
        round($"__uc" / 100.0, 4).as("urgent_price"),
        round($"__tc" / 100.0, 4).as("total_price"),
        $"n",
        round($"__uc" / $"__tc" * 100.0, 4).as("urgent_share"))
      .orderBy($"month")
  }

  /** F2 date functions: year/quarter/month extraction and grouping. */
  def dateFunctions(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .groupBy(year($"o_orderdate").as("y"), quarter($"o_orderdate").as("q"),
        month($"o_orderdate").as("m"))
      .agg(count(lit(1)).as("n"),
        round(sum(graft.functions.Money.cents($"o_totalprice")) / (lit(100.0) * count(lit(1))), 4)
          .as("avg_price"))
      .orderBy($"y", $"q", $"m")
  }

  /** F2 date arithmetic: offsets and differences (the reference's
    * date-stamped cache keys and run timestamps, etl.py:35, 39). */
  def dateArithmetic(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .filter($"o_orderkey" <= 1000)
      .select($"o_orderkey",
        to_date($"o_orderdate").as("order_date"),
        date_add(to_date($"o_orderdate"), 30).as("due_date"),
        datediff(to_date($"o_orderdate"), lit("1995-01-01").cast("date"))
          .as("days_since_epoch_start"),
        last_day(to_date($"o_orderdate")).as("month_end"))
      .orderBy($"o_orderkey")
  }

  /** F3 string functions: upper, substring, length, regexp_replace, concat.
    * Mirrors the reference's prefix-stripping renames (etl.py:82-88). */
  def stringFunctions(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, d)
      .select($"c_custkey",
        upper($"c_mktsegment").as("seg_up"),
        substring($"c_name", 1, 9).as("name_head"),
        length($"c_name").as("name_len"),
        regexp_replace($"c_name", "[0-9]+", "#").as("name_norm"),
        concat($"c_mktsegment", lit(":"), $"c_name").as("seg_name"))
      .orderBy($"c_custkey")
  }

  /** F4 JSON: parse the events.props JSON payload and aggregate on its
    * field — the reference's whole-payload JSON parse (etl.py:45,70) as a
    * column-level operator. */
  def jsonExtract(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, d)
      .select($"event_type",
        from_json($"props", lit("k INT")).getField("k").as("k_val"), $"value")
      .groupBy($"event_type")
      .agg(round(avg($"k_val"), 4).as("avg_k"),
        sum($"k_val".cast(IntegerType)).as("sum_k"),
        count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  /** R1/G5 pivot: long→wide restructuring, the inverse of the reference's
    * map-explode (etl.py:80-81); values pinned for a deterministic schema
    * (required at 100 TB — an unpinned pivot scans twice to discover values). */
  def pivotWide(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d)
      .groupBy($"l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(round(sum($"l_quantity"), 4))
      .orderBy($"l_linestatus")
  }

  /** F5 array functions: per-order collected+sorted line numbers, with
    * size / element access / membership / slicing over the array. The
    * collect is normalized by array_sort so the result is
    * aggregation-order-independent. Array columns are projected as
    * comma-joined strings in the FINAL select — the external gate sorts
    * result rows with pandas, which cannot hash/order ndarray cells. */
  def arrayFunctions(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d)
      .filter($"l_orderkey" <= 500)
      .groupBy($"l_orderkey")
      .agg(array_sort(collect_list($"l_linenumber")).as("lines"))
      .select($"l_orderkey",
        array_join($"lines", ",").as("lines_csv"),
        size($"lines").as("n_lines"),
        element_at($"lines", 1).as("first_line"),
        array_contains($"lines", 3).as("has_line3"),
        array_join(slice($"lines", 1, 2), ",").as("first_two_csv"))
      .orderBy($"l_orderkey")
  }

  /** R1 inverse — unpivot/stack: the wide A/N/R quantity matrix of
    * [[pivotWide]] back to long form. `stack` is the built-in generator
    * for wide→long (the explode of a column tuple). */
  def unpivotLong(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    pivotWide(spark, d)
      .selectExpr("l_linestatus",
        "stack(3, 'A', A, 'N', N, 'R', R) AS (returnflag, sum_qty)")
      .filter($"sum_qty".isNotNull)
      .orderBy($"l_linestatus", $"returnflag")
  }

  /** F5 map functions: build a returnflag→count map per linestatus
    * (map_from_entries over a SORTED entry list, so map order is
    * deterministic), then read it back with map_keys / element_at / size.
    * The map type is the engine-side mirror of the reference's payload
    * map-of-date→OHLCV (raw_data/AAPL_2025-10-05.json:9). */
  def mapFunctions(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d)
      .groupBy($"l_linestatus", $"l_returnflag")
      .agg(count(lit(1)).as("n"))
      .groupBy($"l_linestatus")
      .agg(map_from_entries(array_sort(collect_list(struct($"l_returnflag", $"n"))))
        .as("m"))
      .select($"l_linestatus",
        array_join(map_keys($"m"), ",").as("keys_csv"),
        element_at($"m", "A").as("n_a"),
        element_at($"m", "N").as("n_n"),
        size($"m").as("n_entries"))
      .orderBy($"l_linestatus")
  }

  /** F3 regexp group extraction: parse the structured pieces out of the
    * part strings ("Brand#17" → 17, "small ring" → adjective/noun) — the
    * parse-a-semi-structured-string pattern every log/training pipeline
    * needs. No-match returns '' in both engines. */
  def regexpExtract(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, d)
      .select($"p_partkey",
        regexp_extract($"p_brand", "#(\\d+)", 1).as("brand_num"),
        regexp_extract($"p_name", "^(\\w+) (\\w+)$", 1).as("name_adj"),
        regexp_extract($"p_name", "^(\\w+) (\\w+)$", 2).as("name_noun"),
        regexp_extract($"p_type", "^([A-Z]+)", 1).as("type_head"))
      .orderBy($"p_partkey")
  }

  /** F6 null-handling functions: coalesce/nullif/greatest/least and
    * null-aware comparison, over the lag-null boundary of q09's shape. */
  def nullFunctions(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(spark, d)
      .withColumn("prev", lag($"o_totalprice", 1).over(w))
      .filter($"o_orderkey" <= 2000)
      .select($"o_orderkey",
        round(coalesce($"prev", lit(0.0)), 4).as("prev_or_zero"),
        round(nullif($"o_totalprice", $"o_totalprice"), 4).as("always_null"),
        round(greatest($"o_totalprice", coalesce($"prev", lit(0.0))), 4).as("hi"),
        round(least($"o_totalprice", coalesce($"prev", lit(0.0))), 4).as("lo"),
        $"prev".isNull.as("is_first"))
      .orderBy($"o_orderkey")
  }

  /** F3 extended string functions: pad/trim/translate/reverse/replace
    * (the rename-and-normalize family of etl.py:82-88 widened). */
  def stringFunctions2(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, d)
      .select($"p_partkey",
        lpad($"p_brand", 10, "#").as("brand_padded"),
        rpad($"p_type", 12, ".").as("type_padded"),
        trim(lit("  x  ")).as("trimmed"),
        translate($"p_name", "aeiou", "AEIOU").as("name_translated"),
        reverse($"p_brand").as("brand_reversed"),
        regexp_replace($"p_name", " ", "_").as("name_snake"))
      .orderBy($"p_partkey")
  }

  /** F1 math functions: abs/round/floor/ceil/sqrt over numeric columns. */
  def mathFunctions(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d)
      .filter($"l_orderkey" <= 100)
      .select($"l_orderkey", $"l_linenumber",
        round(abs($"l_extendedprice" - $"l_quantity" * lit(100.0)), 4).as("abs_diff"),
        floor($"l_extendedprice").as("price_floor"),
        ceil($"l_discount" * 100).as("disc_pct_ceil"),
        round(sqrt($"l_quantity"), 4).as("qty_sqrt"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }
}
