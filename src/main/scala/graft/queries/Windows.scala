package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Window-function queries (SURVEY.md §2.6 W1–W5).
  *
  * The reference's `daily_change_percentage` (etl.py:98) is row-local; these
  * generalize it to true windowed analytics over the testdata tables.
  *
  * Scale notes: a window over `partitionBy(k).orderBy(o)` costs ONE shuffle
  * on k plus an in-partition sort — the same plan at 100 TB provided k has
  * enough cardinality (o_custkey / user_id do). Frames are all ROWS-based
  * (bounded memory per key); no unpartitioned global windows, which would
  * funnel the table through one task.
  */
object Windows {

  /** W1 lag: order-over-order price change per customer (the reference's
    * day-over-day change generalized, etl.py:98). */
  def lagChange(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(spark, d)
      .withColumn("prev_price", lag($"o_totalprice", 1).over(w))
      .withColumn("next_price", lead($"o_totalprice", 1).over(w))
      .select($"o_custkey", $"o_orderkey", to_date($"o_orderdate").as("order_date"),
        round($"o_totalprice", 4).as("price"),
        round($"prev_price", 4).as("prev_price"),
        round($"next_price", 4).as("next_price"),
        round($"o_totalprice" - $"prev_price", 4).as("change"))
      .orderBy($"o_custkey", $"order_date", $"o_orderkey")
  }

  /** W3 ranking: row_number over a total order; rank/dense_rank over the
    * price alone (deterministic under ties by construction). */
  def rankTopOrders(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val byCust = Window.partitionBy($"o_custkey")
    val total = byCust.orderBy($"o_totalprice".desc, $"o_orderkey")
    val byPrice = byCust.orderBy($"o_totalprice".desc)
    Tables.orders(spark, d)
      .withColumn("rn", row_number().over(total))
      .withColumn("rnk", rank().over(byPrice))
      .withColumn("drnk", dense_rank().over(byPrice))
      .withColumn("quartile", ntile(4).over(total))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", round($"o_totalprice", 4).as("price"),
        $"rn", $"rnk", $"drnk", $"quartile")
      .orderBy($"o_custkey", $"rn")
  }

  /** W2 moving average: trailing 7-row mean per customer (a 7-day MA once
    * keyed by date). ROWS frame → O(1) state per step. */
  def movingAvg(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(-6, 0)
    Tables.orders(spark, d)
      .withColumn("ma7", avg($"o_totalprice").over(w))
      .select($"o_custkey", $"o_orderkey", round($"ma7", 4).as("ma7"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** W5 RANGE frame (vs the ROWS frames above): peers by VALUE distance —
    * how many of the customer's orders are priced within ±1000 of this
    * one. */
  def rangeFrame(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice")
      .rangeBetween(-1000L, 1000L)
    Tables.orders(spark, d)
      .withColumn("n_similar", count(lit(1)).over(w))
      .select($"o_custkey", $"o_orderkey", round($"o_totalprice", 4).as("price"),
        $"n_similar")
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** W-family value accessors: first/last/nth over the full partition
    * frame (last_value needs the unbounded-following frame or it reads
    * only up to the current row — same rule in DuckDB). */
  def firstLastValue(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val full = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, d)
      .withColumn("first_price", first($"o_totalprice").over(full))
      .withColumn("last_price", last($"o_totalprice").over(full))
      .withColumn("second_price", nth_value($"o_totalprice", 2).over(full))
      .groupBy($"o_custkey")
      .agg(round(max($"first_price"), 4).as("first_price"),
        round(max($"last_price"), 4).as("last_price"),
        round(max($"second_price"), 4).as("second_price"))
      .orderBy($"o_custkey")
  }

  /** W4 running cumulative sum per user over event time. */
  def cumulativeSum(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(spark, d)
      .withColumn("cum_value", sum($"value").over(w))
      .select($"user_id", $"event_id", round($"cum_value", 4).as("cum_value"))
      .orderBy($"user_id", $"event_id")
  }

  /** W3 distribution functions: percent_rank / cume_dist over a fully
    * deterministic order (price, then key tiebreak). */
  def distributionFunctions(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice", $"o_orderkey")
    Tables.orders(spark, d)
      .filter($"o_orderkey" <= 5000)
      .select($"o_orderkey", $"o_orderpriority",
        round(percent_rank().over(w), 4).as("pr"),
        round(cume_dist().over(w), 4).as("cd"))
      .orderBy($"o_orderkey")
  }

  /** W5-ext TIME-range frame: per user, events in the trailing hour of
    * each event — a true RANGE frame over epoch seconds (peers at the
    * same second share a count), not a rows frame. The streaming-adjacent
    * "rate over trailing window" computed in batch; one shuffle on the
    * key like every window. Epoch seconds are FLOORED identically on both
    * engines so frame boundaries agree on sub-second data. */
  def trailingHourCount(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_sec")
      .rangeBetween(-3599L, 0L)
    graft.Tables.events(spark, d)
      .select($"user_id", $"event_id",
        floor($"ts".cast("double")).cast("long").as("ts_sec"))
      .withColumn("n_trailing_1h", count(lit(1)).over(w))
      .select($"user_id", $"event_id", $"n_trailing_1h")
      .orderBy($"user_id", $"event_id")
  }
}
