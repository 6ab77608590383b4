package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{CandleAggregator, PricePoint}
import graft.operators.Upsert

/** Remaining relational depth: non-equi range join (A5), forced sort-merge
  * join (A2), idempotent upsert (A7), typed custom aggregate (G5), and the
  * explode generator (R1/UDTF surface). */
object Advanced {

  /** A5 theta/range join: band join of customers onto account-balance tiers.
    * The tier table is tiny → broadcast nested-loop, the right plan; a
    * large-large band join would instead bucket both sides by range
    * (bin the join value, equi-join on bin, re-filter). */
  def rangeJoin(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val tiers = Seq(
      ("p0_negative", -100000.0, 0.0),
      ("p1_low", 0.0, 2500.0),
      ("p2_mid", 2500.0, 5000.0),
      ("p3_high", 5000.0, 7500.0),
      ("p4_top", 7500.0, 100000.0)).toDF("tier", "lo", "hi")
    Tables.customer(spark, d)
      .join(broadcast(tiers), $"c_acctbal" >= $"lo" && $"c_acctbal" < $"hi")
      .groupBy($"tier")
      .agg(count(lit(1)).as("n_customers"),
        round(sum(graft.functions.Money.cents($"c_acctbal")) / (lit(100.0) * count(lit(1))), 4)
          .as("avg_bal"))
      .orderBy($"tier")
  }

  /** A2 sort-merge join, forced via hint (Catalyst would broadcast at this
    * SF; at 100 TB fact-fact SMJ on the join key is the right strategy and
    * this pins it). */
  def sortMergeJoin(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d).hint("merge"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(round(graft.functions.Money.sumRevenue($"l_extendedprice", $"l_discount"), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"o_orderpriority")
  }

  /** A7 idempotent upsert-ignore: re-deliver an overlapping slice of orders
    * (the reference's restated-history case, §2.10 T5) and verify the merge
    * keeps exactly one row per key. */
  def upsertIgnore(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val existing = Tables.orders(spark, d).filter($"o_orderdate" < lit("2000-01-01"))
    val incoming = Tables.orders(spark, d).filter($"o_orderdate" >= lit("1999-01-01"))
    Upsert.upsertIgnore(incoming, existing, Seq("o_orderkey"))
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        round(graft.functions.Money.sumMoney($"o_totalprice"), 4).as("sum_price"))
      .orderBy($"o_orderstatus")
  }

  /** G5 typed Aggregator: per-customer OHLC candle over the order history,
    * ordered by (orderdate, orderkey). */
  def candleAgg(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val points = Tables.orders(spark, d).select(
      $"o_custkey".as("key"),
      $"o_orderdate".cast("timestamp").cast("long").as("ord1"),
      $"o_orderkey".as("ord2"),
      $"o_totalprice".as("v")).as[PricePoint]
    val candle = new CandleAggregator().toColumn
    points.groupByKey(_.key).agg(candle)
      .map { case (k, c) => (k, c.open, c.high, c.low, c.close, c.total, c.n) }
      .toDF("o_custkey", "open_price", "high_price", "low_price", "close_price",
        "total_price", "n")
      .select($"o_custkey", round($"open_price", 4).as("open_price"),
        round($"high_price", 4).as("high_price"),
        round($"low_price", 4).as("low_price"),
        round($"close_price", 4).as("close_price"),
        round($"total_price", 4).as("total_price"), $"n")
      .orderBy($"o_custkey")
  }

  /** Data-layout Z-order: the 32-bit Morton code of (l_partkey, l_suppkey)
    * per lineitem row ([[graft.operators.Layout.morton2]]) — the clustering
    * key `Layout.zorderWrite` range-partitions on so parquet min-max stats
    * prune box predicates on either dimension (LayoutSpec proves the
    * pruning win). Pure long bit arithmetic, oracle-checked bit-for-bit. */
  def zorderCode(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d)
      .filter($"l_orderkey" < 300)
      .select($"l_orderkey", $"l_linenumber",
        $"l_partkey".bitwiseAND(lit(65535)).as("x"),
        $"l_suppkey".bitwiseAND(lit(65535)).as("y"),
        graft.operators.Layout.morton2($"l_partkey", $"l_suppkey").as("zcode"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** R1 generator: explode text into token rows, then doc-frequency counts —
    * the reference's map→rows expansion (etl.py:80-81) over free text. */
  def explodeTokens(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, d)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
      .groupBy($"token")
      .agg(count(lit(1)).as("n"), countDistinct($"doc_id").as("n_docs"))
      .orderBy($"n".desc, $"token")
      .limit(20)
  }
}
