package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Core relational operator queries (SURVEY.md §2.2, §2.4, §2.5, §2.7).
  *
  * Every query here is paired with a DuckDB oracle in
  * [[graft.SparkEntry.oracleSql]]. Conventions for oracle parity:
  *   - deterministic `ORDER BY` over a full key set,
  *   - `round(x, 4)` on every double-valued output at the FINAL projection
  *     only (both engines compute bit-identical doubles up to aggregation
  *     order; rounding absorbs the summation-order ULP difference),
  *   - aliases identical on both sides (the driver sorts columns by name).
  *
  * Scale notes (100 TB): all queries are single lazy plans — filters reach
  * the parquet scan (PushedFilters), projections prune columns (ReadSchema),
  * small dimension tables are broadcast explicitly, fact-fact joins shuffle
  * on join keys once. No collect(), no driver-side row loops.
  */
object Relational {

  /** P-ops: scan → pushed filter → projection with arithmetic + cast.
    * Reference: the rename/cast/derive pipeline at etl.py:82-98. */
  def filterProject(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d)
      .filter($"l_shipdate" >= lit("1998-01-01") &&
        $"l_shipdate" < lit("1998-04-01") && $"l_discount" > 0.05)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity",
        round($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"),
        to_date($"l_shipdate").as("ship_date"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** The COMPLETE TPC-H Q1 pricing summary (all 8 aggregates + the
    * shipdate cutoff). Money terms aggregate as exact scaled integers
    * ([[graft.functions.Money]]); the three-factor charge product is
    * summed as DECIMAL so the exact integer sum cannot overflow BIGINT at
    * cluster row counts (6e11 rows × 1e11/row beats int64; decimal(38,0)
    * holds it). Averages divide exact sums once at the end. */
  def tpchQ1Full(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Money
    val cents = Money.cents _
    Tables.lineitem(spark, d)
      .filter($"l_shipdate" <= lit("1998-09-02"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 4).as("sum_qty"),
        round(Money.sumMoney($"l_extendedprice"), 4).as("sum_base_price"),
        round(Money.sumRevenue($"l_extendedprice", $"l_discount"), 4)
          .as("sum_disc_price"),
        round((sum((cents($"l_extendedprice") * (lit(100L) - cents($"l_discount"))
            * (lit(100L) + cents($"l_tax"))).cast("decimal(38,0)"))
          / lit(1000000.0)).cast("double"), 4).as("sum_charge"),
        round(sum($"l_quantity") / count(lit(1)), 4).as("avg_qty"),
        round(sum(cents($"l_extendedprice")) / (lit(100.0) * count(lit(1))), 4)
          .as("avg_price"),
        round(sum(cents($"l_discount")) / (lit(100.0) * count(lit(1))), 4)
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** TPC-H Q5 shape (local-supplier volume): the 6-table star-plus-chain
    * join — customer/supplier co-nationality makes it a genuine multi-hop
    * constraint, not just a star. Dimensions (region→nation) broadcast;
    * the three fact-side joins shuffle on their keys; revenue uses the
    * exact integer-cents path. */
  def tpchQ5(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Money
    val asia = Tables.region(spark, d).filter($"r_name" === "ASIA")
    val nations = Tables.nation(spark, d)
      .join(broadcast(asia), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    Tables.customer(spark, d)
      .join(Tables.orders(spark, d), $"c_custkey" === $"o_custkey")
      .filter($"o_orderdate" >= lit("1996-01-01") &&
        $"o_orderdate" < lit("1997-01-01"))
      .join(Tables.lineitem(spark, d), $"l_orderkey" === $"o_orderkey")
      .join(Tables.supplier(spark, d), $"l_suppkey" === $"s_suppkey" &&
        $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nations), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(round(Money.sumRevenue($"l_extendedprice", $"l_discount"), 4)
        .as("revenue"), count(lit(1)).as("n"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** TPC-H Q7 shape (volume shipping between two nations): the DISJUNCTIVE
    * cross-nation predicate ((A,B) or (B,A)) over two broadcast copies of
    * the nation dim, grouped by both nations and ship year. */
  def tpchQ7(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Money
    val n1 = Tables.nation(spark, d)
      .select($"n_nationkey".as("s_nkey"), $"n_name".as("supp_nation"))
    val n2 = Tables.nation(spark, d)
      .select($"n_nationkey".as("c_nkey"), $"n_name".as("cust_nation"))
    Tables.lineitem(spark, d)
      .filter($"l_shipdate" >= lit("1996-01-01") &&
        $"l_shipdate" < lit("1998-01-01"))
      .join(Tables.orders(spark, d), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, d), $"o_custkey" === $"c_custkey")
      .join(Tables.supplier(spark, d), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n1), $"s_nationkey" === $"s_nkey")
      .join(broadcast(n2), $"c_nationkey" === $"c_nkey")
      // nation BANDS rather than one pair, so the disjunction stays
      // non-degenerate even at sf0.001 (a single (A,B) pair matches no
      // lineitem there)
      .filter(($"s_nkey".between(1, 5) && $"c_nkey".between(6, 10)) ||
        ($"s_nkey".between(6, 10) && $"c_nkey".between(1, 5)))
      .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").as("l_year"))
      .agg(round(Money.sumRevenue($"l_extendedprice", $"l_discount"), 4)
        .as("revenue"), count(lit(1)).as("n"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  /** TPC-H Q9 adapted to the harness tables (product-type profit shape):
    * revenue by supplier nation × order year over a part-name slice. The
    * driver's schema has no partsupp, so the ps_supplycost term of true Q9
    * is absent; the plan shape is preserved — two broadcast dims (part,
    * nation), two fact joins (orders, supplier), group on (nation, year).
    * Reference Q9's FROM clause: TPC-H spec 2.18, query 9. */
  def tpchQ9(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Money
    Tables.lineitem(spark, d)
      .join(broadcast(Tables.part(spark, d)
        .filter($"p_name".contains("red")).select($"p_partkey")),
        $"l_partkey" === $"p_partkey")
      .join(Tables.supplier(spark, d)
        .select($"s_suppkey", $"s_nationkey"), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(spark, d)
        .select($"n_nationkey", $"n_name")), $"s_nationkey" === $"n_nationkey")
      .join(Tables.orders(spark, d)
        .select($"o_orderkey", year($"o_orderdate").as("o_year")),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name".as("nation"), $"o_year")
      .agg(round(Money.sumRevenue($"l_extendedprice", $"l_discount"), 4)
        .as("sum_profit"), count(lit(1)).as("n"))
      .orderBy($"nation", $"o_year".desc)
  }

  /** TPC-H Q18 (large-volume customers): orders whose total lineitem
    * quantity exceeds the threshold, joined back to customer, top 100 by
    * (o_totalprice desc, o_orderdate). The HAVING subquery is a semi-join
    * against an aggregate — Catalyst plans the aggregate once and
    * broadcasts the (small) qualifying key set. */
  def tpchQ18(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, d)
    val bigOrders = li.groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("total_qty"))
      .filter($"total_qty" > 150)
    Tables.orders(spark, d)
      .join(bigOrders, $"o_orderkey" === $"l_orderkey")
      .join(Tables.customer(spark, d), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey",
        to_date($"o_orderdate").as("o_orderdate"),
        round($"o_totalprice", 4).as("o_totalprice"),
        round($"total_qty", 4).as("total_qty"))
      .orderBy($"o_totalprice".desc, $"o_orderdate", $"o_orderkey")
      .limit(100)
  }

  /** TPC-H Q10 (returned item reporting): revenue lost to returned items
    * per customer over one quarter of orders, top 20 customers. Fact-fact
    * join (lineitem ⋈ orders) shuffles once on orderkey; customer joins on
    * custkey; nation broadcasts. TakeOrderedAndProject caps the sort at
    * k=20 per partition. */
  def tpchQ10(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Money
    Tables.lineitem(spark, d)
      .filter($"l_returnflag" === "R")
      .join(Tables.orders(spark, d)
        .filter($"o_orderdate" >= lit("1997-01-01") &&
          $"o_orderdate" < lit("1997-07-01"))
        .select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, d)
        .select($"c_custkey", $"c_name", $"c_acctbal", $"c_nationkey"),
        $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, d)
        .select($"n_nationkey", $"n_name")), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"n_name")
      .agg(round(Money.sumRevenue($"l_extendedprice", $"l_discount"), 4)
        .as("revenue"),
        round(max($"c_acctbal"), 4).as("c_acctbal"),
        count(lit(1)).as("n"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  /** TPC-H Q14 (promotion effect), monthly: share of revenue from PROMO
    * parts per ship month of 1997. Conditional aggregation over a
    * broadcast dimension join; the ratio is computed from two exact
    * integer-cents sums so both engines divide identical numerators. */
  def tpchQ14(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Money
    Tables.lineitem(spark, d)
      .filter($"l_shipdate" >= lit("1997-01-01") &&
        $"l_shipdate" < lit("1998-01-01"))
      .join(broadcast(Tables.part(spark, d).select($"p_partkey", $"p_type")),
        $"l_partkey" === $"p_partkey")
      .groupBy(month($"l_shipdate").as("ship_month"))
      .agg(
        round(lit(100.0) *
          Money.sumRevenueIf($"l_extendedprice", $"l_discount",
            $"p_type" === "PROMO") /
          Money.sumRevenue($"l_extendedprice", $"l_discount"), 4)
          .as("promo_pct"),
        count(lit(1)).as("n"))
      .orderBy($"ship_month")
  }

  /** TPC-H Q4 (order priority checking), adapted: count of orders per
    * priority over a window of orderdates where EXISTS a lineitem shipped
    * more than 60 days after the order date (the schema has no
    * commit/receipt dates). The EXISTS is a left-semi join with a
    * non-equi residual condition. */
  def tpchQ4(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, d)
      .filter($"o_orderdate" >= lit("1997-01-01") &&
        $"o_orderdate" < lit("1997-10-01"))
    val li = Tables.lineitem(spark, d).select($"l_orderkey", $"l_shipdate")
    o.join(li, $"o_orderkey" === $"l_orderkey" &&
        $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"), "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  /** TPC-H Q6 (forecasting revenue change): one-row filter+sum —
    * quantity < 24, discount in [0.05, 0.07], one ship year; revenue =
    * Σ price·disc in exact cents·cents / 10^4. The whole query is a scan
    * with every predicate pushed and a single map-side-partial sum. */
  def tpchQ6(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Money
    Tables.lineitem(spark, d)
      .filter($"l_shipdate" >= lit("1997-01-01") &&
        $"l_shipdate" < lit("1998-01-01") &&
        $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
      .agg(round((sum(Money.cents($"l_extendedprice") *
        Money.cents($"l_discount")) / 10000.0), 4).as("revenue"),
        count(lit(1)).as("n"))
  }

  /** TPC-H Q13 (customer distribution): orders-per-customer histogram
    * including zero-order customers — LEFT join with a residual predicate
    * on the JOIN (not WHERE, which would drop the nulls), then two
    * aggregations. */
  def tpchQ13(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val perCust = Tables.customer(spark, d).select($"c_custkey")
      .join(Tables.orders(spark, d)
        .filter($"o_orderpriority" =!= "1-URGENT")
        .select($"o_custkey", $"o_orderkey"),
        $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
    perCust.groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  /** Snapshot delta detection — the change-capture half of an incremental
    * load: classify the NEW snapshot's rows against the OLD as inserted
    * (key absent before) or changed (key present, payload differs), and
    * count the OLD keys that vanished. One full-outer join on the key —
    * the at-scale shape (both snapshots shuffle once; no driver state).
    * Snapshots here are two date-slices of `orders`. */
  def snapshotDelta(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val all = Tables.orders(spark, d)
    // old = everything before mid-1997; new = the 1997 window with urgent
    // orders' status restated — so all four categories are populated:
    // pre-1997 keys vanish (deleted), H2-1997 keys appear (inserted),
    // urgent overlap keys differ (changed), the rest match (unchanged)
    val old = all.filter($"o_orderdate" < lit("1997-07-01"))
      .select($"o_orderkey".as("k"), $"o_orderstatus".as("old_status"))
    val neu = all.filter($"o_orderdate" >= lit("1997-01-01") &&
        $"o_orderdate" < lit("1998-01-01"))
      .select($"o_orderkey".as("k"),
        when($"o_orderpriority" === "1-URGENT", lit("R"))
          .otherwise($"o_orderstatus").as("new_status"))
    old.join(neu, Seq("k"), "full")
      .select(
        when($"old_status".isNull, lit("inserted"))
          .when($"new_status".isNull, lit("deleted"))
          .when($"old_status" =!= $"new_status", lit("changed"))
          .otherwise(lit("unchanged")).as("change"))
      .groupBy($"change")
      .agg(count(lit(1)).as("n"))
      .orderBy($"change")
  }

  /** Two-level aggregation (aggregate OF an aggregate): per-customer order
    * stats re-aggregated per nation — the "metric rollup" shape reporting
    * layers are built from. Two shuffles (custkey, then nation key); the
    * money path stays exact integer cents through BOTH levels so the
    * nation-level averages divide identical integers in both engines. */
  def aggOfAgg(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Money
    val perCust = Tables.orders(spark, d)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(Money.cents($"o_totalprice")).as("spend_cents"))
    Tables.customer(spark, d).select($"c_custkey", $"c_nationkey")
      .join(perCust, $"c_custkey" === $"o_custkey")
      .join(broadcast(Tables.nation(spark, d)
        .select($"n_nationkey", $"n_name")), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("nation"))
      .agg(count(lit(1)).as("n_customers"),
        round(avg($"n_orders"), 4).as("avg_orders_per_cust"),
        round(sum($"spend_cents") / (lit(100.0) * count(lit(1))), 4)
          .as("avg_spend_per_cust"))
      .orderBy($"nation")
  }

  /** Fuzzy string matching: part-name pairs within edit distance 2 over a
    * bounded slice — levenshtein-based near-dup detection, the string
    * sibling of the shingle/embedding near-dup family. The quadratic
    * candidate space is bounded by the key filter; at corpus scale the
    * blocking step (length bands, first-letter buckets, or the q38-style
    * inverted index) replaces the raw cross join. */
  def fuzzyMatch(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val p = Tables.part(spark, d)
      .filter($"p_partkey" <= 200).select($"p_partkey", $"p_name")
    p.as("a").join(p.as("b"),
        $"a.p_partkey" < $"b.p_partkey" &&
        levenshtein($"a.p_name", $"b.p_name") <= 2)
      .select($"a.p_partkey".as("id_a"), $"b.p_partkey".as("id_b"),
        $"a.p_name".as("name_a"), $"b.p_name".as("name_b"),
        levenshtein($"a.p_name", $"b.p_name").as("dist"))
      .orderBy($"id_a", $"id_b")
  }

  /** Latest-row-per-key dedup (the warehouse QUALIFY pattern): each
    * customer's most recent order via row_number over (custkey; orderdate
    * desc, orderkey desc) = 1. One shuffle on the key; at scale this beats
    * a groupBy+join-back because the payload rides the same shuffle. */
  def latestPerKey(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    Tables.orders(spark, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"o_custkey", $"o_orderkey",
        to_date($"o_orderdate").as("o_orderdate"),
        round($"o_totalprice", 4).as("o_totalprice"))
      .orderBy($"o_custkey")
  }

  /** Skew-salted join under the correctness gate: result rows are
    * identical to the plain equi-join (the oracle IS the plain join) —
    * only the shuffle distribution differs, which is the whole point of
    * [[graft.operators.Salt]]. */
  def saltedJoinAgg(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Salt
    val fact = Tables.lineitem(spark, d)
      .select($"l_orderkey".as("okey"), $"l_quantity")
    val dim = Tables.orders(spark, d)
      .select($"o_orderkey".as("okey"), $"o_orderpriority")
    Salt.saltedJoin(fact, dim, "okey", 8)
      .groupBy($"o_orderpriority")
      .agg(round(sum($"l_quantity"), 4).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy($"o_orderpriority")
  }

  /** G1 hash aggregate, TPC-H Q1 shape: map-side partial agg + final agg,
    * one shuffle on the (tiny-cardinality) group keys. */
  def aggGroupBy(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d)
      .filter($"l_shipdate" <= lit("2000-09-02"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 4).as("sum_qty"),
        // money sums in exact integer cents (see graft.functions.Money):
        // a double sum this large rounds differently across engines
        round(graft.functions.Money.sumMoney($"l_extendedprice"), 4).as("sum_base_price"),
        round(graft.functions.Money.sumRevenue($"l_extendedprice", $"l_discount"), 4).as("sum_disc_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        round(sum(graft.functions.Money.cents($"l_discount")) / (lit(100.0) * count(lit(1))), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** A1 broadcast hash join: fact(lineitem) ⋈ broadcast(part).
    * At 100 TB the fact side never shuffles for this join. */
  def joinBroadcast(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d)
      .join(broadcast(Tables.part(spark, d)), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(round(sum($"l_quantity"), 4).as("sum_qty"), count(lit(1)).as("n_items"))
      .orderBy($"p_brand")
  }

  /** A1/A2 multi-way star join (TPC-H Q5 shape): one shuffle join on the
    * fact key (orders⋈lineitem), all dimensions broadcast. */
  def joinMulti(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, d)
      .filter($"o_orderdate" >= lit("1996-01-01") && $"o_orderdate" < lit("1997-01-01"))
    Tables.lineitem(spark, d)
      .join(o, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, d)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(spark, d)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, d)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(round(graft.functions.Money.sumRevenue($"l_extendedprice", $"l_discount"), 4).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"r_name", $"n_name")
  }

  /** O2 top-k: orderBy+limit plans TakeOrderedAndProject — per-partition
    * heaps then a k-row merge on the driver, never a full sort. */
  def topK(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(10)
      .select($"o_orderkey", $"o_custkey",
        round($"o_totalprice", 4).as("o_totalprice"), $"o_orderpriority")
  }

  /** Correlated-subquery shape: parts cheaper than their brand's average
    * retail price. Spark-first form = windowed average (one shuffle on the
    * correlation key), equivalent to DuckDB's correlated subquery. */
  def correlatedSubquery(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"p_brand")
    Tables.part(spark, d)
      .withColumn("brand_cents_sum",
        sum(graft.functions.Money.cents($"p_retailprice")).over(w))
      .withColumn("brand_n", count(lit(1)).over(w))
      .filter($"p_retailprice" < $"brand_cents_sum" / (lit(100.0) * $"brand_n"))
      .select($"p_partkey", $"p_brand", round($"p_retailprice", 4).as("price"),
        round($"brand_cents_sum" / (lit(100.0) * $"brand_n"), 4).as("brand_avg"))
      .orderBy($"p_partkey")
  }

  /** Scalar-subquery shape: orders above the global average price — the
    * single aggregate broadcasts to every row (no per-row subquery). */
  def scalarSubquery(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val globalAvg = Tables.orders(spark, d)
      .agg((sum(graft.functions.Money.cents($"o_totalprice")) /
        (lit(100.0) * count(lit(1)))).as("avg_price"))
    Tables.orders(spark, d)
      .crossJoin(broadcast(globalAvg))
      .filter($"o_totalprice" > $"avg_price")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_above"))
      .orderBy($"o_orderpriority")
  }

  /** DECIMAL-typed aggregation (the warehouse at-rest types of
    * etl.py:120-125 in-query): decimal sums are exact in ANY order, so
    * this needs none of the integer-cents machinery. The FINAL projection
    * casts to a rounded double — the external gate hashes parquet values
    * via pyarrow, where a decimal128 column materializes as
    * `decimal.Decimal` objects that never hash-match the oracle's
    * float64 even when numerically equal. */
  def decimalAgg(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .select($"o_orderstatus", $"o_totalprice".cast("decimal(15,4)").as("p"))
      .groupBy($"o_orderstatus")
      .agg(round(sum($"p").cast("double"), 4).as("sum_price"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderstatus")
  }

  /** A4 anti join: customers with no order since 2001 (NOT EXISTS). */
  def antiJoin(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val recent = Tables.orders(spark, d).filter($"o_orderdate" >= lit("2001-01-01"))
    Tables.customer(spark, d)
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  /** A4 semi join: customers with ≥1 urgent order (EXISTS). */
  def semiJoin(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val urgent = Tables.orders(spark, d).filter($"o_orderpriority" === "1-URGENT")
    Tables.customer(spark, d)
      .join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_nationkey")
  }

  /** A3 left outer join preserving customers with no 2001 orders; the
    * aggregate runs BEFORE the join so the outer side stays 1:1. */
  def outerJoin(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val o2001 = Tables.orders(spark, d)
      .filter($"o_orderdate" >= lit("2001-01-01"))
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n"),
        graft.functions.Money.sumMoney($"o_totalprice").as("spend"))
    Tables.customer(spark, d)
      .join(o2001, $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey",
        coalesce($"n", lit(0L)).as("n_orders"),
        round(coalesce($"spend", lit(0.0)), 4).as("spend"))
      .orderBy($"c_custkey")
  }

  /** TPC-H Q8 (national market share): one supplier nation's share of
    * PROMO-part revenue sold into AMERICA-region customer markets, per
    * order year. Both ratio terms are exact integer-cents sums; the
    * market-region restriction is a broadcast semi-join so no payload
    * columns ride through it. Reference: TPC-H spec 2.18, query 8
    * (p_type / supplier-nation parameters adapted to this schema's
    * vocabulary: NATION_3 has PROMO revenue in the AMERICA slice at
    * every SF, so the conditional numerator actually exercises). */
  def tpchQ8(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Money
    val amNations = Tables.nation(spark, d)
      .join(broadcast(Tables.region(spark, d).filter($"r_name" === "AMERICA")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey")
    val suppNation = Tables.nation(spark, d)
      .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))
    Tables.lineitem(spark, d)
      .join(broadcast(Tables.part(spark, d)
        .filter($"p_type" === "PROMO").select($"p_partkey")),
        $"l_partkey" === $"p_partkey")
      .join(Tables.orders(spark, d)
        .filter($"o_orderdate" >= lit("1996-01-01") &&
          $"o_orderdate" < lit("1998-01-01"))
        .select($"o_orderkey", $"o_custkey", year($"o_orderdate").as("o_year")),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, d).select($"c_custkey", $"c_nationkey"),
        $"o_custkey" === $"c_custkey")
      .join(broadcast(amNations), $"c_nationkey" === $"n_nationkey",
        "left_semi")
      .join(Tables.supplier(spark, d).select($"s_suppkey", $"s_nationkey"),
        $"l_suppkey" === $"s_suppkey")
      .join(broadcast(suppNation), $"s_nationkey" === $"sn_key")
      .groupBy($"o_year")
      .agg(round(lit(100.0) *
        Money.sumRevenueIf($"l_extendedprice", $"l_discount",
          $"supp_nation" === "NATION_3") /
        Money.sumRevenue($"l_extendedprice", $"l_discount"), 4)
        .as("mkt_share"),
        count(lit(1)).as("n"))
      .orderBy($"o_year")
  }

  /** TPC-H Q12 (shipping-priority effect), adapted: the schema has no
    * l_shipmode/commitdate/receiptdate, so "late" = shipped more than 90
    * days after the order date and the group key is l_returnflag; the
    * shape — fact-fact join with a non-equi residual and two
    * complementary conditional counts — is Q12's. */
  def tpchQ12(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val highPri = Seq("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, d)
      .filter($"l_shipdate" >= lit("1997-01-01") &&
        $"l_shipdate" < lit("1998-01-01"))
      .join(Tables.orders(spark, d)
        .select($"o_orderkey", $"o_orderdate", $"o_orderpriority"),
        $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"))
      .groupBy($"l_returnflag")
      .agg(
        sum(when($"o_orderpriority".isin(highPri: _*), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(!$"o_orderpriority".isin(highPri: _*), 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy($"l_returnflag")
  }

  /** TPC-H Q17 (small-quantity-order revenue): lineitems of a brand/size
    * slice whose quantity is below 20% of that part's average quantity;
    * the per-part average is a self-aggregation joined back (Catalyst
    * plans the small aggregate as the build side). p_size stands in for
    * the absent p_container. avg(l_quantity) is exact (integer-valued
    * doubles), revenue is an exact cents sum with the spec's /7.0. */
  def tpchQ17(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Money
    val partKeys = Tables.part(spark, d)
      .filter($"p_brand" === "Brand#4" && $"p_size" <= 15)
      .select($"p_partkey")
    val li = Tables.lineitem(spark, d)
      .join(broadcast(partKeys), $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
    val perPart = li.groupBy($"l_partkey".as("pk"))
      .agg(avg($"l_quantity").as("avg_qty"))
    li.join(perPart, $"l_partkey" === $"pk")
      .filter($"l_quantity" < lit(0.2) * $"avg_qty")
      .agg((sum(Money.cents($"l_extendedprice")).cast("double") / 700.0)
        .as("avg_yearly"),
        count(lit(1)).as("n"))
  }

  /** TPC-H Q19 (discounted revenue, disjunctive predicate): a broadcast
    * join whose residual is an OR of three brand/size/quantity bands —
    * the predicate cannot split across the join, so it exercises
    * join-residual evaluation rather than pushdown. p_size stands in for
    * p_container, and the l_shipmode/shipinstruct legs are dropped
    * (absent columns). */
  def tpchQ19(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Money
    val p = Tables.part(spark, d).select($"p_partkey", $"p_brand", $"p_size")
    Tables.lineitem(spark, d)
      .join(broadcast(p), $"l_partkey" === $"p_partkey" && (
        ($"p_brand" === "Brand#2" && $"p_size".between(1, 5) &&
          $"l_quantity".between(1, 11)) ||
        ($"p_brand" === "Brand#8" && $"p_size".between(1, 10) &&
          $"l_quantity".between(10, 20)) ||
        ($"p_brand" === "Brand#19" && $"p_size".between(1, 15) &&
          $"l_quantity".between(20, 30))))
      .agg(round(Money.sumRevenue($"l_extendedprice", $"l_discount"), 4)
        .as("revenue"),
        count(lit(1)).as("n"))
  }

  /** TPC-H Q21 (suppliers who kept orders waiting): late lines of
    * finished orders where ANOTHER supplier contributed a line (EXISTS,
    * left-semi) but NO other supplier was also late (NOT EXISTS,
    * left-anti) — the classic double-correlated-exists plan as two joins
    * against the same derived base. "Late" = shipped >60 days after the
    * order date (no receipt/commit dates in this schema). */
  def tpchQ21(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val base = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d).filter($"o_orderstatus" === "F")
        .select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_suppkey",
        ($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS")).as("late"))
    val others = base.select($"l_orderkey".as("o2_key"),
      $"l_suppkey".as("s2_key"), $"late".as("late2"))
    base.filter($"late")
      .join(others, $"l_orderkey" === $"o2_key" && $"l_suppkey" =!= $"s2_key",
        "left_semi")
      .join(others.filter($"late2"),
        $"l_orderkey" === $"o2_key" && $"l_suppkey" =!= $"s2_key",
        "left_anti")
      .join(Tables.supplier(spark, d).select($"s_suppkey", $"s_name"),
        $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(100)
  }

  /** TPC-H Q22 (global sales opportunity): customers above the average
    * positive account balance (scalar-subquery threshold, broadcast as a
    * 1-row cross join) with no order since 2001 — the spec's "no orders
    * in 7 years" dormancy window, narrowed so it is non-degenerate on
    * this data (every customer has SOME order) — grouped by market
    * segment (the schema has no c_phone country code). Balance
    * arithmetic is exact integer cents end-to-end. */
  def tpchQ22(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    import graft.functions.Money
    val cust = Tables.customer(spark, d)
      .select($"c_custkey", $"c_mktsegment",
        Money.cents($"c_acctbal").as("bal_cents"))
    val thr = cust.filter($"bal_cents" > 0L)
      .agg((sum($"bal_cents").cast("double") / count(lit(1))).as("thr"))
    cust.join(broadcast(thr))
      .filter($"bal_cents".cast("double") > $"thr")
      .join(Tables.orders(spark, d)
        .filter($"o_orderdate" >= lit("2001-01-01")).select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("numcust"),
        (sum($"bal_cents").cast("double") / 100.0).as("totacctbal"))
      .orderBy($"c_mktsegment")
  }
}
