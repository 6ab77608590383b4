package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Set operations (SURVEY.md §2.8 U1/U2) and the aggregate complement
  * (§2.5 G2–G4, G6).
  *
  * Scale notes: UNION is plan concatenation (no shuffle until the consumer);
  * INTERSECT/EXCEPT compile to aggregate+join shuffles on the full row — keep
  * them on pre-projected key columns, as here. ROLLUP/CUBE expand rows by the
  * number of grouping sets BEFORE the shuffle; grouping keys here are
  * low-cardinality so the expansion is safe at any scale.
  */
object SetsAndAggs {

  /** U1 union-distinct: AUTOMOBILE-segment customers ∪ customers holding an
    * urgent order. Mirrors the reference's per-symbol concat (etl.py:107)
    * plus key dedup. */
  def unionDistinct(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val auto = Tables.customer(spark, d)
      .filter($"c_mktsegment" === "AUTOMOBILE").select($"c_custkey")
    val urgent = Tables.orders(spark, d)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey".as("c_custkey"))
    auto.union(urgent).distinct().orderBy($"c_custkey")
  }

  /** U2 intersect: customers both in BUILDING segment and with an open order. */
  def intersectKeys(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val building = Tables.customer(spark, d)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val open = Tables.orders(spark, d)
      .filter($"o_orderstatus" === "O").select($"o_custkey".as("c_custkey"))
    building.intersect(open).orderBy($"c_custkey")
  }

  /** U2 except: MACHINERY customers minus those with any F(inished) order. */
  def exceptKeys(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val machinery = Tables.customer(spark, d)
      .filter($"c_mktsegment" === "MACHINERY").select($"c_custkey")
    val finished = Tables.orders(spark, d)
      .filter($"o_orderstatus" === "F").select($"o_custkey".as("c_custkey"))
    machinery.except(finished).orderBy($"c_custkey")
  }

  /** G4 rollup over (returnflag, linestatus); NULL subtotal markers are
    * coalesced to 'ALL' so both engines emit identical, NULL-free keys. */
  def rollupAgg(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(round(sum($"l_quantity"), 4).as("sum_qty"), count(lit(1)).as("n"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"sum_qty", $"n")
      .orderBy($"returnflag", $"linestatus")
  }

  /** G4 cube over (orderstatus, orderpriority). */
  def cubeAgg(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(round(graft.functions.Money.sumMoney($"o_totalprice"), 4).as("sum_price"),
        count(lit(1)).as("n"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"sum_price", $"n")
      .orderBy($"status", $"priority")
  }

  /** G2 count-distinct per group (expands to a two-phase agg; Spark plans
    * partial distinct on the mapper side). */
  def countDistinctParts(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  /** G3 approx distinct (HLL++), made oracle-checkable via an in-query
    * exactness bound: the HLL estimate (rsd 0.01) is compared to the exact
    * distinct count computed alongside, and only the exact count plus the
    * `hll_ok` boolean (|approx − exact| ≤ 5% · exact) reach the output —
    * the engine-specific sketch value itself never does, so DuckDB can
    * reproduce every output column. The exact count here is the bound's
    * reference, not the operator's point: at 100 TB one would bound-check
    * the sketch on a sampled slice, not the full corpus. */
  def approxDistinct(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, d)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("exact_parts"),
        approx_count_distinct($"l_partkey", 0.01).as("approx"))
      .select($"l_returnflag", $"exact_parts",
        (abs($"approx" - $"exact_parts") <= $"exact_parts" * 0.05)
          .cast("int").as("hll_ok"))
      .orderBy($"l_returnflag")
  }

  /** G2-ext multiple DISTINCT aggregates in one GROUP BY — Catalyst plans
    * this with an Expand node (one input-row replica per distinct group),
    * a genuinely different physical shape from single-distinct rewrites;
    * at scale the Expand multiplies shuffle volume by the number of
    * distinct columns, which is the known cost of the one-pass form (the
    * alternative is N separate aggregations + a join). */
  def multiDistinct(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .groupBy($"o_orderpriority")
      .agg(
        countDistinct($"o_custkey").as("n_custs"),
        countDistinct(year($"o_orderdate")).as("n_years"),
        count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  /** O-ext top-k per group WITHOUT a window: collect each user's events as
    * structs, sort row-locally, slice k — the small-group alternative to
    * row_number() that avoids the per-partition sort of a window (the
    * whole group rides one aggregation buffer; only valid when groups are
    * bounded, which user-event groups here are). */
  def topKPerGroupNoWindow(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, d)
      .filter($"event_type" === "purchase")
      .groupBy($"user_id")
      .agg(slice(reverse(array_sort(collect_list(
        struct($"value".cast("double").as("v"), $"event_id".as("e"))))), 1, 3)
        .as("top"))
      .select($"user_id",
        concat_ws(",", transform($"top", t => t.getField("e"))).as("top_event_ids"),
        round(aggregate($"top", lit(0.0), (acc, t) => acc + t.getField("v")), 4)
          .as("top_value_sum"))
      .orderBy($"user_id")
  }

  /** G6 exact percentiles via percentile (sort-based exact, matches DuckDB
    * quantile_cont) — median is the 0.5 case. */
  def percentiles(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .groupBy($"o_orderpriority")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderpriority")
  }

  /** G3-ext approx percentiles (Greenwald-Khanna sketch,
    * `approx_percentile`) with the same in-query exactness-bound shape as
    * [[approxDistinct]]: only the exact rank bracket reaches the output.
    * `approx_percentile(x, p, acc)` guarantees rank error ≤ n/acc; with
    * acc = 10000 the sketch value's RANK must sit within n/10000 of p·n —
    * the query counts values ≤ the estimate and asserts the bracket as a
    * boolean. At 100 TB the sketch is the only affordable path (exact
    * percentile materializes the group); the exact count here is the
    * bound's reference at gate scale. */
  def approxPercentiles(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val est = Tables.orders(spark, d)
      .groupBy($"o_orderpriority")
      .agg(expr("approx_percentile(o_totalprice, 0.5, 10000)").as("est"),
        count(lit(1)).as("n"))
    val ranked = Tables.orders(spark, d)
      .join(est.select($"o_orderpriority", $"est"), "o_orderpriority")
      .groupBy($"o_orderpriority")
      .agg(sum(when($"o_totalprice" <= $"est", 1L).otherwise(0L))
        .as("rank_at_est"))
    est.join(ranked, "o_orderpriority")
      .select($"o_orderpriority", $"n",
        (abs($"rank_at_est" - $"n" * 0.5) <= $"n" / 10000.0 + 1.0)
          .cast("int").as("rank_ok"))
      .orderBy($"o_orderpriority")
  }

  /** U2-ALL multiset set operations: EXCEPT ALL / INTERSECT ALL keep
    * MULTIPLICITY (n_except = max(0, a−b) copies, n_intersect = min(a,b)),
    * unlike the set-semantics q14/q15. Output is the per-key multiplicity
    * after the operation, which pins exactly the multiset behavior. */
  def multisetOps(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val a = Tables.orders(spark, d)
      .filter(year($"o_orderdate") === 1997).select($"o_custkey")
    val b = Tables.orders(spark, d)
      .filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    val exc = a.exceptAll(b).groupBy($"o_custkey")
      .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
    val int = a.intersectAll(b).groupBy($"o_custkey")
      .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
    exc.unionByName(int)
      .select($"op", $"o_custkey", $"n")
      .orderBy($"op", $"o_custkey")
  }

  /** G-ext ordered string aggregation (LISTAGG/string_agg): comma-join the
    * region names per nation group — deterministic because the collect is
    * array_sort'ed before joining (plain collect_list order is
    * partition-arrival order, never rely on it). */
  def stringAgg(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, d)
      .groupBy($"c_mktsegment")
      .agg(
        array_join(array_sort(collect_set($"c_nationkey".cast("string"))), ",")
          .as("nations_csv"),
        count(lit(1)).as("n"))
      .orderBy($"c_mktsegment")
  }

  /** G-ext statistical aggregates: stddev/variance/corr/covar. These are
    * true floating aggregates (no exact integer form), so the inputs are
    * normalized to ~1 magnitude FIRST — variance of a 1e5-scale column is
    * 1e10, where a 4dp round needs more exact digits than the one-pass
    * co-moment algorithms of two engines agree on; at ~1 magnitude the
    * cross-engine drift (~1e-13) is far from any round boundary. corr is
    * scale-invariant and needs no normalization. */
  def statsAgg(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val x = ($"o_totalprice" / 100000.0).as("x")
    val y = ($"o_custkey".cast("double") / 1000.0).as("y")
    Tables.orders(spark, d)
      .select($"o_orderpriority", x, y)
      .groupBy($"o_orderpriority")
      .agg(
        round(stddev_samp($"x"), 4).as("sd"),
        round(var_samp($"x"), 4).as("variance"),
        round(corr($"x", $"y"), 4).as("cor"),
        round(covar_samp($"x", $"y"), 4).as("cov"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderpriority")
  }

  /** G-ext equi-width histogram: bucket order totals into fixed 50k bins
    * (floor arithmetic — portable across engines, unlike width_bucket) and
    * report per-bin count + bounds. The quality-score / length
    * distribution profile every corpus audit starts with. */
  def binnedHistogram(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, d)
      .select(floor($"o_totalprice" / 50000.0).cast("int").as("bin"),
        $"o_totalprice")
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"),
        round(min($"o_totalprice"), 4).as("lo"),
        round(max($"o_totalprice"), 4).as("hi"))
      .orderBy($"bin")
  }

  /** G-ext per-group z-score outlier detection over event values: group
    * stats (mean, sample stddev) computed once, broadcast back onto the
    * fact rows, rows with |z| > 2.5 reported — the anomaly screen every
    * metrics pipeline runs. Scale shape: the stats table has one row per
    * group (always broadcastable); the fact side never shuffles — compare
    * a window formulation, which would sort the whole fact table. The
    * |z| > 2.5 cut is on the RAW double (drift ~1e-13 from engine-order
    * summation is 12 orders below the boundary); rounding happens only in
    * the output projection, `+ 0.0` canonicalizing IEEE -0.0 on both
    * engines (see q65). */
  def outlierZscore(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, d)
    val stats = ev.groupBy($"event_type")
      .agg(avg($"value").as("mu"), stddev_samp($"value").as("sd"))
    ev.join(broadcast(stats), "event_type")
      .withColumn("z", ($"value" - $"mu") / $"sd")
      .filter(abs($"z") > 2.5)
      .select($"event_id", $"event_type",
        (round($"value", 4) + lit(0.0)).as("value"),
        (round($"z", 4) + lit(0.0)).as("z"))
      .orderBy($"event_id")
  }
}
