package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] exercises one operator row of SURVEY.md §2;
  * [[oracleSql]] carries the DuckDB-equivalent SQL the driver hash-compares
  * against at sf0.01. Column aliases and ORDER BY are kept identical on both
  * sides (see conventions in [[graft.queries.Relational]]).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape — pushed filter, partial+final hash aggregate. */
  def entry(spark: SparkSession): DataFrame =
    Relational.aggGroupBy(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_filter_project" -> (Relational.filterProject _),
    "q02_agg_groupby"    -> (Relational.aggGroupBy _),
    "q03_join_broadcast" -> (Relational.joinBroadcast _),
    "q04_join_multi"     -> (Relational.joinMulti _),
    "q05_topk"           -> (Relational.topK _),
    "q06_anti_join"      -> (Relational.antiJoin _),
    "q07_semi_join"      -> (Relational.semiJoin _),
    "q08_outer_join"     -> (Relational.outerJoin _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |       round(l_extendedprice * (1.0 - l_discount), 4) AS revenue,
        |       CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-04-01' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_agg_groupby" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 4) AS sum_qty,
        |       round(sum(l_extendedprice), 4) AS sum_base_price,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q03_join_broadcast" ->
      """SELECT p_brand, round(sum(l_quantity), 4) AS sum_qty, count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "q04_join_multi" ->
      """SELECT r_name, n_name,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q05_topk" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS o_totalprice,
        |       o_orderpriority
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q06_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q07_semi_join" ->
      """SELECT c_nationkey, count(*) AS n_customers
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "q08_outer_join" ->
      """SELECT c_custkey,
        |       coalesce(n, 0) AS n_orders,
        |       round(coalesce(spend, 0.0), 4) AS spend
        |FROM customer
        |LEFT JOIN (SELECT o_custkey, count(*) AS n, sum(o_totalprice) AS spend
        |           FROM orders
        |           WHERE o_orderdate >= TIMESTAMP '2001-01-01'
        |           GROUP BY o_custkey) o ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
  )
}
