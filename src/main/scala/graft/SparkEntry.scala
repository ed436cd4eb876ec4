package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator the engine implements is registered here as a named
  * query over the driver's testdata, paired (where SQL-expressible)
  * with an equivalent DuckDB oracle statement in [[oracleSql]]. Column
  * names are aliased identically on both sides — the driver's compare
  * sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.aggPricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_pricing"      -> ((s, d) => Relational.aggPricing(s, d)),
    "q02_filter_project"   -> ((s, d) => Relational.filterProject(s, d)),
    "q03_agg_revenue"      -> ((s, d) => Relational.aggRevenue(s, d)),
    "q04_join_topk"        -> ((s, d) => Relational.joinTopRevenue(s, d)),
    "q05_join_multiway"    -> ((s, d) => Relational.joinMultiway(s, d)),
    "q06_window_rank"      -> ((s, d) => Relational.windowTopOrders(s, d)),
    "q07_window_running"   -> ((s, d) => Relational.windowRunning(s, d)),
    "q08_semi_join"        -> ((s, d) => Relational.semiJoin(s, d)),
    "q09_anti_join"        -> ((s, d) => Relational.antiJoin(s, d)),
    "q10_distinct"         -> ((s, d) => Relational.distinctFlags(s, d)),
    "q11_setops"           -> ((s, d) => Relational.setOps(s, d)),
    "q12_rollup"           -> ((s, d) => Relational.rollupAgg(s, d)),
    "q13_conditional_merge"-> ((s, d) => Relational.conditionalMerge(s, d)),
    "q14_scalar_funcs"     -> ((s, d) => Relational.scalarFuncs(s, d)),
    "q15_date_funcs"       -> ((s, d) => Relational.dateFuncs(s, d)),
    "q16_events_hourly"    -> ((s, d) => Relational.eventsHourly(s, d)),
    "q17_json_extract"     -> ((s, d) => Relational.jsonExtract(s, d)),
    "q18_feature_json"     -> ((s, d) => Relational.featureJson(s, d)),
    "q19_collect_sorted"   -> ((s, d) => Relational.collectSorted(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        | round(avg(l_quantity), 2) AS avg_qty,
        | round(avg(l_extendedprice), 2) AS avg_price,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_partkey, l_extendedprice * l_discount AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q03_agg_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS total_revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q04_join_topk" ->
      """SELECT l_orderkey,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-03-15'
        |  AND l_shipdate > TIMESTAMP '1997-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q05_join_multiway" ->
      """SELECT n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin,
    "q06_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |                     ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        | FROM orders) t
        |WHERE rnk <= 3""".stripMargin,
    "q07_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
        | round(sum(l_extendedprice) OVER (
        |   PARTITION BY l_suppkey
        |   ORDER BY l_shipdate, l_orderkey, l_linenumber
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev
        |FROM lineitem WHERE l_suppkey < 10""".stripMargin,
    "q08_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin,
    "q09_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q10_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q11_setops" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000
        |UNION
        |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
        |EXCEPT
        |SELECT s_suppkey AS custkey FROM supplier""".stripMargin,
    "q12_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "q13_conditional_merge" ->
      """SELECT user_id,
        | round(max(CASE WHEN event_type = 'click' THEN value END), 4) AS click_max,
        | round(max(CASE WHEN event_type = 'view' THEN value END), 4) AS view_max,
        | round(max(CASE WHEN event_type = 'purchase' THEN value END), 4) AS purchase_max,
        | count(*) AS n_events
        |FROM events GROUP BY user_id""".stripMargin,
    "q14_scalar_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u, length(p_name) AS name_len,
        | substr(p_type, 1, 4) AS type4,
        | round(p_retailprice * 1.1, 2) AS bumped,
        | abs(p_size - 25) AS size_dist,
        | concat_ws('#', p_brand, p_type) AS brand_type
        |FROM part""".stripMargin,
    "q15_date_funcs" ->
      """SELECT o_orderkey,
        | year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        | dayofmonth(o_orderdate) AS dom,
        | date_trunc('quarter', o_orderdate) AS qtr_start
        |FROM orders""".stripMargin,
    "q16_events_hourly" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, event_type,
        | count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q17_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50""".stripMargin,
    "q18_feature_json" ->
      """SELECT s_suppkey,
        | to_json(struct_pack(type := 'Feature',
        |   properties := struct_pack(name := s_name, nation := n_name))) AS feature
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey""".stripMargin,
    "q19_collect_sorted" ->
      """SELECT n_name,
        | string_agg(s_name, '|' ORDER BY s_name) AS suppliers,
        | count(*) AS n_supp
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
  )
}
