package graft

import graft.analyze.Compiler
import graft.exec.{Runner, Runners}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises operators from SURVEY.md §2 through the
  * full engine pipeline (compile → plan → execute); `oracleSql` is the
  * DuckDB-equivalent over the same parquet tables. Column names are aliased
  * identically on both sides (the driver sorts columns by name before
  * hashing). Aggregations over double columns are cast to DECIMAL(38,12)
  * per-element before summing on BOTH sides so results are exact and
  * engine-order-independent.
  */
object SparkEntry {

  private lazy val compiled = new Compiler(SampleProject.project).compile()

  private def runner(sfDir: String): Runner =
    new Runner(compiled, Runners.parquetDir(sfDir))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val _ = spark // session is implicit for DataFrame building
    runner("/root/testdata/sf0.001").output("feature_customer")
  }

  /** One entry per implemented operator group from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1/P1/P2/P3/P6 + J1/J2/J5/J7 (implicit + explicit paths, reverse hop)
    "q_lineitem_enriched" -> ((_, dir) =>
      runner(dir).hub("tpch_lineitem").select(
        "l_orderkey", "l_linenumber", "net_price", "net_price_no_returns",
        "c_name", "c_n_name", "r_name", "part_type", "supp_name",
        "order_line_key", "order_ym")),
    // J4/A1: M-aggregates over reverse path + scalar lookup
    "q_customer_aggs" -> ((_, dir) =>
      runner(dir).hub("tpch_customer").select(
        "c_custkey", "order_cnt", "total_spent_cents", "nation_name")),
    // J4/A1: forward 1-M aggregate
    "q_nation_suppliers" -> ((_, dir) =>
      runner(dir).hub("tpch_nation").select(
        "n_nationkey", "n_name", "supplier_cnt", "supplier_acctbal_cents")),
    // W1: window rule pass-through
    "q_orders_window" -> ((_, dir) =>
      runner(dir).hub("tpch_orders").select(
        "o_orderkey", "o_year", "price_rank_in_cust")),
    // P4/A2/S4: filtered aggregate output channel
    "q_feature_customer" -> ((_, dir) => runner(dir).output("feature_customer")),
    // O1/P7: multi-channel UNION ALL with typed null fill
    "q_party_summary" -> ((_, dir) => runner(dir).output("party_summary")),
    // A2/A3: DISTINCT + plain aggregates, min/max
    "q_order_stats" -> ((_, dir) => runner(dir).output("order_stats")))

  /** DuckDB equivalents over the same parquet tables. */
  def oracleSql: Map[String, String] = Map(
    "q_lineitem_enriched" ->
      """SELECT l.l_orderkey, l.l_linenumber,
          (l.l_extendedprice - l.l_tax - l.l_discount) * 100 AS net_price,
          CASE WHEN l.l_returnflag = 'R' THEN 0.0
               ELSE (l.l_extendedprice - l.l_tax - l.l_discount) * 100 END AS net_price_no_returns,
          c.c_name AS c_name,
          n2.n_name AS c_n_name,
          r.r_name AS r_name,
          p.p_type AS part_type,
          s.s_name AS supp_name,
          CONCAT(l.l_orderkey, '|', l.l_linenumber) AS order_line_key,
          strftime(o.o_orderdate, '%Y%m') AS order_ym
        FROM lineitem l
        LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        LEFT JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
        LEFT JOIN nation ns ON ns.n_nationkey = s.s_nationkey
        LEFT JOIN region r ON ns.n_regionkey = r.r_regionkey
        LEFT JOIN part p ON l.l_partkey = p.p_partkey""",
    "q_customer_aggs" ->
      """SELECT c.c_custkey,
          coalesce(a.cnt, 0) AS order_cnt,
          a.total AS total_spent_cents,
          n.n_name AS nation_name
        FROM customer c
        LEFT JOIN (SELECT o_custkey, count(o_orderkey) cnt,
                          CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) total
                   FROM orders GROUP BY o_custkey) a ON c.c_custkey = a.o_custkey
        LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey""",
    "q_nation_suppliers" ->
      """SELECT n.n_nationkey, n.n_name,
          coalesce(a.cnt, 0) AS supplier_cnt,
          a.bal AS supplier_acctbal_cents
        FROM nation n
        LEFT JOIN (SELECT s_nationkey, count(s_suppkey) cnt,
                          CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) bal
                   FROM supplier GROUP BY s_nationkey) a ON n.n_nationkey = a.s_nationkey""",
    "q_orders_window" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year,
          CAST(rank() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS price_rank_in_cust
        FROM orders""",
    "q_feature_customer" ->
      """SELECT c.c_name AS customer,
          strftime(o.o_orderdate, '%Y%m') AS ship_ym,
          CAST(sum(CAST(round((l.l_extendedprice - l.l_tax - l.l_discount) * 100) AS BIGINT))
               AS BIGINT) AS net_price_100
        FROM lineitem l
        LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE l.l_shipdate BETWEEN '1993-01-01' AND '1998-12-31'
        GROUP BY c.c_name, strftime(o.o_orderdate, '%Y%m')""",
    "q_party_summary" ->
      """SELECT c_name AS party_name, c_mktsegment AS party_type,
          c_acctbal AS acctbal, c_nationkey AS nation_key
        FROM customer
        UNION ALL
        SELECT s_name, CAST(null AS VARCHAR), s_acctbal, s_nationkey
        FROM supplier""",
    "q_order_stats" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
          count(DISTINCT o_custkey) AS n_customers,
          count(o_orderkey) AS n_orders,
          max(o_totalprice) AS max_price,
          min(o_totalprice) AS min_price
        FROM orders
        GROUP BY 1""")
}
