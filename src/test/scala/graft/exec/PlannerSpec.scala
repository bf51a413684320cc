package graft.exec

import graft.SampleProject
import graft.analyze.Compiler
import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** End-to-end: compile the sample project, build hubs/outputs from the
  * sf0.001 fixtures, and compare against hand-written Spark SQL oracles.
  */
class PlannerSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val runner: Runner = {
    val cp = new Compiler(SampleProject.project).compile()
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }
    new Runner(cp, Runners.parquetDir(sfDir))
  }

  override def afterAll(): Unit = spark.stop()

  private def assertSame(actual: DataFrame, oracleSql: String): Unit = {
    val expected = spark.sql(oracleSql)
    assert(actual.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      expected.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"schema mismatch:\n actual ${actual.schema.treeString}\n expected ${expected.schema.treeString}")
    val a = actual.count()
    val e = expected.count()
    assert(a == e, s"row count mismatch: $a vs $e")
    val diff1 = actual.exceptAll(expected).count()
    val diff2 = expected.exceptAll(actual).count()
    assert(diff1 == 0 && diff2 == 0, s"content mismatch: $diff1 extra, $diff2 missing")
  }

  test("lineitem hub: derived columns + multi-hop lookups") {
    runner.hub("tpch_lineitem").createOrReplaceTempView("hub_lineitem")
    assertSame(
      spark.table("hub_lineitem").select(
        "l_orderkey", "l_linenumber", "net_price", "net_price_no_returns",
        "c_name", "c_n_name", "r_name", "part_type", "supp_name",
        "order_line_key", "order_ym"),
      """
      SELECT l.l_orderkey, l.l_linenumber,
             (l.l_extendedprice - l.l_tax - l.l_discount) * 100 AS net_price,
             CASE WHEN l.l_returnflag = 'R' THEN 0.0
                  ELSE (l.l_extendedprice - l.l_tax - l.l_discount) * 100 END AS net_price_no_returns,
             c.c_name AS c_name,
             n2.n_name AS c_n_name,
             r.r_name AS r_name,
             p.p_type AS part_type,
             s.s_name AS supp_name,
             CONCAT(l.l_orderkey, '|', l.l_linenumber) AS order_line_key,
             date_format(o.o_orderdate, 'yyyyMM') AS order_ym
      FROM lineitem l
      LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      LEFT JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
      LEFT JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      LEFT JOIN region r ON ns.n_regionkey = r.r_regionkey
      LEFT JOIN part p ON l.l_partkey = p.p_partkey
      """)
  }

  test("customer hub: M-aggregates over reverse path") {
    runner.hub("tpch_customer").createOrReplaceTempView("hub_customer")
    assertSame(
      spark.table("hub_customer").select(
        "c_custkey", "order_cnt", "total_spent_cents", "avg_order_value", "nation_name"),
      """
      SELECT c.c_custkey,
             coalesce(a.cnt, 0) AS order_cnt,
             a.total AS total_spent_cents,
             CAST(a.total AS DOUBLE) / 100.0 / CAST(coalesce(a.cnt, 0) AS DOUBLE) AS avg_order_value,
             n.n_name AS nation_name
      FROM customer c
      LEFT JOIN (SELECT o_custkey, count(o_orderkey) cnt,
                        sum(CAST(round(o_totalprice * 100) AS LONG)) total
                 FROM orders GROUP BY o_custkey) a ON c.c_custkey = a.o_custkey
      LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      """)
  }

  test("nation hub: forward 1-M aggregate") {
    runner.hub("tpch_nation").createOrReplaceTempView("hub_nation")
    assertSame(
      spark.table("hub_nation").select("n_nationkey", "supplier_cnt", "supplier_acctbal_cents"),
      """
      SELECT n.n_nationkey,
             coalesce(a.cnt, 0) AS supplier_cnt,
             a.bal AS supplier_acctbal_cents
      FROM nation n
      LEFT JOIN (SELECT s_nationkey, count(s_suppkey) cnt,
                        sum(CAST(round(s_acctbal * 100) AS LONG)) bal
                 FROM supplier GROUP BY s_nationkey) a ON n.n_nationkey = a.s_nationkey
      """)
  }

  test("orders hub: window rule") {
    runner.hub("tpch_orders").createOrReplaceTempView("hub_orders")
    assertSame(
      spark.table("hub_orders").select("o_orderkey", "o_year", "price_rank_in_cust"),
      """
      SELECT o_orderkey, year(o_orderdate) AS o_year,
             rank() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS price_rank_in_cust
      FROM orders
      """)
  }

  test("feature_customer output: filter + aggregate channel") {
    assertSame(
      runner.output("feature_customer"),
      """
      SELECT c.c_name AS customer,
             date_format(o.o_orderdate, 'yyyyMM') AS ship_ym,
             sum(CAST(round((l.l_extendedprice - l.l_tax - l.l_discount) * 100) AS LONG))
                  AS net_price_100
      FROM lineitem l
      LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE l.l_shipdate BETWEEN '1993-01-01' AND '1998-12-31'
      GROUP BY c.c_name, date_format(o.o_orderdate, 'yyyyMM')
      """)
  }

  test("party_summary output: two-channel union with null fill") {
    assertSame(
      runner.output("party_summary"),
      """
      SELECT c_name AS party_name, c_mktsegment AS party_type,
             c_acctbal AS acctbal, c_nationkey AS nation_key
      FROM customer
      UNION ALL
      SELECT s_name, CAST(null AS STRING), s_acctbal, s_nationkey
      FROM supplier
      """)
  }

  test("flagship entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
