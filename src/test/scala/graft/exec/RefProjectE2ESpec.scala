package graft.exec

import graft.analyze.Compiler
import graft.core._
import graft.parse.YamlLoader
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Paths

/** Executes the reference's OWN sample project, verbatim from its YAML,
  * end-to-end on the driver fixtures — the "a user of the reference could
  * switch" demonstration. The fixture schemas differ from Databricks
  * `samples.tpch.*` (FIXTURES.md §C), so the reader adapts: missing narrow
  * columns are synthesized deterministically, and `partsupp` (absent from
  * the fixtures) is derived from the distinct (partkey, suppkey) pairs of
  * lineitem so the computed-key join has full coverage.
  *
  * ANSI mode is off for this spec: the reference's rules were type-probed
  * on pyspark 3.5 (pre-ANSI default), e.g. `[This].l_returnflag IS TRUE`
  * relies on lax string→boolean coercion.
  */
class RefProjectE2ESpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-refproject-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def t(name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** samples.tpch.<x> → fixture table adapted to the declared schema. */
  private lazy val adapted: Map[String, DataFrame] = {
    def const(cols: (String, String)*)(df: DataFrame): DataFrame =
      cols.foldLeft(df) { case (d, (n, sql)) => d.withColumn(n, expr(sql)) }
    val lineitem = const(
      "l_comment" -> "''", "l_shipinstruct" -> "'NONE'", "l_shipmode" -> "'MAIL'",
      "l_commitdate" -> "date_add(CAST(l_shipdate AS DATE), 1)",
      "l_receiptdate" -> "date_add(CAST(l_shipdate AS DATE), 2)")(t("lineitem"))
    val partsupp = t("lineitem")
      .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .distinct()
      .withColumn("ps_availqty", expr("CAST(ps_partkey % 1000 AS INT)"))
      .withColumn("ps_supplycost", expr("CAST(ps_partkey % 500 + 1 AS DECIMAL(12,2))"))
      .withColumn("ps_comment", lit(""))
    Map(
      "samples.tpch.customer" -> const(
        "c_address" -> "''", "c_comment" -> "''", "c_phone" -> "''")(t("customer")),
      "samples.tpch.lineitem" -> lineitem,
      "samples.tpch.orders" -> const(
        "o_clerk" -> "''", "o_comment" -> "''", "o_shippriority" -> "0")(t("orders")),
      "samples.tpch.nation" -> const("n_comment" -> "''")(t("nation")),
      "samples.tpch.part" -> const(
        "p_comment" -> "''", "p_container" -> "''", "p_mfgr" -> "''")(t("part")),
      "samples.tpch.partsupp" -> partsupp,
      "samples.tpch.region" -> const("r_comment" -> "''")(t("region")),
      "samples.tpch.supplier" -> const(
        "s_address" -> "''", "s_comment" -> "''", "s_phone" -> "''")(t("supplier")))
  }

  private lazy val runner: Runner = {
    val url = getClass.getClassLoader.getResource("refproject/meta.yaml")
    val dir = Paths.get(url.toURI).getParent.toString
    val cp = new Compiler(YamlLoader.load(dir)).compile()
    new Runner(cp, s => adapted(s.sourceTable))
  }

  test("reference sample project passes the strict C12 type probe") {
    // the reference's own YAML, probed exactly the way its import does
    // (2-row datatypes view, first_value wraps, boolean gates)
    val url = getClass.getClassLoader.getResource("refproject/meta.yaml")
    val dir = Paths.get(url.toURI).getParent.toString
    val (_, warnings) = new Compiler(YamlLoader.load(dir)).compileChecked(spark)
    assert(warnings.isEmpty, s"unexpected probe warnings: $warnings")
  }

  test("every reference source hub builds with left-join row preservation") {
    val li = runner.hub("tpch_lineitem")
    assert(li.count() == t("lineitem").count()) // lookups never drop rows
    assert(runner.hub("tpch_customer").count() == t("customer").count())
    assert(runner.hub("tpch_partsupp").count() > 0)
  }

  test("computed-key join (partsupp_pkey) matches every lineitem row") {
    val li = runner.hub("tpch_lineitem")
    // partsupp synthesized from lineitem pairs ⇒ full match coverage
    assert(li.filter(col("gross_margin_per_quantity").isNull).count() == 0)
    // spot-check the rule arithmetic against a direct computation
    val r = li.select("l_partkey", "l_quantity", "net_price_int", "gross_margin_per_quantity")
      .filter(col("l_quantity") > 0).limit(100).collect()
    r.foreach { row =>
      val expected = (BigDecimal(row.getAs[java.math.BigDecimal]("net_price_int")) -
        BigDecimal(row.getAs[Long]("l_partkey") % 500 + 1)) /
        BigDecimal(row.getAs[java.math.BigDecimal]("l_quantity"))
      val got = BigDecimal(row.getAs[java.math.BigDecimal]("gross_margin_per_quantity"))
      assert((expected - got).abs < BigDecimal("0.000001"), s"row $row")
    }
  }

  test("reference output feature_customer matches a SQL oracle") {
    adapted("samples.tpch.lineitem").createOrReplaceTempView("ref_lineitem")
    adapted("samples.tpch.orders").createOrReplaceTempView("ref_orders")
    adapted("samples.tpch.customer").createOrReplaceTempView("ref_customer")
    val out = runner.output("feature_customer")
    val oracle = spark.sql(
      """SELECT c.c_name AS customer,
           CAST(l.l_receiptdate AS DATE) AS line_item_receipt_date,
           CAST(sum((CAST(l.l_extendedprice AS DECIMAL(38,12))
                     - CAST(l.l_tax AS DECIMAL(38,12))
                     - CAST(l.l_discount AS DECIMAL(38,12))) * 100)
                AS INT) AS line_item_net_price_100
         FROM ref_lineitem l
         LEFT JOIN ref_orders o ON l.l_orderkey = o.o_orderkey
         LEFT JOIN ref_customer c ON o.o_custkey = c.c_custkey
         WHERE l.l_receiptdate BETWEEN '1993-01-01' AND '1998-12-31'
         GROUP BY 1, 2""")
    assert(out.count() == oracle.count())
    assert(out.exceptAll(oracle).count() == 0 && oracle.exceptAll(out).count() == 0)
  }

  test("non-boolean output filter rejected with a clear error") {
    val p = Project(
      sources = Seq(SourceDef("s", "s", Seq(RawAttr.parse("x int")))),
      outputs = Seq(OutputDef("o", Seq(OutputCol.parse("x int")),
        Seq(Channel("s", Seq(Mapping.parse("x x")), filter = Some("[This].x + 1"))))))
    import spark.implicits._
    val r = new Runner(new Compiler(p).compile(), _ => Seq(1).toDF("x"))
    val e = intercept[CompileError](r.output("o"))
    assert(e.message.contains("must be a boolean expression"))
  }
}
