package graft.parse

import graft.core._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Golden parse of the reference's own sample project (copied verbatim to
  * test resources — FIXTURES.md §A).
  */
class YamlLoaderSpec extends AnyFunSuite {

  private val dir = {
    val url = getClass.getClassLoader.getResource("refproject/meta.yaml")
    assert(url != null, "refproject fixture missing")
    Paths.get(url.toURI).getParent.toString
  }

  private lazy val p = YamlLoader.load(dir)

  test("loads all 8 sources, 8 relations, 1 output") {
    assert(p.sources.size == 8)
    assert(p.relations.size == 8)
    assert(p.outputs.size == 1)
  }

  test("lineitem source parses with all attributes and rules") {
    val li = p.source("tpch_lineitem")
    assert(li.sourceTable == "samples.tpch.lineitem")
    assert(li.targetTable.contains("enriched_lineitem"))
    assert(li.rawAttributes.size == 16)
    assert(li.rawAttributes.find(_.name == "l_quantity").get.dataType == DecimalType(38, 12))
    assert(li.rawAttributes.find(_.name == "l_shipdate").get.dataType == DateType)
    assert(li.rules.map(_.name) == Seq("net_price_int", "net_price_no_returns", "c_name",
      "c_n_name", "gross_margin_per_quantity", "partsupp_pkey", "order_date_year_month"))
    val cnn = li.rules.find(_.name == "c_n_name").get
    assert(cnn.parameters == Seq(ParamSpec("tpch_nation", Seq(
      "[tpch_lineitem]- orderkey -[tpch_orders]",
      "[tpch_orders]- custkey -[tpch_customer]",
      "[tpch_customer]- nationkey -[tpch_nation]"))))
  }

  test("relations parse with cardinalities and endpoints") {
    val r = p.relationByName("[tpch_nation]- nationkey -[tpch_supplier]")
    assert(r.cardinality == Cardinality.OneMany)
    assert(r.sourceName == "tpch_nation" && r.relatedName == "tpch_supplier")
  }

  test("output parses columns, filter, aggregate channel") {
    val o = p.outputs.head
    assert(o.name == "feature_customer")
    assert(o.columns.map(_.name) ==
      Seq("customer", "line_item_receipt_date", "line_item_net_price_100"))
    val ch = o.channels.head
    assert(ch.sourceName == "tpch_lineitem")
    assert(ch.operationType == OperationType.Aggregate)
    assert(ch.filter.exists(_.contains("BETWEEN")))
    val agg = ch.mappings.find(_.targetColumn == "line_item_net_price_100").get
    assert(agg.aggregate.contains("sum") && agg.expression == "net_price_int")
  }

  test("wrong format version rejected") {
    val tmp = Files.createTempDirectory("graftyaml")
    Files.writeString(tmp.resolve("meta.yaml"), "format: \"core9.9\"\n")
    val e = intercept[CompileError](YamlLoader.load(tmp.toString))
    assert(e.message.contains("Unsupported project format"))
  }

  test("missing meta.yaml rejected") {
    val tmp = Files.createTempDirectory("graftyaml2")
    assertThrows[CompileError](YamlLoader.load(tmp.toString))
  }

  test("struct raw attribute via Spark DataType JSON schema") {
    val tmp = Files.createTempDirectory("graftyaml3")
    Files.writeString(tmp.resolve("meta.yaml"), "format: \"core1.0\"\n")
    val d = tmp.resolve("sources"); Files.createDirectory(d)
    Files.writeString(d.resolve("s.yaml"),
      """source_name: s
        |source_table: t
        |raw_attributes:
        |- x long
        |- name: store
        |  schema:
        |    type: struct
        |    fields:
        |    - name: color
        |      type: string
        |      nullable: true
        |      metadata: {}
        |""".stripMargin)
    val proj = YamlLoader.load(tmp.toString)
    val store = proj.source("s").rawAttributes.find(_.name == "store").get
    assert(store.dataType == StructType(Seq(StructField("color", StringType))))
  }

  test("parsed reference project compiles end to end (without partsupp paths it would fail; full project passes)") {
    // The full reference project compiles: partsupp_pkey computed-key join,
    // multi-hop paths, aggregate output — all resolvable.
    val compiled = new graft.analyze.Compiler(p).compile()
    assert(compiled.sources.size == 8)
    val li = compiled.compiledSource("tpch_lineitem")
    val gross = li.rules.find(_.name == "gross_margin_per_quantity").get
    // gross margin resolves partsupp via the computed-key relation
    assert(gross.params.exists(rp =>
      rp.targetSource == "tpch_partsupp" &&
        rp.path.map(_.relation.name) == Seq("[tpch_lineitem]- partsupp_pkey -[tpch_partsupp]")))
  }
}
