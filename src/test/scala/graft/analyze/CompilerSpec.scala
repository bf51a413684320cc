package graft.analyze

import graft.core._
import graft.SampleProject
import org.scalatest.funsuite.AnyFunSuite

class CompilerSpec extends AnyFunSuite {

  private lazy val cp = new Compiler(SampleProject.project).compile()

  test("sample project compiles") {
    assert(cp.sources.size == 7)
    assert(cp.outputs.size == 3)
  }

  test("sources are topologically ordered") {
    val order = cp.sources.map(_.source.name)
    def before(a: String, b: String) = order.indexOf(a) < order.indexOf(b)
    assert(before("tpch_region", "tpch_lineitem"))
    assert(before("tpch_orders", "tpch_customer")) // customer aggregates over orders
    assert(before("tpch_customer", "tpch_lineitem"))
    assert(before("tpch_supplier", "tpch_nation")) // nation aggregates over supplier
  }

  test("rule-on-rule ordering within a source") {
    val li = cp.compiledSource("tpch_lineitem")
    val order = li.rules.map(_.name)
    assert(order.indexOf("net_price") < order.indexOf("net_price_no_returns"))
  }

  test("aggregate spans get their relation paths") {
    val cust = cp.compiledSource("tpch_customer")
    val avg = cust.rules.find(_.name == "avg_order_value").get
    assert(avg.aggPaths.size == 2)
    assert(avg.aggPaths.forall(_.head.relation.name == "[tpch_orders]- custkey -[tpch_customer]"))
  }

  test("rule cycle detection") {
    val src = SourceDef("s", "t", Seq(RawAttr.parse("x int")),
      rules = Seq(
        RuleDef("a", "[This].b + 1"),
        RuleDef("b", "[This].a + 1")))
    val e = intercept[CompileError](new Compiler(Project(Seq(src))).compile())
    assert(e.message.contains("Circular dependency in rules"))
  }

  test("self-reference rejected") {
    val src = SourceDef("s", "t", Seq(RawAttr.parse("x int")),
      rules = Seq(RuleDef("a", "[This].a + 1")))
    val e = intercept[CompileError](new Compiler(Project(Seq(src))).compile())
    assert(e.message.contains("references itself"))
  }

  test("aggregate over [This] rejected") {
    val src = SourceDef("s", "t", Seq(RawAttr.parse("x int")),
      rules = Seq(RuleDef("a", "sum([This].x)")))
    val e = intercept[CompileError](new Compiler(Project(Seq(src))).compile())
    assert(e.message.contains("not allowed on [This]"))
  }

  test("mixed paths in one aggregate rejected") {
    val a = SourceDef("a", "a", Seq(RawAttr.parse("id int")))
    val b = SourceDef("b", "b", Seq(RawAttr.parse("id int"), RawAttr.parse("v int")))
    val c = SourceDef("c", "c", Seq(RawAttr.parse("id int"), RawAttr.parse("w int")),
      rules = Seq(RuleDef("m", "sum([a].id + [b].v)")))
    val rels = Seq(
      RelationDef("[c]- x -[a]", "[This].id = [Related].id", Cardinality.OneMany),
      RelationDef("[c]- y -[b]", "[This].id = [Related].id", Cardinality.OneMany))
    val e = intercept[CompileError](new Compiler(Project(Seq(a, b, c), rels)).compile())
    assert(e.message.contains("single relation path"))
  }

  test("unknown attribute rejected with reference-style message") {
    val src = SourceDef("s", "t", Seq(RawAttr.parse("x int")),
      rules = Seq(RuleDef("a", "[This].nope + 1")))
    val e = intercept[CompileError](new Compiler(Project(Seq(src))).compile())
    assert(e.message.contains("does not exist in source"))
  }

  test("unknown source in expression rejected") {
    val src = SourceDef("s", "t", Seq(RawAttr.parse("x int")),
      rules = Seq(RuleDef("a", "[ghost].x")))
    val e = intercept[CompileError](new Compiler(Project(Seq(src))).compile())
    assert(e.message.contains("does not exist"))
  }

  test("relation params restricted to This/Related") {
    val a = SourceDef("a", "a", Seq(RawAttr.parse("id int")))
    val b = SourceDef("b", "b", Seq(RawAttr.parse("id int")))
    val rels = Seq(RelationDef("[a]- r -[b]", "[a].id = [Related].id", Cardinality.ManyOne))
    val e = intercept[CompileError](new Compiler(Project(Seq(a, b), rels)).compile())
    assert(e.message.contains("must be [This] or [Related]"))
  }

  test("source-level circular dependency detected") {
    val a = SourceDef("a", "a", Seq(RawAttr.parse("id int")),
      rules = Seq(RuleDef("fromb", "[b].id")))
    val b = SourceDef("b", "b", Seq(RawAttr.parse("id int")),
      rules = Seq(RuleDef("froma", "[a].id")))
    val rels = Seq(
      RelationDef("[a]- r1 -[b]", "[This].id = [Related].id", Cardinality.ManyOne),
      RelationDef("[b]- r2 -[a]", "[This].id = [Related].id", Cardinality.ManyOne))
    val e = intercept[CompileError](new Compiler(Project(Seq(a, b), rels)).compile())
    assert(e.message.contains("Circular dependencies in sources"))
  }

  test("output filter must use [This]") {
    val src = SourceDef("s", "t", Seq(RawAttr.parse("x int")))
    val out = OutputDef("o", Seq(OutputCol.parse("x int")),
      Seq(Channel("s", Seq(Mapping.parse("x x")), filter = Some("[other].x > 1"))))
    val e = intercept[CompileError](new Compiler(Project(Seq(src), Nil, Seq(out))).compile())
    assert(e.message.contains("[This]"))
  }

  test("output mapping against unknown attribute rejected") {
    val src = SourceDef("s", "t", Seq(RawAttr.parse("x int")))
    val out = OutputDef("o", Seq(OutputCol.parse("x int")),
      Seq(Channel("s", Seq(Mapping.parse("nope x")))))
    val e = intercept[CompileError](new Compiler(Project(Seq(src), Nil, Seq(out))).compile())
    assert(e.message.contains("does not exist"))
  }
}
