package graft.analyze

import graft.core._
import graft.SampleProject
import org.scalatest.funsuite.AnyFunSuite

class RelGraphSpec extends AnyFunSuite {

  private val g = new RelGraph(SampleProject.project)

  private def names(p: Seq[Hop]) = p.map(_.relation.name)

  test("single-hop lookup path") {
    val p = g.inferPath("tpch_lineitem", "tpch_orders", wantOne = true)
    assert(names(p) == Seq("[tpch_lineitem]- orderkey -[tpch_orders]"))
    assert(!p.head.reverse)
  }

  test("two-hop implicit path lineitem -> customer") {
    val p = g.inferPath("tpch_lineitem", "tpch_customer", wantOne = true)
    assert(names(p) == Seq(
      "[tpch_lineitem]- orderkey -[tpch_orders]",
      "[tpch_orders]- custkey -[tpch_customer]"))
  }

  test("lineitem -> region is ambiguous (two 1-card routes)") {
    val e = intercept[CompileError](
      g.inferPath("tpch_lineitem", "tpch_region", wantOne = true))
    assert(e.message.contains("Multiple relation paths"))
  }

  test("explicit reverse-hop route lineitem -> supplier -> nation -> region") {
    val p = g.inferPath("tpch_lineitem", "tpch_region", wantOne = true,
      startPath = Seq(
        "[tpch_lineitem]- suppkey -[tpch_supplier]",
        "[tpch_nation]- nationkey -[tpch_supplier]",
        "[tpch_nation]- regionkey -[tpch_region]"))
    assert(p.length == 3)
    assert(p(1).reverse && p(1).cardOne) // supplier -> nation traverses the 1-M edge backward
  }

  test("explicit forward route lineitem -> orders -> customer -> nation -> region") {
    val p = g.inferPath("tpch_lineitem", "tpch_region", wantOne = true,
      startPath = Seq(
        "[tpch_lineitem]- orderkey -[tpch_orders]",
        "[tpch_orders]- custkey -[tpch_customer]",
        "[tpch_customer]- nationkey -[tpch_nation]",
        "[tpch_nation]- regionkey -[tpch_region]"))
    assert(p.length == 4 && p.forall(!_.reverse))
  }

  test("reverse M path customer -> orders for aggregates") {
    val p = g.inferPath("tpch_customer", "tpch_orders", wantOne = false)
    assert(names(p) == Seq("[tpch_orders]- custkey -[tpch_customer]"))
    assert(p.head.reverse && !p.head.cardOne)
  }

  test("forward 1-M path nation -> supplier for aggregates") {
    val p = g.inferPath("tpch_nation", "tpch_supplier", wantOne = false)
    assert(names(p) == Seq("[tpch_nation]- nationkey -[tpch_supplier]"))
    assert(!p.head.reverse && !p.head.cardOne)
  }

  test("scalar request over an M-only path errors with aggregation hint") {
    val e = intercept[CompileError](g.inferPath("tpch_customer", "tpch_orders", wantOne = true))
    assert(e.message.contains("aggregation"))
  }

  test("aggregate request over a 1-only path errors with remove-aggregation hint") {
    val e = intercept[CompileError](g.inferPath("tpch_orders", "tpch_customer", wantOne = false))
    assert(e.message.contains("Remove aggregation"))
  }

  test("no path at all") {
    val proj = Project(
      sources = Seq(
        SourceDef("a", "a", Seq(RawAttr.parse("x int"))),
        SourceDef("b", "b", Seq(RawAttr.parse("y int")))))
    val e = intercept[CompileError](
      new RelGraph(proj).inferPath("a", "b", wantOne = true))
    assert(e.message.contains("No active relation paths"))
  }

  test("ambiguous paths rejected without explicit parameters") {
    val rels = SampleProject.relations :+ RelationDef(
      "[tpch_lineitem]- dup-orderkey -[tpch_orders]",
      "[This].l_orderkey = [Related].o_orderkey", Cardinality.ManyOne)
    val proj = SampleProject.project.copy(relations = rels)
    val e = intercept[CompileError](
      new RelGraph(proj).inferPath("tpch_lineitem", "tpch_orders", wantOne = true))
    assert(e.message.contains("Multiple relation paths"))
  }

  test("explicit start path resolves ambiguity") {
    val rels = SampleProject.relations :+ RelationDef(
      "[tpch_lineitem]- dup-orderkey -[tpch_orders]",
      "[This].l_orderkey = [Related].o_orderkey", Cardinality.ManyOne)
    val proj = SampleProject.project.copy(relations = rels)
    val p = new RelGraph(proj).inferPath(
      "tpch_lineitem", "tpch_orders", wantOne = true,
      startPath = Seq("[tpch_lineitem]- dup-orderkey -[tpch_orders]"))
    assert(names(p) == Seq("[tpch_lineitem]- dup-orderkey -[tpch_orders]"))
  }

  test("primary flag breaks ties without error only via explicit path") {
    // reference behavior: ambiguity is an error in import mode even when a
    // primary exists at the same level (selections>1)
    val rels = SampleProject.relations :+ RelationDef(
      "[tpch_lineitem]- dup-orderkey -[tpch_orders]",
      "[This].l_orderkey = [Related].o_orderkey", Cardinality.ManyOne, primaryFlag = true)
    val proj = SampleProject.project.copy(relations = rels)
    assertThrows[CompileError](
      new RelGraph(proj).inferPath("tpch_lineitem", "tpch_orders", wantOne = true))
  }

  test("explicit path continues to completion past the pinned prefix") {
    // pin only the first 2 of 3 hops; inference completes the chain
    val p = g.inferPath("tpch_lineitem", "tpch_nation", wantOne = true,
      startPath = Seq(
        "[tpch_lineitem]- orderkey -[tpch_orders]",
        "[tpch_orders]- custkey -[tpch_customer]"))
    assert(p.length == 3 && p.last.to == "tpch_nation")
  }

  test("validateChain accepts the sample 3-hop chain") {
    val p = g.validateChain("tpch_lineitem", "tpch_nation", wantOne = true,
      Seq(
        "[tpch_lineitem]- orderkey -[tpch_orders]",
        "[tpch_orders]- custkey -[tpch_customer]",
        "[tpch_customer]- nationkey -[tpch_nation]"))
    assert(p.length == 3)
  }

  test("validateChain rejects disconnected chain") {
    val e = intercept[CompileError](
      g.validateChain("tpch_lineitem", "tpch_nation", wantOne = true,
        Seq("[tpch_orders]- custkey -[tpch_customer]")))
    assert(e.message.contains("does not connect"))
  }

  test("validateChain rejects unknown relation") {
    assertThrows[CompileError](
      g.validateChain("tpch_lineitem", "tpch_orders", wantOne = true, Seq("[nope]- x -[nah]")))
  }

  test("topoSort orders dependencies and detects cycles") {
    assert(RelGraph.topoSort(Seq("a", "b", "c"),
      Map("a" -> Set("b"), "b" -> Set("c"), "c" -> Set())) == Seq("c", "b", "a"))
    assertThrows[CompileError](RelGraph.topoSort(Seq("a", "b"),
      Map("a" -> Set("b"), "b" -> Set("a"))))
  }
}
