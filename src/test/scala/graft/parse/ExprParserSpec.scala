package graft.parse

import graft.core.CompileError
import org.scalatest.funsuite.AnyFunSuite

class ExprParserSpec extends AnyFunSuite {

  private def p(e: String) = ExprParser.parse(e)

  test("simple arithmetic over [This] params") {
    val e = p("([This].l_extendedprice - [This].l_tax - [This].l_discount)*100")
    assert(e.params.map(_.path) == Seq("l_extendedprice", "l_tax", "l_discount"))
    assert(e.params.forall(_.container == "This"))
    assert(!e.hasAggregates && !e.windowFlag)
    val sql = e.render(i => s"T.${e.params(i).attribute}")
    assert(sql == "(T.l_extendedprice - T.l_tax - T.l_discount)*100")
  }

  test("cross-source param and double-quoted literal") {
    val e = p("""date_format([tpch_orders].o_orderdate, "yyyyMM")""")
    assert(e.params == Seq(ParamRef("tpch_orders", "o_orderdate", Nil)))
    assert(e.render(_ => "X") == """date_format(X, "yyyyMM")""")
  }

  test("struct keys parsed into param path") {
    val e = p("[This].store.bicycle.color")
    assert(e.params == Seq(ParamRef("This", "store", Seq("bicycle", "color"))))
  }

  test("numeric bracket kept as literal array index") {
    val e = p("[This].arr[0]")
    assert(e.params == Seq(ParamRef("This", "arr", Nil)))
    assert(e.render(_ => "A") == "A[0]")
  }

  test("quoted text hides brackets and '' escapes") {
    val e = p("CONCAT([This].l_partkey,'|[not a param]''s',[This].l_suppkey)")
    assert(e.params.map(_.attribute) == Seq("l_partkey", "l_suppkey"))
    assert(e.render(i => s"P$i") == "CONCAT(P0,'|[not a param]''s',P1)")
  }

  test("empty brackets rejected") {
    assertThrows[CompileError](p("[ ].x"))
  }

  test("nested brackets rejected") {
    assertThrows[CompileError](p("[a[b]].x"))
  }

  test("bracket without attribute rejected") {
    assertThrows[CompileError](p("[This] + 1"))
  }

  test("aggregate span extraction") {
    val e = p("SUM([tpch_lineitem].l_quantity * (1 - [tpch_lineitem].l_discount))")
    assert(e.aggs.size == 1)
    val a = e.aggs.head
    assert(a.func == "sum" && !a.distinct)
    assert(a.paramIndexes == Seq(0, 1))
    assert(e.segments.collect { case Seg.Agg(j) => j } == Seq(0))
    assert(e.renderAggInner(0, i => s"R.c$i") == "sum(R.c0 * (1 - R.c1))")
  }

  test("distinct aggregate") {
    val e = p("count(DISTINCT [o].x)")
    assert(e.aggs.head.distinct)
    assert(e.renderAggInner(0, _ => "R.x") == "count(DISTINCT R.x)")
  }

  test("aggregate plus outer arithmetic") {
    val e = p("sum([o].x) + max([o].y) * 2")
    assert(e.aggs.map(_.func) == Seq("sum", "max"))
    assert(e.render(i => "P", j => s"A$j") == "A0 + A1 * 2")
  }

  test("window call is not an aggregate and sets windowFlag") {
    val e = p("sum([This].x) OVER (PARTITION BY [This].k ORDER BY [This].t)")
    assert(e.aggs.isEmpty)
    assert(e.windowFlag)
    assert(e.params.map(_.attribute) == Seq("x", "k", "t"))
  }

  test("row_number window (non-allowlisted fn) sets windowFlag only") {
    val e = p("row_number() over (partition by [This].k order by [This].o)")
    assert(e.aggs.isEmpty && e.windowFlag)
  }

  test("aggregate mixed with window rejected") {
    assertThrows[CompileError](
      p("sum([o].x) + max([This].y) OVER (PARTITION BY [This].k)"))
  }

  test("nested aggregates rejected") {
    assertThrows[CompileError](p("sum(max([o].x))"))
  }

  test("aggregate name inside quotes ignored") {
    val e = p("'sum(' || [This].x")
    assert(e.aggs.isEmpty)
    assert(e.params.map(_.attribute) == Seq("x"))
  }

  test("count(*) supported") {
    val e = p("count(*)")
    assert(e.aggs.head.func == "count")
    assert(e.renderAggInner(0, _ => "?") == "count(*)")
  }
}
