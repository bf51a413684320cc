package graft.parse

import graft.core.CompileError
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the tokenizer (SURVEY §5 "our strategy": the parser
  * and path search are the passes subtle enough to warrant them).
  */
object ExprParserPropSpec extends Properties("ExprParser") {

  private val ident: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.oneOf(Gen.alphaNumChar, Gen.const('_'))).map(_.mkString)
  } yield s"$h$t"

  private val paramRef: Gen[String] = for {
    container <- Gen.oneOf(Gen.const("This"), ident)
    attr <- ident
    keys <- Gen.listOf(ident).map(_.take(2))
  } yield s"[$container].${(attr +: keys).mkString(".")}"

  // literal text that cannot open brackets/quotes or form identifiers that
  // merge with a neighboring param's keys
  private val opText: Gen[String] =
    Gen.oneOf(" + ", " - ", " * ", " / ", " = ", ", ", " AND ", " OR ", " ")

  private val quoted: Gen[String] = for {
    inner <- Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf("[]().,* ".toSeq)))
      .map(_.mkString)
  } yield s"'${inner.replace("'", "")}'"

  private val expression: Gen[String] = for {
    n <- Gen.choose(1, 6)
    parts <- Gen.listOfN(n, Gen.frequency(
      3 -> paramRef, 2 -> quoted, 1 -> Gen.numStr.suchThat(_.nonEmpty)))
    seps <- Gen.listOfN(n + 1, opText)
  } yield seps.head + parts.zip(seps.tail).map { case (p, s) => p + s }.mkString

  property("roundTrip: rendering params in original form reproduces input") =
    forAll(expression) { e =>
      val parsed = ExprParser.parse(e)
      val rendered = parsed.render(
        i => parsed.params(i).toString,
        j => throw new IllegalStateException("no aggs generated"))
      rendered == e
    }

  property("bracket text inside single quotes is never a parameter") =
    forAll(ident, ident) { (a, b) =>
      val e = s"'[NotASource].$a' || [This].$b"
      val p = ExprParser.parse(e)
      p.params.map(_.attribute) == Seq(b)
    }

  property("allow-listed aggregate wrapping is always detected") =
    forAll(Gen.oneOf(ExprParser.aggregateFunctions.toSeq), paramRef) { (fn, pr) =>
      val p = ExprParser.parse(s"$fn($pr)")
      p.aggs.map(_.func) == Seq(fn)
    }

  property("non-allow-listed functions are never aggregates") =
    forAll(ident.suchThat(i => !ExprParser.aggregateFunctions.contains(i.toLowerCase)),
      paramRef) { (fn, pr) =>
      ExprParser.parse(s"$fn($pr)").aggs.isEmpty
    }

  property("parse is total on quote-balanced bracket-free text") =
    forAll(Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(" ()+-*/,.=<>".toSeq)))
      .map(_.mkString)) { s =>
      try { ExprParser.parse(s); true }
      catch { case _: CompileError => true } // structured error is fine; crash is not
    }

  property("param count equals bracket-ref count") =
    forAll(Gen.choose(1, 8), ident) { (n, attr) =>
      val e = (1 to n).map(i => s"[s$i].$attr").mkString(" + ")
      ExprParser.parse(e).params.size == n
    }
}
