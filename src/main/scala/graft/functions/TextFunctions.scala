package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing (the MOSS local document fingerprinting algorithm,
  * Schleimer/Wilkerson/Aiken 2003): hash every k-gram of CHARACTERS with
  * a rolling polynomial hash, slide a window of `w` consecutive hashes,
  * keep each window's minimum, and fingerprint the document with the
  * sorted distinct minima. Guarantees: any shared substring of length
  * ≥ k + w − 1 between two documents contributes at least one SHARED
  * fingerprint — the substring-level near-dup primitive that token-level
  * shingles (MinHash) miss when boilerplate is re-wrapped mid-token.
  *
  * Determinism contract (the fingerprints are hash-compared against a
  * DuckDB oracle running the same arithmetic in SQL):
  *   - characters are Unicode CODEPOINTS (`String.codePointAt` stepping,
  *     = DuckDB's `unicode(c)` per `string_split(text, '')` element);
  *   - hash h(c₁…c_k) = fold: acc = c₁; acc = (acc·257 + c_j) mod
  *     (2³¹ − 1) — exact 64-bit integer arithmetic, no overflow
  *     (acc < 2³¹, so acc·257 + c < 2⁴⁰);
  *   - fewer than w hashes but at least one → ONE window over them all;
  *     text shorter than k codepoints → empty fingerprint array.
  */
object WinnowImpl {
  final val Base = 257L
  final val Mod = 2147483647L // 2^31 - 1

  def winnow(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    // codepoint array (BMP chars are one Java char; supplementary pairs
    // collapse to one codepoint, matching DuckDB's per-character split)
    val nCp = str.codePointCount(0, str.length)
    val cps = new Array[Int](nCp)
    var ci = 0; var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      cps(ci) = cp; ci += 1; off += Character.charCount(cp)
    }
    if (nCp < k) return new GenericArrayData(Array.emptyLongArray)
    val nH = nCp - k + 1
    val hs = new Array[Long](nH)
    var i = 0
    while (i < nH) {
      var acc = cps(i).toLong
      var j = 1
      while (j < k) { acc = (acc * Base + cps(i + j)) % Mod; j += 1 }
      hs(i) = acc
      i += 1
    }
    val nW = math.max(1, nH - w + 1)
    val mins = new Array[Long](nW)
    var jw = 0
    while (jw < nW) {
      var m = hs(jw)
      var t = jw + 1
      val end = math.min(jw + w, nH)
      while (t < end) { if (hs(t) < m) m = hs(t); t += 1 }
      mins(jw) = m
      jw += 1
    }
    java.util.Arrays.sort(mins)
    // dedupe in place on the sorted array
    var outN = 0
    var p = 0
    while (p < nW) {
      if (outN == 0 || mins(p) != mins(outN - 1)) { mins(outN) = mins(p); outN += 1 }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, outN))
  }
}

/** Native Catalyst expression wrapping [[WinnowImpl.winnow]] — codegen
  * and interpreted eval share ONE implementation (a static JVM call from
  * the generated stage, like Spark's own regexp/UTF8String intrinsics),
  * so the hot path stays inside whole-stage codegen with no boxing and
  * no lambda-canonicalization hazards.
  */
case class TextWinnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"text_winnow expects STRING, got ${child.dataType.simpleString}")
    else if (k < 1 || w < 1)
      TypeCheckResult.TypeCheckFailure("text_winnow needs k >= 1 and w >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "text_winnow"

  override def nullSafeEval(a: Any): Any =
    WinnowImpl.winnow(a.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WinnowImpl$$.MODULE$$.winnow($a, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): TextWinnow =
    copy(child = newChild)
}
