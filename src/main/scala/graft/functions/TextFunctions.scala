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

/** O(n) per-position k-gram rolling hashes for exact-substring dedup
  * candidate generation ([[graft.operators.Dedup.repeatedSubstringSpans]]):
  * element i (0-based) is a 64-bit polynomial hash (base 1000003,
  * wrap-around mod 2⁶⁴) of the k CODEPOINTS starting at codepoint i —
  * one O(1) roll per position instead of the O(k) substring + re-hash a
  * naive formulation pays (k = 40 ⇒ ~40× less hash work per corpus
  * char). Codepoint stepping matches Spark `substring`'s character
  * semantics, so a hash bucket always corresponds to a character-aligned
  * gram. PREFILTER-grade only: callers must confirm survivors with exact
  * gram equality (a 64-bit hash collides at corpus scale — ~2⁻⁶⁵·n²
  * expected pairs, certain at 100 TB).
  */
object GramHashesImpl {
  final val Base = 1000003L

  def hashes(s: UTF8String, k: Int): ArrayData = {
    val str = s.toString
    val nCp = str.codePointCount(0, str.length)
    if (nCp < k) return new GenericArrayData(Array.emptyLongArray)
    val cps = new Array[Int](nCp)
    var ci = 0; var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      cps(ci) = cp; ci += 1; off += Character.charCount(cp)
    }
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= Base; i += 1 }
    val out = new Array[Long](nCp - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + cps(i); i += 1 }
    out(0) = h
    i = 1
    while (i <= nCp - k) {
      h = (h - cps(i - 1) * pow) * Base + cps(i + k - 1)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression wrapping [[GramHashesImpl.hashes]] —
  * `gram_hashes(text, k)`, same codegen shape as [[TextWinnow]].
  */
case class GramHashes(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"gram_hashes expects STRING, got ${child.dataType.simpleString}")
    else if (k < 2)
      TypeCheckResult.TypeCheckFailure("gram_hashes needs k >= 2")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override def nullSafeEval(a: Any): Any =
    GramHashesImpl.hashes(a.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.GramHashesImpl$$.MODULE$$.hashes($a, $k);")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
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
