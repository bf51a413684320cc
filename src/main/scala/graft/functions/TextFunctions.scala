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

/** Unicode NFC normalization (UAX #15 canonical composition) — the
  * mojibake-independent half of text cleaning: decomposed sequences
  * ('e' + U+0301) become their composed forms ('é'), so byte-different
  * renderings of the SAME text hash/dedup identically downstream.
  *
  * Cross-engine contract: DuckDB's `nfc_normalize` (utf8proc) and
  * `java.text.Normalizer` both implement UAX #15, and the Unicode
  * normalization STABILITY policy guarantees a string of codepoints
  * assigned in both versions normalizes identically forever — so NFC is
  * hash-gateable the way locale collation never is. Already-normalized
  * input (the common case — virtually all real text is NFC) returns the
  * INPUT reference: `isNormalized`'s quick-check pass is a scan with no
  * allocation, so the hot path costs one branch per string.
  */
object NfcImpl {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Native Catalyst expression `text_nfc(s)` wrapping [[NfcImpl.nfc]] —
  * same codegen shape as [[TextWinnow]] (one static JVM call from the
  * generated stage; stays inside whole-stage codegen).
  */
case class TextNfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"text_nfc expects STRING, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def prettyName: String = "text_nfc"

  override def nullSafeEval(a: Any): Any =
    NfcImpl.nfc(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NfcImpl$$.MODULE$$.nfc($a);")

  override protected def withNewChildInternal(newChild: Expression): TextNfc =
    copy(child = newChild)
}

/** Compiled BPE merge table for [[BpeEncode]] — replace-chain SEMANTICS
  * (the proven DuckDB-mirrored contract of `TextAnalysis.bpeTokenCounts`)
  * at array speed. The naive apply is one full padded-string `replace`
  * per rule — O(merges × |word|) string traffic, ~10k allocations per
  * word under a real tokenizer table. This implementation is
  * value-identical (property-tested) but skips rules in O(1): it keeps
  * the set of ADJACENT SYMBOL PAIRS currently present in the word and
  * runs a rule's merge pass only when its pair is present — total work
  * O(merges hash probes + applications × |word|), and applications are
  * bounded by |word| (every pass shortens the symbol array).
  *
  * Replace-chain semantics reproduced exactly, including the
  * alternate-pair artifact: one left-to-right pass per rule over the
  * ORIGINAL symbols (replacements never re-match within the pass), and
  * after a merge the next symbol cannot START a match (its leading
  * delimiter space was consumed by the matched ` a b ` pattern — the
  * java.lang.String.replace behavior the SQL chain compiles to).
  */
final class BpeRules(merges: Seq[(String, String)]) extends Serializable {
  private val n = merges.length
  private val fromA = new Array[String](n)
  private val fromB = new Array[String](n)
  private val to = new Array[String](n)
  private val keys = new Array[String](n)
  merges.zipWithIndex.foreach { case ((f, t), i) =>
    val parts = f.split(" ", -1)
    require(parts.length == 2 && parts.forall(_.nonEmpty),
      s"merge LHS must be two space-separated symbols, got '$f'")
    require(t.nonEmpty, "merge RHS must be non-empty")
    fromA(i) = parts(0); fromB(i) = parts(1); to(i) = t
    keys(i) = parts(0) + " " + parts(1)
  }

  /** Encode one word; returns the BPE symbol array. Empty input yields
    * an empty array (the SQL chain renders a lone empty piece there —
    * unreachable through the operators' `^[a-z]+$` word filter, and the
    * array form is the saner contract for direct callers).
    */
  def encode(word: UTF8String): ArrayData = {
    val s = word.toString
    // codepoint-stepped initial spelling (= Spark split(w, ''))
    var len = 0
    var arr = new Array[String](math.max(s.length, 1))
    var off = 0
    while (off < s.length) {
      val cp = s.codePointAt(off)
      val cc = Character.charCount(cp)
      arr(len) = s.substring(off, off + cc)
      len += 1; off += cc
    }
    if (len >= 2 && n > 0) {
      val pairs = new java.util.HashSet[String](len * 2)
      var i = 0
      while (i < len - 1) { pairs.add(arr(i) + " " + arr(i + 1)); i += 1 }
      var r = 0
      while (r < n && len >= 2) {
        if (pairs.contains(keys(r))) {
          val a = fromA(r); val b = fromB(r); val m = to(r)
          val out = new Array[String](len)
          var o = 0; var blocked = false
          i = 0
          while (i < len) {
            if (!blocked && i + 1 < len && arr(i) == a && arr(i + 1) == b) {
              out(o) = m; o += 1; i += 2; blocked = true
            } else {
              out(o) = arr(i); o += 1; i += 1; blocked = false
            }
          }
          arr = out; len = o
          pairs.clear()
          i = 0
          while (i < len - 1) { pairs.add(arr(i) + " " + arr(i + 1)); i += 1 }
        }
        r += 1
      }
    }
    val out = new Array[AnyRef](len)
    var j = 0
    while (j < len) { out(j) = UTF8String.fromString(arr(j)); j += 1 }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression: `bpe_encode(word)` under a fixed merge
  * table — ARRAY<STRING> of BPE pieces, value-identical to the generated
  * replace chain (the DuckDB-oracle contract) via [[BpeRules]]. The
  * rules object rides the codegen reference table (addReferenceObj), so
  * the hot path stays one static-shaped JVM call inside whole-stage
  * codegen. Constructed directly by the BPE operators (the merge table
  * is a Scala value, not a SQL literal).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  @transient private lazy val rules = new BpeRules(merges)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bpe_encode expects STRING, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def nullSafeEval(a: Any): Any =
    rules.encode(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("bpeRules", rules, classOf[BpeRules].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $r.encode($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
