package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property test: the engine's LOOKAHEAD-FREE GPT-2 pre-tokenization
  * (sentinel pre-pass + ordered-alternation split, the only formulation
  * RE2/DuckDB can mirror) must be token-identical to the PAPER regex
  * (Radford et al. 2019 — `'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+|
  * ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+`, here with the pinned explicit
  * classes over lower-cased text) run with a REAL lookahead in Java
  * regex. Also pins that the GPT-2 token budget diverges from the
  * whitespace-alpha row exactly on punctuation-adjacent text — the
  * reason the row exists.
  */
object Gpt2SplitPropSpec extends Properties("TextAnalysis.gpt2Split") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-gpt2split-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ------------------------------------------------- lookahead reference

  private val ws = " \t\n\\x0B\f\r"
  private val refPattern = java.util.regex.Pattern.compile(
    "'s|'t|'re|'ve|'m|'ll|'d" +
      "| ?\\p{L}+| ?\\p{N}+" +
      s"| ?[^\\p{L}\\p{N}$ws]+" +
      s"|[$ws]+(?![^$ws])" + // the paper's \s+(?!\S)
      s"|[$ws]+")

  private def refSplit(text: String): Seq[String] = {
    val cleaned = text.toLowerCase(java.util.Locale.ROOT).replace("\u0001", "")
    val m = refPattern.matcher(cleaned)
    val b = Seq.newBuilder[String]
    while (m.find()) b += m.group()
    b.result()
  }

  /** Plain-Scala replace-chain BPE (the bpeChainApplied semantics) for
    * the reference token budget.
    */
  private def refBpePieces(word: String, merges: Seq[(String, String)]): Int = {
    val spelled = " " + word.toSeq.mkString(" ") + " "
    val merged = merges.foldLeft(spelled) { case (s, (f, t)) =>
      s.replace(" " + f + " ", " " + t + " ")
    }
    merged.trim.split(" ").length
  }

  // ------------------------------------------------------ the generators

  private val piece: Gen[String] = Gen.oneOf(
    "the", "data", "don't", "it's", "we'll", "i'm", "you've", "they're",
    "co-op", "end.", "x1y", "42", "3.14", "a,b", "(x)", "...", "élan",
    " ", "  ", "   ", "\t", " \t ", "\n", "\u0001", "'", "''", "mid'fix",
    "'start", "end'", "#", "a#b", "-", "--",
    // Unicode \p{L}/\p{N} classes (BMP): Latin-1/2 letters, Greek,
    // Cyrillic, CJK, an Arabic-Indic digit and a vulgar fraction (both
    // \p{N}), plus contraction-adjacent and case-folding shapes
    "żółć", "går", "naïve", "führt", "l'été", "ÉTÉ", "straße", "πόλη",
    "мир", "中文", "٣٤", "½", "x½y", "şeyi'd", "öß", "é.è",
    "  's", " \t'll")
  private val textG: Gen[String] =
    Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, piece)).map(_.mkString(""))

  private def engineSplit(texts: Seq[String]): Map[Long, Seq[String]] = {
    import spark.implicits._
    val df = spark.createDataset(texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }).toDF("doc_id", "text")
    df.selectExpr("doc_id", TextAnalysis.gpt2TokensExpr("text") + " AS ts")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Seq[String]]("ts"))
      .toMap
  }

  property("sentinel formulation == paper lookahead regex, token for token") =
    forAll(Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, textG))) { texts =>
      val got = engineSplit(texts)
      texts.zipWithIndex.forall { case (t, i) =>
        val want = refSplit(t)
        val ok = got(i.toLong) == want
        if (!ok) println(s"SPLIT MISMATCH text=${t.replace("\u0001", "<1>")}" +
          s"\n engine=${got(i.toLong)}\n ref=$want")
        ok
      }
    }

  property("token budget matches an independent Scala pipeline") =
    forAll(Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, textG))) { texts =>
      import spark.implicits._
      val merges = TextAnalysis.largeBpeMerges
      val df = spark.createDataset(texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }).toDF("doc_id", "text")
      val got = TextAnalysis.bpeTokenCountsGpt2(df)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_pretokens"), r.getAs[Long]("n_bpe_tokens_gpt2"))))
        .toMap
      texts.zipWithIndex.forall { case (t, i) =>
        val toks = refSplit(t)
        val want = (toks.length.toLong, toks.map { tok =>
          val body = tok.stripPrefix(" ")
          if (body.nonEmpty && body.forall(Character.isLetter) &&
              !tok.drop(1).contains(' '))
            refBpePieces(body, merges).toLong
          else 1L
        }.sum)
        val ok = got(i.toLong) == want
        if (!ok) println(s"BUDGET MISMATCH text=$t got=${got(i.toLong)} want=$want")
        ok
      }
    }

  property("diverges from the whitespace-alpha row exactly on " +
      "punctuation-adjacent text (the row is not redundant)") = {
    import spark.implicits._
    val df = Seq(
      (0L, "don't stop, now-42 end."), // every word punctuation-adjacent
      (1L, "plain words only here"))   // none
    .toDF("doc_id", "text")
    val wsRow = TextAnalysis.bpeTokenCounts(df, TextAnalysis.largeBpeMerges)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_bpe_tokens")).toMap
    val gpt2 = TextAnalysis.bpeTokenCountsGpt2(df)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_bpe_tokens_gpt2")).toMap
    // whitespace row: "don't"/"stop,"/"now-42"/"end." all fail ^[a-z]+$
    // → 0 priced tokens; gpt2 prices don + 't + stop + , + now + - +
    // 42 + end + . plus the space-glued prefixes
    // spaces glue onto the following words (zero extra tokens), so the
    // plain-text budgets agree exactly while the punctuation-adjacent
    // doc goes 0 -> priced
    wsRow(0L) == 0L && gpt2(0L) >= 9L &&
      wsRow(1L) > 0L && gpt2(1L) == wsRow(1L)
  }

  property("non-ASCII words are REAL letter runs priced through the " +
      "merge chain — not 1-token punctuation runs (the r15 ASCII-class " +
      "contract underpriced them)") = {
    import spark.implicits._
    val df = Seq((0L, "żółć går naïve führt")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTokenCountsGpt2(df).collect().head
    val toks = refSplit("żółć går naïve führt")
    val want = toks.map(t =>
      refBpePieces(t.stripPrefix(" "), TextAnalysis.largeBpeMerges).toLong).sum
    // 4 pretokens; under the old [a-z] contract each priced exactly 1
    // (total 4) — the Unicode contract prices their codepoints through
    // the chain, so the budget must exceed the pretoken count
    got.getAs[Long]("n_pretokens") == 4L &&
      got.getAs[Long]("n_bpe_tokens_gpt2") == want && want > 4L
  }
}
