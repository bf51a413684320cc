package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The standard pre-training corpus cleaning recipe, composed from the
  * individual operators: exact dedup → surface-quality floor → language
  * filter. One scan + one shuffle (the dedup hash) end to end — the
  * filters are codegen'd projections fused into the same stage.
  *
  * Near-dup removal (MinHash) intentionally stays a separate pass: its
  * candidate verification is a different shuffle shape and is usually run
  * at a different cadence than the cheap exact/quality/lang pass.
  */
object CorpusPipeline {

  /** Cleaned corpus: canonical (first-id) representatives of exact-dup
    * groups that clear the quality floor, with a recognized language.
    */
  def clean(
      docs: DataFrame, textCol: String = "text",
      minQuality: Double = 0.3, minTokens: Int = 8,
      keepLangs: Seq[String] = Seq("en", "de", "fr", "es", "zh")): DataFrame = {
    val dedup = Dedup.exact(docs, textCol).select("doc_id", "canonical_id", "dup_count")
    val quality = TextAnalysis.qualityScore(docs, textCol)
    val lang = TextAnalysis.langId(docs, textCol)
    val stats = TextAnalysis.textStats(docs, textCol).select("doc_id", "n_tokens")
    docs.select("doc_id")
      .join(dedup, "doc_id")
      .join(quality, "doc_id")
      .join(lang, "doc_id")
      .join(stats, "doc_id")
      .filter(col("doc_id") === col("canonical_id"))
      .filter(col("quality") >= minQuality)
      .filter(col("n_tokens") >= minTokens)
      .filter(col("lang_pred").isin(keepLangs: _*))
      .select(col("doc_id"), col("lang_pred"), col("quality"),
        col("n_tokens"), col("dup_count"))
  }
}
