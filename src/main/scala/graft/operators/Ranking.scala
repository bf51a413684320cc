package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped ranking — "best k documents per source" — computed the way it
  * must be at corpus scale: never a window over a raw corpus-sized group.
  */
object Ranking {

  /** Exact top-k rows per group by an integer score, descending, ties
    * broken by `tieCol` ascending (a unique id ⇒ a total order, so the
    * result is a deterministic SET and fully hash-gated, q_top_per_group).
    *
    * Two-phase salted ranking (the Skew.twoPhaseAgg shape applied to
    * ranking): phase 1 ranks within (group, salt) — `salts` hash buckets
    * of the tie column — and keeps each bucket's top k; phase 2 ranks the
    * survivors within the group. Phase-1 partitions are ~groupSize/salts;
    * phase-2 partitions are ≤ k·salts rows REGARDLESS of group size.
    * Correct because ranking is monotone: every global top-k row is
    * inside its own bucket's top-k, so phase 1 never discards a winner
    * (spec'd against the single-window form).
    *
    * A single `row_number` window partitioned by the group alone — the
    * textbook form — buffers an entire group in one task: corpus-sized
    * for a head group at 100 TB (the same Zipf-head failure as r6's
    * token windows). `salts` trades a bounded second exchange for that
    * unbounded task; salts=1 degenerates to the textbook plan.
    */
  def topKPerGroup(
      df: DataFrame, groupCols: Seq[String], scoreExpr: String,
      tieCol: String, k: Int, salts: Int = 16): DataFrame = {
    require(k > 0, "k must be positive")
    require(salts > 0, "salts must be positive")
    val staged = df
      .withColumn("__ord", expr(s"CAST($scoreExpr AS BIGINT)"))
      .withColumn("__salt", pmod(xxhash64(col(tieCol)), lit(salts)))
    val g = groupCols.map(col)
    val w1 = Window.partitionBy(g :+ col("__salt"): _*)
      .orderBy(col("__ord").desc, col(tieCol).asc)
    val w2 = Window.partitionBy(g: _*)
      .orderBy(col("__ord").desc, col(tieCol).asc)
    staged
      .withColumn("__r1", row_number().over(w1)).filter(col("__r1") <= k)
      .withColumn("rank", row_number().over(w2)).filter(col("rank") <= k)
      .drop("__ord", "__salt", "__r1")
  }

  /** Deterministic uniform k-sample per group — "inspect 5 random
    * documents from every source" as a REPRODUCIBLE query, not an RNG
    * draw. Each row's sampling key is its content-derived md5 bucket
    * (the [[graft.operators.TextAnalysis.assignSplit]] arithmetic, 16
    * bits), and the sample is the k smallest buckets per group with the
    * id as tie-break: independent of partitioning, run order, engine,
    * and — unlike seeded `sample()` — stable row-by-row as the corpus
    * grows (a new document displaces at most one old pick per group).
    *
    * Rides [[topKPerGroup]]'s salted two-phase ranking, so a
    * corpus-scale head group never becomes one window task; the md5
    * bucket is a per-row projection (no extra exchange). Hash-gated
    * (q_group_sample) — DuckDB computes the identical md5-bucket
    * arithmetic and window.
    */
  def hashSamplePerGroup(
      df: DataFrame, groupCols: Seq[String], idCol: String, k: Int,
      salts: Int = 16): DataFrame = {
    val staged = df
      .withColumn("__h", expr(s"md5(CAST($idCol AS STRING))"))
      .withColumn("__bucket", expr(TextAnalysis.md5Bucket16Expr))
    // k SMALLEST buckets: topKPerGroup ranks descending, so negate
    topKPerGroup(staged, groupCols, "-__bucket", idCol, k, salts)
      .drop("__h", "__bucket")
  }
}
