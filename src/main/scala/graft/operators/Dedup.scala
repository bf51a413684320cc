package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: every variant is a shuffle-on-key plan — no cartesian
  * products anywhere. Candidate generation is always a bucket join
  * (hash group, LSH band, or shingle inverted index with frequency
  * capping); exact verification runs only on candidate pairs.
  */
object Dedup {

  /** Exact dedup: hash-groupBy on normalized text. Emits every doc with its
    * canonical (minimum) doc_id and the duplicate-group size; `is_canonical
    * = doc_id = canonical_id`. One shuffle on the 128-bit hash — the plan
    * that works at any scale.
    */
  def exact(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy("__h")
    docs
      .withColumn("__h", TextAnalysis.normalizedMd5(textCol))
      .withColumn("canonical_id", min("doc_id").over(w))
      .withColumn("dup_count", count(lit(1)).over(w))
      .select(col("doc_id"), col("canonical_id"), col("dup_count"),
        (col("doc_id") === col("canonical_id")).as("is_canonical"))
  }

  /** Word n-gram shingle array (distinct, lower-cased). */
  def shingleExpr(textCol: String, n: Int): String = {
    val toks = TextAnalysis.tokensExpr(textCol)
    s"""array_distinct(transform(
       |  sequence(0, greatest(size($toks) - $n, 0)),
       |  i -> array_join(slice($toks, i + 1, $n), ' ')))""".stripMargin
  }

  /** Exact n-gram Jaccard duplicate pairs via a shingle inverted index:
    * explode distinct shingles, self-join on shingle (skipping shingles
    * shared by more than `maxShingleFreq` docs — stopword-gram blowup
    * guard), then verify exact Jaccard ≥ threshold from the true
    * intersection size. Emits (doc_a, doc_b, jaccard) with doc_a < doc_b.
    *
    * At 100 TB prefer [[minhashPairs]]: the inverted index is exact but its
    * join fan-out grows with document similarity density; MinHash bounds
    * the fan-out at #bands per document.
    */
  def ngramJaccardPairs(
      docs: DataFrame, textCol: String = "text", n: Int = 3,
      threshold: Double = 0.5, maxShingleFreq: Int = 100): DataFrame = {
    val sh = docs.select(col("doc_id"),
      explode(expr(shingleExpr(textCol, n))).as("shingle"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val capped = sh
      .withColumn("__f", count(lit(1)).over(Window.partitionBy("shingle")))
      .filter(col("__f") <= maxShingleFreq)
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "sh_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "sh_b"), "doc_b")
      .withColumn("jaccard",
        expr("round(CAST(inter AS DOUBLE) / CAST(sh_a + sh_b - inter AS DOUBLE), 6)"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** MinHash + LSH near-duplicate pairs: k minhashes over shingle hashes,
    * banded into `bands` buckets; docs colliding in any band become
    * candidates; candidates are verified with exact Jaccard on the shingle
    * sets. Fan-out is exactly `bands` rows per document — the 100 TB path.
    */
  def minhashPairs(
      docs: DataFrame, textCol: String = "text", n: Int = 3,
      numHashes: Int = 32, bands: Int = 16, threshold: Double = 0.5): DataFrame = {
    // banding chosen for the threshold: P(candidate) = 1-(1-j^rows)^bands;
    // 16 bands × 2 rows ⇒ ≈0.996 at j=0.54, the knee sits near j≈0.2 —
    // false candidates cost only verification, misses cost recall
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val withShingles = docs
      .select(col("doc_id"), expr(shingleExpr(textCol, n)).as("__sh"))
      .filter(size(col("__sh")) > 0)
    // minhash_j = min over shingles of a seeded 64-bit hash
    val minhashes = (0 until numHashes).map { j =>
      expr(s"array_min(transform(__sh, s -> xxhash64(s, $j)))").as(s"__mh$j")
    }
    val mh = withShingles.select(col("doc_id") +: col("__sh") +: minhashes: _*)
    // band key: hash of the band's row of minhashes
    val bandRows = (0 until bands).map { b =>
      val cols = (0 until rows).map(r => s"__mh${b * rows + r}").mkString(", ")
      mh.select(col("doc_id"), col("__sh"),
        lit(b).as("__band"), expr(s"xxhash64($cols)").as("__bucket"))
    }.reduce(_ union _)
    val cand = bandRows.as("a").join(bandRows.as("b"),
        col("a.__band") === col("b.__band") && col("a.__bucket") === col("b.__bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.__sh").as("sh_a"), col("b.__sh").as("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
    cand
      .withColumn("jaccard", expr(
        """round(CAST(size(array_intersect(sh_a, sh_b)) AS DOUBLE)
          | / CAST(size(array_union(sh_a, sh_b)) AS DOUBLE), 6)""".stripMargin))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 64-bit SimHash per document: token-hash sign votes per bit, computed
    * entirely row-local with higher-order functions (no shuffle, no UDF).
    */
  def simhash(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = TextAnalysis.tokensExpr(textCol)
    docs.select(col("doc_id"), expr(
      s"""aggregate(
         |  transform($toks, t -> xxhash64(t)),
         |  CAST(array_repeat(0L, 64) AS ARRAY<BIGINT>),
         |  (acc, h) -> zip_with(acc, sequence(0L, 63L),
         |                       (a, i) -> a + CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END),
         |  acc -> aggregate(zip_with(acc, sequence(0L, 63L),
         |                            (a, i) -> CASE WHEN a > 0 THEN shiftleft(1L, CAST(i AS INT)) ELSE 0L END),
         |                   0L, (s, v) -> s | v))""".stripMargin).as("simhash"))
  }

  /** SimHash near-dup pairs: 4 bands of 16 bits as LSH buckets, verified by
    * Hamming distance ≤ `maxHamming`.
    */
  def simhashPairs(
      docs: DataFrame, textCol: String = "text", maxHamming: Int = 8): DataFrame = {
    val sh = simhash(docs, textCol)
    val bandRows = (0 until 4).map { b =>
      sh.select(col("doc_id"), col("simhash"),
        lit(b).as("__band"), expr(s"(simhash >> ${b * 16}) & 65535").as("__bucket"))
    }.reduce(_ union _)
    bandRows.as("a").join(bandRows.as("b"),
        col("a.__band") === col("b.__band") && col("a.__bucket") === col("b.__bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding cosine near-dup pairs via sign-LSH: `nBits` deterministic
    * hyperplanes (seeded client-side, inlined as literals) bucket the
    * vectors; same-bucket pairs are verified with exact cosine ≥ threshold.
    */
  def embeddingDupPairs(
      embeddings: DataFrame, vecCol: String = "embedding", idCol: String = "vec_id",
      dim: Int = 64, nBits: Int = 12, threshold: Double = 0.95, seed: Long = 42L): DataFrame = {
    val bucket = Similarity.signBucketExpr(vecCol, dim, nBits, seed)
    val b = embeddings.select(col(idCol), col(vecCol), expr(bucket).as("__bucket"))
    b.as("a").join(b.as("b"),
        col("a.__bucket") === col("b.__bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        expr(s"round(${Similarity.cosineExpr(s"a.$vecCol", s"b.$vecCol")}, 6)").as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
