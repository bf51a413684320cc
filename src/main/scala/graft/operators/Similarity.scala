package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.Random

/** Approximate-nearest-neighbor search over an embedding column
  * (`ARRAY<FLOAT>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast join of the (small)
  * query set against the corpus, one corpus scan, no corpus shuffle.
  * Scale path: sign-LSH bucketing (random-hyperplane bits) so each probe
  * touches only its bucket — the 100 TB plan; an IVF-style variant can
  * reuse the same bucket-join shape with learned centroids.
  */
object Similarity {

  /** Exact cosine between two ARRAY<FLOAT> columns, accumulated in double
    * in array order (deterministic, engine-portable). SQL reference form —
    * the hot paths use [[withCosine]], a compiled pass with the same fold
    * order (bit-identical doubles); higher-order functions run interpreted
    * (CodegenFallback) and dominate wall-clock at pair volume.
    */
  def cosineExpr(a: String, b: String): String =
    s"""(aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
       |           CAST(0 AS DOUBLE), (acc, v) -> acc + v))
       | / (sqrt(aggregate(transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
       |           CAST(0 AS DOUBLE), (acc, v) -> acc + v))
       |  * sqrt(aggregate(transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
       |           CAST(0 AS DOUBLE), (acc, v) -> acc + v)))""".stripMargin

  /** Appends a raw `cosine` over two ARRAY<FLOAT> columns via the native
    * codegen expression [[graft.functions.FloatVecCosine]] (callers apply
    * Spark's own `round(cosine, 6)` so the rounding stays the builtin's).
    * The expression stays inside whole-stage codegen — candidate join,
    * cosine, and threshold filter compile into one stage, with no UDF
    * boxing and no mapPartitions encoder boundary. Accumulation order
    * matches [[cosineExpr]] exactly, so the formulations (and the DuckDB
    * oracle) are bit-identical.
    */
  private[operators] def withCosine(
      df: DataFrame, aCol: String, bCol: String, keep: Seq[String]): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select((keep.map(col) :+
      expr(s"vec_cosine(`$aCol`, `$bCol`)").as("cosine")): _*)
  }

  /** [[withCosine]] with the two norms hoisted by the CALLER — computed
    * once per join-INPUT row instead of once per candidate pair, a ~3×
    * flop cut wherever pair volume ≫ row volume (the brute-force cross,
    * the cell self-join). `vec_dot/(norm·norm)` is bit-identical to
    * `vec_cosine` (same accumulation order — see [[graft.functions
    * .FloatVecDot]]), so oracle parity is unaffected.
    */
  private[operators] def withCosineHoisted(
      df: DataFrame, aCol: String, bCol: String,
      aNorm: String, bNorm: String, keep: Seq[String]): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select((keep.map(col) :+
      expr(s"vec_dot(`$aCol`, `$bCol`) / (`$aNorm` * `$bNorm`)").as("cosine")): _*)
  }

  /** Deterministic random hyperplanes (seeded), inlined as literals. */
  private[operators] def hyperplanes(dim: Int, nBits: Int, seed: Long): Seq[Seq[Double]] = {
    val r = new Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(r.nextGaussian()))
  }

  /** Sign-LSH bucket id: bit i = sign of dot(vec, hyperplane_i). */
  def signBucketExpr(vecCol: String, dim: Int, nBits: Int, seed: Long): String = {
    val planes = hyperplanes(dim, nBits, seed)
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val lits = p.map(v => f"CAST($v%.17g AS DOUBLE)").mkString(", ")
      s"""CASE WHEN aggregate(zip_with($vecCol, array($lits),
         |  (x, h) -> CAST(x AS DOUBLE) * h), CAST(0 AS DOUBLE), (acc, v) -> acc + v) > 0
         |  THEN shiftleft(1L, $i) ELSE 0L END""".stripMargin
    }
    bits.mkString("(", " + ", ")")
  }

  /** (id, vec, bucket per table) computed partition-wise in compiled code —
    * the SQL sign-bucket expression runs interpreted (higher-order
    * functions are CodegenFallback) and dominates wall-clock once tables ×
    * nBits × dim grows. Hyperplanes are identical to [[signBucketExpr]]'s
    * (same seeded RNG), so the two formulations bucket identically.
    */
  private[operators] def withSignBuckets(
      df: DataFrame, vecCol: String, idCol: String,
      dim: Int, nBits: Int, tables: Int, seed: Long): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    val planesPerTable: Array[Array[Array[Double]]] =
      (0 until tables).map(t =>
        hyperplanes(dim, nBits, seed + t).map(_.toArray).toArray).toArray
    val in = df.select(col(idCol), col(vecCol))
    val idType = in.schema(idCol).dataType
    val vecType = in.schema(vecCol).dataType
    val out = StructType(Seq(
      StructField(idCol, idType), StructField(vecCol, vecType),
      StructField("__buckets", ArrayType(LongType))))
    in.mapPartitions { it =>
      it.map { r =>
        val vec = r.getSeq[Float](1)
        val v = new Array[Double](vec.length)
        var i = 0
        while (i < v.length) { v(i) = vec(i).toDouble; i += 1 }
        val buckets = new Array[Long](tables)
        var t = 0
        while (t < tables) {
          val planes = planesPerTable(t)
          var bucket = 0L
          var b = 0
          while (b < nBits) {
            val p = planes(b)
            var dot = 0.0
            var j = 0
            val d = math.min(p.length, v.length)
            while (j < d) { dot += v(j) * p(j); j += 1 }
            if (dot > 0) bucket |= (1L << b)
            b += 1
          }
          buckets(t) = bucket
          t += 1
        }
        Row(r.get(0), r.get(1), buckets.toSeq)
      }
    }(RowEncoder.encoderFor(out))
  }

  /** Brute-force cosine top-k for a query set against the corpus.
    * `queries` is broadcast (small side); ranking is deterministic
    * (score desc, corpus id asc); self-matches excluded.
    */
  def cosineTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    // norms hoisted out of the |queries|×|corpus| cross (see
    // withCosineHoisted): one per corpus row, one per broadcast query row
    val joined = corpus.withColumn("__cn", expr(s"vec_norm(`$vecCol`)")).as("c")
      .join(broadcast(
          queries.withColumn("__qn", expr(s"vec_norm(`$vecCol`)")).as("q")),
        col(s"q.$idCol") =!= col(s"c.$idCol"))
      .select(
        col(s"q.$idCol").as("query_id"),
        col(s"c.$idCol").as("match_id"),
        col(s"q.$vecCol").as("__qv"),
        col(s"c.$vecCol").as("__cv"),
        col("__qn"), col("__cn"))
    withCosineHoisted(joined, "__qv", "__cv", "__qn", "__cn",
        Seq("query_id", "match_id"))
      .withColumn("cosine", expr("round(cosine, 6)"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("match_id"))))
      .filter(col("rank") <= k)
  }

  /** Brute-force cosine top-k over int8-QUANTIZED vectors
    * ([[graft.functions.FloatVecQuantizeQ8]] maxabs symmetric
    * quantization): cosine is scale-invariant per vector, so the
    * per-vector scale drops out and scoring runs
    * [[graft.functions.I8VecCosine]] directly on the ARRAY<TINYINT>
    * forms — 4× smaller storage/shuffle than FLOAT at 100 TB embedding
    * scale, exact integer dot/norm accumulation (engine-order
    * independent), and the same broadcast-queries single-scan plan as
    * [[cosineTopK]]. Ranking quality degrades only by the quantization
    * error (q_q8_recall_bounds gates recall vs full precision).
    */
  def cosineTopKQ8(
      corpus: DataFrame, queries: DataFrame, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    def quantized(df: DataFrame) =
      df.select(col(idCol), expr(s"vec_quantize_q8(`$vecCol`)").as("__q"))
    quantized(corpus).as("c")
      .join(broadcast(quantized(queries).as("q")),
        col(s"q.$idCol") =!= col(s"c.$idCol"))
      .select(
        col(s"q.$idCol").as("query_id"),
        col(s"c.$idCol").as("match_id"),
        expr("round(vec_cosine_i8(`q`.`__q`, `c`.`__q`), 6)").as("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("match_id"))))
      .filter(col("rank") <= k)
  }

  /** A fitted IVF index: the coarse-quantizer centroids (tiny — lives on
    * the driver / in task closures) plus the cell-assigned corpus. The
    * FAISS IVF discipline is train-once / probe-many: fit the index with
    * [[ivfFit]] (expensive — an iterative KMeans job plus one corpus
    * assignment pass), persist or materialize `assigned` (it is a plain
    * DataFrame — `persist()` it across query batches, or write it
    * bucketed by `__cell` as the 100 TB form), then serve every query
    * batch through [[cosineTopKIvfProbe]], which only joins against the
    * probed cells and never re-clusters.
    *
    * LIFECYCLE: [[ivfFit]] does NOT persist `assigned`; if the caller
    * persists it (the recommended serve-many form), the caller also owns
    * releasing that cache — call [[IvfIndex.close]] (or
    * `assigned.unpersist()`) when the index is retired. Nothing else in
    * the index holds executor resources: `centroids` is a plain driver
    * array.
    */
  final case class IvfIndex(
      centroids: Array[Array[Double]], assigned: DataFrame,
      vecCol: String, idCol: String) {
    /** Releases the `assigned` cache if the caller persisted it (no-op
      * otherwise — `unpersist` on an unpersisted DataFrame is safe).
      * Non-blocking; the index is unusable for probes only in the sense
      * that subsequent probes recompute the assignment lineage. */
    def close(): Unit = { assigned.unpersist(false); () }
  }

  /** Corpus-size-derived list/cluster count for the coarse quantizers
    * ([[ivfFit]] nLists, `Dedup.semanticDedup` nClusters): the smallest
    * k that keeps expected cell occupancy at or under
    * `targetOccupancy`, floored at 16 (a toy corpus gains nothing from
    * fewer) and capped at 65536 (a Spark KMeans with more centroids
    * than that is the wrong tool — past the cap, occupancy grows again
    * and a two-level / hierarchical coarse quantizer is the real
    * answer, which is out of scope here and documented instead).
    *
    * Why occupancy is the control variable: within-cell verification
    * work is occupancy² per cell ⇒ n·occupancy/2 total — LINEAR in
    * corpus size when occupancy is pinned, vs the quadratic n²/k of a
    * fixed k. 256 keeps a cell's pair block at ~32k cosines (a small
    * task) while keeping k = n/256 low enough that the sampled KMeans
    * fit (FAISS trains on ~30–256 vectors per centroid) stays
    * tractable until the cap.
    */
  def autoNLists(n: Long, targetOccupancy: Int = 256): Int = {
    require(targetOccupancy > 0, "targetOccupancy must be positive")
    val k = (n + targetOccupancy - 1) / targetOccupancy
    math.min(65536L, math.max(16L, k)).toInt
  }

  /** Fits the IVF coarse quantizer and assigns every corpus row to its
    * cell. Run ONCE per corpus; reuse the returned index across query
    * batches (r2 re-ran this inside every query invocation — the
    * scale-killer this split removes). `assigned` comes back UNPERSISTED;
    * a caller that persists it for probe reuse owns the matching
    * `unpersist` — see [[IvfIndex.close]].
    *
    * `nLists <= 0` derives the list count from the corpus row count via
    * [[autoNLists]] (one count() against the corpus — metadata-cheap on
    * parquet sources).
    */
  def ivfFit(
      corpus: DataFrame,
      vecCol: String = "embedding", idCol: String = "vec_id",
      nLists: Int = 16, seed: Long = 42L,
      fitSampleFraction: Double = 1.0,
      targetOccupancy: Int = 256): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(fitSampleFraction > 0 && fitSampleFraction <= 1.0,
      "fitSampleFraction must be in (0, 1]")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    // SPHERICAL k-means: every consumer of this index (IVF ANN probes,
    // multi-probe SemDeDup) scores by COSINE, so the coarse quantizer
    // must partition by angle, not raw L2 — fit and assign on
    // unit-normalized vectors (the FAISS inner-product-IVF / published
    // SemDeDup practice). Raw-L2 cells scatter a cosine-close pair with
    // unequal norms into unrelated cells with unrelated centroid
    // orderings, which is precisely the multi-probe recall killer (at
    // sf3 — norms 0.73–2.96 — raw-L2 cells left 76 of 1125 true dup
    // pairs unreachable at probes=4; unit-sphere cells: 0). Stored
    // vectors stay RAW; exact cosine verification is norm-invariant.
    val featured = corpus.select(col(idCol), col(vecCol))
      .withColumn("__nrm", expr(s"vec_norm(`$vecCol`)"))
      .withColumn("__v", array_to_vector(expr(
        s"""CASE WHEN __nrm = 0 THEN `$vecCol`
           | ELSE transform(`$vecCol`,
           |   x -> CAST(CAST(x AS DOUBLE) / __nrm AS FLOAT)) END""".stripMargin)))
    val k = if (nLists > 0) nLists else autoNLists(corpus.count(), targetOccupancy)
    // At 100 TB the KMeans fit must run on a sample — centroid quality
    // converges long before the full corpus is seen (FAISS trains IVF on
    // ~{30-256}×nLists vectors); assignment still covers every row.
    val fitInput =
      if (fitSampleFraction >= 1.0) featured
      else featured.sample(withReplacement = false, fitSampleFraction, seed)
    val model = new KMeans().setK(k).setSeed(seed)
      .setFeaturesCol("__v").setPredictionCol("__cell").fit(fitInput)
    val assigned = model.transform(featured)
      .select(col(idCol), col(vecCol), col("__cell"))
    IvfIndex(model.clusterCenters.map(_.toArray), assigned, vecCol, idCol)
  }

  /** Probe path of IVF ANN top-k: each query batch touches only its
    * `nProbe` nearest cells of a previously fitted [[IvfIndex]] —
    * candidate generation is an equi-join on cell id (shuffle-on-key, no
    * cartesian; broadcast on the exploded query side). No clustering and
    * no corpus re-assignment happens here.
    */
  /** Top-`nProbe` nearest-cell assignment against a driver-side centroid
    * array, compiled row-local (the centroid array is tiny and ships in
    * the closure) — SHARED by the IVF ANN probe and multi-probe SemDeDup
    * ([[graft.operators.Dedup.semanticDedupProbed]]) so the two paths'
    * distance/tie conventions cannot drift. Emits (idCol, vecCol,
    * `__cells` ARRAY<INT>).
    */
  private[operators] def probeCells(
      df: DataFrame, centroids: Array[Array[Double]],
      vecCol: String, idCol: String, nProbe: Int): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    val in = df.select(col(idCol), col(vecCol))
    val out = StructType(Seq(
      StructField(idCol, in.schema(idCol).dataType),
      StructField(vecCol, in.schema(vecCol).dataType),
      StructField("__cells", ArrayType(IntegerType))))
    in.mapPartitions { it =>
      it.map { r =>
        val vec = r.getSeq[Float](1)
        // unit-normalize before ranking — the centroids live on the unit
        // sphere ([[ivfFit]] fits spherical k-means), so cell distance
        // must be measured from the SAME normalized point KMeans assigned
        // (a raw-norm query would rank cells by magnitude, not angle)
        var nsq = 0.0
        var i = 0
        while (i < vec.length) { nsq += vec(i).toDouble * vec(i).toDouble; i += 1 }
        val n = math.sqrt(nsq)
        val unit = new Array[Float](vec.length)
        i = 0
        while (i < vec.length) {
          // same arithmetic as ivfFit's SQL normalizer (CAST(x AS
          // DOUBLE) / norm, rounded to FLOAT) so assignment and probe
          // rank cells from bit-identical points
          unit(i) = if (n == 0) vec(i) else (vec(i).toDouble / n).toFloat
          i += 1
        }
        // bounded top-k selection: O(C·nProbe) per row instead of the
        // full O(C log C) sort — at 100 TB the coarse quantizer holds
        // ~sqrt(N) cells (tens of thousands), and nProbe stays ≤ ~16, so
        // materializing + sorting every distance is the probe hot loop's
        // avoidable cost. Ties keep ascending centroid order (strict
        // comparisons on both the reject and the shift), bit-identical
        // to the stable sortBy(_._1) this replaces.
        val nSel = math.min(nProbe, centroids.length)
        val selD = new Array[Double](nSel)
        val selC = new Array[Int](nSel)
        var held = 0
        var c = 0
        while (c < centroids.length) {
          val ctr = centroids(c)
          var d = 0.0
          var j = 0
          val dim = math.min(ctr.length, unit.length)
          while (j < dim) { val t = unit(j) - ctr(j); d += t * t; j += 1 }
          if (held < nSel || d < selD(held - 1)) {
            var pos = if (held < nSel) held else held - 1
            while (pos > 0 && selD(pos - 1) > d) {
              selD(pos) = selD(pos - 1); selC(pos) = selC(pos - 1); pos -= 1
            }
            selD(pos) = d; selC(pos) = c
            if (held < nSel) held += 1
          }
          c += 1
        }
        Row(r.get(0), r.get(1), selC.take(held).toIndexedSeq)
      }
    }(RowEncoder.encoderFor(out))
  }

  def cosineTopKIvfProbe(
      index: IvfIndex, queries: DataFrame, k: Int, nProbe: Int = 4): DataFrame = {
    val IvfIndex(centroids, assigned, vecCol, idCol) = index
    val probed = probeCells(queries, centroids, vecCol, idCol, nProbe)

    val q = probed.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      explode(col("__cells")).as("__cell"))
    val pairs = assigned.as("c").join(broadcast(q.as("q")),
        col("q.__cell") === col("c.__cell") &&
          col("q.query_id") =!= col(s"c.$idCol"))
      .select(col("query_id"), col(s"c.$idCol").as("match_id"),
        col("__qv"), col(s"c.$vecCol").as("__cv"))
    withCosine(pairs, "__qv", "__cv", Seq("query_id", "match_id"))
      .withColumn("cosine", expr("round(cosine, 6)"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("match_id"))))
      .filter(col("rank") <= k)
  }

  /** One-shot convenience: [[ivfFit]] + [[cosineTopKIvfProbe]]. Pays the
    * KMeans fit per call — for repeated batches fit once and probe.
    */
  def cosineTopKIvf(
      corpus: DataFrame, queries: DataFrame, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id",
      nLists: Int = 16, nProbe: Int = 4, seed: Long = 42L,
      fitSampleFraction: Double = 1.0): DataFrame =
    cosineTopKIvfProbe(
      ivfFit(corpus, vecCol, idCol, nLists, seed, fitSampleFraction),
      queries, k, nProbe)

  /** Multi-table sign-LSH ANN top-k: `tables` independent hyperplane sets;
    * a corpus row is a candidate when it collides with the query in ANY
    * table. Per-table collision probability for angle θ is (1 - θ/π)^nBits,
    * so recall ≈ 1 - (1 - p)^tables — tune `nBits` down / `tables` up for
    * weakly-similar corpora, up/down for near-duplicate search. Candidate
    * generation is a bucket equi-join per table (union of `tables` joins);
    * the corpus never self-joins, so the plan scales linearly in corpus
    * size.
    */
  def cosineTopKLsh(
      corpus: DataFrame, queries: DataFrame, k: Int,
      vecCol: String = "embedding", idCol: String = "vec_id",
      dim: Int = 64, nBits: Int = 8, tables: Int = 8, seed: Long = 42L): DataFrame = {
    // compiled bucket computation (see withSignBuckets), fanned out with
    // posexplode; candidate join carries ids only, vectors rejoin after
    val c = withSignBuckets(corpus, vecCol, idCol, dim, nBits, tables, seed)
      .select(col(idCol), posexplode(col("__buckets")).as(Seq("__table", "__bucket")))
    val q = withSignBuckets(queries, vecCol, idCol, dim, nBits, tables, seed)
      .select(col(idCol), posexplode(col("__buckets")).as(Seq("__table", "__bucket")))
    val candidates = c.as("c").join(broadcast(q.as("q")),
        col("q.__table") === col("c.__table") && col("q.__bucket") === col("c.__bucket") &&
          col(s"q.$idCol") =!= col(s"c.$idCol"))
      .select(col(s"q.$idCol").as("query_id"), col(s"c.$idCol").as("match_id"))
      .dropDuplicates("query_id", "match_id")
    val pairs = candidates
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))), "query_id")
      .join(corpus.select(col(idCol).as("match_id"), col(vecCol).as("__cv")), "match_id")
    withCosine(pairs, "__qv", "__cv", Seq("query_id", "match_id"))
      .withColumn("cosine", expr("round(cosine, 6)"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("match_id"))))
      .filter(col("rank") <= k)
  }

  /** Deterministic ±1 sign for projection cell (i → j): parity of the
    * first hex digit of `md5("i_j")`. md5-quality mixing, computed ONCE
    * per matrix cell at plan-build time (never per row), and trivially
    * reproducible in any engine with md5 — which is what lets the oracle
    * SQL inline the identical matrix.
    */
  def projSign(i: Int, j: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${i}_$j".getBytes("UTF-8"))
    if (((d(0) >> 4) & 1) == 0) 1 else -1
  }

  /** Signed random projection (Achlioptas/JL): reduce `inDim`-float
    * embeddings to `outDim` integer components, `p_j = Σ_i s_ij ·
    * round(e_i · 1e6)` with `s_ij ∈ {±1}` from [[projSign]]. The JL
    * lemma gives distance preservation within ~1/√outDim distortion —
    * the cheap dimension cut a 100 TB pipeline runs BEFORE LSH/IVF so
    * every downstream distance costs outDim, not inDim, multiplies.
    *
    * Execution shape: the sign matrix is inDim·outDim compile-time
    * LITERALS folded into one projection expression — per-row codegen'd
    * arithmetic, zero shuffles, zero extra scans, nothing broadcast.
    * Components quantize to micro-units BEFORE summation, so every
    * engine computes the identical BIGINT (float Σ-order divergence is
    * the reason sums are banned on raw floats — the
    * `TextAnalysis.unigramSurprise` discipline); `|p_j| ≤ inDim · 1e6 ·
    * max|e|`, nowhere near overflow. Emitted LONG (`vec_id, dim,
    * p_micro`) — array-free compare, hash-gated (q_random_projection,
    * oracle inlines the same matrix as VALUES).
    */
  def randomProject(
      embeddings: DataFrame, inDim: Int, outDim: Int,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    require(inDim > 0 && outDim > 0, "dims must be positive")
    val comps = (0 until outDim).map { j =>
      val terms = (0 until inDim).map { i =>
        val s = if (projSign(i, j) > 0) "+" else "-"
        s"$s CAST(round(CAST($vecCol[$i] AS DOUBLE) * 1000000) AS BIGINT)"
      }.mkString(" ")
      s"($terms) AS __p$j"
    }
    embeddings.selectExpr(Seq(s"$idCol") ++ comps: _*)
      .select(col(idCol),
        posexplode(array((0 until outDim).map(j => col(s"__p$j")): _*)))
      .withColumnRenamed("pos", "dim")
      .withColumnRenamed("col", "p_micro")
  }
}
