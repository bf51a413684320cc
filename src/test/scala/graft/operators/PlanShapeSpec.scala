package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Executable scale evidence: pins the number of full-data shuffle
  * exchanges in each operator's physical plan (see SCALE.md's shuffle
  * budget). A regression that adds an exchange — a lost partitioning
  * reuse, an agg that stopped being partial, a broadcast that silently
  * became a shuffle join on the small fixtures — fails here long before a
  * bench run would catch it. Broadcast exchanges are NOT counted: they are
  * dimension-sized by design and their selection is stats-driven.
  */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-planshape-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sfDir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private def embeds = spark.read.parquet(s"$sfDir/embeddings.parquet")
  private def events = graft.streaming.Events.readEvents(spark, s"$sfDir/events.parquet")

  /** Shuffle exchanges in the planned physical tree (broadcasts excluded). */
  private def shuffles(df: DataFrame): Int =
    "Exchange (hash|range|Single|round)".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  test("scan-shaped operators plan ZERO shuffles") {
    assert(shuffles(TextAnalysis.textStats(docs)) == 0)
    assert(shuffles(TextAnalysis.langId(docs)) == 0)
    assert(shuffles(TextAnalysis.qualityScore(docs)) == 0)
    assert(shuffles(TextAnalysis.gopherRules(docs)) == 0)
    assert(shuffles(TextAnalysis.c4Rules(docs)) == 0)
    assert(shuffles(TextAnalysis.fineWebRules(docs)) == 0)
    // HTML boilerplate extraction: the crawl pipeline's highest-traffic
    // operator is one codegen projection — the scan is the only cost
    assert(shuffles(TextAnalysis.htmlExtract(
      TextAnalysis.syntheticHtmlFromDocs(docs))) == 0)
    // profile-dispatched variant: the per-row lang lookup adds NO plan
    // change — still one codegen projection
    assert(shuffles(TextAnalysis.htmlExtractLang(
      TextAnalysis.syntheticHtmlMultiFromDocs(docs))) == 0)
    // GPT-2 pre-tokenized BPE budget: sentinel pre-pass + split + merge
    // chain all inside one projection
    assert(shuffles(TextAnalysis.bpeTokenCountsGpt2(docs)) == 0)
    // compressed-audio header decode: mapPartitions byte walk,
    // scan-shaped like the WAV decode
    assert(shuffles(Multimodal.decode(
      Multimodal.syntheticAudioFormatsFromDocs(docs))) == 0)
    // WARC ingest: record walk + HTTP envelope + html_extract is one
    // zero-shuffle projection chain — binary never crosses an exchange
    assert(shuffles(Warc.warcExtractQuery(docs)) == 0)
    // WAV decode: mapPartitions (streamed byte parse) but scan-shaped —
    // audio bytes never cross an exchange
    assert(shuffles(Audio.wavStats(Audio.syntheticWavFromDocs(docs))) == 0)
    assert(shuffles(TextAnalysis.fingerprint(docs)) == 0)
    assert(shuffles(TextAnalysis.assignSplit(docs,
      Seq("train" -> 0.8, "val" -> 0.2))) == 0)
    assert(shuffles(TextAnalysis.stratifiedSampleHash(docs, "lang",
      Map("en" -> 0.5))) == 0)
    assert(shuffles(Packing.packSequences(docs, 256)) == 0)
    assert(shuffles(Packing.chunkDocuments(docs, 32, 4)) == 0)
    assert(shuffles(Dedup.winnowFingerprints(docs)) == 0)
    assert(shuffles(TextAnalysis.bpeTokenCounts(docs)) == 0)
    assert(shuffles(TextAnalysis.piiScrub(docs)) == 0)
    assert(shuffles(TextAnalysis.urlCanonicalize(docs.select(col("doc_id"),
      expr("concat('https://e.org/', doc_id)").as("url")))) == 0)
    assert(shuffles(TextAnalysis.unicodeClean(docs)) == 0)
    // signed random projection: sign matrix is compile-time literals in
    // ONE codegen projection; posexplode is per-row fan-out, no exchange
    assert(shuffles(Similarity.randomProject(embeds, 64, 8)) == 0)
    // pixel decode: mapPartitions (ImageIO needs objects) but still a
    // single scan-shaped stage — binary never crosses an exchange
    assert(shuffles(Multimodal.decodePixels(
      Multimodal.syntheticImagesFromDocs(docs))) == 0)
  }

  test("single-shuffle aggregations stay single-shuffle") {
    assert(shuffles(TextAnalysis.tokenLengthHistogram(docs, 16)) == 1)
    assert(shuffles(graft.streaming.Events.sessionizeBatch(events)) == 1)
    // hopping windows: the 4× window explode happens BEFORE the exchange
    // (a per-row projection), so the slide factor costs no extra shuffle
    assert(shuffles(graft.streaming.Events.hourlyHopStats(events)) == 1)
    assert(shuffles(graft.streaming.Events.sessionWindowStats(events)) == 1)
    // as-of join: union is exchange-free, ONE window exchange carries the
    // match — never a range explosion or per-key quadratic theta join.
    // forward flips the sort order only; nearest runs BOTH window passes
    // over the same hash exchange (two sorts, still one shuffle)
    for (dir <- Seq("backward", "forward", "nearest"))
      assert(shuffles(AsOf.asOfJoin(
        events.select("event_id", "user_id", "ts"),
        events.select(col("user_id"), col("ts"), col("value")),
        on = Seq("user_id"), direction = dir)) == 1, s"direction=$dir")
  }

  test("rollingEventFeatures: both windows share ONE user-key exchange") {
    val plan = Features.rollingEventFeatures(events).queryExecution
      .executedPlan.toString
    // two Window nodes (range frame + lag), but the same hashpartitioning
    // (user_id) exchange feeds both — a second exchange means the lag
    // window stopped reusing the range window's partitioning
    assert(shuffles(Features.rollingEventFeatures(events)) == 1)
    assert("\\bWindow\\b".r.findAllIn(plan).length == 2)
  }

  test("categoricalDrift: join reuses groupBy partitioning; totals branch reuses the counts") {
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    val even = docs.filter(expr("doc_id % 2 = 0"))
    val odd = docs.filter(expr("doc_id % 2 = 1"))
    val drift = Stats.categoricalDrift(even, odd, "source")
    drift.collect() // materialize so AQE settles the final stage graph
    val nodes = walk(drift.queryExecution.executedPlan)
    // budget: one key exchange per slice's two-phase count (the full-outer
    // join consumes the groupBy partitioning DIRECTLY — no re-exchange)
    // + the 1-row totals SinglePartition; the totals branch's duplicated
    // count subtrees must collapse to ReusedExchange, and totals attach
    // as a broadcast, never a shuffle
    assert(nodes.collect { case s: ShuffleExchangeLike => s }.size == 3,
      "budget: count(a) + count(b) + totals scalar")
    assert(nodes.collect { case r: ReusedExchangeExec => r }.size == 2,
      "totals branch must reuse both slice-count exchanges, not re-scan")
    assert(!nodes.exists(_.nodeName.contains("Window")),
      "drift must not window anything")
  }

  test("topFraction: corpus is filtered, never sorted/windowed/shuffled") {
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    val tf = Stats.topFraction(docs.select("doc_id", "n_chars"), "n_chars", 0.2)
    tf.collect()
    val nodes = walk(tf.queryExecution.executedPlan)
    // every exchange feeds the HISTOGRAM branch (distinct-score relation):
    // the two-phase score count, the cum-window SinglePartition, and the
    // total-count SinglePartition (its duplicated histogram subtree must
    // collapse to ReusedExchange); the corpus side is scan →
    // broadcast-filter — a corpus-side sort or window here is the global
    // top-N anti-pattern this operator exists to avoid
    assert(nodes.collect { case s: ShuffleExchangeLike => s }.size == 3,
      "budget: score histogram + cum window + total scalar")
    assert(nodes.collect { case r: ReusedExchangeExec => r }.nonEmpty,
      "total-count branch must reuse the histogram exchange")
    val corpusWindows = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if !w.child.toString.contains("HashAggregate") => w
    }
    assert(corpusWindows.isEmpty, "only the histogram may be windowed")
    assert(nodes.exists(n => n.nodeName.contains("BroadcastNestedLoopJoin")),
      "the cutoff must attach as a broadcast scalar")
  }

  test("topKPerGroup: two bounded ranking exchanges, never one corpus-group window") {
    val tk = Ranking.topKPerGroup(
      docs.select("doc_id", "source", "n_chars"),
      Seq("source"), "n_chars", "doc_id", k = 3, salts = 4)
    // phase 1 partitions by (group, salt) — tasks are groupSize/salts;
    // phase 2 partitions by group over ≤ k·salts survivors per group.
    // Budget: exactly those two exchanges (both windows sort locally)
    assert(shuffles(tk) == 2)
    val plan = tk.queryExecution.executedPlan.toString
    assert("hashpartitioning\\(source[#0-9L]*, __salt".r
      .findAllIn(plan).nonEmpty, "phase 1 must partition by (group, salt)")
  }

  test("retentionCohorts: two aggregations, no join, no window") {
    val rc = Features.retentionCohorts(events)
    val plan = rc.queryExecution.executedPlan.toString
    // user agg (collect_set bounded by the calendar) + the cohort-matrix
    // agg; the user→cohort attach rides the first aggregation — a join
    // or window here means the single-pass shape regressed
    assert(shuffles(rc) == 2)
    assert(!plan.contains("Join"), "retention must not join")
    assert(!plan.contains("Window"), "retention must not window")
  }

  test("funnel: k stages share ONE user-key partitioning — k exchanges, no more") {
    // under broadcast-off (the 100 TB shuffled-join topology) each
    // stage's min-agg exchanges on user_id once and every join consumes
    // that partitioning — a (k+1)th full-data exchange means a stage
    // stopped reusing it. The k single-row count aggregates at the end
    // are SinglePartition exchanges over one row each, not corpus data.
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val f = Features.funnel(events, Seq("view", "click", "purchase"))
      f.collect() // materialize so AQE settles reuse across union branches
      val nodes = walk(f.queryExecution.executedPlan)
      val userExchanges = nodes.collect {
        case s: ShuffleExchangeLike
          if s.outputPartitioning.toString.contains("user_id") => s
      }
      assert(userExchanges.size == 3,
        s"3 stages must EXECUTE exactly 3 user-key exchanges (one per " +
          s"shrinking event slice), saw ${userExchanges.size}")
      // the union's count branches re-state the chain prefix; those
      // duplicated subtrees must collapse to ReusedExchange, not re-run
      assert(nodes.collect { case r: ReusedExchangeExec => r }.size >= 3,
        "chain-prefix subtrees must reuse, not recompute")
      // each stage aggregation rides its join's partitioning: the min-agg
      // after a join must NOT introduce an exchange (visible as exactly
      // one exchange per stage above, none between join and agg)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("labelCentroids: one two-phase aggregation on labels x dims") {
    assert(shuffles(Stats.labelCentroids(embeds)) == 1)
  }

  test("attribution batch join inherits the bucketed hash-join shape") {
    val plan = graft.streaming.Events.attributionJoinBatch(events.select(
        col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "attribution must route through the bucketed range join")
  }

  test("quantile sketch aggregates in two phases — one shuffle, no sort") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val df = li
      .withColumn("price_cents",
        expr("CAST(round(l_extendedprice * 100) AS LONG)"))
      .groupBy("l_returnflag")
      .agg(expr("percentile_approx(price_cents, array(0.25D, 0.5D), 10000)")
        .as("approx_cents"))
    assert(shuffles(df) == 1,
      "sketch must merge per-partition state through one exchange")
    assert(!df.queryExecution.executedPlan.toString.contains("Sort "),
      "the sketch path must not global-sort the data")
  }

  test("rangeJoin is a hash join on (keys, bucket) — never a nested loop") {
    val sessions = graft.streaming.Events.sessionizeBatch(events)
    val plan = AsOf.rangeJoin(
      events.select("event_id", "user_id", "ts"), sessions,
      on = Seq("user_id"), startCol = "session_start", endCol = "session_end",
      payload = Seq("session_seq"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "range join must bucketize into a hash join, not a nested loop")
  }

  test("staged aggregations plan exactly their documented budget") {
    // (doc,token) agg + token agg
    assert(shuffles(TextAnalysis.vocabulary(docs)) == 2)
    // strata agg + single-partition window over the (tiny) aggregated strata
    assert(shuffles(TextAnalysis.mixReport(docs)) == 2)
    // explode is exchange-free; the domain agg pays the distinct-doc
    // expand: (domain, doc) partial + domain final
    assert(shuffles(TextAnalysis.domainStats(docs)) == 2)
    // distinct-agg expand: (hour,type,user) partial + (hour,type) final
    assert(shuffles(graft.streaming.Events.hourlyStatsBatch(events)) == 2)
    // (doc, n-gram) agg + per-doc rollup — no corpus-level state at all
    assert(shuffles(TextAnalysis.ngramRepetition(docs, n = 3)) == 2)
  }

  /** Expands AdaptiveSparkPlan + query stages into the real executed tree. */
  private def walk(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val here = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => Seq(q) ++ walk(q.plan)
      case other => Seq(other)
    }
    here ++ p.children.flatMap(walk)
  }

  test("exact dedup: group-stats join, no hash window, totals exchange reused") {
    // the hash-WINDOW form was one exchange, but its hot-group partition
    // (a million-copy boilerplate page — dedup's core use case) was one
    // unsplittable window task. The group-stats-join form runs the
    // skew-immune two-phase totals aggregation ONCE (head and tail
    // branches share it via ReusedExchange) plus the probe exchange for
    // the tail rejoin — whose skewed partitions AQE's skew-join splitting
    // can break up, structurally impossible for a window.
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.window.WindowExec
    // headMinDupes = 2 so BOTH routing paths are live on the fixture
    // (with an empty head AQE folds the broadcast join into a null
    // projection — a fine plan, but not the one under test)
    val df = Dedup.exact(docs, headMinDupes = 2L)
    df.collect()
    val nodes = walk(df.queryExecution.executedPlan)
    assert(nodes.collect { case w: WindowExec => w }.isEmpty,
      "exact dedup must not window-partition by content hash")
    // budget is an UPPER bound: totals agg + the tail-probe exchange; at
    // fixture scale AQE's runtime stats convert the tail join to a
    // broadcast too and the probe never shuffles at all (at 100 TB the
    // tail stays a shuffled join — whose skew AQE can split)
    val ex = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(ex.size <= 2, s"budget: totals agg + tail-probe exchange, got ${ex.size}")
    assert(nodes.collect { case r: ReusedExchangeExec => r }.nonEmpty,
      "head and tail branches must share one totals aggregation")
  }

  test("winnowPairs: self-join sides share ONE fingerprint subtree at scale") {
    // at fixture scale AQE broadcasts the b-side and prunes the empty hot
    // set, hiding the 100 TB topology. Forcing the shuffled join exposes
    // it: both sides of the fp self-join must hash-exchange the SAME
    // (scan → winnow → anti-join) subtree, so ReusedExchange collapses
    // them to ONE corpus scan + winnow computation — the hot-df agg scan
    // is the only other scan. Without reuse the expensive rolling-hash
    // projection runs twice over the corpus.
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Dedup.winnowPairs(docs, minShared = 1, maxFpFreq = 5)
      df.collect()
      val nodes = walk(df.queryExecution.executedPlan)
      assert(nodes.collect { case r: ReusedExchangeExec => r }.nonEmpty,
        "self-join sides must reuse one fingerprint exchange")
      assert(nodes.count(_.nodeName.contains("Scan")) <= 2,
        "one corpus scan for the shared cool subtree + one for hot-df")
      assert(nodes.collect { case w: WindowExec => w }.isEmpty)
      val s = df.queryExecution.executedPlan.toString
      assert(!s.contains("CartesianProduct") &&
        !s.contains("BroadcastNestedLoopJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("lineDedup: frequency-routed marking, bounded budget, no windows") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.window.WindowExec
    val df = Dedup.lineDedup(
      docs.withColumn("text",
        concat(col("text"), lit("\nSHARED FOOTER "),
          (col("doc_id") % 3).cast("string"))),
      minDocFreq = 2, headMinDf = 10L)
    df.collect()
    val nodes = walk(df.queryExecution.executedPlan)
    assert(nodes.collect { case w: WindowExec => w }.isEmpty,
      "line dedup must not window on the line key")
    // upper bound: (line,doc) distinct + line-df agg + mid-range probe
    // exchange + per-doc reassembly (AQE may broadcast the mid-range set
    // away at fixture scale)
    assert(nodes.collect { case s: ShuffleExchangeLike => s }.size <= 4)
  }

  test("token corpus totals never window-partition by token (Zipf skew)") {
    // VERDICT r6 "What's wrong" #1: a Window.partitionBy("token") buffers
    // one row per containing document in a single task — corpus-sized for
    // a Zipf-head stopword at 100 TB. topTerms/unigramSurprise instead
    // route totals through joinTokenTotals (two-phase agg + frequency-
    // routed broadcast/tail rejoin). Executed-plan budget per operator:
    // the (doc, token) agg, the token totals agg (REUSES the (doc, token)
    // exchange — one corpus scan+explode, not two), the final doc_id
    // exchange, and the corpus-scalar SinglePartition exchange; the only
    // windows left partition by doc_id.
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.window.WindowExec
    for (df <- Seq(
        TextAnalysis.topTerms(docs, k = 5, headMinDf = 10L),
        TextAnalysis.unigramSurprise(docs, headMinTf = 10L))) {
      df.collect() // materialize so AQE settles the final stage graph
      val nodes = walk(df.queryExecution.executedPlan)
      val tokenWindows = nodes.collect {
        case w: WindowExec if w.partitionSpec.exists(_.toString.contains("token")) => w
      }
      assert(tokenWindows.isEmpty, "corpus totals must not window on token")
      assert(nodes.collect { case s: ShuffleExchangeLike => s }.size == 4,
        "budget: (doc,token) agg + token totals + doc_id + corpus scalar")
      assert(nodes.collect { case r: ReusedExchangeExec => r }.nonEmpty,
        "totals branch must reuse the (doc,token) exchange, not re-scan")
      assert(nodes.count(_.nodeName.contains("Scan")) == 2,
        "one corpus scan for the shared build + one for the scalar total")
    }
  }

  test("bm25Rank: one corpus scan, stats broadcast scalar, heap top-k") {
    // the whole score is a per-row projection; corpus statistics arrive
    // as a 1-row broadcast aggregate (its SinglePartition exchange is the
    // ONLY shuffle), and the global top-k is TakeOrderedAndProject (per-
    // partition heaps + driver merge of k rows), never a full sort
    val df = TextAnalysis.bm25Rank(docs, Seq("vector", "hash"), k = 10)
    assert(shuffles(df) == 1, "only the 1-row stats aggregate may shuffle")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), "top-k must be heap-based")
    assert(!plan.contains("Sort "), "no global sort of scored documents")
  }

  test("mixResample: thresholds on group-cardinality rows, data broadcast-joined") {
    // the min(c/w) OVER () window runs over per-stratum COUNTS (group
    // cardinality), never data rows — its SinglePartition exchange plus
    // the counts aggregate are the only shuffles; documents themselves
    // join the threshold table via broadcast and are filtered in place
    val df = TextAnalysis.mixResample(docs, "lang",
      Seq("en" -> 0.4, "de" -> 0.2, "fr" -> 0.2, "es" -> 0.2))
    assert(shuffles(df) == 2, "counts agg + tiny window; data rows never shuffle")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("bigramSurprise: ONE corpus scan, four exchanges, no token windows") {
    // both per-type statistics (bigram total, prefix total) are folded
    // into one type-level table before the single frequency-routed join
    // back to per-document rows — composing two routed joins instead
    // multiplies union branches 2×2 (the r7 lesson encoded in
    // routedJoin's scaladoc). Executed-plan budget: (doc, bigram) agg +
    // bigram totals + prefix totals + final doc_id agg; every other
    // consumer must hit ReusedExchange, and the corpus is scanned ONCE
    // (lambda-free bigramPairs + left-join prefix attach + non-nullable
    // substring_index __w1 are each load-bearing for that; see the
    // operator's comments).
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.window.WindowExec
    val df = TextAnalysis.bigramSurprise(docs, headMin = 10L)
    df.collect() // materialize so AQE settles the final stage graph
    val nodes = walk(df.queryExecution.executedPlan)
    assert(nodes.collect { case w: WindowExec => w }.isEmpty,
      "corpus totals must never window on a token-like key")
    assert(nodes.collect { case s: ShuffleExchangeLike => s }.size == 4,
      "budget: (doc,bigram) agg + bigram totals + prefix totals + doc_id agg")
    assert(nodes.collect { case r: ReusedExchangeExec => r }.nonEmpty,
      "probe/totals branches must reuse the (doc,bigram) exchange")
    assert(nodes.count(_.nodeName.contains("Scan")) == 1,
      "one corpus scan feeds every branch")
  }

  test("exact ngram pairs: df-routed cap, NO corpus window, bounded budget") {
    // VERDICT r9 #6: the default n-gram-Jaccard API must be scale-safe —
    // the hot-shingle cap is a two-phase frequency agg + head-broadcast /
    // tail-join anti-mark, never a shingle-partitioned count window (a
    // boilerplate shingle's corpus-scale group would buffer in one task).
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
    val df = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
    val nodes = walk(df.queryExecution.executedPlan)
    assert(nodes.collect { case w: WindowExec => w }.isEmpty,
      "hot-shingle cap must not window over the corpus shingle key")
    assert(nodes.collect { case b: BroadcastExchangeLike => b }.nonEmpty,
      "the head hot set must broadcast")
    // budget: the shingle frequency agg (statically planned once per
    // hot-set branch — the identical subtrees collapse to a
    // ReusedExchange at runtime, same accepted shape as lineDedup) +
    // index side of the tail anti-mark join + pair-intersection agg
    assert(shuffles(df) <= 4)
  }

  test("LSH candidate generation never exceeds its banded budget") {
    assert(shuffles(Dedup.minhashPairs(docs, threshold = 0.5)) <= 3)
    // the maxBandFreq hot-bucket cap windows on the same (band, bucket)
    // key the candidate join shuffles on — tightening it must not add an
    // exchange to the plan
    assert(shuffles(Dedup.minhashPairs(docs, threshold = 0.5, maxBandFreq = 10)) <= 3)
    assert(shuffles(Dedup.minhashPairsAgainst(
      docs, docs.filter(col("doc_id") < 25), threshold = 0.5, maxBandFreq = 10)) <= 4)
    // r14 signature-identical collapse adds the per-signature canonical
    // aggregation (+its class join) ahead of the band join: one exchange
    // on the signature (the join back rides it / broadcasts), the band
    // join pair (b-side reuses a-side), and the pair dedup — and the
    // hamming filter now runs BEFORE the dedup exchange
    assert(shuffles(Dedup.simhashPairs(docs)) <= 5)
    // image dHash pairs: same banded budget as the text SimHash relation —
    // the decode is scan-shaped (binary never shuffles; only (id, hash)
    // rows reach the band join)
    assert(shuffles(Multimodal.imageDupPairs(
      Multimodal.syntheticGridImagesFromDocs(docs))) <= 5)
    // multi-table form: band-rows candidate join (ids only) + distinct +
    // two vector rejoins — tables multiplies candidate ROWS, not exchanges
    assert(shuffles(Dedup.embeddingDupPairs(embeds, threshold = 0.9)) <= 5)
    assert(shuffles(Dedup.embeddingDupPairs(embeds, threshold = 0.9, tables = 16)) <= 5)
    // bipartite decontamination: corpus cap window + overlap agg; the
    // probe index joins via broadcast (asserted non-shuffle)
    assert(shuffles(Dedup.ngramContamination(docs,
      docs.filter(col("doc_id") < 25))) == 2)
    // prefiltered form adds ONLY the probe-membership distinct (a
    // probe-suite-sized exchange): the corpus-side prune must plan as a
    // broadcast semi-join, never a shuffle
    val pf = Dedup.ngramContaminationPrefiltered(docs,
      docs.filter(col("doc_id") < 25))
    assert(shuffles(pf) == 3, "exact budget + one probe-set distinct")
    assert(pf.queryExecution.executedPlan.toString.contains("LeftSemi"),
      "hash-membership prune must be a semi-join")
  }

  test("fuzzyVocabMap: one vocab build feeds both classes via ReusedExchange") {
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    import spark.implicits._
    // the raw sf0.001 fixture has no rare→canon pair, and an empty
    // result lets AQE collapse the whole plan to EmptyRelation before
    // any stage materializes — plant one typo so the stages run
    val corpus = spark.createDataset(Seq(
        (1L, ("table " * 12).trim), (2L, "tble also rare"),
        (3L, ("window " * 11).trim)))
      .toDF("doc_id", "text").repartition(3)
    val df = TextAnalysis.fuzzyVocabMap(corpus, rareMax = 2, canonMin = 10)
    assert(df.collect().nonEmpty)
    val nodes = walk(df.queryExecution.executedPlan)
    // the rare and canonical classes must filter ONE shared vocab
    // aggregation, not rebuild it: AQE dedupes the identical token
    // exchanges into ReusedExchange at runtime
    assert(nodes.collect { case r: ReusedExchangeExec => r }.nonEmpty,
      "vocab subtree must be shared between rare and canonical branches")
    // vocab (2 staged aggs, reused across classes) + pair distinct +
    // the single min_by argmax agg — all keyed on words/variants whose
    // fanout is alphabet-bounded; NO per-side distinct before the join
    // (the pair-level distinct collapses duplicate variants) and NO
    // argmax rejoin (min_by over the (-freq, word) struct)
    assert(nodes.collect { case s: ShuffleExchangeLike => s }.size <= 7,
      "shuffle budget exceeded")
  }

  test("quantileBins: bins from the histogram, corpus broadcast-joined") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val qb = Stats.quantileBins(docs.select("doc_id", "n_chars"), "n_chars", 10)
    qb.collect()
    val nodes = walk(qb.queryExecution.executedPlan)
    // the topFraction discipline: score histogram two-phase agg + cum
    // window SinglePartition + total scalar — every exchange carries the
    // DISTINCT-score relation, never the corpus
    assert(nodes.collect { case s: ShuffleExchangeLike => s }.size == 3,
      "budget: histogram + cum window + total scalar")
    val corpusWindows = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if !w.child.toString.contains("HashAggregate") => w
    }
    assert(corpusWindows.isEmpty, "only the histogram may be windowed")
    assert(nodes.exists(_.nodeName.contains("BroadcastHashJoin")),
      "score->bin map must attach as a broadcast join")
  }

  test("eventTransitions: one user-key window + one bounded-key agg") {
    assert(shuffles(Features.eventTransitions(events)) == 2)
  }

  test("groupedMedian: histogram exchanges only, final agg reuses group keys") {
    val gm = Stats.groupedMedian(docs.select("lang", "n_chars"),
      Seq("lang"), "n_chars")
    // (group, score) two-phase histogram + ONE group-key exchange shared
    // by the cum window, the total window, and the final min-agg — the
    // corpus itself aggregates once, never windows
    assert(shuffles(gm) == 2)
    val corpusWindows = walk(gm.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if !w.child.toString.contains("HashAggregate") => w
    }
    assert(corpusWindows.isEmpty, "only the histogram may be windowed")
  }

  test("snapshotDiff: one skew-free id-key full-outer join, text never shuffles") {
    val old = docs.filter(col("doc_id") % 10 =!= 3)
    val cur = docs.filter(col("doc_id") % 10 =!= 7)
    val sd = CorpusPipeline.snapshotDiff(old, cur)
    assert(shuffles(sd) == 2, "one exchange per snapshot side")
    // the 32-char md5 crosses the exchange, the full text must not
    val exchanges = walk(sd.queryExecution.executedPlan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.forall(!_.child.schema.fieldNames.contains("text")),
      "text column must be hashed scan-side, not shuffled")
  }

  test("hashSamplePerGroup inherits the two-phase ranking budget") {
    // md5 staging is a per-row projection — no exchange beyond the two
    // salted ranking phases
    assert(shuffles(Ranking.hashSamplePerGroup(
      docs.select("doc_id", "source"), Seq("source"), "doc_id", 5, salts = 4)) == 2)
  }

  test("ANN probes: one top-k window exchange, corpus never self-joins") {
    assert(shuffles(Similarity.cosineTopK(embeds,
      embeds.filter(col("vec_id") < 16), k = 5)) == 1)
    // int8-quantized brute force: same broadcast-queries plan — the
    // quantization is a codegen'd projection, not an extra stage
    assert(shuffles(Similarity.cosineTopKQ8(embeds,
      embeds.filter(col("vec_id") < 16), k = 5)) == 1)
    val idx = Similarity.ivfFit(embeds, nLists = 4, seed = 42L)
    assert(shuffles(Similarity.cosineTopKIvfProbe(idx,
      embeds.filter(col("vec_id") < 16), k = 5, nProbe = 2)) <= 2)
  }

  test("mixRollup: all hierarchy levels ride ONE Expand + one aggregation") {
    val mr = TextAnalysis.mixRollup(docs)
    val plan = mr.queryExecution.executedPlan.toString
    // ROLLUP = scan-side Expand (constant #levels fan-out) feeding a
    // single two-phase agg — one shuffle, same as the flat report; a
    // second exchange means Spark stopped folding the levels into one
    // grouping-sets aggregation (e.g. a union-of-aggs rewrite crept in)
    assert(shuffles(mr) == 1, "budget: one grouping-sets aggregation")
    assert(plan.contains("Expand"), "levels must expand scan-side")
    assert(!plan.contains("Union"), "never one aggregation pass per level")
  }

  test("applyChanges: log reduced first, then ONE id-key join — no window") {
    val ch = docs.filter(expr("doc_id % 5 = 0"))
      .select(col("doc_id"), lit(2L).as("seq"), lit("upsert").as("op"),
        concat(col("text"), lit(" v2")).as("text"))
    val out = CorpusPipeline.applyChanges(docs, ch)
    // last-writer-wins agg on id + the base side's join alignment (the
    // winner side's agg partitioning is consumed directly); a ROW_NUMBER
    // window over the log or a third exchange means the reduce-first
    // shape regressed
    assert(shuffles(out) == 2, "budget: LWW agg + base join alignment")
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "change-log resolution must aggregate, not window")
  }

  test("fkAudit: distinct-key-bounded join, one child scan, no second pass") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    val a = Integrity.fkAudit(orders, "o_custkey", cust, "c_custkey", "r")
    a.collect()
    val nodes = walk(a.queryExecution.executedPlan)
    // child (key,count) agg + parent distinct + the single-row rollup; a
    // 4th exchange or a second child scan means the all-populations-from-
    // one-join-null-pattern shape regressed to a totals crossJoin
    assert(nodes.collect {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => s
    }.size <= 3, "budget: child agg + parent distinct + 1-row rollup")
    val scans = nodes.count(n =>
      n.nodeName.contains("Scan") && n.toString.contains("orders.parquet"))
    assert(scans == 1, s"child must be scanned exactly once, got $scans")
  }

  test("jaccardPrefixPairs: prefix-bounded index, arrays reused, no corpus window") {
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    // broadcast-off = the 100 TB shuffled topology
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val jp = Dedup.jaccardPrefixPairs(docs, threshold = 0.7)
      jp.collect()
      val nodes = walk(jp.queryExecution.executedPlan)
      // df agg + freq-join alignment + byDoc agg + prefix self-join (2)
      // + pair distinct + two verification joins consuming byDoc — every
      // exchange keyed and bounded; the duplicated byDoc/index subtrees
      // must collapse to ReusedExchange, not re-scan the corpus
      assert(nodes.collect { case s: ShuffleExchangeLike => s }.size <= 8,
        "shuffle budget exceeded")
      assert(nodes.collect { case r: ReusedExchangeExec => r }.size >= 2,
        "self-join/verify branches must reuse subtrees, not re-scan")
      assert(!nodes.exists(_.nodeName.contains("Window")),
        "no corpus window in the prefix-filter plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("weightedSampleHash: corpus filtered in place, total a broadcast scalar") {
    val ws = TextAnalysis.weightedSampleHash(docs, "n_chars", 300L)
    // the ONE exchange is the 1-row weight-total aggregation; the corpus
    // itself is never shuffled — the keep predicate runs scan-side
    assert(shuffles(ws) == 1, "only the W_total scalar may shuffle")
    assert(ws.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin") ||
      ws.queryExecution.executedPlan.toString.contains("BroadcastExchange"),
      "W_total must attach as a broadcast")
  }

  test("scd2History: one id-key exchange carries the whole interval build") {
    val ch = docs.selectExpr("doc_id", "1L AS seq", "'upsert' AS op", "text")
    assert(shuffles(CorpusPipeline.scd2History(ch)) == 1)
  }

  test("numericDrift: windows only over the baseline histogram, never a slice") {
    val d = docs.select("doc_id", "n_chars")
    val nd = Stats.numericDrift(d, d, "n_chars", 10)
    nd.collect()
    val nodes = walk(nd.queryExecution.executedPlan)
    val corpusWindows = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if !w.child.toString.contains("HashAggregate") => w
    }
    assert(corpusWindows.isEmpty, "only the histogram may be windowed")
    // histogram + cum window + total + edge-bin agg + edges collect +
    // two slice bin-counts + drift totals — all bounded relations except
    // the two slice counts, which are two-phase
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    assert(nodes.collect { case s: ShuffleExchangeLike => s }.size <= 9,
      "shuffle budget exceeded")
  }

  test("pmiCooccurrence: one corpus pair-scan, type-level joins, no windows") {
    val pm = TextAnalysis.pmiCooccurrence(docs, window = 3, minPairCount = 5L)
    pm.collect()
    val nodes = walk(pm.queryExecution.executedPlan)
    assert(!nodes.exists(_.nodeName.contains("Window")),
      "no window anywhere in the PMI plan")
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // pair agg + marginal aggs + their join alignments + total scalar;
    // every exchange carries the vocab-level pair-count relation (or the
    // 1-row total), never corpus positions
    assert(nodes.collect { case s: ShuffleExchangeLike => s }.size <= 8,
      "shuffle budget exceeded")
    assert(nodes.exists(n => n.getClass.getSimpleName == "ReusedExchangeExec"),
      "marginals must reuse the pair-count exchange, not re-scan the corpus")
  }

  test("pageRank: two exchanges per iteration plus the static degree build") {
    import spark.implicits._
    val nodes10 = (1L to 10L).toDF("id")
    val edges10 = (1L to 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val p1 = Graph.pageRank(nodes10, edges10, iterations = 1)
    val p3 = Graph.pageRank(nodes10, edges10, iterations = 3)
    val s1 = shuffles(p1); val s3 = shuffles(p3)
    // growth must be linear in iterations (the join+agg pair), not
    // quadratic via replanned edge subtrees
    assert(s3 - s1 <= 2 * 2 + 2, s"per-iteration shuffle growth too high: $s1 -> $s3")
  }

  test("multiTouchAttribution: rangeJoin pairs + ONE purchase-key window exchange") {
    val mt = graft.streaming.Events.multiTouchAttribution(events, model = "u")
    val plan = mt.queryExecution.executedPlan.toString
    // both window specs (row_number + count) must share one exchange on
    // purchase_id, added on top of the bucketed range-join's budget
    val base = shuffles(graft.streaming.Events.attributionJoinBatch(events))
    assert(shuffles(mt) == base + 1,
      s"expected exactly one extra exchange over the range join")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "attribution must stay a guarded hash range join")
  }

  test("skewAudit: the audit obeys the discipline it polices — no key-space window") {
    val sa = Integrity.skewAudit(events, Seq("user_id"), "events(user_id)")
    sa.collect()
    val nodes = walk(sa.queryExecution.executedPlan)
    // AQE can rewrite the histogram exchange under the window into a
    // ReusedExchange of the aggregation's exchange — still the bounded
    // histogram relation, just deduplicated
    val corpusWindows = nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if !w.child.toString.contains("HashAggregate") &&
          !w.child.toString.contains("ReusedExchange") => w
    }
    assert(corpusWindows.isEmpty,
      "the only window may run over the frequency histogram")
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // key count + freq histogram + cum window + totals scalar + final
    assert(nodes.collect { case s: ShuffleExchangeLike => s }.size <= 6,
      "shuffle budget exceeded")
  }

  test("dsirWeights: gram-explode counted ONCE, model+totals ride ReusedExchange") {
    // The (doc, tgt, bucket) count relation is the operator's only
    // corpus-sized intermediate; the model fit AND the scoring branch
    // must consume ONE planned exchange of it (the null-id prefilter in
    // bucketCounts is load-bearing: the restore join's pushed
    // IsNotNull(doc_id) otherwise differentiates the two subtrees and
    // the corpus is exploded twice). Totals likewise reuse the model's
    // bucket exchange.
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.window.WindowExec
    val df = Selection.dsirWeights(docs, col("lang") === "en")
    df.collect() // AQE settles the final stage graph
    val nodes = walk(df.queryExecution.executedPlan)
    assert(nodes.collect { case w: WindowExec => w }.isEmpty,
      "no window anywhere — scores are pure aggregation")
    val reused = nodes.collect { case r: ReusedExchangeExec => r }
    assert(reused.size >= 2,
      "model fit must reuse the count exchange; totals must reuse the model exchange")
    // corpus text is scanned once (the restore branch reads doc_id only)
    val textScans = nodes.count(n =>
      n.nodeName.contains("Scan") && n.toString.contains("text"))
    assert(textScans == 1, s"one corpus text scan, got $textScans")
    // budget: counts agg + model agg + totals single-partition + doc
    // score agg + the skinny id-only restore join exchange
    assert(nodes.collect { case s: ShuffleExchangeLike => s }.size <= 6,
      "shuffle budget exceeded")
  }

  test("nbQuality: fit, prior, and scoring share ONE gram-count exchange") {
    // NB adds a THIRD consumer (the doc-count prior) to the same
    // (doc, tgt, bucket) count exchange DSIR fits off — all but the
    // first planned occurrence must collapse to ReusedExchange, the
    // corpus text must scan once, and nothing windows
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.window.WindowExec
    val df = Selection.nbQuality(docs, col("lang") === "en")
    df.collect() // AQE settles the final stage graph
    val nodes = walk(df.queryExecution.executedPlan)
    assert(nodes.collect { case w: WindowExec => w }.isEmpty,
      "no window anywhere — NB is pure aggregation")
    assert(nodes.collect { case r: ReusedExchangeExec => r }.size >= 2,
      "prior and scoring must reuse the count exchange, not re-explode the corpus")
    val textScans = nodes.count(n =>
      n.nodeName.contains("Scan") && n.toString.contains("text"))
    assert(textScans <= 1, s"at most one visible corpus text scan, got $textScans")
  }

  test("knPerplexity: corpus materialized once; model + probe share its blocks") {
    // r17 shape: the (doc, tgt, trigram) relation, the trigram-type table
    // and the scored-type model are each materialized ONCE (lazy local
    // checkpoints — the pre-r17 ReusedExchange form re-ran the corpus
    // explode per checkpointed consumer and every model table re-ran the
    // type aggregation). The FINAL plan must therefore contain no corpus
    // text scan at all (the one scan lives inside the perDoc
    // materialization), nothing may window, and the routed probe's two
    // branches must read the SAME checkpointed (doc, trigram) RDD — two
    // RDD-scan leaves over one RDD id, not two re-explosions.
    import org.apache.spark.sql.execution.RDDScanExec
    import org.apache.spark.sql.execution.window.WindowExec
    val df = TextAnalysis.knPerplexity(docs, col("lang") === "en")
    df.collect() // AQE settles the final stage graph
    val nodes = walk(df.queryExecution.executedPlan)
    assert(nodes.collect { case w: WindowExec => w }.isEmpty,
      "no window anywhere — scoring is pure aggregation")
    val textScans = nodes.count(n =>
      n.nodeName.contains("Scan") && n.toString.contains("text") &&
        !n.isInstanceOf[RDDScanExec])
    assert(textScans == 0,
      s"corpus must ride the materialized (doc, trigram) relation, got $textScans scans")
    // the final stage graph bottoms out on the materialized relations:
    // at most the three checkpoints (perDoc / types / scored model) —
    // more distinct RDD leaves would mean a consumer fell off the
    // materialized path and re-derived its input
    val rddScanIds = nodes.collect { case r: RDDScanExec => r.inputRDD.id }
    assert(rddScanIds.nonEmpty, "probe must read the checkpointed relation")
    assert(rddScanIds.distinct.size <= 3,
      s"more RDD leaves than materialized relations: ids $rddScanIds")
  }

  test("dsirSample: global top-k is TakeOrderedAndProject, never a sort") {
    val df = Selection.dsirSample(docs, col("lang") === "en", k = 10)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "fixed-budget selection must run per-partition heaps + driver merge")
    assert(!plan.contains("SortExec"), "no global sort of the corpus")
  }

  test("IvfIndex lifecycle: caller-owned persist is released by close()") {
    val idx = Similarity.ivfFit(embeds, nLists = 4, seed = 42L)
    val cached = idx.copy(assigned = idx.assigned.persist())
    cached.assigned.count()
    assert(cached.assigned.storageLevel.useMemory,
      "persisted assignment should be cached after materialization")
    cached.close()
    assert(!cached.assigned.storageLevel.useMemory,
      "close() must unpersist the caller-persisted assignment")
    idx.close() // unpersisted index: close() is a safe no-op
  }
}
