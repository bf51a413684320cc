package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics on plain DataFrames — no GraphX, no RDDs:
  * each iteration is the same two relational steps (join ranks to edges,
  * aggregate contributions by destination) Catalyst already knows how to
  * shuffle, broadcast, and AQE-split. The duplicate-document graph
  * ([[Dedup.minhashPairs]] edges) is the natural input: rank centrality
  * identifies template/boilerplate hubs that near-dup CLUSTERING alone
  * underweights (a hub touching many small clusters never forms one big
  * component).
  */
object Graph {

  /** Bounded-iteration PageRank over an undirected edge list, in exact
    * integer micro-units: rank₀ = 1e6 per node, and each iteration sets
    *
    *   rank(v) = 150000 + (85 · Σ_{u∼v} (rank(u) DIV deg(u))) DIV 100
    *
    * — the standard damping-0.85 update with every operation an integer
    * (division truncates deterministically; the dropped sub-micro mass
    * is the price of an engine-exact, hash-gateable result — q_pagerank
    * runs the identical arithmetic in DuckDB). Isolated nodes settle at
    * the teleport floor 150000.
    *
    * Plan per iteration: ONE join of the rank relation to the
    * degree-annotated directed edge list (both keyed on the node id) and
    * ONE destination-keyed aggregation — two linear exchanges, hub skew
    * AQE-splittable, nothing driver-side. `iterations` is a structural
    * constant (ranks stabilize geometrically; 3–5 suffices for
    * hub-detection); the unrolled lazy plan repeats the edge subtree per
    * iteration — ReusedExchange collapses the static side. For production
    * iteration counts, `checkpointDir` + `checkpointEvery` cut the
    * lineage with a RELIABLE checkpoint (`setCheckpointDir` +
    * `checkpoint()` every N rounds, dir on HDFS/S3): unlike executor-
    * local blocks, checkpoint files survive executor loss, so a
    * 1000-executor run can lose workers mid-iteration and recompute from
    * the last checkpoint instead of failing the job. Ranks are identical
    * with the knob on or off (spec-pinned) — it only changes where the
    * truncated plan's inputs live.
    *
    * `nodes` must carry unique `id`s; `edges` (id_a, id_b) are treated
    * as undirected and should be deduplicated pairs (double-counted
    * parallel edges double their contribution weight).
    */
  def pageRank(
      nodes: DataFrame, edges: DataFrame, iterations: Int = 3,
      checkpointDir: Option[String] = None, checkpointEvery: Int = 2): DataFrame = {
    require(iterations >= 1, "at least one iteration")
    require(checkpointEvery >= 1, "checkpointEvery must be positive")
    checkpointDir.foreach { d =>
      // the dir is SparkContext-global — see components' scaladoc for the
      // shared-dir and cleanCheckpoints operational notes
      Checkpoints.ensureCheckpointDir(nodes.sparkSession.sparkContext, d)
    }
    val dir = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
    val deg = dir.groupBy("src").agg(count(lit(1)).as("__deg"))
    val dirDeg = dir.join(deg, "src")
    var rank = nodes.select(col("id"), lit(1000000L).as("rank_micro"))
    for (i <- 1 to iterations) {
      val contrib = dirDeg
        .join(rank, dirDeg("src") === rank("id"))
        .select(col("dst").as("id"),
          expr("rank_micro DIV __deg").as("__c"))
        .groupBy("id").agg(sum("__c").as("__in"))
      rank = nodes.select("id").join(contrib, Seq("id"), "left")
        .select(col("id"),
          expr("150000L + ((85 * coalesce(__in, 0L)) DIV 100)")
            .as("rank_micro"))
      if (checkpointDir.isDefined && i % checkpointEvery == 0 && i < iterations)
        rank = rank.checkpoint()
    }
    rank
  }
}
