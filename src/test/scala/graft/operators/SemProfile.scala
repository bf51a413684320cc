package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for semanticDedupProbed stage costs at a given SF:
  * times (a) probe-cell assignment alone, (b) the candidate join without
  * cosine, (c) the full operator — isolating whether the wall is in
  * candidate generation or in per-pair cosine work.
  * Usage: sbt "Test/runMain graft.operators.SemProfile <sfDir> <probes>"
  */
object SemProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/testdata/sf1"
    val probes = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val idx0 = Similarity.ivfFit(
      e, nLists = 0, seed = 42L, fitSampleFraction = 0.5)
    val idx = idx0.copy(assigned = idx0.assigned.persist())
    idx.assigned.count() // materialize
    println(s"nLists=${idx.centroids.length}")
    def time(label: String)(fn: => Long): Unit = {
      for (p <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = fn
        println(f"$label pass$p rows=$n secs=${(System.nanoTime()-t0)/1e9}%.2f")
      }
    }
    val assigned = idx.assigned
    time("probeCells") {
      Similarity.probeCells(
        assigned, idx.centroids, "embedding", "vec_id", probes)
        .select(col("vec_id"), explode(col("__cells")).as("__cell")).count()
    }
    val probed = Similarity.probeCells(
        assigned, idx.centroids, "embedding", "vec_id", probes)
      .select(col("vec_id").as("__pid"), col("embedding").as("__pv"),
        explode(col("__cells")).as("__cell"))
    val primary = assigned.select(
      col("vec_id").as("__qid"), col("embedding").as("__qv"), col("__cell"))
    time("candJoin") {
      probed.join(primary, Seq("__cell"))
        .filter(col("__pid") =!= col("__qid")).count()
    }
    time("full") {
      Dedup.semanticDedupProbed(idx, probes, 0.9).count()
    }
    spark.stop()
  }
}
