package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off calibration probe for SemDeDup's adaptive nClusters: at a
  * given SF, compares the is_kept answer and wall time of
  * `semanticDedup` across nClusters values against the exact one-cell
  * (brute-force) answer — quantifying where coarse-quantizer recall
  * starts to diverge from the all-pairs oracle on the driver fixtures.
  *
  * Usage: sbt "Test/runMain graft.tools.SemTune <sfDir> <k1,k2,...>"
  */
object SemTune {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/testdata/sf1"
    val ks = (if (args.length > 1) args(1) else "16,32,64,142")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = e.count()
    // exact: every vector in one cell => all-pairs verification
    val exact = graft.operators.Dedup.semanticDedupFromCells(
      e.select(col("vec_id"), col("embedding"), lit(0).as("__cell")),
      threshold = 0.9)
    val exactDropped = exact.filter(!col("is_kept"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    println(s"SEMTUNE n=$n exact_dropped=${exactDropped.size}")
    for (k <- ks) {
      val t0 = System.nanoTime()
      val out = graft.operators.Dedup.semanticDedup(
        e, nClusters = k, threshold = 0.9, fitSampleFraction = 0.5)
      val dropped = out.filter(!col("is_kept"))
        .select("vec_id").collect().map(_.getLong(0)).toSet
    val secs = (System.nanoTime() - t0) / 1e9
      val missed = exactDropped -- dropped
      val extra = dropped -- exactDropped
      println(f"SEMTUNE k=$k%4d dropped=${dropped.size}%5d " +
        f"missed=${missed.size}%4d extra=${extra.size}%4d secs=$secs%.2f")
    }
    spark.stop()
  }
}
