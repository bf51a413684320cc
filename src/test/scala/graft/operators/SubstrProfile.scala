package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for repeatedSubstringSpans stage costs.
  * Usage: sbt "Test/runMain graft.operators.SubstrProfile <sfDir>"
  */
object SubstrProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val minLen = 40
    def time(label: String)(fn: => Long): Unit =
      for (p <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = fn
        println(f"$label pass$p rows=$n secs=${(System.nanoTime()-t0)/1e9}%.2f")
      }
    val pos = docs
      .select(col("doc_id"),
        explode(expr(
          s"""CASE WHEN length(text) >= $minLen
              THEN sequence(1, length(text) - ${minLen - 1})
              ELSE array() END""")).as("__i"),
        col("text").as("__text"))
      .select(col("doc_id"), col("__i").cast("long").as("__i"),
        expr(s"substring(__text, __i, $minLen)").as("__gram"))
    time("pos")(pos.count())
    val dupGrams = pos.groupBy("__gram").agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1).select("__gram")
    time("dupGrams")(dupGrams.count())
    val dupPos = pos.join(dupGrams, Seq("__gram"), "left_semi")
      .select(col("doc_id"), col("__i"))
    time("dupPos")(dupPos.count())
    time("full")(Dedup.repeatedSubstringSpans(docs, minLen).count())
    val posH = pos.select(col("doc_id"), col("__i"), xxhash64(col("__gram")).as("__h"))
    val dupH = posH.groupBy("__h").agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1).select("__h")
    time("dupH")(dupH.count())
    time("dupPosH")(posH.join(dupH, Seq("__h"), "left_semi").count())
    time("grpPartitions64") {
      pos.repartition(64, col("__gram")).groupBy("__gram")
        .agg(count(lit(1)).as("__c")).filter(col("__c") > 1).count()
    }
    spark.stop()
  }
}
