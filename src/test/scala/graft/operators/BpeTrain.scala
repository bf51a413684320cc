package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot trainer for [[TextAnalysis.largeBpeMerges]]: collect the
  * (vocab-bounded) word-frequency table once, then run the replace-chain
  * BPE training loop in plain Scala — per step, apply the merges learned
  * so far to every vocab word (padded-string replace chain, the
  * bpeTokenCounts/bpeMergeCandidates semantics exactly), count adjacent
  * symbol pairs weighted by word frequency, and take the (count DESC,
  * pair ASC) argmax. Each step is what ONE iterated
  * `bpeMergeCandidates(docs, merges, topN = 1)` Spark job computes; the
  * local loop avoids 150 corpus re-aggregations. Prints the Scala Seq
  * literal to paste into TextAnalysis.
  */
object BpeTrain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val nMerges = if (args.length > 1) args(1).toInt else 150
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wf = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("__w", expr(
        "filter(split(lower(trim(text)), ' +'), w -> w rlike '^[a-z]+$')"))
      .select(explode(col("__w")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wf"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    spark.stop()
    println(s"vocab=${wf.length}")

    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    // padded spelling, replace-chain application of the merges so far
    def apply(word: String): Array[String] = {
      var s = " " + word.toCharArray.mkString(" ") + " "
      merges.foreach { case (f, t) => s = s.replace(s" $f ", s" $t ") }
      s.trim.split(" ")
    }
    var step = 0
    while (step < nMerges) {
      val counts = scala.collection.mutable.HashMap[String, Long]()
      wf.foreach { case (w, f) =>
        val syms = apply(w)
        var i = 0
        while (i < syms.length - 1) {
          val pair = syms(i) + " " + syms(i + 1)
          counts.put(pair, counts.getOrElse(pair, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) { step = nMerges }
      else {
        // (count DESC, pair ASC) argmax — the bpeMergeCandidates order
        val (pair, _) = counts.toSeq.minBy { case (p, n) => (-n, p) }
        merges += (pair -> pair.replace(" ", ""))
        step += 1
      }
    }
    println("  val largeBpeMerges: Seq[(String, String)] = Seq(")
    println(merges.grouped(3).map(g =>
      "    " + g.map { case (f, t) => s""""$f" -> "$t"""" }.mkString(", "))
      .mkString(",\n") + ")")
  }
}
