package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the BPE apply under a REAL-sized merge table:
  * times token counting over the documents fixture with (a) the
  * array-speed `bpe_encode` expression and (b) the original generated
  * replace chain, on a synthetic rank-ordered table of `nMerges` rules
  * (frequency-plausible: pairs drawn from letter bigrams and previously
  * merged symbols, the shape a trained tokenizer table has).
  * Usage: sbt "Test/runMain graft.operators.BpeProfile <sfDir> <nMerges>"
  */
object BpeProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val nMerges = if (args.length > 1) args(1).toInt else 1000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // deterministic synthetic table: seed with letter-bigram rules, then
    // compound previously-merged symbols (real tables are ~this shape)
    val letters = "etaoinshrdlucmfwypvbgkjqxz".map(_.toString)
    val rules = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val symbols = scala.collection.mutable.ArrayBuffer[String](letters: _*)
    val seen = scala.collection.mutable.HashSet[String]()
    var i = 0
    while (rules.length < nMerges) {
      val a = symbols(((i.toLong * 7919L) % symbols.length).toInt)
      val b = symbols(((i.toLong * 104729L + 13L) % symbols.length).toInt)
      val key = s"$a $b"
      if (!seen(key) && (a + b).length <= 12) {
        seen += key
        rules += (key -> (a + b))
        symbols += (a + b)
      }
      i += 1
    }
    val merges = rules.toSeq
    println(s"merges=${merges.length} docs=${docs.count()}")

    val chain = TextAnalysis.bpeChainApplied(merges)
    val table = merges.map { case (f, t) => s"$f>$t" }.mkString(";")
    def time(label: String, sql: String): Unit =
      for (p <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = docs
          .withColumn("__w", expr(
            "filter(split(lower(trim(text)), ' +'), w -> w rlike '^[a-z]+$')"))
          .selectExpr(s"aggregate(transform(__w, w -> $sql), 0, (a, x) -> a + x) AS n")
          .agg(sum("n")).head().getLong(0)
        println(f"$label pass$p tokens=$n secs=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    time("bpe_encode(fast)", s"size(bpe_encode(w, '$table'))")
    time("replace-chain   ", s"size(split(trim($chain), ' '))")
    spark.stop()
  }
}
