package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query twice — pass 1 warms the
  * JVM/codegen, pass 2 is the reported time — and prints ONE JSON line.
  *
  * Queries execute into the `noop` sink (not `.count()`): a count-only plan
  * lets Catalyst prune every projection, so per-row expression work
  * (derived columns, text stats, cosines) would be optimized out of the
  * measurement; the noop write evaluates every output column and discards
  * the rows (VERDICT r1 "What's wrong" #4).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime()
      fn
      (System.nanoTime() - t0) / 1e9
    }

    def exec(n: String): Unit =
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()

    val names = SparkEntry.queries.keys.toSeq.sorted
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    // pass 1: warmup (codegen, file-index, broadcast caches)
    val warmup = names.map { n =>
      n -> (try time(exec(n))
      catch { case e: Throwable => errors += s"$n: ${e.getMessage}"; -1.0 })
    }.toMap
    // pass 2: measured
    val results = names.map { n =>
      n -> (if (warmup(n) < 0) -1.0
            else try time(exec(n))
            catch { case _: Throwable => -1.0 })
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val ok = results.filter(_._2 >= 0)
    val total = ok.map(_._2).sum
    val warm = warmup.values.filter(_ >= 0).sum
    val err = errors.map(e => "\"" + e.replace("\"", "'").replace("\n", " ") + "\"")
      .mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""warmup_total":$warm,"n_queries":${results.size},"errors":$err,"sf":"$sfDir"}""")
    spark.stop()
  }
}
