package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing: assign documents to fixed-capacity context windows
  * ("bins") so training batches waste as little padding as possible.
  *
  * Distributed shape: greedy first-fit-decreasing WITHIN each partition
  * (`mapPartitions`, no shuffle beyond the optional pre-partitioning).
  * Global optimality is not a goal — FFD inside a partition is within
  * 11/9·OPT+1 of that partition's optimum, and at 100 TB the only plans
  * that exist are partition-local ones. Bin ids are globally unique
  * (partition id in the high bits). Oversized documents (> capacity) get
  * a bin of their own (truncation/splitting is the tokenizer's decision,
  * not the packer's).
  */
object Packing {

  /** Pack by whitespace-token count. Emits one row per document:
    * (doc_id, n_tokens, bin_id, bin_fill) where bin_fill is the bin's
    * total token count after packing.
    */
  def packSequences(
      docs: DataFrame, capacity: Int, textCol: String = "text"): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val sized = docs.select(
      col("doc_id"),
      expr(s"size(${TextAnalysis.tokensExpr(textCol)})").as("n_tokens"))
    val out = StructType(Seq(
      StructField("doc_id", sized.schema("doc_id").dataType),
      StructField("n_tokens", IntegerType),
      StructField("bin_id", LongType),
      StructField("bin_fill", IntegerType)))
    val packed = sized.mapPartitions { it =>
      val rows = it.toArray
      if (rows.isEmpty) Iterator.empty
      else {
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        // first-fit-decreasing: sort by length desc (doc_id asc tiebreak
        // for determinism given the partition's row set)
        val sorted = rows.sortBy(r => (-r.getInt(1), r.get(0).toString))
        val binFill = scala.collection.mutable.ArrayBuffer.empty[Int]
        val assignment = sorted.map { r =>
          val n = r.getInt(1)
          var b = 0
          while (b < binFill.length && binFill(b) + n > capacity) b += 1
          if (b == binFill.length) binFill += 0
          binFill(b) += n
          (r.get(0), n, b)
        }
        assignment.iterator.map { case (id, n, b) =>
          Row(id, n, (pid << 32) | b.toLong, binFill(b))
        }
      }
    }(RowEncoder.encoderFor(out))
    packed
  }

  /** Packing efficiency summary: bins, mean fill ratio, padding waste. */
  def packingStats(packed: DataFrame, capacity: Int): DataFrame =
    packed
      .groupBy("bin_id").agg(expr("first(bin_fill)").as("fill"))
      .agg(
        expr("count(1)").as("n_bins"),
        expr(s"round(avg(CAST(fill AS DOUBLE) / $capacity.0), 6)").as("mean_fill_ratio"),
        expr(s"CAST(sum(greatest($capacity - fill, 0)) AS BIGINT)").as("padding_tokens"))
}
