package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — the feature-pipeline operator Spark's
  * built-in joins don't express: for every left row, attach the LATEST
  * right row with the same keys and `rightTs <= leftTs` (backward
  * inclusive, DuckDB/kdb ASOF semantics). Training-data pipelines need
  * this for leak-free features: "the user's stats as they were when the
  * event happened", never lookahead.
  *
  * Spark-first plan, not a range join: tag both sides, union them
  * (exchange-free), and run ONE window pass per key ordered by
  * (ts, side) carrying the latest right payload forward —
  * `last(payload, ignoreNulls)` over rows unbounded-preceding..current.
  * Right rows sort before left rows at equal ts, which is exactly the
  * inclusive boundary. Total cost: one hash shuffle on the keys + sort,
  * independent of time-range density — a naive range join explodes on
  * (key, time-bucket) pairs and a theta join is quadratic per key. At
  * 100 TB both sides stream through one exchange.
  *
  * Contract: right must be unique per (keys, rightTs) — the standard
  * as-of precondition (with duplicates, "the latest row at that ts" is
  * ambiguous in any engine, including DuckDB's ASOF).
  *
  * Left rows with no matching right row keep null payload (left-join
  * semantics). With `toleranceMs` set, a match older than the tolerance
  * is nulled out as well (the kdb `wj`/pandas `merge_asof` tolerance
  * contract).
  */
object AsOf {

  def asOfJoin(
      left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String = "ts", rightTs: String = "ts",
      payload: Seq[String] = Nil,
      prefix: String = "",
      toleranceMs: Option[Long] = None): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one equality key")
    val pay =
      if (payload.nonEmpty) payload
      else right.columns.toSeq.filterNot(c => on.contains(c) || c == rightTs)
    require(pay.nonEmpty, "right side carries no payload columns")

    val leftCols = left.columns.toSeq
    // common union schema: keys ++ __ts ++ __side ++ __l ++ __r
    val l0 = left.select(
      on.map(col) ++ Seq(
        col(leftTs).cast("timestamp").as("__ts"),
        lit(1).as("__side"),
        struct(leftCols.map(col): _*).as("__l")): _*)
    val r0 = right.select(
      on.map(col) ++ Seq(
        col(rightTs).cast("timestamp").as("__ts"),
        lit(0).as("__side"),
        struct((pay.map(col) :+
          col(rightTs).cast("timestamp").as("__rts")): _*).as("__r")): _*)
    val l = l0.withColumn("__r", lit(null).cast(r0.schema("__r").dataType))
    val r = r0.withColumn("__l", lit(null).cast(l0.schema("__l").dataType))

    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val inTol = toleranceMs match {
      case Some(ms) => matched.withColumn("__m",
        when(col("__m").isNotNull &&
          unix_micros(col("__ts")) - unix_micros(col("__m.__rts")) <= ms * 1000L,
          col("__m")))
      case None => matched
    }
    inTol.select(
      leftCols.map(c => col(s"__l.`$c`").as(c)) ++
        pay.map(c => col(s"__m.`$c`").as(prefix + c)): _*)
  }

  /** Interval (range) join: INNER-join point rows to every interval
    * [startCol, endCol] (inclusive both ends) sharing the equality keys
    * that contains the point's timestamp. The other temporal join Spark
    * lacks natively: a plain inequality join plans a per-key
    * nested-loop/cartesian (Databricks added a range-join HINT for
    * exactly this).
    *
    * Spark-first shape — bucketize: each interval explodes into the
    * fixed-width time buckets it overlaps, points compute their single
    * bucket, both sides hash-join on (keys, bucket), and the exact
    * containment predicate filters residuals. Explode factor =
    * intervalLength / bucketWidth + 1, declared up front via
    * `bucketWidthSec` (size it near the TYPICAL interval length: too
    * small explodes the interval side, too large degrades toward the
    * per-key product). The join stays a hash join at any scale — never
    * CartesianProduct / BroadcastNestedLoopJoin (pinned in
    * PlanShapeSpec).
    *
    * A point matching several overlapping intervals emits one row per
    * match (standard interval-join semantics); unmatched points drop
    * (inner). Use [[asOfJoin]] when "latest single match" is wanted.
    */
  def rangeJoin(
      points: DataFrame, intervals: DataFrame, on: Seq[String],
      pointTs: String = "ts",
      startCol: String = "start", endCol: String = "end",
      payload: Seq[String] = Nil,
      prefix: String = "",
      bucketWidthSec: Long = 3600L): DataFrame = {
    require(on.nonEmpty, "range join needs at least one equality key")
    require(bucketWidthSec > 0, "bucketWidthSec must be positive")
    val pay =
      if (payload.nonEmpty) payload
      else intervals.columns.toSeq
        .filterNot(c => on.contains(c) || c == startCol || c == endCol)
    val widthUs = bucketWidthSec * 1000000L

    val p = points
      .withColumn("__pts", col(pointTs).cast("timestamp"))
      .withColumn("__b", floor(unix_micros(col("__pts")) / widthUs))
    val iCols = on.map(col) ++
      Seq(col(startCol).cast("timestamp").as("__s"),
        col(endCol).cast("timestamp").as("__e")) ++
      pay.map(c => col(c).as(prefix + c))
    val i = intervals.select(iCols: _*)
      .withColumn("__b", explode(sequence(
        floor(unix_micros(col("__s")) / widthUs),
        floor(unix_micros(col("__e")) / widthUs))))

    p.join(i, on :+ "__b")
      .filter(col("__pts") >= col("__s") && col("__pts") <= col("__e"))
      .drop("__b", "__pts", "__s", "__e")
  }
}
