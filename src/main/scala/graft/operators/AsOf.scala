package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — the feature-pipeline operator Spark's
  * built-in joins don't express: for every left row, attach the LATEST
  * right row with the same keys and `rightTs <= leftTs` (backward
  * inclusive, DuckDB/kdb ASOF semantics), or with
  * `direction = "forward"` the EARLIEST right row with
  * `rightTs >= leftTs` ("next event after" — the pandas `merge_asof`
  * forward contract), or with `direction = "nearest"` whichever of the
  * two is closer in time (ties break backward). Training-data pipelines
  * need backward for leak-free features: "the user's stats as they were
  * when the event happened", never lookahead.
  *
  * Spark-first plan, not a range join: tag both sides, union them
  * (exchange-free), and run ONE window pass per key ordered by
  * (ts, side) carrying the latest right payload forward —
  * `last(payload, ignoreNulls)` over rows unbounded-preceding..current.
  * Right rows sort before left rows at equal ts, which is exactly the
  * inclusive boundary; forward is the same plan with the timestamp
  * order flipped, and nearest runs both window passes over the SAME
  * hash exchange (one shuffle, two sorts). Total cost: one hash
  * shuffle on the keys + sort(s), independent of time-range density —
  * a naive range join explodes on (key, time-bucket) pairs and a theta
  * join is quadratic per key. At 100 TB both sides stream through one
  * exchange.
  *
  * Contract: right must be unique per (keys, rightTs) — the standard
  * as-of precondition (with duplicates, "the latest row at that ts" is
  * ambiguous in any engine, including DuckDB's ASOF).
  *
  * NULL keys follow SQL join semantics: a NULL-keyed right row never
  * matches anything (it is dropped from the match pass), and a
  * NULL-keyed left row comes back with null payload like any other
  * unmatched left row — matching NULL to NULL would diverge from
  * DuckDB ASOF / ANSI equality. NULL timestamps get the same
  * treatment in all three directions: a null-`rightTs` right row is
  * dropped (it has no position on the time axis to match at), and a
  * null-`leftTs` left row comes back with null payload — DuckDB ASOF
  * likewise never matches through a NULL comparison.
  *
  * Left rows with no matching right row keep null payload (left-join
  * semantics). With `toleranceMs` set, a match farther from `leftTs`
  * than the tolerance (in the match direction) is nulled out as well
  * (the kdb `wj`/pandas `merge_asof` tolerance contract).
  */
object AsOf {

  def asOfJoin(
      left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String = "ts", rightTs: String = "ts",
      payload: Seq[String] = Nil,
      prefix: String = "",
      toleranceMs: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one equality key")
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
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
    // NULL-keyed or NULL-timestamp right rows can never be a
    // SQL-semantics match; dropping them here keeps them out of the
    // window passes entirely (a null __ts would otherwise sort first
    // under asc and be attached as a bogus "match" with null __rts)
    val r = r0.withColumn("__l", lit(null).cast(l0.schema("__l").dataType))
      .filter((on.map(col(_).isNotNull) :+ col("__ts").isNotNull)
        .reduce(_ && _))

    def pass(descending: Boolean): org.apache.spark.sql.expressions.WindowSpec = {
      val ord = if (descending) col("__ts").desc else col("__ts").asc
      // right rows (__side = 0) sort before left rows at equal __ts in
      // BOTH directions — the inclusive boundary
      Window.partitionBy(on.map(col): _*)
        .orderBy(ord, col("__side").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    // signed distance from the left timestamp in the match direction;
    // both window passes guarantee it is >= 0
    def backDeltaUs = unix_micros(col("__ts")) - unix_micros(col("__mb.__rts"))
    def fwdDeltaUs = unix_micros(col("__mf.__rts")) - unix_micros(col("__ts"))
    def clampTol(m: Column, deltaUs: Column): Column = toleranceMs match {
      case Some(ms) => when(m.isNotNull && deltaUs <= ms * 1000L, m)
      case None => m
    }

    val unioned = l.unionByName(r)
    val matched = direction match {
      case "backward" => unioned
        .withColumn("__mb", last(col("__r"), ignoreNulls = true).over(pass(descending = false)))
        .filter(col("__side") === 1)
        .withColumn("__m", clampTol(col("__mb"), backDeltaUs))
      case "forward" => unioned
        .withColumn("__mf", last(col("__r"), ignoreNulls = true).over(pass(descending = true)))
        .filter(col("__side") === 1)
        .withColumn("__m", clampTol(col("__mf"), fwdDeltaUs))
      case "nearest" => unioned
        .withColumn("__mb", last(col("__r"), ignoreNulls = true).over(pass(descending = false)))
        .withColumn("__mf", last(col("__r"), ignoreNulls = true).over(pass(descending = true)))
        .filter(col("__side") === 1)
        .withColumn("__mb", clampTol(col("__mb"), backDeltaUs))
        .withColumn("__mf", clampTol(col("__mf"), fwdDeltaUs))
        .withColumn("__m",
          when(col("__mb").isNull, col("__mf"))
            .when(col("__mf").isNull, col("__mb"))
            .when(fwdDeltaUs < backDeltaUs, col("__mf"))
            .otherwise(col("__mb"))) // tie → backward
    }
    matched
      // null-leftTs left rows are unmatched by contract in every
      // direction (under forward's desc order a null __ts sorts last
      // and would otherwise pick up the earliest right row)
      .withColumn("__m", when(col("__ts").isNotNull, col("__m")))
      .select(
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
    *
    * The explode factor is guarded: an interval spanning more than
    * `maxBucketsPerInterval` buckets fails the job with a named error
    * naming the offending interval, instead of silently minting millions
    * of bucket rows from one corrupt row (a year-9999 end timestamp at a
    * 1-second bucket width would ask `sequence` for ~2^31 elements and
    * die with an opaque message mid-shuffle). Clamping is deliberately
    * NOT offered — it would silently drop matches in the clamped range.
    * Size `bucketWidthSec` near the typical interval length and keep the
    * guard as corrupt-data insurance.
    */
  def rangeJoin(
      points: DataFrame, intervals: DataFrame, on: Seq[String],
      pointTs: String = "ts",
      startCol: String = "start", endCol: String = "end",
      payload: Seq[String] = Nil,
      prefix: String = "",
      bucketWidthSec: Long = 3600L,
      maxBucketsPerInterval: Long = 65536L): DataFrame = {
    require(on.nonEmpty, "range join needs at least one equality key")
    require(bucketWidthSec > 0, "bucketWidthSec must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
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
    // the guard lives in a FILTER (cannot be pruned away like an unused
    // projected column would be): intervals inside the budget pass the
    // predicate without evaluating raise_error
    val nBuckets = floor(unix_micros(col("__e")) / widthUs) -
      floor(unix_micros(col("__s")) / widthUs) + lit(1L)
    val i = intervals.select(iCols: _*)
      .filter(when(nBuckets <= maxBucketsPerInterval, lit(true))
        .otherwise(raise_error(concat(
          lit(s"rangeJoin: interval ["), col("__s").cast("string"),
          lit(", "), col("__e").cast("string"),
          lit(s"] spans "), nBuckets.cast("string"),
          lit(s" buckets of ${bucketWidthSec}s > maxBucketsPerInterval=" +
            s"$maxBucketsPerInterval — raise bucketWidthSec or clean " +
            "corrupt interval bounds"))).cast("boolean")))
      .withColumn("__b", explode(sequence(
        floor(unix_micros(col("__s")) / widthUs),
        floor(unix_micros(col("__e")) / widthUs))))

    p.join(i, on :+ "__b")
      .filter(col("__pts") >= col("__s") && col("__pts") <= col("__e"))
      .drop("__b", "__pts", "__s", "__e")
  }
}
