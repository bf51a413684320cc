package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical data-layout operators — the write-side half of scan
  * performance at 100 TB. A table's FILE layout decides how much of it a
  * filtered scan reads: parquet keeps min/max stats per file (and per row
  * group), and Spark's scan planning plus parquet predicate pushdown skip
  * files whose stat range cannot match the filter. Layout is therefore a
  * first-class operator: cluster the rows so those ranges are TIGHT for
  * the query columns.
  */
object Layout {

  /** Z-order clustering: range-partition and sort by the 2-D Morton key
    * of (`xExpr`, `yExpr`) (the [[graft.functions.ZOrder2]] codegen
    * expression), so a downstream write yields files clustered in BOTH
    * dimensions at once — a filter on either column (or a box on both)
    * prunes most files, where a lexicographic two-column sort only
    * prunes on the leading column ("all of user X" degrades to a full
    * scan under time-leading sort, and vice versa).
    *
    * Cost: one range exchange (sampled bounds, skew-proof by
    * construction) plus an in-partition sort — exactly what a plain
    * `ORDER BY` layout pays; the clustering quality is the free part
    * (the key is a per-row codegen projection). Input expressions must
    * be non-negative BIGINTs; bucket/shift wider or signed domains first
    * (only relative order matters). The `__z` key is retained on the
    * output (callers drop it after the write if unwanted): file-level
    * min/max on `__z` itself also serves z-range (box) pruning at the
    * row-group level.
    */
  def zOrderLayout(
      df: DataFrame, xExpr: String, yExpr: String,
      nPartitions: Int): DataFrame = {
    require(nPartitions > 0, "nPartitions must be positive")
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("__z", expr(s"zorder2(CAST($xExpr AS BIGINT), CAST($yExpr AS BIGINT))"))
      .repartitionByRange(nPartitions, col("__z"))
      .sortWithinPartitions("__z")
  }

  /** Per-partition (min, max, count) of an expression under the CURRENT
    * partitioning — the measurement half of layout work: run it on a
    * candidate layout's query columns and count how many partitions a
    * given filter range intersects (LayoutSpec does exactly that to pin
    * z-order's box-pruning advantage over a one-column sort). Pure
    * mapPartitions metadata pass — no shuffle, no data movement.
    */
  def partitionRanges(df: DataFrame, colName: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(colName).cast("long"))
      .mapPartitions { it =>
        var mn = Long.MaxValue; var mx = Long.MinValue; var n = 0L
        it.foreach { r =>
          if (!r.isNullAt(0)) {
            val v = r.getLong(0)
            if (v < mn) mn = v
            if (v > mx) mx = v
            n += 1
          }
        }
        if (n == 0) Iterator.empty
        else Iterator((mn, mx, n))
      }
      .toDF("p_min", "p_max", "n_rows")
  }
}
