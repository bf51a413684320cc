package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Layout

/** Z-order key (codegen expression) + layout operator: exact interleave
  * values, 31-bit masking, and the measurable property the layout is FOR
  * — a trailing-dimension filter touches a fraction of the partitions
  * where a lexicographic sort touches all of them.
  */
class LayoutSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-layout-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("zorder2 interleaves bits exactly; masks to 31 bits; nulls propagate") {
    GraftFunctions.register(spark)
    val out = spark.sql(
      """SELECT
        zorder2(0L, 0L)  AS z00,
        zorder2(3L, 5L)  AS z35,
        zorder2(5L, 3L)  AS z53,
        zorder2(2147483647L, 2147483647L) AS zmax,
        zorder2(CAST(NULL AS BIGINT), 1L) AS znull,
        zorder2(2147483651L, 5L) AS zmasked
      """).collect()(0)
    // spread(3)=0b101=5, spread(5)=0b10001=17: 5 | 17<<1 = 39
    assert(out.getLong(0) == 0L)
    assert(out.getLong(1) == 39L)
    // arguments are NOT symmetric: 17 | 5<<1 = 27
    assert(out.getLong(2) == 27L)
    // full 31+31 bits interleave to 62 bits, always non-negative
    assert(out.getLong(3) == (1L << 62) - 1)
    assert(out.isNullAt(4))
    // 2147483651 = 2^31 + 3 masks to 3
    assert(out.getLong(5) == 39L)
  }

  test("zorder2 matches the interpreted (non-codegen) eval path") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 200).map(_ =>
      (rnd.nextLong().abs & 0x7FFFFFFFL, rnd.nextLong().abs & 0x7FFFFFFFL))
    val viaSql = pairs.toDF("x", "y")
      .selectExpr("zorder2(x, y) AS z").collect().map(_.getLong(0))
    def spread(v0: Long): Long = {
      var v = v0 & 0x7FFFFFFFL
      v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
      v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
      v = (v | (v << 2)) & 0x3333333333333333L
      v = (v | (v << 1)) & 0x5555555555555555L
      v
    }
    val expected = pairs.map { case (x, y) => spread(x) | (spread(y) << 1) }
    assert(viaSql.toSeq == expected)
  }

  test("z-order layout prunes a trailing-dimension filter; lexicographic does not") {
    import spark.implicits._
    // 64x64 grid: both layouts get 16 range partitions of 256 rows
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val zTouched = Layout.zOrderLayout(grid, "x", "y", 16)
      .withColumn("p", spark_partition_id())
      .filter(col("y") < 8).select("p").distinct().count()
    val lexTouched = grid.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions("x", "y")
      .withColumn("p", spark_partition_id())
      .filter(col("y") < 8).select("p").distinct().count()
    // y's bits occupy odd positions: y<8 zeroes every odd bit above 5, so
    // matching z values live in the lower half of the key space — half
    // the partitions; under x-leading sort every x-slice carries y<8 rows
    assert(zTouched <= 8, s"z-order touched $zTouched of 16")
    assert(lexTouched == 16, s"lexicographic touched $lexTouched of 16")
    // and the leading dimension still prunes under z-order too (x<8
    // constrains even bits: the box x<8 AND y<8 collapses to z<64)
    val boxTouched = Layout.zOrderLayout(grid, "x", "y", 16)
      .withColumn("p", spark_partition_id())
      .filter(col("x") < 8 && col("y") < 8).select("p").distinct().count()
    assert(boxTouched == 1, s"8x8 box touched $boxTouched partitions")
  }

  test("partitionRanges reports disjoint per-partition spans under range layout") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("v").repartitionByRange(5, col("v"))
    val ranges = Layout.partitionRanges(df, "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(ranges.map(_._3).sum == 1000L)
    ranges.sliding(2).foreach {
      case Array((_, hi, _), (lo, _, _)) => assert(hi < lo)
      case _ =>
    }
  }
}
