package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expression: the 2-D Z-order (Morton) key of two
  * non-negative integer columns — bit-interleave `x`'s bits into even
  * positions and `y`'s into odd, producing ONE sort key whose total order
  * is simultaneously clustered in BOTH dimensions. Sorting/range-
  * partitioning a table by this key is the standard data-layout move for
  * 100 TB scans filtered on two independent columns (a time-range AND a
  * key-range): parquet min/max stats on the raw columns become tight per
  * file, so both predicates prune files, where a plain two-column sort
  * only prunes on the leading column.
  *
  * Inputs are masked to their low 31 bits (callers bucket/shift wider
  * domains first — only the RELATIVE order of the masked values matters
  * for clustering), so the interleaved result stays in non-negative
  * BIGINT range and compares identically as signed or unsigned — the
  * property that makes the key portable across engines (the DuckDB
  * oracle mirrors the same five mask-and-shift spread steps; hash-gated
  * by q_zorder).
  *
  * The spread is the classic binary-magic-numbers sequence (public
  * bit-twiddling folklore, e.g. Stanford Bit Twiddling Hacks); five
  * shift-or-mask steps per coordinate, fully inside whole-stage codegen.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 expects two BIGINT arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  private def spread(v0: Long): Long = {
    var v = v0 & 0x7FFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    spread(a.asInstanceOf[Long]) | (spread(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // one shared private static helper per generated class
      val fn = ctx.addNewFunction("graft_zspread",
        s"""
           |private long graft_zspread(long v) {
           |  v &= 0x7FFFFFFFL;
           |  v = (v | (v << 16)) & 0x0000FFFF0000FFFFL;
           |  v = (v | (v << 8)) & 0x00FF00FF00FF00FFL;
           |  v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL;
           |  v = (v | (v << 2)) & 0x3333333333333333L;
           |  v = (v | (v << 1)) & 0x5555555555555555L;
           |  return v;
           |}
         """.stripMargin)
      s"${ev.value} = $fn($a) | ($fn($b) << 1);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}
