package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity of two ARRAY<FLOAT>
  * columns, with whole-stage codegen (`doGenCode`).
  *
  * Why an Expression and not a UDF or mapPartitions: a Scala UDF boxes
  * every element and blocks codegen; a mapPartitions pass (the previous
  * implementation) is compiled but forces an encoder boundary — rows
  * serialize out of Tungsten and back. This expression stays inside the
  * generated stage: the join that produces candidate pairs, the cosine,
  * and the threshold filter compile into ONE Java loop.
  *
  * Numerics: one interleaved left-to-right pass (dot over the common
  * prefix, norms over each full array) — the same accumulation order as
  * the SQL higher-order formulation and the DuckDB oracle, so results are
  * bit-identical across all three.
  */
case class FloatVecCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_cosine expects two ARRAY<FLOAT> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var dot = 0.0; var na = 0.0; var nb = 0.0
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble; val yv = y.getFloat(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    var j = n
    while (j < x.numElements()) { val v = x.getFloat(j).toDouble; na += v * v; j += 1 }
    j = n
    while (j < y.numElements()) { val v = y.getFloat(j).toDouble; nb += v * v; j += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |int $n = Math.min($a.numElements(), $b.numElements());
         |int $i = 0;
         |for (; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |for (int j = $n; j < $a.numElements(); j++) {
         |  double v = (double) $a.getFloat(j); $na += v * v;
         |}
         |for (int j = $n; j < $b.numElements(); j++) {
         |  double v = (double) $b.getFloat(j); $nb += v * v;
         |}
         |${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecCosine =
    copy(left = newLeft, right = newRight)
}

/** Registration: per-session (`GraftFunctions.register`) or via the
  * standard extensions hook
  * (`--conf spark.sql.extensions=graft.functions.GraftExtensions`).
  */
object GraftFunctions {

  val functions: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("vec_cosine",
      (es: Seq[Expression]) => FloatVecCosine(es(0), es(1)),
      "vec_cosine(a, b) - cosine similarity of two ARRAY<FLOAT> vectors"))

  /** Idempotent per-session registration (temp functions). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (name, builder, _) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

/** `SparkSessionExtensions` injector so the functions exist in every
  * session of a cluster configured with
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, builder, usage) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[FloatVecCosine].getName, name, usage),
        builder))
    }
}
