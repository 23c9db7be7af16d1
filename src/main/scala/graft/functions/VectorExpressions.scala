package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding hot path: fused
  * float-array dot product in DOUBLE, left-to-right accumulation.
  *
  * Why not `aggregate(zip_with(...))`: the higher-order-function chain
  * allocates an intermediate array per row and evaluates a lambda per
  * element through `ArrayData` boxing; this expression is a tight
  * primitive loop inside whole-stage codegen — the (b)-tier of the
  * custom-operator preference order (custom `Expression` before custom
  * plan nodes).
  *
  * The accumulation order matches the HOF formulation and the DuckDB
  * oracle's `list_reduce` exactly, so results stay bit-identical.
  */
case class DotF32(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_f32 needs two array<float> args, got ${left.dataType} / ${right.dataType}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_f32"
}

object VectorExpressions {
  private[functions] val dotF32Builder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2, s"dot_f32 takes 2 args, got ${exprs.length}")
    DotF32(exprs.head, exprs(1))
  }

  /** Register `dot_f32` in the session's function registry so it is
    * usable from `expr(...)` and SQL. Idempotent.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotF32].getName, "dot_f32"),
      dotF32Builder)
  }
}

/** Session-extension wiring for deployments that build their session via
  * `spark.sql.extensions=graft.functions.GraftExtensions` (e.g.
  * spark-submit on a cluster): injects the graft native functions at
  * session build, so every session — including SQL-only clients — sees
  * them without calling [[VectorExpressions.register]].
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    e.injectFunction((
      FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotF32].getName, "dot_f32"),
      VectorExpressions.dotF32Builder))
}
