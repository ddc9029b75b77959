package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the dot product of two double arrays —
  * the norm-free sibling of [[CosineSimilarity]] for plans that PRECOMPUTE
  * row norms: an all-pairs similarity computes each vector's norm once
  * (corpus-sized work) instead of twice per PAIR inside the fused cosine
  * (pair-sized work, 3 multiply-adds per element) — per-pair cost drops to
  * one multiply-add per element plus a division.
  *
  * Numerics: a single sequential left fold in element order over
  * `min(|a|, |b|)` elements — bit-identical to the dot accumulator inside
  * [[CosineSimilarity]] (accumulators there are independent folds) and to
  * the DuckDB `list_reduce` twin, so `dot_product(a, b) / (nrm_a * nrm_b)`
  * equals `cosine_similarity(a, b)` exactly when
  * `nrm = sqrt(aggregate(v, 0.0, (s, x) -> s + x * x))`.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0d
    var i = 0
    while (i < n) {
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  private[functions] val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"dot_product expects 2 arguments, got ${exprs.length}")
    DotProduct(
      Cast(exprs(0), ArrayType(DoubleType)), Cast(exprs(1), ArrayType(DoubleType)))
  }

  /** Register `dot_product` on an already-built session (idempotent);
    * numeric-array inputs are cast to array<double> (exact for float). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      builder)
}
