package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression for IVF coarse-quantizer cell ranking: the
  * `nprobe` nearest centroid ids for a vector, ordered by (squared
  * distance asc, cell id asc) — the codegen'd upgrade of the
  * higher-order-function pipeline
  * (`array_sort(zip_with(cents, sequence(..), struct(aggregate(...))))`)
  * that [[graft.ops.Vector]] previously interpreted per row (HOF lambdas
  * never enter whole-stage codegen; this does, like
  * [[CosineSimilarity]]).
  *
  * Numerics are bit-identical to the lambda pipeline and to the DuckDB
  * oracle's `list_reduce` twin: each cell's distance is a sequential left
  * fold of `(x_j - c_j)²` in element order over `min(|v|, |c|)` elements,
  * and ties rank the smaller cell id first (the ascending scan keeps the
  * first minimum).
  *
  * The centroid matrix rides along as a codegen reference object — a
  * per-query CONSTANT shipped once per executor with the generated class,
  * not a per-row SQL literal tree.
  */
case class IvfNearestCells(
    child: Expression, cents: Seq[Seq[Double]], nprobe: Int)
    extends UnaryExpression {

  require(cents.nonEmpty && nprobe >= 1 && nprobe <= cents.length,
    s"nprobe must be in [1, ${cents.length}], got $nprobe")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "ivf_cells"

  @transient private lazy val matrix: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val k = matrix.length
    val ds = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cv = matrix(c)
      val m = math.min(v.numElements(), cv.length)
      var acc = 0d
      var j = 0
      while (j < m) {
        val t = v.getDouble(j) - cv(j)
        acc += t * t
        j += 1
      }
      ds(c) = acc
      c += 1
    }
    val out = new Array[Int](nprobe)
    val used = new Array[Boolean](k)
    var s = 0
    while (s < nprobe) {
      var best = -1
      var ci = 0
      while (ci < k) {
        if (!used(ci) && (best < 0 || ds(ci) < ds(best))) best = ci
        ci += 1
      }
      used(best) = true
      out(s) = best
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cRef = ctx.addReferenceObj("ivfCents", matrix, "double[][]")
      val k = matrix.length
      val ds = ctx.freshName("ds")
      val cv = ctx.freshName("cv")
      val acc = ctx.freshName("acc")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val out = ctx.freshName("out")
      val used = ctx.freshName("used")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val ci = ctx.freshName("ci")
      s"""
         |double[] $ds = new double[$k];
         |for (int $c = 0; $c < $k; $c++) {
         |  double[] $cv = $cRef[$c];
         |  int $m = java.lang.Math.min($v.numElements(), $cv.length);
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    double $t = $v.getDouble($j) - $cv[$j];
         |    $acc += $t * $t;
         |  }
         |  $ds[$c] = $acc;
         |}
         |int[] $out = new int[$nprobe];
         |boolean[] $used = new boolean[$k];
         |for (int $s = 0; $s < $nprobe; $s++) {
         |  int $best = -1;
         |  for (int $ci = 0; $ci < $k; $ci++) {
         |    if (!$used[$ci] && ($best < 0 || $ds[$ci] < $ds[$best])) $best = $ci;
         |  }
         |  $used[$best] = true;
         |  $out[$s] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): IvfNearestCells =
    copy(child = newChild)
}

object IvfNearestCells {

  /** Register `ivf_cells` bound to THIS centroid set / probe width on an
    * already-built session. Re-registration replaces the binding —
    * expressions are captured into plans at analysis time, so queries
    * built before a re-registration keep their own centroids. */
  def register(
      spark: SparkSession, cents: Array[Array[Double]], nprobe: Int): Unit =
    registerAs(spark, "ivf_cells", cents, nprobe)

  /** Same binding under an explicit NAME — the distributed hierarchy fit
    * ([[graft.ops.Vector]] `hierAssignFrame`) needs two coexisting
    * centroid scans in one build (raw-coarse ownership argmin, then
    * re-indexed coarse routing); distinct names keep both bindings live
    * without relying on analysis-time capture ordering. */
  def registerAs(spark: SparkSession, name: String,
      cents: Array[Array[Double]], nprobe: Int): Unit = {
    val centSeq: Seq[Seq[Double]] = cents.map(_.toSeq).toSeq
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo(classOf[IvfNearestCells].getName, name),
      { exprs =>
        require(exprs.length == 1,
          s"$name expects 1 argument, got ${exprs.length}")
        IvfNearestCells(Cast(exprs.head, ArrayType(DoubleType)), centSeq, nprobe)
      })
  }
}
