package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression for random-hyperplane LSH banding: the
  * namespaced band values of a vector against a fixed plane matrix —
  * the codegen'd upgrade of the `transform(planes, pl -> CASE WHEN
  * aggregate(zip_with(...)) >= 0 ...)` + band-packing expression pipeline
  * [[graft.ops.Vector]] previously interpreted per row.
  *
  * Semantics (bit-identical to the lambda pipeline and the DuckDB twin):
  * bit p = 1 iff the sequential left fold of `v_j * plane_p_j` over
  * `min(|v|, |plane|)` elements is ≥ 0; band b packs `bandBits`
  * consecutive bits big-endian and adds `b * 16` so band values never
  * collide across bands.
  *
  * The plane matrix rides as a codegen reference object — shipped once
  * per executor with the generated class, not a per-row literal tree.
  */
case class LshBands(
    child: Expression, planes: Seq[Seq[Double]], bandBits: Int)
    extends UnaryExpression {

  require(planes.nonEmpty && bandBits >= 1 && planes.length % bandBits == 0,
    s"plane count ${planes.length} must be a multiple of bandBits $bandBits")

  private def nBands = planes.length / bandBits

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "lsh_bands"

  @transient private lazy val matrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Int](nBands)
    var p = 0
    while (p < matrix.length) {
      val pl = matrix(p)
      val m = math.min(v.numElements(), pl.length)
      var acc = 0d
      var j = 0
      while (j < m) {
        acc += v.getDouble(j) * pl(j)
        j += 1
      }
      val b = p / bandBits
      if (acc >= 0) out(b) |= 1 << (bandBits - 1 - p % bandBits)
      p += 1
    }
    var b = 0
    while (b < nBands) { out(b) += b * 16; b += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val pRef = ctx.addReferenceObj("lshPlanes", matrix, "double[][]")
      val nb = nBands
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val pl = ctx.freshName("pl")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      s"""
         |int[] $out = new int[$nb];
         |for (int $p = 0; $p < ${matrix.length}; $p++) {
         |  double[] $pl = $pRef[$p];
         |  int $m = java.lang.Math.min($v.numElements(), $pl.length);
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    $acc += $v.getDouble($j) * $pl[$j];
         |  }
         |  if ($acc >= 0) $out[$p / $bandBits] |= 1 << ($bandBits - 1 - $p % $bandBits);
         |}
         |for (int $b = 0; $b < $nb; $b++) { $out[$b] += $b * 16; }
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBands =
    copy(child = newChild)
}

object LshBands {

  /** Register `lsh_bands` bound to THIS plane matrix / band width on an
    * already-built session (expressions are captured into plans at
    * analysis time, like [[IvfNearestCells.register]]). */
  def register(
      spark: SparkSession, planes: Array[Array[Double]], bandBits: Int): Unit = {
    val planeSeq: Seq[Seq[Double]] = planes.map(_.toSeq).toSeq
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("lsh_bands"),
      new ExpressionInfo(classOf[LshBands].getName, "lsh_bands"),
      { exprs =>
        require(exprs.length == 1,
          s"lsh_bands expects 1 argument, got ${exprs.length}")
        LshBands(Cast(exprs.head, ArrayType(DoubleType)), planeSeq, bandBits)
      })
  }
}
