package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression for TWO-LEVEL (hierarchical) IVF cell
  * ranking — the assignment-side counterpart of [[IvfNearestCells]]
  * and the rung BASELINE.md's fixed-cell-size analysis named: a flat
  * scan over k fine cells costs n·k dot-folds, which caps useful k at
  * √n (the balanced flat optimum); routing through ⌈√k⌉ coarse
  * centers first costs n·(√k + k/√k) = 2n√k, so k = n^(2/3) fine
  * cells become affordable and TOTAL join work (assignment + pair
  * scoring) drops from Θ(n^1.5) to Θ(n^(4/3)).
  *
  * Contract (replayed verbatim by the DuckDB twin):
  *   1. distances to every coarse center — the same sequential
  *      (x_j − c_j)² left fold as [[IvfNearestCells]];
  *   2. the `nprobeCoarse` nearest coarse groups (dist asc, coarse
  *      position asc);
  *   3. among the fine centers OWNED by those groups, the `nprobe`
  *      nearest fine cell ids (dist asc, fine position asc). Fewer
  *      than `nprobe` candidates emit as-is (the caller guarantees
  *      every group is non-empty, so ≥ nprobeCoarse candidates
  *      always exist).
  * Owner lists ride along as codegen reference objects, like the
  * centroid matrix — per-query constants, not per-row literals. */
case class HierIvfCells(
    child: Expression,
    coarse: Seq[Seq[Double]], fine: Seq[Seq[Double]],
    ownedFine: Seq[Seq[Int]], nprobeCoarse: Int, nprobe: Int)
    extends UnaryExpression {

  require(coarse.nonEmpty && fine.nonEmpty, "empty center set")
  require(ownedFine.length == coarse.length,
    s"one owned-fine list per coarse center: ${ownedFine.length} vs ${coarse.length}")
  require(ownedFine.forall(_.nonEmpty),
    "every coarse group must own at least one fine center (drop empty " +
      "groups at build time — hierCenters does)")
  require(nprobeCoarse >= 1 && nprobeCoarse <= coarse.length,
    s"nprobeCoarse must be in [1, ${coarse.length}], got $nprobeCoarse")
  require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "hier_cells"

  @transient private lazy val coarseM: Array[Array[Double]] =
    coarse.map(_.toArray).toArray
  @transient private lazy val fineM: Array[Array[Double]] =
    fine.map(_.toArray).toArray
  @transient private lazy val ownedM: Array[Array[Int]] =
    ownedFine.map(_.toArray).toArray

  /** The shared two-level scan, also invoked by the generated code —
    * the routing logic (two ranked selection loops over variable-size
    * owner lists) is control-flow, not per-element arithmetic, so a
    * static-method call keeps eval and codegen literally one body
    * instead of two transcriptions that could drift. */
  override protected def nullSafeEval(input: Any): Any =
    HierIvfCells.scan(input.asInstanceOf[ArrayData], coarseM, fineM,
      ownedM, nprobeCoarse, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cRef = ctx.addReferenceObj("hierCoarse", coarseM, "double[][]")
      val fRef = ctx.addReferenceObj("hierFine", fineM, "double[][]")
      val oRef = ctx.addReferenceObj("hierOwned", ownedM, "int[][]")
      s"""
         |${ev.value} = graft.functions.HierIvfCells.scan(
         |  $v, $cRef, $fRef, $oRef, $nprobeCoarse, $nprobe);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HierIvfCells =
    copy(child = newChild)
}

object HierIvfCells {

  /** Two-level scan: coarse ranking, then fine ranking within the
    * probed groups. Sequential (x−c)² folds in element order; all
    * ties break toward the smaller position index (the ascending
    * scans keep the first minimum) — bit-compatible with
    * [[IvfNearestCells]] and the DuckDB twins. */
  def scan(v: ArrayData, coarse: Array[Array[Double]],
      fine: Array[Array[Double]], owned: Array[Array[Int]],
      nprobeCoarse: Int, nprobe: Int): UnsafeArrayData = {
    val kc = coarse.length
    val cds = new Array[Double](kc)
    var c = 0
    while (c < kc) {
      val cv = coarse(c)
      val m = math.min(v.numElements(), cv.length)
      var acc = 0d
      var j = 0
      while (j < m) {
        val t = v.getDouble(j) - cv(j)
        acc += t * t
        j += 1
      }
      cds(c) = acc
      c += 1
    }
    val topC = new Array[Int](nprobeCoarse)
    val usedC = new Array[Boolean](kc)
    var s = 0
    while (s < nprobeCoarse) {
      var best = -1
      var ci = 0
      while (ci < kc) {
        if (!usedC(ci) && (best < 0 || cds(ci) < cds(best))) best = ci
        ci += 1
      }
      usedC(best) = true
      topC(s) = best
      s += 1
    }
    // candidate fine cells = the probed groups' owner lists
    var nCand = 0
    var g = 0
    while (g < nprobeCoarse) { nCand += owned(topC(g)).length; g += 1 }
    val candId = new Array[Int](nCand)
    val candD = new Array[Double](nCand)
    var w = 0
    g = 0
    while (g < nprobeCoarse) {
      val lst = owned(topC(g))
      var i = 0
      while (i < lst.length) {
        val fid = lst(i)
        val fv = fine(fid)
        val m = math.min(v.numElements(), fv.length)
        var acc = 0d
        var j = 0
        while (j < m) {
          val t = v.getDouble(j) - fv(j)
          acc += t * t
          j += 1
        }
        candId(w) = fid
        candD(w) = acc
        w += 1
        i += 1
      }
      g += 1
    }
    val take = math.min(nprobe, nCand)
    val out = new Array[Int](take)
    val used = new Array[Boolean](nCand)
    s = 0
    while (s < take) {
      var best = -1
      var i = 0
      while (i < nCand) {
        if (!used(i) && (best < 0 ||
            candD(i) < candD(best) ||
            (candD(i) == candD(best) && candId(i) < candId(best)))) best = i
        i += 1
      }
      used(best) = true
      out(s) = candId(best)
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Register `hier_cells` bound to THIS hierarchy on an already-built
    * session; re-registration replaces the binding (expressions are
    * captured into plans at analysis time). */
  def register(spark: SparkSession, coarse: Array[Array[Double]],
      fine: Array[Array[Double]], ownedFine: Array[Array[Int]],
      nprobeCoarse: Int, nprobe: Int): Unit = {
    val cs: Seq[Seq[Double]] = coarse.map(_.toSeq).toSeq
    val fs: Seq[Seq[Double]] = fine.map(_.toSeq).toSeq
    val os: Seq[Seq[Int]] = ownedFine.map(_.toSeq).toSeq
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("hier_cells"),
      new ExpressionInfo(classOf[HierIvfCells].getName, "hier_cells"),
      { exprs =>
        require(exprs.length == 1,
          s"hier_cells expects 1 argument, got ${exprs.length}")
        HierIvfCells(Cast(exprs.head, ArrayType(DoubleType)), cs, fs, os,
          nprobeCoarse, nprobe)
      })
  }
}
