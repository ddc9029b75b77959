package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** [[PackCodes]] / [[CodeDot]]: the PHYSICAL int8 representation of the
  * scalar-quantization codes ([[graft.ops.Vector.quantizedVecs]]) and its
  * codegen'd integer dot.
  *
  * `q_similarity_quantized` proved the affine code-dot MATH; these two
  * expressions make the bandwidth claim physical: a code vector rides
  * shuffles as a Dim-byte `binary` cell (one unsigned byte per code —
  * codes are 0..255 by construction of the min/max affine quantizer)
  * instead of a Dim×8-byte `array<double>`, the true 8× shrink the int8
  * story promises. `code_dot` multiplies the bytes UNSIGNED (`& 0xFF`)
  * and accumulates in a long — products ≤ 255² and Dim-length sums stay
  * far below 2^63 (and below 2^53, so the value is also exact when later
  * used in double arithmetic), bit-identical to the BIGINT fold the
  * DuckDB oracles replay over the unpacked code lists.
  */
case class PackCodes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def prettyName: String = "pack_codes"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      // a NULL element packed as byte 0 would be indistinguishable from a
      // real 0 code and silently corrupt every downstream code_dot score —
      // codes are NOT NULL by construction, so a null here is a bug
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          s"pack_codes: null code element at index $i")
      out(i) = (a.getLong(i) & 0xffL).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "pack_codes: null code element at index " + $i);
         |  }
         |  $out[$i] = (byte) ($a.getLong($i) & 0xffL);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PackCodes =
    copy(child = newChild)
}

case class CodeDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "code_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    // a silent min-length truncation would mask a dimension bug AND
    // diverge from the DuckDB twin (which indexes both lists over the
    // full Dim) — mismatched code widths must fail loudly
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"code_dot: code cells differ in width (${x.length} vs ${y.length})")
    var dot = 0L
    var i = 0
    while (i < x.length) {
      dot += (x(i) & 0xff).toLong * (y(i) & 0xff).toLong
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |if ($a.length != $b.length) {
         |  throw new IllegalArgumentException(
         |    "code_dot: code cells differ in width (" + $a.length +
         |      " vs " + $b.length + ")");
         |}
         |long $dot = 0L;
         |for (int $i = 0; $i < $a.length; $i++) {
         |  $dot += ((long) ($a[$i] & 0xff)) * ((long) ($b[$i] & 0xff));
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CodeDot =
    copy(left = newLeft, right = newRight)
}

object CodePack {

  private[functions] val packBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1,
      s"pack_codes expects 1 argument, got ${exprs.length}")
    PackCodes(Cast(exprs.head, ArrayType(LongType)))
  }

  private[functions] val dotBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"code_dot expects 2 arguments, got ${exprs.length}")
    CodeDot(exprs(0), exprs(1))
  }

  /** Register `pack_codes` + `code_dot` on an already-built session
    * (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("pack_codes"),
      new ExpressionInfo(classOf[PackCodes].getName, "pack_codes"),
      packBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("code_dot"),
      new ExpressionInfo(classOf[CodeDot].getName, "code_dot"),
      dotBuilder)
  }
}
