package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two 16-bit keys — the DATA-LAYOUT
  * primitive for multi-dimensional pruning: sort (or range-partition) a
  * table by `zorder2(a, b)` and every file/row-group's [min, max]
  * footer stats become a TILE in (a, b) space, so predicates on EITHER
  * dimension prune, instead of perfect pruning on the leading sort key
  * and none on the second. At 100 TB this is the difference between a
  * secondary-dimension query scanning every file and scanning ~√F of
  * them; the footer-stat skipping that consumes the layout already
  * exists in [[graft.sources.BatchSource]].
  *
  * Contract: both inputs are masked to their low 16 bits (65536-bucket
  * rank space per dimension — callers map wider domains down via
  * division or ranking first; masking, not clamping, keeps the function
  * total and engine-portable). The z-value is `spread(x) | spread(y) <<
  * 1` — bit i of x lands at even position 2i, bit i of y at odd 2i+1 —
  * a 32-bit value, so every intermediate fits a signed 64-bit integer
  * in any engine and the DuckDB oracle replays the identical
  * magic-number spread in plain SQL (`q_layout_zorder`).
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "zorder2"

  // registration wraps the children in Cast(LongType); the Number fold
  // keeps a directly-constructed instance over int columns correct too
  // (generated Java widens primitively either way)
  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrder2.compute(x.asInstanceOf[Number].longValue(),
      y.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"""
         |${ev.value} = graft.functions.ZOrder2.compute($x, $y);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {

  /** Spread the low 16 bits of `v` to even bit positions (0, 2, …, 30).
    * Static so generated code calls straight into JIT'd bytecode. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  def compute(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  /** DuckDB replay of [[spread]] over SQL fragment `e` — the exact
    * masks/shifts above, decimal-spelled; every intermediate < 2^32. */
  def spreadDuck(e: String): String = {
    val steps = List(
      ("8", "16711935"),  // << 8, & 0x00FF00FF
      ("4", "252645135"), // << 4, & 0x0F0F0F0F
      ("2", "858993459"), // << 2, & 0x33333333
      ("1", "1431655765") // << 1, & 0x55555555
    )
    steps.foldLeft(s"(($e) & 65535)") { case (acc, (sh, mask)) =>
      s"((($acc) | (($acc) << $sh)) & $mask)"
    }
  }

  /** DuckDB replay of [[compute]]. */
  def computeDuck(x: String, y: String): String =
    s"(${spreadDuck(x)} | (${spreadDuck(y)} << 1))"

  /** Register `zorder2` on an already-built session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("zorder2"),
      new ExpressionInfo(classOf[ZOrder2].getName, "zorder2"),
      { exprs =>
        require(exprs.length == 2,
          s"zorder2 expects 2 arguments, got ${exprs.length}")
        ZOrder2(Cast(exprs.head, LongType), Cast(exprs(1), LongType))
      })
}
