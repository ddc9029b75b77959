package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct 3-token shingling over a token array — the codegen'd
  * upgrade of `array_distinct(transform(sequence(...), i -> concat(...)))`
  * that [[graft.ops.Dedup]] previously interpreted per row.
  *
  * Parity contract: shingle i = `tk[i] ⧺ ' ' ⧺ tk[i+1] ⧺ ' ' ⧺ tk[i+2]`,
  * deduplicated keeping FIRST occurrence order (`array_distinct`
  * semantics; downstream Jaccard set sizes don't depend on order, but the
  * array itself matches the HOF pipeline element for element).
  */
case class Shingles3(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "shingles3"

  override protected def nullSafeEval(input: Any): Any =
    Shingles3.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = graft.functions.Shingles3.compute($v);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)
}

object Shingles3 {

  private val Space = UTF8String.fromString(" ")

  /** One fused pass: concat 3-grams, dedupe preserving first occurrence.
    * Static so generated code calls straight into JIT'd bytecode. */
  def compute(tk: ArrayData): ArrayData = {
    val n = tk.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + 2 < n) {
      if (!tk.isNullAt(i) && !tk.isNullAt(i + 1) && !tk.isNullAt(i + 2)) {
        out.add(UTF8String.concat(
          tk.getUTF8String(i), Space, tk.getUTF8String(i + 1), Space,
          tk.getUTF8String(i + 2)))
      }
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** Register `shingles3` on an already-built session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("shingles3"),
      new ExpressionInfo(classOf[Shingles3].getName, "shingles3"),
      { exprs =>
        require(exprs.length == 1,
          s"shingles3 expects 1 argument, got ${exprs.length}")
        Shingles3(exprs.head)
      })
}
