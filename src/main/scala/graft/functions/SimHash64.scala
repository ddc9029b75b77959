package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 64-bit simhash over a token array, emitted as FOUR 16-bit block
  * values `[b0, b1, b2, b3]` (block k = signature bits [16k, 16k+16); the
  * split-block form is what the Hamming key joins on, and packing into one
  * long would overflow positive BIGINT at bit 63). ONE row-local pass —
  * the codegen'd upgrade of the explode + 64-aggregate groupBy that
  * `q_dedup_simhash_hamming` first shipped with: no token explode, no
  * 64-column partial aggregate, no shuffle at all to build signatures.
  *
  * Parity contract (the DuckDB oracle replays the same arithmetic in SQL;
  * [[graft.ops.Dedup]] keeps that SQL as the single shared generator):
  *   - per token, h1 = first 4 md5 bytes big-endian unsigned
  *     (== `conv(substring(md5(t),1,8),16,10)`, [[graft.ops.Text.md5i]]),
  *     h2 = md5 bytes 4..7 (`substring(md5(t),9,8)`);
  *   - vote j (0 ≤ j < 64) accumulates +1 when bit `j mod 32` of
  *     (j < 32 ? h1 : h2) is set, else −1 — occurrence-weighted, exactly
  *     the `sum(CASE … THEN 1 ELSE -1)` of the SQL twin;
  *   - signature bit j = 1 iff its vote is STRICTLY positive (ties → 0);
  *   - empty token arrays (and arrays of only nulls) yield an all-null
  *     block array, mirroring how the exploded pipeline simply had no
  *     rows for such a document — callers filter those out.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = graft.functions.SimHash64.compute($v);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** One fused pass: token → md5 → 64 ±1 bit votes → 4 packed 16-bit
    * blocks. Static so generated code calls straight into JIT-compiled
    * bytecode (the [[MinHashSig]] pattern). */
  def compute(tk: ArrayData): ArrayData = {
    val n = tk.numElements()
    val votes = new Array[Int](64)
    var any = false
    val md = digests.get()
    var i = 0
    while (i < n) {
      if (!tk.isNullAt(i)) {
        any = true
        md.reset()
        md.update(tk.getUTF8String(i).getBytes)
        val d = md.digest()
        val h1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val h2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        var j = 0
        while (j < 32) {
          votes(j) += (if (((h1 >>> j) & 1L) == 1L) 1 else -1)
          votes(32 + j) += (if (((h2 >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](4)(null))
    else {
      val blocks = new Array[Long](4)
      var k = 0
      while (k < 4) {
        var b = 0L
        var i2 = 0
        while (i2 < 16) {
          if (votes(16 * k + i2) > 0) b |= (1L << i2)
          i2 += 1
        }
        blocks(k) = b
        k += 1
      }
      UnsafeArrayData.fromPrimitiveArray(blocks)
    }
  }

  /** Register `simhash64` on an already-built session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      { exprs =>
        require(exprs.length == 1,
          s"simhash64 expects 1 argument, got ${exprs.length}")
        SimHash64(exprs.head)
      })
}
