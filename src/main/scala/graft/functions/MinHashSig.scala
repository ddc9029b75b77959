package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature over a token array: 3-token shingles →
  * md5-derived 32-bit hash → K permuted minima, fused into ONE pass — the
  * codegen'd upgrade of the four-stage HOF pipeline
  * (`transform(concat…)` → `transform(md5…)` → K × `array_min(transform)`)
  * that [[graft.ops.Dedup]] previously interpreted per row.
  *
  * Parity contract (the DuckDB oracle replays the same arithmetic):
  *   - shingle = `tk[i] ⧺ ' ' ⧺ tk[i+1] ⧺ ' ' ⧺ tk[i+2]` over UTF-8 bytes;
  *   - hash = first 4 md5 bytes big-endian unsigned
  *     (== `conv(substring(md5(s),1,8),16,10)`, [[graft.ops.Text.md5i]]);
  *   - signature k = min over shingles of `(a_k·h + b_k) mod p` — exact in
  *     signed 64-bit (a ≤ 1.3e8, h < 2³² → product < 2⁶³), and identical
  *     whether or not shingles are deduplicated first (min ignores
  *     multiplicity, so `array_distinct` dropped out of this path);
  *   - fewer than 3 tokens → all-null signature (`array_min([]) = NULL`).
  */
case class MinHashSig(
    child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression {

  require(a.nonEmpty && a.length == b.length, "coefficient arrays must align")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "minhash_sig"

  @transient private lazy val aArr: Array[Long] = a.toArray
  @transient private lazy val bArr: Array[Long] = b.toArray

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
      s"""
         |${ev.value} = graft.functions.MinHashSig.compute($v, $aRef, $bRef, ${p}L);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** One fused pass: shingle → md5-int → K running minima. Static so the
    * generated code calls straight into JIT-compiled bytecode (the same
    * pattern as Spark's StaticInvoke), no interpreted lambda machinery. */
  def compute(tk: ArrayData, a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val n = tk.numElements()
    val k = a.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    val md = digests.get()
    val space = ' '.toByte
    var i = 0
    while (i + 2 < n) {
      if (!tk.isNullAt(i) && !tk.isNullAt(i + 1) && !tk.isNullAt(i + 2)) {
        md.reset()
        md.update(tk.getUTF8String(i).getBytes)
        md.update(space)
        md.update(tk.getUTF8String(i + 1).getBytes)
        md.update(space)
        md.update(tk.getUTF8String(i + 2).getBytes)
        val d = md.digest()
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        any = true
        var j = 0
        while (j < k) {
          val v = (a(j) * h + b(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](k)(null))
    else UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Register `minhash_sig` bound to THESE permutation constants on an
    * already-built session. */
  def register(
      spark: SparkSession, a: Seq[Long], b: Seq[Long], p: Long): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      { exprs =>
        require(exprs.length == 1,
          s"minhash_sig expects 1 argument, got ${exprs.length}")
        MinHashSig(exprs.head, a, b, p)
      })
}
