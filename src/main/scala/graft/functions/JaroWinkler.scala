package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** `jaro_winkler(a, b)` — the textbook Jaro-Winkler similarity, the
  * fuzzy-match scorer entity resolution runs on names (Spark ships
  * `levenshtein` but no Jaro family; DuckDB's native
  * `jaro_winkler_similarity` is the oracle twin, and this
  * implementation matches its observable contract, probed value by
  * value: empty input → 0.0, matching window ⌊max(|a|,|b|)/2⌋ − 1,
  * half-transposition count, and the Winkler prefix boost
  * `jaro + min(prefix, 4) · 0.1 · (1 − jaro)` applied only when
  * jaro > 0.7). Comparison is per UTF-16 code unit — identical to
  * DuckDB's byte-wise walk on ASCII text, which is what the fixture
  * (and most name data) carries; supplementary-plane input would
  * diverge from a byte-based engine on EITHER definition, so the
  * contract is documented rather than hidden. Codegen emits one
  * static call (whole-stage codegen keeps the row loop fused; the
  * score itself is branch-heavy scalar code a JIT compiles once).
  * Oracle-checked as `q_text_jaro`; pinned value-by-value against
  * DuckDB probes in FunctionsSpec. */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.score(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.score(" +
        s"$a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** The scorer the generated code calls (static forwarder). */
  def score(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val f1 = new Array[Boolean](l1)
    val f2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var matched = false
      while (j <= hi && !matched) {
        if (!f2(j) && s1.charAt(i) == s2.charAt(j)) {
          f1(i) = true; f2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars in s1 order vs s2 order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (f1(i)) {
        while (!f2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    // RapidFuzz (DuckDB's engine) FLOORS the half-transposition count
    // (integer division) — an odd mismatch count arises when greedy
    // in-window matching crosses alignments ('red bolt'/'blue anvil':
    // m=4, t=3 → 1, not 1.5); probed and pinned in FunctionsSpec
    val jaro = (md / l1 + md / l2 + (md - (t / 2)) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(4, math.min(l1, l2)) &&
        s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  private[functions] val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"jaro_winkler expects 2 arguments, got ${exprs.length}")
    JaroWinklerSim(exprs(0), exprs(1))
  }

  /** Register `jaro_winkler` on an already-built session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler"),
      builder)
}
