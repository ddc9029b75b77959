package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ZOrder2: the magic-number spread must equal the definitional bit
  * interleave, and the layout it induces must actually buy
  * secondary-dimension pruning under the footer-stat [min, max] model. */
class ZOrderSpec extends SparkSpec {

  /** Definitional interleave: bit i of x → 2i, bit i of y → 2i+1. */
  private def naive(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("magic-number spread ≡ definitional interleave, ∀ 16-bit inputs") {
    val rnd = new scala.util.Random(7)
    // corners + random interior
    val probes = Seq(0L, 1L, 0xFFFFL, 0x8000L, 0x5555L, 0xAAAAL) ++
      Seq.fill(500)(rnd.nextInt(65536).toLong)
    for (x <- probes; y <- probes.take(12)) {
      assert(ZOrder2.compute(x, y) == naive(x, y), s"($x, $y)")
    }
    // masking contract: only the low 16 bits participate
    assert(ZOrder2.compute(0x12345L, 3L) == ZOrder2.compute(0x2345L, 3L))
  }

  test("expression evaluates identically interpreted and codegen'd") {
    import spark.implicits._
    ZOrder2.register(spark)
    val df = (0 until 1000)
      .map(i => (i.toLong * 131 % 65536, i.toLong * 31 % 65536))
      .toDF("x", "y")
    val want = (0 until 1000)
      .map(i => naive(i.toLong * 131 % 65536, i.toLong * 31 % 65536))
    val got = df.select(expr("zorder2(x, y)")).collect().map(_.getLong(0))
    assert(got.toSeq == want)
    // force the interpreted nullSafeEval path too — a codegen-only run
    // would let a divergence in the eval path through untested
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(expr("zorder2(x, y)")).collect().map(_.getLong(0))
      assert(interp.toSeq == want)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("z-order layout prunes the secondary dimension; linear sort cannot") {
    import spark.implicits._
    ZOrder2.register(spark)
    // 4096 points on a 64×64 grid, 16 equal chunks per layout — each
    // chunk models one file/row-group whose footer stats are the
    // [min, max] of each column (exactly what BatchSource skips on).
    val pts = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val df = pts.toDF("x", "y")
    val chunks = 16
    def footerStats(sorted: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] = {
      // rank in sort order → chunk id; aggregate per-chunk min/max
      val w = org.apache.spark.sql.expressions.Window.orderBy("k")
      sorted.withColumn("rk", row_number().over(w) - 1)
        .withColumn("chunk", floor(col("rk") * chunks / pts.length))
        .groupBy("chunk")
        .agg(min("x").as("xlo"), max("x").as("xhi"),
          min("y").as("ylo"), max("y").as("yhi"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq
    }
    val linear = footerStats(df.withColumn("k", struct(col("x"), col("y"))))
    val zorder = footerStats(df.withColumn("k", expr("zorder2(x, y)")))
    assert(linear.size == chunks && zorder.size == chunks)
    // y-only predicate: y ∈ [16, 23] (1/8 of the domain)
    def touched(stats: Seq[(Long, Long, Long, Long)]) =
      stats.count { case (_, _, ylo, yhi) => yhi >= 16 && ylo <= 23 }
    // linear sort on (x, y): every chunk spans the full y range
    assert(touched(linear) == chunks,
      s"linear layout should touch all $chunks chunks, got ${touched(linear)}")
    // z-order: 16 chunks tile the grid 4×4, a 1/8 y-band hits one row
    // of tiles (+1 tolerance for the unaligned band edge)
    assert(touched(zorder) <= chunks / 4 + 1,
      s"z-order should touch ≤ ${chunks / 4 + 1} chunks, got ${touched(zorder)}")
    // the leading dimension keeps a bound too: x ∈ [16, 23] touches at
    // most one tile-row's worth of chunks either way
    def touchedX(stats: Seq[(Long, Long, Long, Long)]) =
      stats.count { case (xlo, xhi, _, _) => xhi >= 16 && xlo <= 23 }
    assert(touchedX(zorder) <= chunks / 4 + 1)
  }

  test("zorderLayout partitions carry disjoint z-ranges (tile files)") {
    import spark.implicits._
    val pts = for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong)
    // awkward column names must survive as references (backtick quoting)
    val quoted = graft.Graft.zorderLayout(
      spark, pts.toDF("x col", "select"), "x col", "select", partitions = 2)
    assert(quoted.count() == pts.length)
    val laid = graft.Graft.zorderLayout(
      spark, pts.toDF("x", "y"), "x", "y", partitions = 4)
    val ranges = laid
      .select(spark_partition_id().as("pid"), expr("zorder2(x, y)").as("z"))
      .groupBy("pid").agg(min("z").as("zlo"), max("z").as("zhi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(ranges.length == 4)
    // range partitioning ⇒ consecutive partitions never overlap in z
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }
}
