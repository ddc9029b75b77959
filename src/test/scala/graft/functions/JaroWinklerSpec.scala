package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[JaroWinklerSim]] must equal DuckDB's jaro_winkler_similarity —
  * every expected value below was PROBED from DuckDB on this machine
  * (the oracle key `q_text_jaro` re-proves it over 95k fixture pairs).
  * The 'red bolt' case pins the floored half-transposition rule (m=4,
  * t=3 → 1): the divergence the first implementation shipped. */
class JaroWinklerSpec extends SparkSpec {

  private val cases = Seq(
    // (a, b, DuckDB jaro_winkler_similarity)
    ("martha", "marhta", 0.9611111111111111), // prefix-3 boost
    ("DIXON", "DICKSONX", 0.8133333333333332), // prefix-2 boost
    ("aXXXXX", "aYYYYY", 0.4444444444444444), // jaro < 0.7 → NO boost
    ("CRATE", "TRACE", 0.7333333333333334), // > 0.7 but prefix 0
    ("abcdefgh", "abcdefxy", 0.9), // prefix capped at 4
    ("red bolt", "blue anvil", 0.5499999999999999), // odd t=3 → floor to 1
    ("", "abc", 0.0), // empty → 0 (DuckDB, not 1)
    ("", "", 0.0),
    ("a", "a", 1.0),
    ("ab", "ba", 0.0)) // window 0 → no matches

  test("scorer equals the DuckDB probes, interpreted and codegen'd") {
    cases.foreach { case (a, b, want) =>
      assert(JaroWinkler.score(a, b) == want,
        s"score('$a','$b') = ${JaroWinkler.score(a, b)}, want $want")
    }
    // through the registered expression (codegen path)
    JaroWinkler.register(spark)
    import spark.implicits._
    val got = cases.map { case (a, b, _) => (a, b) }
      .toDF("a", "b")
      .select(expr("jaro_winkler(a, b)")).collect().map(_.getDouble(0))
    assert(got.toSeq == cases.map(_._3),
      s"codegen path diverged: ${got.toSeq} vs ${cases.map(_._3)}")
  }

  test("symmetry and null propagation") {
    assert(JaroWinkler.score("large bolt", "new gear") ==
      JaroWinkler.score("new gear", "large bolt"))
    JaroWinkler.register(spark)
    import spark.implicits._
    val r = Seq((Some("x"), Option.empty[String])).toDF("a", "b")
      .select(expr("jaro_winkler(a, b)")).collect()(0)
    assert(r.isNullAt(0))
  }
}
