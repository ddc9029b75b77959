package graft

/** The Snowflake scalar-dialect shim ([[SqlDialect]]): mapped calls
  * rewrite exactly, divergent forms fail LOUDLY, and everything else —
  * strings, comments, quoted identifiers, natively-supported
  * functions — passes through byte-for-byte. The oracle-checked twins
  * are `q_sql_dialect_scalar` / `_bitwise` / `_passthrough` /
  * `_listagg`; this spec covers the rewriter's edges. */
class SqlDialectSpec extends SparkSpec {
  import spark.implicits._

  test("simple renames and wraps") {
    assert(SqlDialect.rewrite("SELECT IFF(a > 1, 'x', 'y')") ==
      "SELECT if(a > 1, 'x', 'y')")
    assert(SqlDialect.rewrite("SELECT SQUARE(x)") ==
      "SELECT power((x), 2)")
    assert(SqlDialect.rewrite("SELECT charindex('b', s)") ==
      "SELECT locate('b', s)")
    assert(SqlDialect.rewrite("SELECT TO_VARCHAR(n)") ==
      "SELECT CAST((n) AS STRING)")
    assert(SqlDialect.rewrite("SELECT EditDistance(a, b)") ==
      "SELECT levenshtein(a, b)")
    assert(SqlDialect.rewrite("SELECT BITAND(a, 255)") ==
      "SELECT ((a) & (255))")
    assert(SqlDialect.rewrite("SELECT BITNOT(a)") == "SELECT (~(a))")
    assert(SqlDialect.rewrite("SELECT BITSHIFTLEFT(a, 3)") ==
      "SELECT shiftleft(a, 3)")
  }

  test("DIV0 becomes the zero-guarded CASE, DIV0NULL adds the NULL arm") {
    assert(SqlDialect.rewrite("DIV0(a, b)") ==
      "(CASE WHEN (b) = 0 THEN 0 ELSE (a) / (b) END)")
    assert(SqlDialect.rewrite("DIV0NULL(a, b)") ==
      "(CASE WHEN (b) = 0 OR (b) IS NULL THEN 0 ELSE (a) / (b) END)")
  }

  test("nested calls rewrite inside-out") {
    assert(SqlDialect.rewrite("IFF(DIV0(a, b) > 0, SQUARE(x), y)") ==
      "if((CASE WHEN (b) = 0 THEN 0 ELSE (a) / (b) END) > 0, " +
        "power((x), 2), y)")
  }

  test("commas inside nested parens and strings don't split arguments") {
    assert(SqlDialect.rewrite("IFF(f(a, b) = 1, 'x,y', concat(c, d))") ==
      "if(f(a, b) = 1, 'x,y', concat(c, d))")
  }

  test("string literals, comments, and quoted identifiers pass through") {
    assert(SqlDialect.rewrite("SELECT 'IFF(a,b,c)' AS t") ==
      "SELECT 'IFF(a,b,c)' AS t")
    assert(SqlDialect.rewrite("SELECT 'it''s IFF(x,y,z)'") ==
      "SELECT 'it''s IFF(x,y,z)'")
    assert(SqlDialect.rewrite("SELECT x -- IFF(a,b,c)\nFROM t") ==
      "SELECT x -- IFF(a,b,c)\nFROM t")
    assert(SqlDialect.rewrite("SELECT /* IFF(a,b,c) */ x") ==
      "SELECT /* IFF(a,b,c) */ x")
    assert(SqlDialect.rewrite("SELECT \"IFF\"(a, b, c)") ==
      "SELECT \"IFF\"(a, b, c)")
  }

  test("a bare identifier or qualified reference named like a mapping is untouched") {
    assert(SqlDialect.rewrite("SELECT iff FROM t") == "SELECT iff FROM t")
    assert(SqlDialect.rewrite("SELECT s.iff(a, b, c)") ==
      "SELECT s.iff(a, b, c)")
    // suffix/prefix words that merely contain a mapped name
    assert(SqlDialect.rewrite("SELECT diff(a, b), squarex(y)") ==
      "SELECT diff(a, b), squarex(y)")
  }

  test("divergent forms fail loudly with the offending call") {
    val e1 = intercept[IllegalArgumentException](
      SqlDialect.rewrite("TO_VARCHAR(d, 'YYYY-MM')"))
    assert(e1.getMessage.contains("format"))
    val e2 = intercept[IllegalArgumentException](
      SqlDialect.rewrite("EDITDISTANCE(a, b, 3)"))
    assert(e2.getMessage.contains("max-distance"))
    val e3 = intercept[RuntimeException](
      SqlDialect.rewrite("STRTOK(s, '.,', 2)"))
    assert(e3.getMessage.contains("split_part"))
    val e4 = intercept[IllegalArgumentException](
      SqlDialect.rewrite("IFF(a, b)"))
    assert(e4.getMessage.contains("3 argument"))
  }

  test("rewritten SQL actually runs through the front door") {
    Seq((1L, 10.0, "abc"), (2L, 0.0, "xyz"))
      .toDF("k", "d", "s").createOrReplaceTempView("sd_t")
    val rows = SqlText.sql(spark,
      """SELECT k, IFF(d > 5, 'hi', 'lo') AS tag,
        |  DIV0(100.0, d) AS ratio,
        |  CHARINDEX('b', s) AS pos,
        |  BITSHIFTLEFT(BITAND(k, 3), 2) AS sh
        |FROM sd_t ORDER BY k""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getDouble(2), r.getInt(3), r.getLong(4)))
    assert(rows.toSeq == Seq((1L, "hi", 10.0, 2, 4L),
      (2L, "lo", 0.0, 0, 8L)))
    spark.catalog.dropTempView("sd_t")
  }

  test("dialect calls work inside MERGE AND-gates") {
    Seq((1L, "a", 10L), (2L, "b", 20L))
      .toDF("k", "tag", "v").createOrReplaceTempView("sd_corpus")
    Seq((1L, "A", 11L), (2L, "B", 99L))
      .toDF("k", "tag", "v").createOrReplaceTempView("sd_batch")
    // gate: only rows where IFF says the batch v is small get updated
    val out = SqlText.sql(spark,
      """MERGE INTO sd_corpus c USING sd_batch b ON c.k = b.k
        |WHEN MATCHED AND IFF(b.v < 50, true, false) THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "A", 11L), (2L, "b", 20L)))
    spark.catalog.dropTempView("sd_corpus")
    spark.catalog.dropTempView("sd_batch")
  }
}
