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
    // residual exotics only — the frequent 2-arg TO_VARCHAR / 3-arg
    // EDITDISTANCE / STRTOK forms (incl. MON/DY and character sets,
    // round 16) map exactly
    val e1 = intercept[RuntimeException](
      SqlDialect.rewrite("TO_VARCHAR(d, 'MONTH DD, YYYY')")) // full name
    assert(e1.getMessage.contains("tokens outside the mapped set"))
    val e2 = intercept[RuntimeException](
      SqlDialect.rewrite("TO_VARCHAR(d, fmt_col)")) // computed format
    assert(e2.getMessage.contains("string literal"))
    val e3 = intercept[IllegalArgumentException](
      SqlDialect.rewrite("STRTOK(s, '', 2)")) // whole-string-as-token form
    assert(e3.getMessage.contains("EMPTY delimiter"))
    val e4 = intercept[IllegalArgumentException](
      SqlDialect.rewrite("IFF(a, b)"))
    assert(e4.getMessage.contains("3 argument"))
  }

  test("2-arg TO_VARCHAR maps literal date and numeric formats") {
    assert(SqlDialect.rewrite("TO_VARCHAR(d, 'YYYY-MM-DD')") ==
      "date_format((d), 'yyyy-MM-dd')")
    assert(SqlDialect.rewrite("TO_VARCHAR(d, 'DD/MM/YYYY HH24:MI:SS')") ==
      "date_format((d), 'dd/MM/yyyy HH:mm:ss')")
    // case-insensitive tokens, 12-hour + meridiem, fractional seconds
    assert(SqlDialect.rewrite("TO_VARCHAR(d, 'hh12:mi am')") ==
      "date_format((d), 'hh:mm a')")
    assert(SqlDialect.rewrite("TO_VARCHAR(d, 'SS.FF3')") ==
      "date_format((d), 'ss.SSS')")
    assert(SqlDialect.rewrite("TO_VARCHAR(x, '9,999,990.00')") ==
      "format_number((x), '#,###,##0.00')")
    assert(SqlDialect.rewrite("TO_VARCHAR(x, '0000')") ==
      "format_number((x), '0000')")
    assert(SqlDialect.rewrite("TO_VARCHAR(x, '$9,990.00')") ==
      "format_number((x), '$#,##0.00')")
    // MON/DY (round 16): output case follows the keyword's case —
    // capitalized folds into the plain pattern (no concat), upper/lower
    // emit their own wrapped segment
    assert(SqlDialect.rewrite("TO_VARCHAR(d, 'Mon DD, YYYY')") ==
      "date_format((d), 'MMM dd, yyyy')")
    assert(SqlDialect.rewrite("TO_VARCHAR(d, 'MON DD')") ==
      "concat(upper(date_format((d), 'MMM')), date_format((d), ' dd'))")
    assert(SqlDialect.rewrite("TO_VARCHAR(d, 'dy')") ==
      "lower(date_format((d), 'EEE'))")
    // behavioral: the wrapped segments really produce Snowflake's case
    val mon = spark.sql("SELECT " +
      SqlDialect.rewrite("TO_VARCHAR(DATE'1996-01-02', 'MON DD, YYYY')") +
      " AS u, " +
      SqlDialect.rewrite("TO_VARCHAR(DATE'1996-01-02', 'Mon')") + " AS c, " +
      SqlDialect.rewrite("TO_VARCHAR(DATE'1996-01-02', 'dy')") + " AS l")
      .collect().head
    assert(mon.getString(0) == "JAN 02, 1996")
    assert(mon.getString(1) == "Jan")
    assert(mon.getString(2) == "tue")
    // '$' only leads; two decimal points are not a numeric format
    intercept[RuntimeException](SqlDialect.rewrite("TO_VARCHAR(x, '9$9')"))
    intercept[RuntimeException](SqlDialect.rewrite("TO_VARCHAR(x, '9.9.9')"))
    // 9/0 orderings DecimalFormat rejects must fail AT REWRITE TIME,
    // not as a raw Malformed-pattern error mid-execution: integer part
    // needs 9s before 0s, fraction the mirror
    intercept[RuntimeException](SqlDialect.rewrite("TO_VARCHAR(x, '099')"))
    intercept[RuntimeException](SqlDialect.rewrite("TO_VARCHAR(x, '9.90')"))
  }

  test("3-arg EDITDISTANCE clamps to max via nullif, ONE evaluation") {
    assert(SqlDialect.rewrite("EDITDISTANCE(a, b, 3)") ==
      "coalesce(nullif(levenshtein((a), (b), (3)), -1), (3))")
    // behavioral: clamp at max, exact at/below max (Spark end-to-end)
    val r = spark.sql("SELECT " +
      SqlDialect.rewrite("EDITDISTANCE('kitten', 'sitting', 2)") + " AS c, " +
      SqlDialect.rewrite("EDITDISTANCE('kitten', 'sitting', 3)") + " AS e, " +
      SqlDialect.rewrite("EDITDISTANCE('kitten', 'sitting', 9)") + " AS f")
      .collect().head
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((2, 3, 3)))
  }

  test("single-char STRTOK collapses empties and NULLs past the end") {
    val got = spark.sql("SELECT " +
      SqlDialect.rewrite("STRTOK('a  b   c', ' ', 3)") + " AS c3, " +
      SqlDialect.rewrite("STRTOK('a  b', ' ', 9)") + " AS miss, " +
      SqlDialect.rewrite("STRTOK('x.y.z', '.', 2)") + " AS dot, " +
      SqlDialect.rewrite("STRTOK('one two')") + " AS dflt")
      .collect().head
    assert(got.getString(0) == "c")
    assert(got.isNullAt(1), "past-the-end must be NULL, not ''")
    assert(got.getString(2) == "y", "regex-special delimiter must escape")
    assert(got.getString(3) == "one")
    // character-SET form (round 16): any-of splitting, empty-token
    // collapse across MIXED consecutive delimiters, regex metas in the
    // class escaped, NULL past the end — Snowflake's documented
    // STRTOK('a.b,c', '.,', k) behavior
    val set = spark.sql("SELECT " +
      SqlDialect.rewrite("STRTOK('a.b,c', '.,', 2)") + " AS s2, " +
      SqlDialect.rewrite("STRTOK('x-.y', '.-', 2)") + " AS mixed, " +
      SqlDialect.rewrite("STRTOK('p1]q2[r3', '[]', 3)") + " AS bracket, " +
      SqlDialect.rewrite("STRTOK('a.b,c', '.,', 4)") + " AS miss")
      .collect().head
    assert(set.getString(0) == "b")
    assert(set.getString(1) == "y",
      "mixed consecutive set delimiters must collapse to no token")
    assert(set.getString(2) == "r3",
      "regex metas inside the class must escape")
    assert(set.isNullAt(3), "set form past-the-end must be NULL")
    // Snowflake ERRORS on part <= 0; try_element_at(-1) would silently
    // serve the LAST token — literal parts reject at rewrite time,
    // computed parts raise at execution
    val e = intercept[IllegalArgumentException](
      SqlDialect.rewrite("STRTOK('a-b', '-', 0)"))
    assert(e.getMessage.contains("part must be >= 1"))
    val e2 = intercept[Exception](spark.sql("SELECT " +
      SqlDialect.rewrite("STRTOK('a-b', '-', 1 - 2)")).collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e2).exists(m => m != null && m.contains("part must be >= 1")))
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

  test("maskLiterals: same length, keywords hidden, delimiters survive") {
    def m(s: String) = SqlDialect.maskLiterals(s)
    val cases = Seq(
      "SELECT 'x WHERE y' AS a FROM t",
      "UPDATE t SET a = 'it''s WHEN' WHERE k = 1",
      "SELECT a -- WHERE hidden\nFROM t",
      "SELECT /* WHEN * hidden */ a FROM t",
      "SELECT \"odd col\" , `tick QUALIFY` FROM t",
      "SELECT 'unterminated",      // unterminated literal
      "SELECT a /* unterminated",  // unterminated comment
      "SELECT '' AS empty, a FROM t")
    cases.foreach { s =>
      val masked = m(s)
      assert(masked.length == s.length, s"length drift for: $s")
      assert(!masked.toUpperCase.matches("(?s).*'[^']*WHERE[^']*'.*"),
        s"literal keyword leaked: $masked")
    }
    assert(m("SELECT 'x WHERE y' FROM t") == "SELECT '#########' FROM t")
    assert(m("a -- b WHERE c\nd") == "a --##########\nd")
    assert(m("a /* WHEN */ b") == "a /*######*/ b")
    // '' doubling masks as interior, both quotes of the pair included
    assert(m("'it''s'") == "'#####'")
  }
}
