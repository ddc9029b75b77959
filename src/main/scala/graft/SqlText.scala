package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Warehouse-SQL text front-end — the reference's query-string-first UX
  * (`read_snowflake(query)`, dask_snowflake/core.py:143) for the three
  * statements a warehouse user types that Spark SQL cannot run without
  * extra machinery: `MERGE INTO` (Spark parses it but needs a v2 table
  * format to analyze), Snowflake-style `ASOF JOIN … MATCH_CONDITION`
  * (no Spark syntax at all), and the `QUALIFY` window-filter clause
  * (no QUALIFY token in Spark 4.1's parser). Each is recognized by a
  * restricted canonical grammar and REWRITTEN — MERGE/ASOF onto the
  * engine's native operators ([[Graft.upsert]], [[Graft.asofJoin]]),
  * QUALIFY onto the wrapped-subquery filter — so the SQL text is a
  * front door, not a second implementation, and the scale story (one
  * key-shuffle merge; union+window as-of with no range explosion) is
  * exactly the API one's. Everything else passes through to
  * `spark.sql` verbatim.
  *
  * Restrictions are LOUD (`require`/analysis errors), never silent:
  * unsupported MERGE actions, non-equi ON conjuncts, a
  * MATCH_CONDITION that is not a single `l.t >= r.t` / `l.t <= r.t`
  * comparison, or a QUALIFY predicate over an un-aliased window all
  * fail with the offending text. Oracle-checked as `q_sql_merge` /
  * `q_sql_asof` / `q_sql_qualify`.
  */
object SqlText {

  // MERGE INTO <target> [AS t] USING <source> [AS s] ON <equi-conds>
  //   [WHEN MATCHED THEN UPDATE SET <* | assignments>
  //    WHEN NOT MATCHED THEN INSERT *]
  // — `SET *` (or no action clauses at all) is the canonical full-row
  // upsert; `SET col = s.col, …` is the partial update (matched rows
  // keep every unlisted column). INSERT is always full-row, so the
  // schemas must align either way.
  private val MergeRe =
    ("""(?is)^\s*MERGE\s+INTO\s+(\w+)(?:\s+(?:AS\s+)?(?!USING\b)(\w+))?""" +
     """\s+USING\s+(\w+)(?:\s+(?:AS\s+)?(?!ON\b)(\w+))?""" +
     """\s+ON\s+(.+?)""" +
     """(?:\s+WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+(\*|.+?)""" +
     """\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*)?\s*;?\s*$""").r

  private val AssignRe =
    """(?s)^\s*(?:(\w+)\.)?(\w+)\s*=\s*(\w+)\.(\w+)\s*$""".r

  // SELECT … FROM <lt> [AS l] ASOF JOIN <rt> [AS r]
  //   MATCH_CONDITION(<a>.<t> >= <b>.<t2>) ON <equi-conds> [tail…]
  private val AsofRe =
    ("""(?is)^\s*(SELECT\s+.+?)\s+FROM\s+""" +
     """(\w+)(?:\s+(?:AS\s+)?(?!ASOF\b)(\w+))?""" +
     """\s+ASOF\s+JOIN\s+""" +
     """(\w+)(?:\s+(?:AS\s+)?(?!MATCH_CONDITION\b)(\w+))?""" +
     """\s+MATCH_CONDITION\s*\(\s*(\w+)\.(\w+)\s*(>=|<=)\s*(\w+)\.(\w+)\s*\)""" +
     """\s+ON\s+(.+?)""" +
     """(\s+(?:WHERE|GROUP\s+BY|ORDER\s+BY|LIMIT)\b.*?)?\s*;?\s*$""").r

  // SELECT … QUALIFY <pred> [ORDER BY …] — Snowflake/DuckDB's
  // window-filter clause, absent from Spark SQL (no QUALIFY token in
  // the 4.1 parser). Canonical rewrite: wrap the pre-QUALIFY query and
  // filter the wrapper, so the predicate references the select list's
  // aliases — the `rn <= k` top-k-per-group idiom. A predicate naming
  // a window expression NOT aliased in the select list fails loudly at
  // analysis (unresolved column), never silently.
  private val QualifyRe =
    """(?is)^\s*(SELECT\s+.+?)\s+QUALIFY\s+(.+?)(\s+ORDER\s+BY\s+.+?)?\s*;?\s*$""".r

  private val EquiRe = """(?s)^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$""".r

  /** Parse an AND-conjunction of alias-qualified equi conditions into
    * (leftCol, rightCol) pairs, oriented so the first element belongs
    * to `leftAlias`. Anything non-equi is a loud error. */
  private def equiKeys(cond: String, leftAlias: String,
      rightAlias: String): Seq[(String, String)] =
    cond.split("""(?i)\s+AND\s+""").toSeq.map {
      case EquiRe(a1, c1, a2, c2) =>
        if (a1.equalsIgnoreCase(leftAlias) && a2.equalsIgnoreCase(rightAlias))
          (c1, c2)
        else if (a1.equalsIgnoreCase(rightAlias) && a2.equalsIgnoreCase(leftAlias))
          (c2, c1)
        else sys.error(s"ON condition references unknown alias: '$a1.$c1 = $a2.$c2' " +
          s"(expected aliases '$leftAlias' and '$rightAlias')")
      case other => sys.error(
        s"only alias-qualified equi conditions are supported in ON, got: '$other'")
    }

  /** Strip `alias.` qualifiers from a SQL fragment — after the rewrite
    * every column lives flat in one view, so the qualifiers must go. */
  private def stripAliases(fragment: String, aliases: Seq[String]): String =
    aliases.foldLeft(fragment) { (f, a) =>
      f.replaceAll(s"(?i)\\b${java.util.regex.Pattern.quote(a)}\\.", "")
    }

  /** Run one SQL statement, extending `spark.sql` with the MERGE INTO
    * and ASOF JOIN forms above. Returns the result relation; for MERGE
    * (Spark frames are immutable — there is no in-place table to
    * mutate without a v2 catalog) the result IS the merged relation,
    * which the caller writes wherever the target lives. */
  def sql(spark: SparkSession, text: String): DataFrame = text match {
    case MergeRe(target, tAliasOrNull, source, sAliasOrNull, cond,
        setOrNull) =>
      val tAlias = Option(tAliasOrNull).getOrElse(target)
      val sAlias = Option(sAliasOrNull).getOrElse(source)
      val keys = equiKeys(cond, tAlias, sAlias)
      keys.foreach { case (tk, sk) =>
        require(tk == sk,
          s"MERGE keys must share a column name (got $tAlias.$tk = $sAlias.$sk); " +
            "rename the source column before merging")
      }
      Option(setOrNull).map(_.trim).filter(_ != "*") match {
        case None =>
          Graft.upsert(spark.table(target), spark.table(source),
            keys.map(_._1))
        case Some(assigns) =>
          val set = assigns.split(",").toSeq.map {
            case AssignRe(lhsAliasOrNull, tc, rhsAlias, sc) =>
              require(lhsAliasOrNull == null ||
                  lhsAliasOrNull.equalsIgnoreCase(tAlias),
                s"SET target must be a '$tAlias' column: $lhsAliasOrNull.$tc")
              require(rhsAlias.equalsIgnoreCase(sAlias),
                s"SET source must be a '$sAlias' column: $rhsAlias.$sc")
              (tc, sc)
            case other => sys.error(
              s"only 'col = $sAlias.col' assignments are supported in SET, " +
                s"got: '$other'")
          }
          Graft.upsertPartial(spark.table(target), spark.table(source),
            keys.map(_._1), set)
      }

    case AsofRe(proj, lt, lAliasOrNull, rt, rAliasOrNull,
        mcA, mcT, op, mcB, mcT2, cond, tailOrNull) =>
      val lAlias = Option(lAliasOrNull).getOrElse(lt)
      val rAlias = Option(rAliasOrNull).getOrElse(rt)
      // orient the MATCH_CONDITION: `l.t >= r.t` is the backward join
      // (most recent right at or before left), `l.t <= r.t` forward
      val (leftTime, rightTime, forward) =
        if (mcA.equalsIgnoreCase(lAlias) && mcB.equalsIgnoreCase(rAlias))
          (mcT, mcT2, op == "<=")
        else if (mcA.equalsIgnoreCase(rAlias) && mcB.equalsIgnoreCase(lAlias))
          (mcT2, mcT, op == ">=")
        else sys.error(s"MATCH_CONDITION references unknown alias: " +
          s"'$mcA.$mcT $op $mcB.$mcT2'")
      val keys = equiKeys(cond, lAlias, rAlias)
      val left = spark.table(lt)
      // align right-side key column names onto the left's (the engine
      // operator joins by shared names)
      val right0 = spark.table(rt)
      val right = keys.foldLeft(right0) { case (r, (lk, rk)) =>
        if (lk == rk) r else r.withColumnRenamed(rk, lk)
      }
      val joined = Graft.asofJoin(left, right, keys.map(_._1),
        leftTime, rightTime, forward = forward)
      val view = "graft_sql_asof_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
      joined.createOrReplaceTempView(view)
      val rewritten = stripAliases(
        s"$proj FROM $view${Option(tailOrNull).getOrElse("")}",
        Seq(lAlias, rAlias))
      // the analyzed plan holds the view's resolved child directly, so
      // the scratch view can drop as soon as analysis is done
      val out = spark.sql(rewritten)
      spark.catalog.dropTempView(view)
      out

    case QualifyRe(head, pred, orderOrNull) =>
      spark.sql(s"SELECT * FROM ($head) __graft_qualify WHERE $pred" +
        Option(orderOrNull).getOrElse(""))

    case other => spark.sql(other)
  }
}
