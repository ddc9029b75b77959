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
  * MERGE supports the CDC verb set: full (`SET *`) and partial
  * (`SET col = s.col, …`) updates, `DELETE`, an optional
  * `WHEN MATCHED AND <pred>` gate on either action, insert-only
  * merges, and `WHEN NOT MATCHED THEN INSERT *` — each rewritten onto
  * [[Graft.upsert]] / [[Graft.upsertPartial]] / [[Graft.mergeDelete]].
  *
  * Restrictions are LOUD (`require`/analysis errors), never silent:
  * unsupported MERGE actions (INSERT VALUES lists, multiple matched
  * branches, update-only merges), non-equi ON conjuncts, a
  * MATCH_CONDITION that is not a single `l.t >= r.t` / `l.t <= r.t`
  * comparison, or a QUALIFY predicate over an un-aliased window all
  * fail with the offending text. Oracle-checked as `q_sql_merge` /
  * `q_sql_merge_partial` / `q_sql_merge_delete` / `q_sql_asof` /
  * `q_sql_qualify`.
  */
object SqlText {

  // MERGE INTO <target> [AS t] USING <source> [AS s] ON <equi-conds>
  //   [WHEN MATCHED [AND <pred>] THEN (UPDATE SET <* | assignments> | DELETE)]
  //   [WHEN NOT MATCHED THEN INSERT *]
  // — `SET *` (or no action clauses at all) is the canonical full-row
  // upsert; `SET col = s.col, …` is the partial update (matched rows
  // keep every unlisted column); `DELETE` removes matched target rows;
  // an `AND <pred>` gate restricts the matched action to pairs
  // satisfying it (other matched rows stay unchanged). INSERT is
  // always full-row, so the schemas must align whenever it appears.
  // At most ONE matched clause and ONE not-matched clause, in that
  // order — anything else (INSERT VALUES lists, multiple matched
  // branches) fails loudly with the offending clause text.
  private val MergeHeadRe =
    ("""(?is)^\s*MERGE\s+INTO\s+(\w+)(?:\s+(?:AS\s+)?(?!USING\b)(\w+))?""" +
     """\s+USING\s+(\w+)(?:\s+(?:AS\s+)?(?!ON\b)(\w+))?""" +
     """\s+ON\s+(.+?)""" +
     """((?:\s+WHEN\s.+)?)\s*;?\s*$""").r

  private val MatchedUpdateRe =
    """(?is)^WHEN\s+MATCHED\s+(?:AND\s+(.+?)\s+)?THEN\s+UPDATE\s+SET\s+(\*|.+?)\s*$""".r
  private val MatchedDeleteRe =
    """(?is)^WHEN\s+MATCHED\s+(?:AND\s+(.+?)\s+)?THEN\s+DELETE\s*$""".r
  private val NotMatchedInsertRe =
    """(?is)^WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*$""".r

  /** A parsed `WHEN MATCHED` action: the optional AND-gate text and
    * either the SET fragment (update) or None (delete). */
  private sealed trait MatchedAction
  private case class MatchedUpdate(pred: Option[String], set: String)
    extends MatchedAction
  private case class MatchedDelete(pred: Option[String])
    extends MatchedAction

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

  /** Rewrite `userAlias.` qualifiers onto the engine operators' fixed
    * internal aliases (two-phase through placeholders, so a user alias
    * that collides with an engine alias — e.g. the target aliased `b` —
    * can never be double-substituted). */
  private def mapAliases(fragment: String,
      renames: Seq[(String, String)]): String = {
    val tmp = renames.zipWithIndex.foldLeft(fragment) {
      case (f, ((ua, _), i)) =>
        f.replaceAll(s"(?i)\\b${java.util.regex.Pattern.quote(ua)}\\.",
          s"__graft_alias_$i.")
    }
    renames.zipWithIndex.foldLeft(tmp) { case (f, ((_, ea), i)) =>
      f.replace(s"__graft_alias_$i.", s"$ea.")
    }
  }

  /** Run one SQL statement, extending `spark.sql` with the MERGE INTO
    * and ASOF JOIN forms above. Returns the result relation; for MERGE
    * (Spark frames are immutable — there is no in-place table to
    * mutate without a v2 catalog) the result IS the merged relation,
    * which the caller writes wherever the target lives. */
  def sql(spark: SparkSession, text: String): DataFrame = text match {
    case MergeHeadRe(target, tAliasOrNull, source, sAliasOrNull, cond,
        whenTail) =>
      val tAlias = Option(tAliasOrNull).getOrElse(target)
      val sAlias = Option(sAliasOrNull).getOrElse(source)
      val keys = equiKeys(cond, tAlias, sAlias)
      keys.foreach { case (tk, sk) =>
        require(tk == sk,
          s"MERGE keys must share a column name (got $tAlias.$tk = $sAlias.$sk); " +
            "rename the source column before merging")
      }
      val keyCols = keys.map(_._1)
      // split the WHEN tail into clauses at each WHEN boundary and
      // classify; anything outside the canonical set fails loudly
      val clauses = whenTail.split("""(?i)(?=\bWHEN\s)""").toSeq
        .map(_.trim).filter(_.nonEmpty)
      var matchedOpt: Option[MatchedAction] = None
      var insert = false
      clauses.foreach {
        case NotMatchedInsertRe() =>
          require(!insert, "duplicate WHEN NOT MATCHED clause")
          insert = true
        case c @ MatchedUpdateRe(predOrNull, set) =>
          require(matchedOpt.isEmpty,
            s"only one WHEN MATCHED clause is supported; second: '$c'")
          require(!insert,
            "WHEN MATCHED must precede WHEN NOT MATCHED")
          matchedOpt = Some(MatchedUpdate(Option(predOrNull), set.trim))
        case c @ MatchedDeleteRe(predOrNull) =>
          require(matchedOpt.isEmpty,
            s"only one WHEN MATCHED clause is supported; second: '$c'")
          require(!insert,
            "WHEN MATCHED must precede WHEN NOT MATCHED")
          matchedOpt = Some(MatchedDelete(Option(predOrNull)))
        case other => sys.error(
          s"unsupported MERGE clause: '$other' (supported: WHEN MATCHED " +
            "[AND <pred>] THEN UPDATE SET <*|col = s.col, …> | DELETE; " +
            "WHEN NOT MATCHED THEN INSERT *)")
      }
      val corpus = spark.table(target)
      val batch = spark.table(source)
      // AND-gates reference the user's aliases; the engine operators
      // fix theirs as c (target) / b (source)
      def predCol(p: String): org.apache.spark.sql.Column =
        org.apache.spark.sql.functions.expr(
          mapAliases(p, Seq(tAlias -> "c", sAlias -> "b")))
      def parseAssigns(assigns: String): Seq[(String, String)] =
        assigns.split(",").toSeq.map {
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
      (matchedOpt, insert) match {
        // bare MERGE (no clauses) stays the canonical full-row upsert
        case (None, false) =>
          Graft.upsert(corpus, batch, keyCols)
        // insert-only merge: matched target rows unchanged, unmatched
        // batch rows append — one anti key join
        case (None, true) =>
          require(corpus.columns.sameElements(batch.columns),
            s"INSERT * needs aligned schemas: ${corpus.columns.mkString(",")} " +
              s"vs ${batch.columns.mkString(",")}")
          import org.apache.spark.sql.functions.col
          val insCond = keyCols.map(k => col(s"b.$k") === col(s"c.$k"))
            .reduce(_ && _)
          corpus.unionAll(
            batch.alias("b").join(corpus.alias("c"), insCond, "left_anti"))
        case (Some(MatchedUpdate(None, "*")), true) =>
          Graft.upsert(corpus, batch, keyCols)
        case (Some(MatchedUpdate(pred @ Some(_), "*")), true) =>
          // gated full-row update ≡ SET every non-key column, gated
          val set = corpus.columns.filterNot(keyCols.contains)
            .map(n => (n, n)).toSeq
          Graft.upsertPartial(corpus, batch, keyCols, set,
            pred.map(predCol))
        case (Some(MatchedUpdate(pred, assigns)), true) =>
          Graft.upsertPartial(corpus, batch, keyCols,
            parseAssigns(assigns), pred.map(predCol))
        case (Some(_: MatchedUpdate), false) => sys.error(
          "UPDATE without WHEN NOT MATCHED THEN INSERT * is not " +
            "supported — add the insert clause (update-only MERGE)")
        case (Some(MatchedDelete(pred)), ins) =>
          Graft.mergeDelete(corpus, batch, keyCols, pred.map(predCol),
            insertUnmatched = ins)
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
