package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.QueryDef
import graft.warehouse.Tables

/** Text-analysis operators over `documents` (SURVEY §2 Tier D; north-star
  * "text analysis" block: token counting, tf-idf, language-ID heuristic,
  * quality scoring, document fingerprinting).
  *
  * Everything is built from codegen-friendly built-ins (`split`, `explode`,
  * higher-order array functions) — no UDFs — so Catalyst keeps the plans
  * whole-stage-compiled and the aggregations are ordinary partial+final
  * hash aggregates that scale by shuffle on the grouping key.
  *
  * Cross-engine determinism: token hashing uses md5 (identical bytes in
  * any engine) folded to a 32-bit int; float outputs are rounded;
  * exact sums go through DECIMAL internally.
  */
object Text {

  /** Tokens of a document — whitespace tokenization on the word-soup
    * corpus (FIXTURES.md: text is space-separated). */
  def toks: Column = split(col("text"), " ")

  /** 32-bit deterministic string hash both engines can compute
    * identically: first 8 hex chars of md5, parsed as an integer.
    * Spark: conv(hex,16,10); DuckDB: CAST('0x'||hex AS BIGINT). */
  def md5i(e: String): String =
    s"CAST(conv(substring(md5($e), 1, 8), 16, 10) AS BIGINT)"

  /** DuckDB twin of [[md5i]]. */
  def md5iDuck(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 8)) AS BIGINT)"

  /** Rae et al. 2021 (arXiv:2112.11446, A1.1)'s published stop words —
    * the PRODUCTION default for [[gopherKeep]] on real English text. */
  val GopherStopsPublished: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The quality family's shared fixture stoplist — what the keyed GATE
    * passes explicitly: the synthetic vocabulary contains exactly one of
    * the published eight, which would pin rule 5 false on every
    * document. The rule SHAPE (≥2 distinct function words present) is
    * what the gate encodes; the list is corpus-specific (r15 advice —
    * parameterized here so the production default is Gopher's own). */
  val GopherStopsFixture: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** The five Gopher/MassiveText rule signals over a `text` column:
    * (n_words, mean word length, symbol ratio, alpha ratio, stop hits,
    * per-rule predicates). Shared by the keyed gate and the curate
    * pipeline so the two can never drift. */
  private[ops] def gopherSignals(stops: Seq[String]):
      (Column, Column, Column, Column, Column, Seq[Column]) = {
    val nW = size(toks).cast(DoubleType)
    // Σ word lengths = chars minus the nW-1 separators: one length()
    // instead of a per-token lambda fold
    val meanLen = (length(col("text")).cast(DoubleType) - (nW - 1)) / nW
    val nHash = length(col("text")) -
      length(regexp_replace(col("text"), "#", ""))
    val nEll = (length(col("text")) -
      length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3
    val symRatio = (nHash + nEll).cast(DoubleType) / nW
    val nAlpha = size(expr(
      "filter(split(text, ' '), w -> w RLIKE '[a-zA-Z]')"))
      .cast(DoubleType)
    val alphaRatio = nAlpha / nW
    val stopHits = size(array_intersect(
      array_distinct(toks),
      array(stops.map(lit): _*))).cast(LongType)
    val rules = Seq(
      (nW >= 50) && (nW <= 100000),
      (meanLen >= 3) && (meanLen <= 10),
      symRatio <= 0.1,
      alphaRatio >= 0.8,
      stopHits >= 2)
    (nW, meanLen, symRatio, alphaRatio, stopHits, rules)
  }

  /** The Gopher rule-gate KEEP predicate (all five rules AND'd),
    * stoplist-parameterized; production default = the published eight. */
  def gopherKeep(stops: Seq[String] = GopherStopsPublished): Column =
    gopherSignals(stops)._6.reduce(_ && _)

  /** Repeated-3-gram fraction of `text`, floor-scaled to e6 integer:
    * `1 − distinct/total` 3-grams; documents under 3 tokens have no
    * 3-grams → 0 by convention (mirrored in the DuckDB twin). Requires
    * [[graft.functions.Shingles3]] registered on the session. */
  private[graft] def repetitionE6: Column = {
    val nTok = size(toks)
    val nSh = (nTok - 2).cast(DoubleType)
    val nDis = size(expr("shingles3(split(text, ' '))")).cast(DoubleType)
    when(nTok >= 3, floor((lit(1.0) - nDis / nSh) * 1e6).cast(LongType))
      .otherwise(lit(0L))
  }

  /** Per-document packed-bucket assignment ([[graft.Graft.packSequences]];
    * the grouped report is `q_pack_sequences`): documents pack into
    * token-budget buckets in doc_id order per source — bucket = how many
    * full budgets precede the doc's running token total.
    *
    * `rangeWidth = None` (the oracle-pinned default) is CONTIGUOUS per
    * source: one window cumsum, deterministic, but one source = one
    * window partition = one task — the documented honest limit when a
    * single source dominates a 100 TB corpus.
    *
    * `rangeWidth = Some(w)` is the scale-out refinement: a TWO-LEVEL
    * parallel scan. Level 1 runs the same cumsum inside fixed doc_id
    * ranges (`partitionBy(source, doc_id DIV w)`) — fully parallel, the
    * corpus-sized work. Level 2 numbers buckets globally by a cumsum
    * over the per-chunk counts of buckets actually started
    * (`(chunk_tokens − last_doc_tokens) DIV budget + 1` — each chunk
    * starts a fresh bucket, so ≤1 underfilled bucket per boundary, and
    * the global ids stay dense); that window is still one task per
    * source but over
    * chunk-count rows (corpus_rows/w of them), not documents — the
    * skew-collapse trick aggregation trees use. Same determinism,
    * repartition-stable, identical buckets except where a contiguous
    * bucket would straddle a range boundary (TextSpec pins both
    * properties). The offsets join is left unhinted: one row per
    * (source, chunk) is broadcast-sized for sane widths, but a
    * degenerate `w` makes it corpus-sized — the size-based planner
    * decides, and the level-1 side already carries the right hash
    * partitioning for a shuffle-free merge. */
  private[graft] def packAssignments(
      docs: DataFrame, budget: Long = 2048L,
      rangeWidth: Option[Long] = None): DataFrame = {
    require(budget > 0, s"token budget must be positive: $budget")
    val toks = docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
    rangeWidth match {
      case None =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("doc_id")
        toks.withColumn("bucket",
          floor((sum("n_tokens").over(w) - col("n_tokens")) / lit(budget))
            .cast(LongType))
      case Some(rw) =>
        require(rw > 0, s"rangeWidth must be positive: $rw")
        val chunked = toks.withColumn("__chunk", expr(s"doc_id DIV $rw"))
        val wLocal = org.apache.spark.sql.expressions.Window
          .partitionBy("source", "__chunk").orderBy("doc_id")
        val local = chunked.withColumn("__start",
          sum("n_tokens").over(wLocal) - col("n_tokens"))
        val wChunks = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("__chunk")
        // buckets a chunk actually STARTS: assignment keys on a doc's
        // start offset, so the count is last-start DIV budget + 1, not
        // ceil(total/budget) (which would reserve a bucket no doc starts
        // in and leave holes in the numbering). Exact integer math — no
        // double rounding at 100 TB token sums.
        val offsets = chunked.groupBy("source", "__chunk")
          .agg(expr(
            s"(sum(n_tokens) - max_by(n_tokens, doc_id)) DIV $budget + 1"
          ).as("__nb"))
          .withColumn("__off", sum("__nb").over(wChunks) - col("__nb"))
          .select("source", "__chunk", "__off")
        local.join(offsets, Seq("source", "__chunk"))
          .withColumn("bucket",
            (col("__off") + floor(col("__start") / lit(budget))).cast(LongType))
          .select("doc_id", "source", "n_tokens", "bucket")
    }
  }

  /** Token-budget corpus selection ([[graft.Graft.selectTokenBudget]];
    * oracle key `q_select_token_budget`): admit documents in
    * (n_chars DESC, doc_id) order — n_chars standing in for any
    * monotone quality key — while the running token total fits the
    * budget. The global-order cumsum runs WITHOUT a global window: the
    * heavy pass partitions by quality bucket (`n_chars DIV bucketWidth`,
    * a coarsening of the sort key, so buckets are contiguous runs of
    * the global order) and a bucket-summary window (≤ max_chars /
    * bucketWidth rows — deliberately unpartitioned, that's the
    * skew-collapse) supplies each bucket's preceding total. Identical
    * rows to the naive single-window cumsum, which the DuckDB oracle
    * computes. Smaller `bucketWidth` → more parallel tasks in the
    * heavy pass. */
  private[graft] def selectTokenBudget(
      s: SparkSession, d: String, budget: Long,
      bucketWidth: Long = 64L): DataFrame =
    selectTokenBudgetDf(Tables.table(s, d, "documents"), budget, bucketWidth)

  /** DataFrame-input core of [[selectTokenBudget]] — split out so the
    * ScalaCheck property (TextSpec) can drive random corpora through the
    * exact production decomposition. */
  private[graft] def selectTokenBudgetDf(
      docs: DataFrame, budget: Long,
      bucketWidth: Long = 64L): DataFrame = {
    require(budget > 0, s"token budget must be positive: $budget")
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val toks = docs
      .select(col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
      .withColumn("__bucket", expr(s"n_chars DIV $bucketWidth"))
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy("__bucket")
      .orderBy(col("n_chars").desc, col("doc_id"))
    val local = toks.withColumn("__cum", sum("n_tokens").over(wLocal))
    val wBuckets = org.apache.spark.sql.expressions.Window
      .orderBy(col("__bucket").desc)
    val offsets = toks.groupBy("__bucket")
      .agg(sum("n_tokens").as("__bt"))
      .withColumn("__off", sum("__bt").over(wBuckets) - col("__bt"))
      .select("__bucket", "__off")
    // offsets is left UNHINTED like packAssignments' twin: one row per
    // bucket is broadcast-sized at sane widths, but bucketWidth=1 makes
    // it one row per distinct n_chars — the size-based planner decides,
    // and the local side already carries the __bucket hash partitioning
    local.join(offsets, Seq("__bucket"))
      .withColumn("cum_tokens", col("__off") + col("__cum"))
      .filter(col("cum_tokens") <= budget)
      .select("doc_id", "n_tokens", "cum_tokens")
      .orderBy("doc_id")
  }

  /** EXACT top-N rows per group without a group-sized window partition —
    * the two-level decomposition ([[packAssignments]]/[[selectTokenBudgetDf]])
    * applied to RANKING. Level 1 ranks within (group, salt) slices — any
    * global top-N row is top-N within its own slice, so each slice's
    * local top-N is a superset of the answer — and level 2 ranks only
    * the surviving ≤ salts·n candidates per group. A hot group costs
    * `salts` parallel tasks of corpus/salts rows instead of ONE task
    * sorting the whole group; the final window's input is
    * candidate-sized, never corpus-sized. Exact for any deterministic
    * total order (TextSpec proves salted ≡ naive by ScalaCheck).
    *
    * `order` must be a total order (tie-break to a unique column) or
    * ranks at the cut boundary are ambiguous. The salt key only routes
    * rows — it never reaches the output, so any column works.
    */
  private[graft] def topNPerGroup(df: DataFrame, group: Seq[String],
      order: Seq[Column], n: Int, saltKey: Column,
      salts: Int = 16): DataFrame = {
    require(n > 0, s"top-N needs a positive n: $n")
    require(salts > 0, s"salts must be positive: $salts")
    // public entry point (Graft.topPerGroup): reject inputs whose columns
    // would be silently clobbered by the internal names or the appended
    // output column — withColumn OVERWRITES an existing name
    for (c <- Seq("__salt", "__lr", "rank"))
      require(!df.columns.contains(c),
        s"topPerGroup appends/uses column '$c'; the input already has one " +
          "— rename it first")
    val W = org.apache.spark.sql.expressions.Window
    val salted = df.withColumn("__salt", pmod(hash(saltKey), lit(salts)))
    val cand = salted
      .withColumn("__lr", row_number().over(
        W.partitionBy((group :+ "__salt").map(col): _*).orderBy(order: _*)))
      .filter(col("__lr") <= n)
      .drop("__lr", "__salt")
    cand
      .withColumn("rank", row_number().over(
        W.partitionBy(group.map(col): _*).orderBy(order: _*)).cast(LongType))
      .filter(col("rank") <= n)
  }

  /** Per-group deterministic "reservoir" ([[graft.Graft.reservoirPerGroup]]):
    * k rows per group, uniform over each group's ids, as BOTTOM-K BY
    * HASH — rank by the portable md5 of `idCol`, keep each group's k
    * smallest. A pure function of the id set (stable across runs,
    * engines, partitionings; mergeable by re-taking bottom-k) where a
    * classic streaming reservoir is order-dependent. Rides
    * [[topNPerGroup]]'s salted two-level rank. Appends `hk` (the hash
    * rank key) and `rank`. */
  private[graft] def reservoirPerGroup(df: DataFrame, group: Seq[String],
      idCol: String, k: Int): DataFrame = {
    require(!df.columns.contains("hk"),
      "reservoirPerGroup appends 'hk'; the input already has one")
    val hashed = df.withColumn("hk",
      expr(md5i(s"CAST(`${idCol.replace("`", "``")}` AS STRING)")))
    topNPerGroup(hashed, group, Seq(col("hk"), col(idCol)), k,
      saltKey = col(idCol))
  }

  /** Epoch-ladder width guard for the multi-epoch sampling draw: source
    * s's oversampling rate is `budget·w_s / (tot·d_s)`; a rate at or
    * above `ladderWidth` would have its extra copies silently truncated
    * by the fixed 0..ladderWidth−1 explode — identically on both
    * engines, so the oracle cannot see it. This rewrites the
    * load-bearing `w_s` column (so column pruning cannot drop the
    * check) to `raise_error` on any out-of-ladder source: truncation is
    * loud, and the evaluation is sources-grain (a handful of rows),
    * never per-document. Input must carry (d_s, w_s, tot). */
  private[graft] def guardEpochLadder(srcWithTot: DataFrame, budget: Int,
      ladderWidth: Int): DataFrame =
    srcWithTot.withColumn("w_s",
      when(expr(s"CAST($budget AS DECIMAL(38,0)) * w_s >= " +
          s"CAST($ladderWidth AS DECIMAL(38,0)) * tot * d_s"),
        expr(s"CAST(raise_error('epoch ladder too narrow: a source " +
          s"oversampling rate is >= $ladderWidth — widen the ladder') " +
          "AS BIGINT)"))
      .otherwise(col("w_s")))

  /** Vocabulary row count under which DSIR's token-keyed frequency
    * frames broadcast; above it they meet the (doc,token) frame in a
    * token-keyed shuffle join. ~4M tokens × ~24 B/row ≈ 100 MB is the
    * classic executor-broadcast ceiling; a 100 TB web corpus's raw
    * vocabulary (hundreds of millions of distinct tokens with typos and
    * code) is far past it. */
  private[graft] val DsirBroadcastMaxVocab: Long = 1L << 22

  /** DSIR importance resampling with the vocabulary-join dispatch
    * MEASURED (r15 verdict task 7) — the same measured-volume pattern
    * as [[Graph.hintNodeGrain]] / [[Temporal.asofAutoWidth]]: the
    * frequency frames registry-persist once (they feed both the scalar
    * totals and the per-doc join, so the persist also stops a double
    * aggregation — persist, not checkpoint, so PlanSpec can still see
    * the pruned/pushed vocab scans in the lineage), ONE |vocab| count
    * makes the call, and both arms are pinned identical by TextSpec.
    * Semantics unchanged from the keyed contract (see the QueryDef
    * note). */
  /** Shared per-document term-frequency artifact: ONE documents scan +
    * explode + (doc, token) hash-agg, materialized once per (session,
    * sf dir) and consumed by every corpus-statistics key that needs the
    * (doc_id, token, tf) grain (DSIR, the log-prob bucketing). `lang`
    * rides along (functionally dependent on doc_id — one row per doc in
    * the documents table, so the grain is unchanged) because the DSIR
    * target-vocabulary side filters on it. r17 optimization round: the
    * explode pipeline used to re-run per consumer — 3× inside
    * `q_select_dsir` alone (raw-vocab build, target-vocab build, per-doc
    * join), once more per other key (guide §2.4: the fact is scanned
    * once, every derived frequency re-aggregates the bounded
    * (doc, token) frame instead). */
  /** The artifact's build plan, exposed un-checkpointed so PlanSpec can
    * pin the scan pruning and map-side combine that the checkpoint
    * otherwise hides behind a LogicalRDD. */
  private[ops] def docTermFreqBuild(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    Tables.table(s, d, "documents")
      .select(col("doc_id"), col("lang"), explode(toks).as("token"))
      .groupBy("doc_id", "lang", "token").agg(count(lit(1)).as("tf"))

  private[ops] def docTermFreq(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    graft.CacheRegistry.getOrCheckpoint("text_doc_tf", d,
      docTermFreqBuild(s, d))

  /** The per-doc scored frame BEFORE its registry checkpoint, plus the
    * measured-dispatch arm tag — split out so the plan pins (vocabulary
    * broadcasts, lang slice, no early sort) can see the pipeline. */
  private[ops] def dsirScoredBuild(
      s: org.apache.spark.sql.SparkSession, d: String,
      broadcastMaxVocab: Long = DsirBroadcastMaxVocab): (DataFrame, String) = {
    val tf = docTermFreq(s, d)
    // rcnt ≡ the old count over raw (doc,token) occurrences: sum of the
    // per-doc tf IS that count, re-aggregated from the shared artifact;
    // tcnt likewise over the lang = 'en' slice — bit-identical longs.
    val rawFreq = graft.CacheRegistry.getOrPersist("dsir_rawfreq", d,
      tf.groupBy("token").agg(sum("tf").as("rcnt")))
    val tgtFreq = graft.CacheRegistry.getOrPersist("dsir_tgtfreq", d,
      tf.filter(col("lang") === "en")
        .groupBy("token").agg(sum("tf").as("tcnt")))
    // the measured dispatch: |vocab| is one count over the persisted
    // frame; one decision governs both vocab-grain sides (target
    // vocabulary ⊆ raw vocabulary)
    val nVocab = rawFreq.count()
    def vocabGrain(df: DataFrame): DataFrame =
      if (nVocab <= broadcastMaxVocab) broadcast(df) else df
    val scal = rawFreq.agg(sum("rcnt").as("rtot"),
        count(lit(1)).as("v"))
      .crossJoin(tgtFreq.agg(
        coalesce(sum("tcnt"), lit(0L)).as("ttot")))
    val perDoc = tf.join(vocabGrain(rawFreq), "token")
      .join(vocabGrain(tgtFreq), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(
        sum(expr("CAST(tf AS DECIMAL(10,0)) * " +
          "CAST(round(ln(coalesce(tcnt, 0) + 1), 9) AS DECIMAL(20,9))"))
          .as("slpt"),
        sum(expr("CAST(tf AS DECIMAL(10,0)) * " +
          "CAST(round(ln(rcnt), 9) AS DECIMAL(20,9))")).as("slpr"),
        sum("tf").as("n_tok"))
    val scoredBuild = perDoc.join(broadcast(scal))
      .select(col("doc_id"),
        round((col("slpt") - col("slpr")).cast(DoubleType) / col("n_tok")
          - log((col("ttot") + col("v")).cast(DoubleType))
          + log(col("rtot").cast(DoubleType)), 6).as("dsir_logw"))
    (scoredBuild, if (nVocab <= broadcastMaxVocab) "bcast" else "join")
  }

  private[graft] def dsirSelect(
      s: org.apache.spark.sql.SparkSession, d: String,
      broadcastMaxVocab: Long = DsirBroadcastMaxVocab): DataFrame = {
    val (scoredBuild, arm) = dsirScoredBuild(s, d, broadcastMaxVocab)
    // doc-count-bounded (doc_id, double) — materialized so the max
    // broadcast's build and the final filter both read the scan instead
    // of each re-running the per-doc join pipeline (r16 verdict item 4:
    // the mx broadcast child was a full second execution of perDoc).
    // The arm rides the cache key (the knnJoinHier precedent): a
    // forced-arm call (TextSpec's arm-equality pin) must never be
    // served the other arm's cached frame and silently test nothing.
    val scored = graft.CacheRegistry.getOrCheckpoint(
      s"dsir_scored_$arm", d, scoredBuild)
    val mx = scored.agg(max("dsir_logw").as("maxw"))
    scored.join(broadcast(mx))
      .filter(expr("round(ln(((" + md5i("CAST(doc_id AS STRING)") +
        " % 1000000) + 1) / 1000000.0), 9)") <
        lit(100.0) * (col("dsir_logw") - col("maxw")))
      .select("doc_id", "dsir_logw")
      .orderBy("doc_id")
  }

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------ token counting
    // corpus-wide token frequencies: explode → hash-agg (map-side partial
    // combine keeps the shuffle tiny — vocabulary-sized, not corpus-sized)
    QueryDef("q_text_tokens",
      (s, d) => Tables.table(s, d, "documents")
        .select(explode(toks).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(30),
      Some("""SELECT token, CAST(count(1) AS BIGINT) AS n
             |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
             |GROUP BY token ORDER BY n DESC, token LIMIT 30""".stripMargin)),

    // per-document token stats
    QueryDef("q_text_token_stats",
      (s, d) => Tables.table(s, d, "documents").select(
          col("doc_id"),
          size(toks).cast(LongType).as("n_tokens"),
          size(array_distinct(toks)).cast(LongType).as("n_distinct"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
             |  CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------- feature hashing (TF)
    // the vocabulary-FREE featurizer (hashing trick): every token hashes
    // into one of 32 fixed buckets, per-doc bucket counts become a dense
    // fixed-dim count vector — no vocabulary build, no second pass, no
    // global dictionary to broadcast, which is what makes the trick the
    // 100 TB featurizer. One hash-agg on (doc_id, bucket) with map-side
    // combine; per-doc assembly is a ≤32-entry map lookup over a
    // sequence, never a pivot. md5-derived buckets are engine-portable
    // (same trick as q_sample_split); the oracle fills the grid by
    // LEFT JOIN instead and hash-matches.
    QueryDef("q_text_hashing_tf",
      (s, d) => {
        val D = 32
        val docs = Tables.table(s, d, "documents")
        val counts = docs
          .select(col("doc_id"), explode(toks).as("token"))
          .select(col("doc_id"),
            expr(s"CAST(${md5i("token")} % $D AS INT)").as("b"))
          .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(map_from_entries(collect_list(struct(col("b"), col("c"))))
            .as("m"))
        // row set driven from documents (left join) like the oracle's
        // grid: a doc whose token array is NULL/empty still emits its
        // all-zero vector instead of vanishing with the explode. The
        // dense vector is assembled per doc, then emitted ELEMENT-WISE
        // as (doc_id, b, c) rows — the driver's canonical row sort
        // hashes scalars only (raw array cells are unhashable in its
        // pandas path); |docs|·32 rows, still bounded.
        docs.select(col("doc_id"))
          .join(counts, Seq("doc_id"), "left")
          .select(col("doc_id"),
            expr(s"transform(sequence(0, ${D - 1}), " +
              "i -> coalesce(m[i], CAST(0 AS BIGINT)))").as("tf"))
          .select(col("doc_id"), posexplode(col("tf")).as(Seq("b", "c")))
          .select(col("doc_id"), col("b").cast("long").as("b"), col("c"))
          .orderBy("doc_id", "b")
      },
      Some(s"""WITH term AS (
              |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
              |  FROM documents
              |), cnt AS (
              |  SELECT doc_id, ${md5iDuck("token")} % 32 AS b,
              |    count(1) AS c
              |  FROM term GROUP BY 1, 2
              |), grid AS (
              |  SELECT doc_id, i AS b
              |  FROM documents, UNNEST(generate_series(0, 31)) AS u(i)
              |)
              |SELECT g.doc_id, CAST(g.b AS BIGINT) AS b,
              |  CAST(coalesce(c.c, 0) AS BIGINT) AS c
              |FROM grid g LEFT JOIN cnt c ON g.doc_id = c.doc_id AND g.b = c.b
              |ORDER BY g.doc_id, g.b""".stripMargin)),

    // ------------------------------- linear quality model (fastText-ish)
    // the CCNet/fastText-style quality filter as a LINEAR model over the
    // hashing-trick features: score(doc) = Σ_tokens w[bucket(token)],
    // i.e. the dot product of the q_text_hashing_tf count vector with a
    // fixed 32-bucket weight vector — evaluated per TOKEN so the dense
    // vector is never materialized: one explode + one map-side-combinable
    // hash-agg, same shape (and scale story) as token counting. Weights
    // are md5-derived integers in milli-units (wm ∈ [-500, 500]), so the
    // score sum is EXACT cross-engine (BIGINT, no float accumulation
    // order); the logistic prob on top is the only float and is rounded
    // to 6 digits (double exp agrees to ~1 ulp across engines — same
    // margin argument as q_text_unigram_logprob's 9-digit ln). The
    // weight md5 runs on the (doc, bucket) COUNTS (≤ 32/doc), never per
    // token — Σ_b c_b·w_b ≡ Σ_tokens w_b(token), but one corpus-scale
    // md5 pass instead of two.
    QueryDef("q_text_quality_model",
      (s, d) => {
        val D = 32
        val wm = s"(${md5i(s"CAST(b AS STRING)")} % 1001 - 500)"
        Tables.table(s, d, "documents")
          .select(col("doc_id"), explode(toks).as("token"))
          .select(col("doc_id"),
            expr(s"CAST(${md5i("token")} % $D AS INT)").as("b"))
          .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
          .select(col("doc_id"), (col("c") * expr(wm)).as("w"))
          .groupBy("doc_id")
          .agg(sum(col("w")).as("score_milli"))
          .select(col("doc_id"), col("score_milli"),
            round(lit(1.0) /
              (lit(1.0) + exp(-col("score_milli") / lit(1000.0))), 6)
              .as("prob"))
          .orderBy("doc_id")
      },
      Some(s"""WITH term AS (
              |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
              |  FROM documents
              |), cnt AS (
              |  SELECT doc_id, ${md5iDuck("token")} % 32 AS b,
              |    count(1) AS c
              |  FROM term GROUP BY 1, 2
              |), sc AS (
              |  SELECT doc_id,
              |    sum(c * (${md5iDuck("CAST(b AS VARCHAR)")} % 1001 - 500))
              |      AS score_milli
              |  FROM cnt GROUP BY doc_id
              |)
              |SELECT doc_id, CAST(score_milli AS BIGINT) AS score_milli,
              |  round(1.0 / (1.0 + exp(-score_milli / 1000.0)), 6) AS prob
              |FROM sc ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------ regex redaction
    // the PII-scrub shape (emails/phones/IDs → placeholder tokens): one
    // streaming regexp_replace pass, no shuffle, no UDF — at 100 TB
    // this is a map-only pipeline stage whose cost is the scan itself.
    // The fixture corpus is lowercase word soup, so the demonstration
    // pattern redacts a word SHAPE (s-words ≥ 4 chars) rather than
    // digit runs that never occur; the operator is the same. Both
    // engines run the identical pattern (plain character classes — the
    // Java-regex/RE2 dialect overlap); DuckDB needs the explicit 'g'
    // flag for the global replace Spark does by default.
    QueryDef("q_text_redact",
      (s, d) => {
        // DataFrame-function form, NOT expr(): the SQL parser would eat
        // the \b escapes inside a string literal
        val pat = "\\bs[a-z]{3,}\\b"
        Tables.table(s, d, "documents")
          .select(col("doc_id"),
            regexp_count(col("text"), lit(pat)).cast(LongType)
              .as("n_redacted"),
            substring(regexp_replace(col("text"), pat, "<TOK>"), 1, 60)
              .as("cleaned_prefix"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '\bs[a-z]{3,}\b'))
             |    AS BIGINT) AS n_redacted,
             |  substr(regexp_replace(text, '\bs[a-z]{3,}\b', '<TOK>', 'g'),
             |    1, 60) AS cleaned_prefix
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------ tf-idf
    // two aggregations + a broadcast-able join: term counts per doc,
    // document frequency per term (computed over ALL docs), N as a
    // broadcast scalar. Output restricted to doc_id < 20 to keep the
    // verify dump small; the aggregates themselves run over the full table.
    // ------------------------------- corpus-derived stopword candidates
    // tokens appearing in ≥ 60% of documents — the data-driven stopword
    // list a multilingual curation pipeline builds when no fixed list
    // exists (the df side of tf-idf, thresholded instead of weighted).
    // One explode → (doc, token) hash agg (rows per token ARE the
    // distinct docs containing it — same df derivation as q_text_tfidf)
    // → token-grain df agg → threshold against the broadcast doc count.
    // Output is vocab-bounded; the threshold is an ALL-INTEGER
    // cross-multiplication (100·df ≥ 60·N) so no float boundary exists.
    QueryDef("q_text_stopwords",
      (s, d) => {
        val docs = Tables.table(s, d, "documents")
        val df_ = docs.select(col("doc_id"), explode(toks).as("token"))
          .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
          .groupBy("token").agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        df_.join(broadcast(n))
          .filter(col("df") * 100 >= col("n_docs") * 60)
          .select(col("token"), col("df"),
            round(col("df").cast(DoubleType) /
              col("n_docs").cast(DoubleType), 6).as("doc_frac"))
          .orderBy("token")
      },
      Some("""WITH tf AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |  FROM documents
             |), df AS (
             |  SELECT token, CAST(count(1) AS BIGINT) AS df FROM (
             |    SELECT DISTINCT doc_id, token FROM tf
             |  ) GROUP BY token
             |), n AS (SELECT count(1) AS n_docs FROM documents)
             |SELECT token, df,
             |  round(CAST(df AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
             |    AS doc_frac
             |FROM df, n
             |WHERE df * 100 >= n_docs * 60
             |ORDER BY token""".stripMargin)),

    QueryDef("q_text_tfidf",
      (s, d) => {
        val docs = Tables.table(s, d, "documents")
        val term = docs.select(col("doc_id"), explode(toks).as("token"))
        // df derives from the tf aggregate (rows per token in tf ARE the
        // distinct docs containing it) — replaces the second
        // countDistinct EXPAND over the full term table with a count over
        // the already-aggregated pairs. The tf subtree is recomputed for
        // the df branch (cheaper than materializing an in-memory copy at
        // this size; at 100 TB a pipeline would checkpoint tf instead).
        val tf = term.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        val df_ = tf.groupBy("token").agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        tf.join(broadcast(df_), "token")
          .join(broadcast(n))
          .filter(col("doc_id") < 20)
          .select(col("doc_id"), col("token"), col("tf").cast(LongType).as("tf"),
            round(col("tf") * log(col("n_docs").cast(DoubleType) / col("df")), 6)
              .as("tfidf"))
          .orderBy("doc_id", "token")
      },
      Some("""WITH term AS (
             |  SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents
             |), tf AS (
             |  SELECT doc_id, token, count(1) AS tf FROM term GROUP BY 1, 2
             |), df AS (
             |  SELECT token, count(DISTINCT doc_id) AS df FROM term GROUP BY 1
             |)
             |SELECT tf.doc_id, tf.token, CAST(tf.tf AS BIGINT) AS tf,
             |  round(tf.tf * ln((SELECT count(1) FROM documents)::DOUBLE / df.df), 6) AS tfidf
             |FROM tf JOIN df USING (token)
             |WHERE tf.doc_id < 20
             |ORDER BY doc_id, token""".stripMargin)),

    // ------------------------------------------------ BM25 relevance
    // the retrieval scorer tf-idf is not: BM25(k1=1.2, b=0.75) adds tf
    // saturation and doc-length normalization — what a RAG-curation
    // pipeline actually ranks candidate documents with. Every input is
    // INTEGER-exact (tf, df, per-doc length dl, corpus doc count, total
    // token count), so the one double expression — written identically
    // on both engines — is deterministic; round(6) is presentation.
    // The scale shape: the corpus-sized term table reduces ONCE (the
    // (doc_id, token) hash-agg); dl = Σ tf and df both derive from the
    // already-reduced pair table, so their inputs are pair-sized, not
    // corpus-sized (the q_text_tfidf df-from-tf trick, applied twice);
    // df is vocab-bounded and the 1-row corpus stats frame broadcasts.
    // Same doc_id < 20 output discipline as q_text_tfidf.
    QueryDef("q_text_bm25",
      (s, d) => {
        val docs = Tables.table(s, d, "documents")
        val term = docs.select(col("doc_id"), explode(toks).as("token"))
        val tf = term.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
        val df_ = tf.groupBy("token").agg(count(lit(1)).as("df"))
        val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("tot_dl"))
        tf.join(dl, "doc_id")
          .join(broadcast(df_), "token")
          .join(broadcast(stats))
          .filter(col("doc_id") < 20)
          .select(col("doc_id"), col("token"),
            col("tf").cast(LongType).as("tf"),
            round(expr(
              """ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
                |  * (CAST(tf AS DOUBLE) * 2.2)
                |  / (CAST(tf AS DOUBLE) + 1.2 * (0.25
                |     + 0.75 * CAST(dl AS DOUBLE) * n_docs / tot_dl))
                |""".stripMargin), 6).as("bm25"))
          .orderBy("doc_id", "token")
      },
      Some("""WITH term AS (
             |  SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents
             |), tf AS (
             |  SELECT doc_id, token, count(1) AS tf FROM term GROUP BY 1, 2
             |), dl AS (
             |  SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1
             |), df AS (
             |  SELECT token, count(1) AS df FROM tf GROUP BY 1
             |), stats AS (
             |  SELECT count(1) AS n_docs, sum(dl) AS tot_dl FROM dl
             |)
             |SELECT tf.doc_id, tf.token, CAST(tf.tf AS BIGINT) AS tf,
             |  round(ln(1.0 + (CAST(n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5))
             |    * (CAST(tf.tf AS DOUBLE) * 2.2)
             |    / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25
             |       + 0.75 * CAST(dl.dl AS DOUBLE) * n_docs / tot_dl)), 6) AS bm25
             |FROM tf JOIN dl USING (doc_id), df, stats
             |WHERE tf.doc_id < 20 AND df.token = tf.token
             |ORDER BY tf.doc_id, tf.token""".stripMargin)),

    // ------------------------------------------------ language ID
    // n-gram/stopword-profile heuristic: score each language by hits
    // against a fixed marker-word profile, argmax with a deterministic
    // tie order. (The real corpus vocabulary is the profile source;
    // the mechanism — profile scoring entirely inside codegen'd array
    // expressions, no shuffle at all — is the 100 TB-relevant part.)
    QueryDef("q_text_langid",
      (s, d) => Tables.table(s, d, "documents").select(
          col("doc_id"),
          expr("CAST(size(filter(split(text,' '), x -> x IN ('the','a','data'))) AS BIGINT)").as("s_en"),
          expr("CAST(size(filter(split(text,' '), x -> x IN ('table','row','column'))) AS BIGINT)").as("s_de"),
          expr("CAST(size(filter(split(text,' '), x -> x IN ('query','join','merge'))) AS BIGINT)").as("s_fr"))
        .withColumn("pred_lang",
          when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr"), "en")
            .when(col("s_de") >= col("s_fr"), "de")
            .otherwise("fr"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(len(list_filter(string_split(text,' '), x -> list_contains(['the','a','data'], x))) AS BIGINT) AS s_en,
             |  CAST(len(list_filter(string_split(text,' '), x -> list_contains(['table','row','column'], x))) AS BIGINT) AS s_de,
             |  CAST(len(list_filter(string_split(text,' '), x -> list_contains(['query','join','merge'], x))) AS BIGINT) AS s_fr,
             |  CASE WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
             |       WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS pred_lang
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------ quality scoring
    // length / type-token-ratio / mean-token-length heuristics folded into
    // one score; per-row only (maps over the scan, zero shuffle)
    QueryDef("q_text_quality",
      (s, d) => {
        val nTok = size(toks).cast(DoubleType)
        val nDis = size(array_distinct(toks)).cast(DoubleType)
        val ttr = nDis / nTok
        val avgLen = (length(col("text")) - (nTok - 1)) / nTok
        // outputs are floor-scaled to integers, not round()ed: these
        // ratios of small ints land exactly on decimal rounding
        // boundaries, where Spark's and DuckDB's round() disagree by an
        // ulp. floor of the SAME double is engine-identical.
        Tables.table(s, d, "documents").select(
            col("doc_id"),
            nTok.cast(LongType).as("n_tokens"),
            floor(ttr * 1e6).cast(LongType).as("ttr_e6"),
            floor(avgLen * 1e6).cast(LongType).as("avg_token_len_e6"),
            floor((ttr * lit(0.3)
              + least(nTok / 100.0, lit(1.0)) * lit(0.4)
              + least(avgLen / 10.0, lit(1.0)) * lit(0.3)) * 1e6)
              .cast(LongType).as("quality_e6"))
          .orderBy("doc_id")
      },
      Some("""WITH q AS (
             |  SELECT doc_id,
             |    len(string_split(text,' '))::DOUBLE AS n_tokens,
             |    len(list_distinct(string_split(text,' ')))::DOUBLE AS n_distinct,
             |    length(text) AS n_chars
             |  FROM documents
             |)
             |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             |  CAST(floor(n_distinct / n_tokens * 1000000.0) AS BIGINT) AS ttr_e6,
             |  CAST(floor((n_chars - (n_tokens - 1)) / n_tokens * 1000000.0) AS BIGINT) AS avg_token_len_e6,
             |  CAST(floor((n_distinct / n_tokens * 0.3
             |    + least(n_tokens / 100.0, 1.0) * 0.4
             |    + least((n_chars - (n_tokens - 1)) / n_tokens / 10.0, 1.0) * 0.3) * 1000000.0) AS BIGINT) AS quality_e6
             |FROM q ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------ subword tokens
    // BPE-ish regex segmentation (consonant*-vowel+ chunks): the shape of
    // subword token counting without a tokenizer model; per-row regex only
    QueryDef("q_text_subword",
      (s, d) => Tables.table(s, d, "documents").select(
          col("doc_id"),
          size(expr("regexp_extract_all(text, '[a-z]+[aeiou]', 0)"))
            .cast(LongType).as("n_subwords"),
          size(array_distinct(expr("regexp_extract_all(text, '[a-z]+[aeiou]', 0)")))
            .cast(LongType).as("n_distinct_subwords"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '[a-z]+[aeiou]')) AS BIGINT) AS n_subwords,
             |  CAST(len(list_distinct(regexp_extract_all(text, '[a-z]+[aeiou]'))) AS BIGINT) AS n_distinct_subwords
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------ fingerprinting
    // order-sensitive rolling polynomial hash over the token stream
    // (content fingerprint: same tokens in a different order → different
    // print). Left fold with identical integer arithmetic in both engines.
    // Jaro-Winkler fuzzy scoring ([[graft.functions.JaroWinklerSim]] —
    // the codegen'd expression; Spark has levenshtein but no Jaro
    // family). Scored over the deterministic adjacent-id part-name
    // pairing (|parts| rows, row-local — the bounded demo of a scorer
    // that in production rides a blocked candidate list, never
    // all-pairs); DuckDB's NATIVE jaro_winkler_similarity is the
    // oracle, so the hash compare proves algorithm equality, not just
    // self-consistency.
    QueryDef("q_text_jaro",
      (s, d) => {
        graft.functions.JaroWinkler.register(s)
        val p = Tables.table(s, d, "part")
        p.select(col("p_partkey"), col("p_name").as("name_a"))
          .join(p.select((col("p_partkey") - 1000).as("p_partkey"),
            col("p_name").as("name_b")), "p_partkey")
          .select(col("p_partkey"),
            round(expr("jaro_winkler(name_a, name_b)"), 6).as("jw"))
          .orderBy("p_partkey")
      },
      Some("""SELECT a.p_partkey,
             |  round(jaro_winkler_similarity(a.p_name, b.p_name), 6)
             |    AS jw
             |FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1000
             |ORDER BY a.p_partkey""".stripMargin)),

    QueryDef("q_text_fingerprint",
      (s, d) => Tables.table(s, d, "documents").select(
          col("doc_id"),
          expr(s"""aggregate(
                  |  transform(split(text, ' '), t -> ${md5i("t")}),
                  |  CAST(0 AS BIGINT),
                  |  (acc, h) -> (acc * 31 + h) % 1000000007)""".stripMargin)
            .as("fingerprint"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  list_reduce(
              |    list_prepend(CAST(0 AS BIGINT),
              |      list_transform(string_split(text, ' '), t -> ${md5iDuck("t")})),
              |    (acc, h) -> (acc * 31 + h) % 1000000007) AS fingerprint
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------ quality signals
    // the other two heuristics of the classic quality triple (length /
    // punct / stopword): punctuation density over characters and stopword
    // density over tokens. Per-row map over the scan, zero shuffle;
    // floor-scaled integers for engine-exact parity (see q_text_quality).
    QueryDef("q_text_quality_signals",
      (s, d) => {
        val nTok = size(toks).cast(DoubleType)
        val nChars = length(col("text")).cast(DoubleType)
        val nPunct = nChars - length(
          regexp_replace(col("text"), "[.,!?;:]", "")).cast(DoubleType)
        val nStop = size(expr(
          "filter(split(text, ' '), t -> t IN ('the','a','an','and','or','of','to','in','is','it'))"))
          .cast(DoubleType)
        Tables.table(s, d, "documents").select(
            col("doc_id"),
            floor(nPunct / nChars * 1e6).cast(LongType).as("punct_ratio_e6"),
            floor(nStop / nTok * 1e6).cast(LongType).as("stopword_ratio_e6"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(floor((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
             |    / length(text)::DOUBLE * 1000000.0) AS BIGINT) AS punct_ratio_e6,
             |  CAST(floor(len(list_filter(string_split(text, ' '),
             |      t -> t IN ('the','a','an','and','or','of','to','in','is','it')))
             |    / len(string_split(text, ' '))::DOUBLE * 1000000.0) AS BIGINT)
             |    AS stopword_ratio_e6
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ---------------------------------------------- Gopher rule filter
    // the published Gopher/MassiveText rule SET (Rae et al. 2021, A1.1)
    // as one named gate, not loose signals: word count ∈ [50, 100k],
    // mean word length ∈ [3, 10], symbol-to-word ratio ('#'/'...')
    // ≤ 0.1, ≥80% of words alphabetic, ≥2 distinct stopwords. The
    // stoplist is the quality family's shared one (q_text_quality_signals)
    // rather than Gopher's written-English eight ("the be to of and that
    // have with"): the synthetic fixture vocabulary contains exactly ONE
    // of those eight, which would pin the rule false on every document —
    // the rule's SHAPE (≥2 distinct function words present) is what the
    // gate encodes, the list is corpus-specific. The two line-shape rules
    // (bullet-start / ellipsis-end line fractions) don't apply to a
    // single-line corpus and are deliberately out. Emits the measured
    // signals, a per-rule bitmask (bit i = rule i passed) and the AND
    // verdict — downstream selection reads `keep`, auditing reads the
    // mask to see WHICH rule killed a document. Per-row map over one
    // scan, zero shuffle; thresholds compare engine-identical doubles
    // (integer counts divided as doubles), outputs floor-scaled like
    // the rest of the quality family.
    QueryDef("q_text_gopher_rules",
      (s, d) => {
        val (nW, meanLen, symRatio, alphaRatio, stopHits, rules) =
          gopherSignals(GopherStopsFixture)
        val Seq(r1, r2, r3, r4, r5) = rules
        val mask = rules.zipWithIndex
          .map { case (r, i) => when(r, lit(1L << i)).otherwise(lit(0L)) }
          .reduce(_ + _)
        Tables.table(s, d, "documents").select(
            col("doc_id"),
            nW.cast(LongType).as("n_words"),
            floor(meanLen * 1e6).cast(LongType).as("mean_word_len_e6"),
            floor(symRatio * 1e6).cast(LongType).as("symbol_ratio_e6"),
            floor(alphaRatio * 1e6).cast(LongType).as("alpha_ratio_e6"),
            stopHits.as("stop_hits"),
            mask.as("rule_mask"),
            (r1 && r2 && r3 && r4 && r5).cast(LongType).as("keep"))
          .orderBy("doc_id")
      },
      Some("""WITH g AS (
             |  SELECT doc_id,
             |    len(string_split(text, ' '))::DOUBLE AS n_words,
             |    (length(text)::DOUBLE - (len(string_split(text, ' ')) - 1))
             |      / len(string_split(text, ' ')) AS mean_len,
             |    ((length(text) - length(replace(text, '#', '')))
             |      + (length(text) - length(replace(text, '...', ''))) / 3
             |     )::DOUBLE / len(string_split(text, ' ')) AS sym_ratio,
             |    len(list_filter(string_split(text, ' '),
             |        w -> regexp_matches(w, '[a-zA-Z]')))::DOUBLE
             |      / len(string_split(text, ' ')) AS alpha_ratio,
             |    CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
             |      ['the','a','an','and','or','of','to','in','is','it'])) AS BIGINT)
             |      AS stop_hits
             |  FROM documents
             |), r AS (
             |  SELECT doc_id, n_words, mean_len, sym_ratio, alpha_ratio,
             |    stop_hits,
             |    CASE WHEN n_words >= 50 AND n_words <= 100000
             |      THEN 1 ELSE 0 END AS r1,
             |    CASE WHEN mean_len >= 3 AND mean_len <= 10
             |      THEN 1 ELSE 0 END AS r2,
             |    CASE WHEN sym_ratio <= 0.1 THEN 1 ELSE 0 END AS r3,
             |    CASE WHEN alpha_ratio >= 0.8 THEN 1 ELSE 0 END AS r4,
             |    CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS r5
             |  FROM g
             |)
             |SELECT doc_id,
             |  CAST(n_words AS BIGINT) AS n_words,
             |  CAST(floor(mean_len * 1000000.0) AS BIGINT) AS mean_word_len_e6,
             |  CAST(floor(sym_ratio * 1000000.0) AS BIGINT) AS symbol_ratio_e6,
             |  CAST(floor(alpha_ratio * 1000000.0) AS BIGINT) AS alpha_ratio_e6,
             |  stop_hits,
             |  CAST(r1 + r2 * 2 + r3 * 4 + r4 * 8 + r5 * 16 AS BIGINT)
             |    AS rule_mask,
             |  CAST(r1 * r2 * r3 * r4 * r5 AS BIGINT) AS keep
             |FROM r ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------ repetition ratio
    // the repeated-n-gram filter (the classic "repetition" quality gate:
    // boilerplate and looping generations show high duplicate-shingle
    // fractions): rep = 1 - distinct_3grams / total_3grams per document.
    // Per-row map over one scan — zero shuffle; the distinct shingling is
    // the codegen'd Shingles3 shared with the dedup family; floor-scaled
    // e6 integers for engine-exact parity. Docs under 3 tokens have no
    // 3-grams → ratio 0 by convention on both sides.
    QueryDef("q_text_repetition",
      (s, d) => {
        graft.functions.Shingles3.register(s)
        Tables.table(s, d, "documents")
          .select(col("doc_id"), repetitionE6.as("rep_ratio_e6"))
          .orderBy("doc_id")
      },
      Some("""WITH tk_t AS (
             |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
             |)
             |SELECT doc_id,
             |  CASE WHEN len(tk) >= 3 THEN
             |    CAST(floor((1.0 - len(list_distinct(list_transform(
             |        generate_series(1, len(tk) - 2),
             |        i -> concat(tk[i], ' ', tk[i+1], ' ', tk[i+2]))))::DOUBLE
             |      / (len(tk) - 2)) * 1000000.0) AS BIGINT)
             |  ELSE CAST(0 AS BIGINT) END AS rep_ratio_e6
             |FROM tk_t ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------ unigram log-prob
    // per-doc average unigram log-probability under the corpus's OWN
    // unigram distribution — the classic cheap perplexity-style quality
    // signal (a doc of corpus-rare tokens scores low). Same two-
    // aggregate shape as tf-idf: (doc, token) counts, vocabulary-sized
    // frequency table joined back (broadcast here; a token-key shuffle
    // join at 100 TB vocabularies), then ONE per-doc aggregate.
    // avg = Σ tf·ln(cnt) / n_tok − ln(N). Cross-engine determinism: the
    // per-token ln is rounded to 9 digits (both engines: round(ln(cnt),
    // 9) into DECIMAL(20,9)) and the Σ runs in DECIMAL
    // (order-independent, exact), so partition order can never wiggle
    // the 6-digit output; only the final scalar ops are double.
    QueryDef("q_text_unigram_logprob",
      (s, d) => {
        val docs = Tables.table(s, d, "documents")
        val term = docs.select(col("doc_id"), explode(toks).as("token"))
        val tf = term.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        val freq = tf.groupBy("token").agg(sum("tf").as("cnt"))
        val totals = freq.agg(sum("cnt").as("n_total"))
        tf.join(broadcast(freq), "token")
          .groupBy("doc_id")
          .agg(
            sum(expr("CAST(tf AS DECIMAL(10,0)) * " +
              "CAST(round(ln(cnt), 9) AS DECIMAL(20,9))")).as("slp"),
            sum("tf").as("n_tok"))
          .join(broadcast(totals))
          .select(col("doc_id"),
            round(col("slp").cast(DoubleType) / col("n_tok")
              - log(col("n_total").cast(DoubleType)), 6).as("avg_logprob"))
          .orderBy("doc_id")
      },
      Some("""WITH term AS (
             |  SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents
             |), tf AS (
             |  SELECT doc_id, token, count(1) AS tf FROM term GROUP BY 1, 2
             |), freq AS (
             |  SELECT token, sum(tf) AS cnt FROM tf GROUP BY 1
             |), perdoc AS (
             |  SELECT doc_id,
             |    sum(CAST(tf AS DECIMAL(10,0))
             |      * CAST(round(ln(cnt), 9) AS DECIMAL(20,9))) AS slp,
             |    sum(tf) AS n_tok
             |  FROM tf JOIN freq USING (token) GROUP BY doc_id
             |)
             |SELECT doc_id,
             |  round(CAST(slp AS DOUBLE) / n_tok
             |    - ln(CAST((SELECT sum(cnt) FROM freq) AS DOUBLE)), 6) AS avg_logprob
             |FROM perdoc ORDER BY doc_id""".stripMargin)),

    // --------------------------------- deterministic training shuffle
    // the LAST step of every training-data pipeline: a SEEDED global
    // shuffle of the curated corpus into training shards — each doc
    // gets (shard, pos) from a pseudorandom permutation that is a pure
    // function of (seed, doc_id), so re-running the pipeline (or
    // re-materializing one lost shard) reproduces the exact order.
    // Spark-first shape: NO global sort — the md5 keyed hash assigns
    // the shard (uniform by construction), and position is a
    // row_number window PER SHARD ordered by (hash, doc_id); shards
    // sort independently in parallel, so the biggest task is
    // corpus/nshards at any scale. Changing the seed string is a fresh
    // epoch-order; both engines replay the identical permutation.
    QueryDef("q_shuffle_shards",
      (s, d) => {
        val h = s"${md5i("'ep42:' || CAST(doc_id AS STRING)")} % 1000000000"
        Tables.table(s, d, "documents").select("doc_id")
          .withColumn("h", expr(h))
          .withColumn("shard", (col("h") % 8).cast(LongType))
          .withColumn("pos", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("shard").orderBy(col("h"), col("doc_id")))
            .cast(LongType))
          .select("doc_id", "shard", "pos")
          .orderBy("shard", "pos")
      },
      Some(s"""WITH h_t AS (
              |  SELECT doc_id,
              |    ${md5iDuck("'ep42:' || CAST(doc_id AS VARCHAR)")}
              |      % 1000000000 AS h
              |  FROM documents
              |)
              |SELECT doc_id, CAST(h % 8 AS BIGINT) AS shard,
              |  CAST(row_number() OVER (PARTITION BY h % 8
              |    ORDER BY h, doc_id) AS BIGINT) AS pos
              |FROM h_t ORDER BY shard, pos""".stripMargin)),

    // --------------------------------------- DSIR importance resampling
    // Data Selection with Importance Resampling (Xie et al., 2023 —
    // arXiv:2302.03169): select raw-corpus docs whose token
    // distribution looks like a TARGET domain, by per-doc importance
    // log-weight logw = avg over tokens of [ln p_target(tok) −
    // ln p_raw(tok)] (unigram estimate, add-1 smoothing on the target
    // side so raw-only tokens stay finite), then hash-coin resampling
    // with acceptance ∝ exp(β·logw): accept iff
    // ln(u) < β·(logw − max(logw)) — the comparison stays in LOG
    // domain (no exp underflow; exact at any corpus size) and every
    // transcendental is rounded to 9 decimals on BOTH engines before
    // the DECIMAL-exact Σ, the proven unigram-logprob determinism
    // pattern. β (DSIR's temperature; 100 here) sharpens selection
    // when target and raw distributions are close — the synthetic
    // corpus's en slice differs from the mix by only ~0.05 nats/token,
    // so β=1 would accept nearly everything; β·(logw − max) is one
    // IEEE multiply of identical doubles, engine-exact. Target = the 'en' slice of
    // the same corpus (any reference corpus slots in). Scale shape:
    // two (doc,token) hash aggs, one token-keyed vocabulary join whose
    // broadcast-vs-shuffle arm is MEASURED per run ([[dsirSelect]]),
    // one per-doc agg, two 1-row broadcasts — the corpus never sorts.
    QueryDef("q_select_dsir",
      (s, d) => dsirSelect(s, d),
      Some(s"""WITH term AS (
              |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
              |  FROM documents
              |), tf AS (
              |  SELECT doc_id, token, count(1) AS tf FROM term GROUP BY 1, 2
              |), raw_freq AS (
              |  SELECT token, sum(tf) AS rcnt FROM tf GROUP BY 1
              |), tgt_freq AS (
              |  SELECT token, count(1) AS tcnt FROM term
              |  WHERE lang = 'en' GROUP BY 1
              |), scal AS (
              |  SELECT (SELECT sum(rcnt) FROM raw_freq) AS rtot,
              |         (SELECT count(1) FROM raw_freq) AS v,
              |         (SELECT coalesce(sum(tcnt), 0) FROM tgt_freq) AS ttot
              |), perdoc AS (
              |  SELECT doc_id,
              |    sum(CAST(tf AS DECIMAL(10,0))
              |      * CAST(round(ln(coalesce(tcnt, 0) + 1), 9)
              |          AS DECIMAL(20,9))) AS slpt,
              |    sum(CAST(tf AS DECIMAL(10,0))
              |      * CAST(round(ln(rcnt), 9) AS DECIMAL(20,9))) AS slpr,
              |    sum(tf) AS n_tok
              |  FROM tf JOIN raw_freq USING (token)
              |    LEFT JOIN tgt_freq USING (token)
              |  GROUP BY doc_id
              |), scored AS (
              |  SELECT doc_id,
              |    round(CAST(slpt - slpr AS DOUBLE) / n_tok
              |      - ln(CAST(ttot + v AS DOUBLE))
              |      + ln(CAST(rtot AS DOUBLE)), 6) AS dsir_logw
              |  FROM perdoc, scal
              |), mx AS (SELECT max(dsir_logw) AS maxw FROM scored)
              |SELECT doc_id, dsir_logw FROM scored, mx
              |WHERE round(ln(((${md5iDuck("CAST(doc_id AS VARCHAR)")}
              |    % 1000000) + 1) / 1000000.0), 9)
              |  < 100.0 * (dsir_logw - maxw)
              |ORDER BY doc_id""".stripMargin)),

    // ----------------------------------------- log-prob quality buckets
    // CCNet-style (Wenzek et al., 2020) quality bucketing: split the
    // corpus into head/middle/tail by per-doc unigram log-probability.
    // CCNet cuts at corpus quantiles of a reference-LM perplexity; the
    // engine twin cuts at FIXED OFFSETS from the corpus mean logprob —
    // scale-invariant like the quantile cut (the mean tracks the
    // corpus), but exactly comparable across engines: both cuts are
    // DECIMAL-exact aggregates (no interpolation between floating
    // ranks, so no last-ulp threshold drift class at any SF) and every
    // per-doc score is the proven rounded-9/DECIMAL unigram shape.
    // head = logp ≥ mean; the second cut is the mean of the
    // BELOW-mean half (exact decimal Σ over rounded-6 scores —
    // order-independent, engine-identical), so all three buckets
    // populate on any non-degenerate corpus: middle = [cut2, mean),
    // tail = below. One (doc,token) agg + vocabulary join + two 1-row
    // broadcasts; no sort, no single-partition window.
    QueryDef("q_text_logprob_buckets",
      (s, d) => {
        // r17 optimization round: rides the shared [[docTermFreq]]
        // artifact (ONE explode pipeline per session, was one per
        // consumer) and checkpoints the doc-grain perDoc frame so the
        // scored/mean/cut2 consumers read a scan instead of each
        // re-running the vocabulary join (the broadcast-child
        // re-execution class of r16's histQuantiles fix). n_total is
        // DERIVED from perDoc: Σ_docs n_tok ≡ Σ_tokens cnt exactly
        // (the same tf multiset summed in a different grouping — exact
        // integer arithmetic), so the old freq→totals aggregation chain
        // is gone entirely.
        val tf = docTermFreq(s, d)
        val freq = tf.groupBy("token").agg(sum("tf").as("cnt"))
        val perDoc = graft.CacheRegistry.getOrCheckpoint(
          "text_logprob_perdoc", d,
          tf.join(broadcast(freq), "token")
            .groupBy("doc_id")
            .agg(
              sum(expr("CAST(tf AS DECIMAL(10,0)) * " +
                "CAST(round(ln(cnt), 9) AS DECIMAL(20,9))")).as("slp"),
              sum("tf").as("n_tok")))
        val tot = perDoc.agg(
          sum("slp").as("slp_all"), sum("n_tok").as("n_total"))
        val scored = perDoc.join(broadcast(tot))
          .select(col("doc_id"),
            round(col("slp").cast(DoubleType) / col("n_tok")
              - log(col("n_total").cast(DoubleType)), 6).as("logp"))
        // corpus mean in the SAME exact-decimal space: Σslp/Σn_tok
        val mean = tot
          .select(round(col("slp_all").cast(DoubleType) / col("n_total")
            - log(col("n_total").cast(DoubleType)), 6).as("mean_logp"))
        val withMean = scored.join(broadcast(mean))
        val cut2 = withMean.filter(col("logp") < col("mean_logp"))
          .agg(round(sum(expr("CAST(logp AS DECIMAL(20,6))"))
            .cast(DoubleType) / count(lit(1)), 6).as("low_logp"))
        withMean.join(broadcast(cut2))
          .select(col("doc_id"), col("logp"),
            when(col("logp") >= col("mean_logp"), "head")
              .when(col("logp") >= col("low_logp"), "middle")
              .otherwise("tail").as("bucket"))
          .orderBy("doc_id")
      },
      Some("""WITH term AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
             |  FROM documents
             |), tf AS (
             |  SELECT doc_id, token, count(1) AS tf FROM term GROUP BY 1, 2
             |), freq AS (
             |  SELECT token, sum(tf) AS cnt FROM tf GROUP BY 1
             |), perdoc AS (
             |  SELECT doc_id,
             |    sum(CAST(tf AS DECIMAL(10,0))
             |      * CAST(round(ln(cnt), 9) AS DECIMAL(20,9))) AS slp,
             |    sum(tf) AS n_tok
             |  FROM tf JOIN freq USING (token) GROUP BY doc_id
             |), tot AS (SELECT sum(cnt) AS n_total FROM freq),
             |scored AS (
             |  SELECT doc_id,
             |    round(CAST(slp AS DOUBLE) / n_tok
             |      - ln(CAST(n_total AS DOUBLE)), 6) AS logp
             |  FROM perdoc, tot
             |), m AS (
             |  SELECT round(CAST(sum(slp) AS DOUBLE) / sum(n_tok)
             |    - ln(CAST((SELECT n_total FROM tot) AS DOUBLE)), 6)
             |    AS mean_logp
             |  FROM perdoc
             |), c2 AS (
             |  SELECT round(CAST(sum(CAST(logp AS DECIMAL(20,6))) AS DOUBLE)
             |    / count(1), 6) AS low_logp
             |  FROM scored, m WHERE logp < mean_logp
             |)
             |SELECT doc_id, logp,
             |  CASE WHEN logp >= mean_logp THEN 'head'
             |       WHEN logp >= low_logp THEN 'middle'
             |       ELSE 'tail' END AS bucket
             |FROM scored, m, c2 ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------- weighted sampling
    // importance sampling with per-ROW admission probability ∝ a weight
    // column (here n_chars — the "sample long documents more" curation
    // dial; any quality score slots in). Hash-based like its siblings:
    // u = md5(doc_id) % 1e6 is a reproducible uniform, and the admission
    // test is written as ALL-INTEGER cross-multiplication
    // (u * max_w < 1e6 * w  ⇔  u/1e6 < w/max_w) so no float division
    // ever enters — bit-identical admission on any engine, no boundary-
    // row drift. The weight normalizer (corpus max) is a 1-row agg
    // broadcast onto a narrow scan: at 100 TB the key costs one column
    // scan plus a scalar join, no shuffle of the corpus itself.
    QueryDef("q_sample_weighted",
      (s, d) => {
        val docs = Tables.table(s, d, "documents").select("doc_id", "n_chars")
        val mx = docs.agg(max("n_chars").as("max_chars"))
        docs.join(broadcast(mx))
          .filter(expr(s"${md5i("CAST(doc_id AS STRING)")} % 1000000")
            * col("max_chars") < lit(1000000L) * col("n_chars"))
          .select("doc_id", "n_chars")
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, n_chars
              |FROM documents,
              |  (SELECT max(n_chars) AS max_chars FROM documents)
              |WHERE (${md5iDuck("CAST(doc_id AS VARCHAR)")} % 1000000)
              |  * max_chars < 1000000 * n_chars
              |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------ stratified sampling
    // per-language admission quotas — the corpus-BALANCING primitive
    // (down-sample the dominant language, keep low-resource ones whole).
    // Hash-based like q_sample_split: reproducible across runs, engines
    // and cluster sizes, stable under repartitioning. One narrow scan —
    // the quota test is a per-row predicate, no shuffle at all.
    QueryDef("q_sample_stratified",
      (s, d) => {
        val pct = expr(s"${md5i("CAST(doc_id AS STRING)")} % 100")
        val quota = org.apache.spark.sql.functions
          .when(col("lang") === "en", 25).otherwise(80)
        Tables.table(s, d, "documents")
          .filter(pct < quota)
          .select(col("doc_id"), col("lang"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, lang FROM documents
              |WHERE ${md5iDuck("CAST(doc_id AS VARCHAR)")} % 100 <
              |  CASE WHEN lang = 'en' THEN 25 ELSE 80 END
              |ORDER BY doc_id""".stripMargin)),

    // -------------------------------------- temperature source mixing
    // the mixture-WEIGHT computation (Pile/PaLM-style): source s gets
    // weight ∝ n_tokens(s)^α with temperature α = 0.5 — up-weights
    // low-resource sources relative to proportional sampling — then a
    // token budget B turns weights into per-source sampling rates
    // (rate > 1 ⇒ multiple epochs over that source). One corpus pass
    // (map-side-combinable token-count agg); everything after runs on
    // the sources-sized summary with a 1-row broadcast total — at 100 TB
    // the mixture math costs the same as a count.
    //
    // Cross-engine determinism: IEEE-754 sqrt is EXACTLY rounded, so
    // sqrt(n_tokens) is bit-identical in any engine; it's then pinned to
    // DECIMAL(28,9) and the normalization total is an exact decimal sum
    // (float summation order never enters). The final ratios are written
    // as the identical double expression on both sides and rounded to 6.
    QueryDef("q_sample_mixture",
      (s, d) => {
        val src = Tables.table(s, d, "documents")
          .groupBy("source")
          .agg(sum(size(toks).cast(LongType)).as("n_tokens"))
          .withColumn("w_raw",
            expr("CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 9) " +
              "AS DECIMAL(28,9))"))
        val tot = src.agg(sum(col("w_raw")).as("tot"))
        src.crossJoin(broadcast(tot))
          .select(col("source"), col("n_tokens"),
            expr("round(CAST(w_raw AS DOUBLE) / CAST(tot AS DOUBLE), 6)")
              .as("mix_weight"),
            expr("round(1000000.0 * (CAST(w_raw AS DOUBLE) " +
              "/ CAST(tot AS DOUBLE)) / CAST(n_tokens AS DOUBLE), 6)")
              .as("sample_rate"))
          .orderBy("source")
      },
      Some("""WITH src AS (
             |  SELECT source,
             |    CAST(sum(len(string_split(text, ' '))) AS BIGINT)
             |      AS n_tokens
             |  FROM documents GROUP BY source
             |), w AS (
             |  SELECT source, n_tokens,
             |    CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 9)
             |      AS DECIMAL(28,9)) AS w_raw
             |  FROM src
             |), tot AS (SELECT sum(w_raw) AS tot FROM w)
             |SELECT source, n_tokens,
             |  round(CAST(w_raw AS DOUBLE) / CAST(tot AS DOUBLE), 6)
             |    AS mix_weight,
             |  round(1000000.0 * (CAST(w_raw AS DOUBLE)
             |    / CAST(tot AS DOUBLE)) / CAST(n_tokens AS DOUBLE), 6)
             |    AS sample_rate
             |FROM w, tot ORDER BY source""".stripMargin)),

    // ----------------------------------- temperature-sampled manifest
    // the END-TO-END companion of q_sample_mixture's weights: actually
    // ADMIT documents so each source's expected share follows the
    // temperature-flattened weight w_s ∝ sqrt(D_s) (α = 0.5) against a
    // corpus budget of B = 300 docs — the Pile/ROOTS-style mixture draw
    // as a deterministic manifest. Admission for a doc in source s is
    //   u/1e6 < B·w_s / (tot·D_s)
    // written as ALL-INTEGER cross-multiplication (q_sample_weighted's
    // trick, scaled up): u·TOT·D_s < 1e6·B·W_s, where W_s =
    // round(sqrt(D_s)·1e9) (IEEE sqrt is exactly rounded → identical
    // BIGINT on any engine) and TOT = ΣW_s is an exact integer sum.
    // The products live in int128 (Spark DECIMAL(38,0) ≡ DuckDB
    // HUGEINT — exact to 1e38, vs the ~1e30 worst case at 10^10 docs
    // per source), so the admission boundary is bit-identical with no
    // float division anywhere. Plan: one doc-count agg (sources-sized),
    // broadcast back onto a narrow scan — the corpus itself never
    // shuffles, same cost envelope as a filtered count at 100 TB.
    QueryDef("q_sample_temperature",
      (s, d) => {
        val srcW = Tables.table(s, d, "documents")
          .groupBy("source").agg(count(lit(1)).as("d_s"))
          .withColumn("w_s",
            expr("CAST(round(sqrt(CAST(d_s AS DOUBLE)) * 1e9) AS BIGINT)"))
        val tot = srcW.agg(sum(col("w_s")).as("tot"))
        Tables.table(s, d, "documents").select("doc_id", "source")
          .join(broadcast(srcW), "source")
          .crossJoin(broadcast(tot))
          .filter(
            expr(s"CAST(${md5i("CAST(doc_id AS STRING)")} % 1000000 " +
              "AS DECIMAL(38,0)) * tot * d_s") <
            expr("CAST(1000000 AS DECIMAL(38,0)) * 300 * w_s"))
          .select("doc_id", "source")
          .orderBy("doc_id")
      },
      Some(s"""WITH src AS (
              |  SELECT source, count(1) AS d_s,
              |    CAST(round(sqrt(CAST(count(1) AS DOUBLE)) * 1e9)
              |      AS BIGINT) AS w_s
              |  FROM documents GROUP BY source
              |), tot AS (SELECT sum(w_s) AS tot FROM src)
              |SELECT doc_id, d.source
              |FROM documents d JOIN src USING (source), tot
              |WHERE CAST(${md5iDuck("CAST(doc_id AS VARCHAR)")} % 1000000
              |    AS HUGEINT) * tot * d_s
              |  < CAST(1000000 AS HUGEINT) * 300 * w_s
              |ORDER BY doc_id""".stripMargin)),

    // ------------------------------------ multi-epoch sampling manifest
    // the EPOCH-oversampling draw (rate > 1 ⇒ a low-resource source
    // repeats): q_sample_temperature's sibling where each doc emits
    // floor/ceil(rate) copies instead of a 0/1 admission. Epoch-ladder
    // form: doc d with uniform u = md5(d) % 1e6 appears in epoch e iff
    //   rate − e > u/1e6   ⟺   u·TOT·D_s < 1e6·(B·w_s − e·TOT·D_s)
    // — a PREFIX of epochs, expected copies exactly `rate`, and the
    // whole ladder is int128 arithmetic (Spark DECIMAL(38,0) ≡ DuckDB
    // HUGEINT): no rational division, no float boundary anywhere. The
    // budget B = 1000 docs makes rates straddle 1 across the scale
    // factors, so both the repeat (>1) and thin-sample (<1) regimes are
    // exercised. Plan: sources-sized weight math broadcast onto a
    // narrow scan + a ≤5-wide epoch explode — the corpus never
    // shuffles.
    QueryDef("q_sample_epochs",
      (s, d) => {
        val srcW = Tables.table(s, d, "documents")
          .groupBy("source").agg(count(lit(1)).as("d_s"))
          .withColumn("w_s",
            expr("CAST(round(sqrt(CAST(d_s AS DOUBLE)) * 1e9) AS BIGINT)"))
        val tot = srcW.agg(sum(col("w_s")).as("tot"))
        // sources-grain ladder guard: a rate above the 0..4 ladder would
        // be truncated IDENTICALLY on both engines (invisible to the
        // oracle), so it must fail loudly instead — raise_error rides
        // the load-bearing w_s column so pruning can't drop it
        val srcWG = guardEpochLadder(
          srcW.crossJoin(broadcast(tot)), budget = 1000, ladderWidth = 5)
        Tables.table(s, d, "documents").select("doc_id", "source")
          .join(broadcast(srcWG), "source")
          .withColumn("epoch", explode(sequence(lit(0), lit(4))))
          .filter(
            expr(s"CAST(${md5i("CAST(doc_id AS STRING)")} % 1000000 " +
              "AS DECIMAL(38,0)) * tot * d_s") <
            expr("CAST(1000000 AS DECIMAL(38,0)) " +
              "* (1000 * w_s - epoch * tot * d_s)"))
          .select(col("doc_id"), col("source"), col("epoch").cast(LongType)
            .as("epoch"))
          .orderBy("doc_id", "epoch")
      },
      Some(s"""WITH src AS (
              |  SELECT source, count(1) AS d_s,
              |    CAST(round(sqrt(CAST(count(1) AS DOUBLE)) * 1e9)
              |      AS BIGINT) AS w_s
              |  FROM documents GROUP BY source
              |), tot AS (SELECT sum(w_s) AS tot FROM src),
              |ladder AS (SELECT unnest(generate_series(0, 4)) AS epoch)
              |SELECT doc_id, d.source, CAST(epoch AS BIGINT) AS epoch
              |FROM documents d JOIN src USING (source), tot, ladder
              |WHERE CAST(${md5iDuck("CAST(doc_id AS VARCHAR)")} % 1000000
              |    AS HUGEINT) * tot * d_s
              |  < CAST(1000000 AS HUGEINT)
              |    * (1000 * w_s - epoch * tot * d_s)
              |ORDER BY doc_id, epoch""".stripMargin)),

    // --------------------------------------- character entropy signal
    // the Gopher-class "is this natural text" quality signal: per-doc
    // Shannon entropy over characters, −Σ_c p_c·log2(p_c) — low for
    // boilerplate/repeated filler, high for encrypted/random noise,
    // mid-band for prose. Plan: per-char explode → (doc, char) hash agg
    // (map-side-combined — the only corpus-sized pass; the frame then
    // collapses to ≤ charset rows per doc) → doc totals re-aggregated
    // from that frame (shuffle-aligned on doc_id) → per-char entropy
    // terms. Cross-engine determinism: each term is rounded to an e9
    // INTEGER (n_c, N integers → p_c is the same double; log2 agrees to
    // ~1 ulp, the e9 rounding absorbs it — q_text_unigram_logprob's
    // margin argument), integer-summed (order-free), and the final
    // value re-rounds to e6 micro-bits, so a one-off at e9 dies at e6.
    QueryDef("q_text_entropy",
      (s, d) => {
        // char = explicit CODE POINT on both engines ('(?s).' matches
        // one code point in Java regex and RE2 alike) — split(text, '')
        // vs string_split(text, '') can disagree on non-ASCII text
        // (code units / grapheme clusters), the stated multilingual
        // domain; TextSpec pins the code-point contract on surrogate +
        // combining-mark fixtures
        val cc = Tables.table(s, d, "documents")
          .select(col("doc_id"),
            explode(expr("regexp_extract_all(text, '(?s).', 0)")).as("ch"))
          .filter(col("ch") =!= "")
          .groupBy("doc_id", "ch").agg(count(lit(1)).as("n_c"))
        val tot = cc.groupBy("doc_id").agg(
          sum(col("n_c")).as("n"), count(lit(1)).as("k"))
        cc.join(tot, "doc_id")
          .select(col("doc_id"), col("n"), col("k"),
            expr("CAST(round(-1e9 * (CAST(n_c AS DOUBLE) / n) " +
              "* log2(CAST(n_c AS DOUBLE) / n)) AS BIGINT)").as("t_e9"))
          .groupBy("doc_id")
          .agg(min(col("n")).as("n_chars_counted"),
            min(col("k")).as("n_distinct_chars"),
            expr("CAST(round(sum(t_e9) / 1000.0) AS BIGINT)")
              .as("entropy_e6"))
          .orderBy("doc_id")
      },
      Some("""WITH ch AS (
             |  SELECT doc_id,
             |    unnest(regexp_extract_all(text, '(?s).')) AS ch
             |  FROM documents
             |), cc AS (
             |  SELECT doc_id, ch, count(1) AS n_c FROM ch
             |  WHERE ch <> '' GROUP BY 1, 2
             |), tot AS (
             |  SELECT doc_id, sum(n_c) AS n, count(1) AS k
             |  FROM cc GROUP BY 1
             |)
             |SELECT cc.doc_id,
             |  CAST(min(n) AS BIGINT) AS n_chars_counted,
             |  CAST(min(k) AS BIGINT) AS n_distinct_chars,
             |  CAST(round(sum(CAST(round(-1e9
             |      * (CAST(n_c AS DOUBLE) / n)
             |      * log2(CAST(n_c AS DOUBLE) / n)) AS BIGINT))
             |    / 1000.0) AS BIGINT) AS entropy_e6
             |FROM cc JOIN tot ON cc.doc_id = tot.doc_id
             |GROUP BY cc.doc_id ORDER BY cc.doc_id""".stripMargin)),

    // ------------------------------------------------ per-source quotas
    // exact top-N per source by quality (n_chars standing in for any
    // monotone quality key, as in q_select_token_budget) — the
    // MIXTURE-construction primitive: cap each source's contribution to
    // the training corpus at its best N documents. Unlike the hash
    // quotas above (a fixed admission RATE), this is a fixed COUNT with
    // a total order, i.e. a ranking problem — and the naive rank is a
    // per-source window, one task per source, serialized on whichever
    // source dominates the corpus. [[topNPerGroup]] runs it as the
    // salted two-level rank instead: 16 parallel slices per source keep
    // local top-10s, the final window ranks ≤160 candidates per source.
    // The oracle computes the naive single-window version; identical
    // rows because the slice survivors are a superset of the answer.
    QueryDef("q_sample_quota",
      (s, d) => topNPerGroup(
          Tables.table(s, d, "documents"),
          Seq("source"), Seq(col("n_chars").desc, col("doc_id")), 10,
          saltKey = col("doc_id"))
        .select("source", "doc_id", "lang", "n_chars", "rank")
        .orderBy("source", "rank"),
      Some("""SELECT source, doc_id, lang, n_chars, rank FROM (
             |  SELECT source, doc_id, lang, n_chars,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY n_chars DESC, doc_id) AS rank
             |  FROM documents)
             |WHERE rank <= 10 ORDER BY source, rank""".stripMargin)),

    // ------------------------------------------------ top bigrams / lang
    // corpus-level n-gram statistics (the vocabulary-inspection /
    // contamination-eyeball primitive): top-10 bigrams per language by
    // frequency. The heavy pass is explode → partial+final hash agg on
    // (lang, bigram) — the corpus never feeds a window. Ranking runs on
    // the distinct-bigram COUNT frame (vocab-sized, not corpus-sized),
    // and even that avoids one-task-per-language via the same salted
    // two-level rank as q_sample_quota. Ties break on the bigram string
    // so the cut is a total order on both engines. zip_with of the two
    // shifted token slices forms bigrams without an index join; a
    // single-token document yields two empty slices, not an error.
    QueryDef("q_text_bigrams",
      (s, d) => {
        val tail = greatest(size(toks) - 1, lit(0))
        val counts = Tables.table(s, d, "documents")
          .select(col("lang"), explode(zip_with(
            slice(toks, lit(1), tail), slice(toks, lit(2), tail),
            (a, b) => concat(a, lit(" "), b))).as("bigram"))
          .groupBy("lang", "bigram").agg(count(lit(1)).as("n"))
        topNPerGroup(counts, Seq("lang"),
            Seq(col("n").desc, col("bigram")), 10, saltKey = col("bigram"))
          .select("lang", "bigram", "n", "rank")
          .orderBy("lang", "rank")
      },
      Some("""WITH tk AS (
             |  SELECT lang, string_split(text, ' ') AS t FROM documents
             |), bg AS (
             |  SELECT lang, t[i] || ' ' || t[i + 1] AS bigram
             |  FROM tk, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
             |), c AS (
             |  SELECT lang, bigram, count(1) AS n FROM bg GROUP BY 1, 2
             |)
             |SELECT lang, bigram, n, rank FROM (
             |  SELECT lang, bigram, n,
             |    row_number() OVER (PARTITION BY lang
             |      ORDER BY n DESC, bigram) AS rank
             |  FROM c)
             |WHERE rank <= 10 ORDER BY lang, rank""".stripMargin)),

    // ------------------------------------------------ sequence packing
    // pack documents into context-window-sized groups (token budget 2048)
    // — the batch-construction primitive of a training pipeline. Packing
    // is CONTIGUOUS per source in doc_id order: bucket = how many full
    // budgets precede the doc's running token total, so assignment is a
    // window cumsum (one shuffle by source), deterministic, and
    // engine-portable — not a greedy bin-packer, which is inherently
    // sequential and unreproducible under repartitioning. A document
    // longer than the budget gets buckets to itself (standard overflow).
    // Scale note (honest limit): a window partition is one task, so ONE
    // source's cumsum serializes on one executor — fine for many-source
    // corpora, a bottleneck if a single source dominates 100 TB. The
    // scale-out refinement is IMPLEMENTED as [[packAssignments]]'
    // `rangeWidth` option (Graft.packSequences(rangeWidth=…)): the same
    // math inside fixed-width doc_id ranges, fully parallel, at the
    // cost of ≤1 underfilled bucket per range boundary. Deliberately
    // NOT the default: the contiguous-per-source semantics here are
    // what the oracle pins.
    QueryDef("q_pack_sequences",
      (s, d) =>
        packAssignments(Tables.table(s, d, "documents"))
          .groupBy("source", "bucket")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
          .orderBy("source", "bucket"),
      Some("""WITH toks AS (
             |  SELECT doc_id, source,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |  FROM documents
             |), packed AS (
             |  SELECT source,
             |    CAST(floor((sum(n_tokens) OVER (PARTITION BY source
             |        ORDER BY doc_id) - n_tokens) / 2048) AS BIGINT) AS bucket,
             |    n_tokens
             |  FROM toks
             |)
             |SELECT source, bucket, CAST(count(1) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
             |FROM packed GROUP BY source, bucket
             |ORDER BY source, bucket""".stripMargin)),

    // ------------------------------------------------ budgeted selection
    // fill a token budget with the BEST documents: admit docs in
    // (n_chars DESC, doc_id) order — n_chars standing in for any
    // monotone quality key — while the running token total fits. The
    // naive plan is a cumsum over ONE global sort (a single window
    // task); this runs the packing trick on the SORT KEY instead of
    // doc_id: the heavy cumsum partitions by quality bucket
    // (n_chars DIV 64 — a coarsening of the order, so buckets ARE
    // contiguous runs of the global sort), and a per-bucket-summary
    // window (≤ max_chars/64 rows) supplies each bucket's preceding
    // token total. global running total = bucket offset + local cumsum,
    // EXACTLY the single-window result — the DuckDB oracle computes the
    // naive global version and must hash-match.
    QueryDef("q_select_token_budget",
      (s, d) => selectTokenBudget(s, d, budget = 50000L),
      Some("""WITH toks AS (
             |  SELECT doc_id, n_chars,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |  FROM documents
             |), ranked AS (
             |  SELECT doc_id, n_tokens,
             |    sum(n_tokens) OVER (ORDER BY n_chars DESC, doc_id) AS cum_tokens
             |  FROM toks
             |)
             |SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
             |FROM ranked WHERE cum_tokens <= 50000
             |ORDER BY doc_id""".stripMargin)),

    // The chunked scale-out of the same packing ([[packAssignments]]
    // with rangeWidth): the heavy cumsum runs per (source, doc_id DIV
    // 100) chunk, bucket ids numbered densely by a chunk-summary scan.
    // The DuckDB oracle replays BOTH levels — local starts, per-chunk
    // started-bucket counts, the offset window — so the driver
    // hash-checks the parallel math every round, not just the spec's
    // driver replay.
    QueryDef("q_pack_sequences_chunked",
      (s, d) =>
        packAssignments(Tables.table(s, d, "documents"), rangeWidth = Some(100L))
          .groupBy("source", "bucket")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
          .orderBy("source", "bucket"),
      Some("""WITH toks AS (
             |  SELECT doc_id, source, doc_id // 100 AS chunk,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |  FROM documents
             |), local AS (
             |  SELECT doc_id, source, chunk, n_tokens,
             |    sum(n_tokens) OVER (PARTITION BY source, chunk
             |      ORDER BY doc_id) - n_tokens AS strt
             |  FROM toks
             |), summ AS (
             |  SELECT source, chunk,
             |    (sum(n_tokens) - max_by(n_tokens, doc_id)) // 2048 + 1 AS nb
             |  FROM toks GROUP BY source, chunk
             |), offs AS (
             |  SELECT source, chunk,
             |    sum(nb) OVER (PARTITION BY source ORDER BY chunk) - nb AS off
             |  FROM summ
             |), packed AS (
             |  SELECT l.source,
             |    CAST(o.off + l.strt // 2048 AS BIGINT) AS bucket, l.n_tokens
             |  FROM local l JOIN offs o USING (source, chunk)
             |)
             |SELECT source, bucket, CAST(count(1) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
             |FROM packed GROUP BY source, bucket
             |ORDER BY source, bucket""".stripMargin)),

    // ------------------------------------------------ sliding chunking
    // RAG / long-context chunking: each document sliced into 120-char
    // windows every 90 chars (25% overlap so no sentence is ever split
    // across a boundary without appearing whole in a neighbor) — the
    // retrieval-indexing primitive that feeds the similarity family.
    // ROW-LOCAL by construction: starts are a `sequence`, the window is a
    // `substr` — zero shuffle before the contract's final orderBy, and at
    // 100 TB this is a pure map stage that pipelines into whatever
    // consumes the chunks (embedding, indexing, near-dup). The tail
    // window is shorter, never padded; a start past the text's end is
    // never generated (sequence stops at len), so chunk counts are exact.
    QueryDef("q_text_chunks",
      (s, d) => {
        val len = length(col("text"))
        Tables.table(s, d, "documents")
          .select(col("doc_id"), col("text"),
            posexplode(sequence(lit(1), greatest(len, lit(1)), lit(90)))
              .as(Seq("chunk_idx", "start")))
          .select(col("doc_id"), col("chunk_idx").cast(LongType),
            col("text").substr(col("start"), lit(120)).as("chunk"))
          .withColumn("chunk_chars", length(col("chunk")).cast(LongType))
          .orderBy("doc_id", "chunk_idx")
      },
      Some("""SELECT doc_id, CAST((i - 1) // 90 AS BIGINT) AS chunk_idx,
             |  substr(text, CAST(i AS BIGINT), 120) AS chunk,
             |  CAST(length(substr(text, CAST(i AS BIGINT), 120)) AS BIGINT)
             |    AS chunk_chars
             |FROM documents,
             |  UNNEST(generate_series(1, greatest(length(text), 1), 90)) AS u(i)
             |ORDER BY doc_id, chunk_idx""".stripMargin)),

    // ------------------------------------------ per-group reservoir
    // fixed-size uniform sample PER GROUP (k=5 docs per language) — the
    // eyeball-sample / few-shot-pick primitive. A classic streaming
    // reservoir is order-dependent; the distributed-and-reproducible
    // equivalent is BOTTOM-K BY HASH: rank every row by the md5 of its
    // unique id and keep each group's k smallest. Same uniformity (the
    // hash is a fixed random permutation of doc ids), but the sample is
    // a pure FUNCTION of the id set — stable across runs, engines,
    // partitionings, and executor counts, and two nodes' bottom-k lists
    // MERGE by re-taking bottom-k (the mergeability a true reservoir
    // lacks). Rides [[topNPerGroup]]'s salted two-level rank, so a
    // dominant language never serializes into one window task.
    QueryDef("q_sample_reservoir",
      (s, d) => reservoirPerGroup(
          Tables.table(s, d, "documents").select("lang", "doc_id"),
          Seq("lang"), "doc_id", 5)
        .select(col("lang"), col("doc_id"), col("hk"))
        .orderBy("lang", "doc_id"),
      Some(s"""SELECT lang, doc_id, hk FROM (
              |  SELECT lang, doc_id,
              |    ${md5iDuck("CAST(doc_id AS VARCHAR)")} AS hk,
              |    row_number() OVER (PARTITION BY lang
              |      ORDER BY ${md5iDuck("CAST(doc_id AS VARCHAR)")}, doc_id)
              |      AS rk
              |  FROM documents)
              |WHERE rk <= 5
              |ORDER BY lang, doc_id""".stripMargin)),

    // --------------------------------------------- collocation mining
    // PMI-style collocations per language: adjacent word pairs that
    // co-occur far more often than their unigram frequencies predict —
    // the phrase-detection pass of a corpus pipeline (multi-word
    // expressions, tokenizer-merge candidates). Score is an EXACT
    // integer lift in parts-per-million:
    //   lift_ppm = (n_ab · 10^6 · N²) div (B · n_a · n_b)
    // (N = tokens in the language, B = bigrams; lift ≈ p(ab)/(p(a)p(b)),
    // the exp of PMI) — computed in DECIMAL(38,0) / HUGEINT on the two
    // engines so partial-agg order cannot wiggle a bit, where a float
    // log-PMI would drift. Headroom: the numerator tops out ~10^26 at
    // the replica (≪ 10^38); the BIGINT result tops out ~10^6·N/(B·min²)
    // ≈ 10^12 at the replica — the n_ab ≥ 3 support floor keeps the
    // singleton-pair degenerates (lift = N²/B ≫ everything) out entirely.
    // Plan: two explode+count aggs (token grain, bigram grain), two
    // token-keyed joins to attach unigram counts, two broadcast joins
    // for the per-lang totals, then the salted top-10 — at 100 TB the
    // heavy grain is the bigram count, ONE map-side-combinable shuffle.
    QueryDef("q_text_collocations",
      (s, d) => {
        val docs = Tables.table(s, d, "documents")
        val tail = greatest(size(toks) - 1, lit(0))
        val tok = docs.select(col("lang"), explode(toks).as("w"))
        val uni = tok.groupBy("lang", "w").agg(count(lit(1)).as("n_w"))
        val tot = tok.groupBy("lang").agg(count(lit(1)).as("n_tok"))
        val bg = docs.select(col("lang"), explode(zip_with(
            slice(toks, lit(1), tail), slice(toks, lit(2), tail),
            (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
          .select(col("lang"), col("p.w1").as("w1"), col("p.w2").as("w2"))
        val nbg = bg.groupBy("lang").agg(count(lit(1)).as("n_bg"))
        val scored = bg.groupBy("lang", "w1", "w2")
          .agg(count(lit(1)).as("n_ab"))
          .filter(col("n_ab") >= 3)
          .join(uni.select(col("lang"), col("w").as("w1"),
            col("n_w").as("n_a")), Seq("lang", "w1"))
          .join(uni.select(col("lang"), col("w").as("w2"),
            col("n_w").as("n_b")), Seq("lang", "w2"))
          .join(broadcast(tot), Seq("lang"))
          .join(broadcast(nbg), Seq("lang"))
          .withColumn("lift_ppm", expr(
            """(CAST(n_ab AS DECIMAL(38,0)) * 1000000 * n_tok * n_tok)
              | div (CAST(n_bg AS DECIMAL(38,0)) * n_a * n_b)""".stripMargin))
          .select("lang", "w1", "w2", "n_ab", "lift_ppm")
        topNPerGroup(scored, Seq("lang"),
            Seq(col("lift_ppm").desc, col("w1"), col("w2")), 10,
            saltKey = concat(col("w1"), lit(" "), col("w2")))
          .orderBy("lang", "rank")
      },
      Some("""WITH tk AS (
             |  SELECT lang, string_split(text, ' ') AS t FROM documents
             |), uni AS (
             |  SELECT lang, u.w, count(1) AS n_w
             |  FROM tk, UNNEST(t) AS u(w) GROUP BY 1, 2
             |), tot AS (
             |  SELECT lang, count(1) AS n_tok
             |  FROM tk, UNNEST(t) AS u(w) GROUP BY 1
             |), bg AS (
             |  SELECT lang, t[i] AS w1, t[i + 1] AS w2
             |  FROM tk, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
             |), nbg AS (
             |  SELECT lang, count(1) AS n_bg FROM bg GROUP BY 1
             |), pair AS (
             |  SELECT lang, w1, w2, count(1) AS n_ab
             |  FROM bg GROUP BY 1, 2, 3 HAVING count(1) >= 3
             |), scored AS (
             |  SELECT p.lang, p.w1, p.w2, CAST(p.n_ab AS BIGINT) AS n_ab,
             |    CAST((CAST(p.n_ab AS HUGEINT) * 1000000 * t.n_tok * t.n_tok)
             |      // (CAST(b.n_bg AS HUGEINT) * a.n_w * c.n_w) AS BIGINT)
             |      AS lift_ppm
             |  FROM pair p
             |  JOIN uni a ON a.lang = p.lang AND a.w = p.w1
             |  JOIN uni c ON c.lang = p.lang AND c.w = p.w2
             |  JOIN tot t ON t.lang = p.lang
             |  JOIN nbg b ON b.lang = p.lang
             |)
             |SELECT lang, w1, w2, n_ab, lift_ppm, rank FROM (
             |  SELECT lang, w1, w2, n_ab, lift_ppm,
             |    row_number() OVER (PARTITION BY lang
             |      ORDER BY lift_ppm DESC, w1, w2) AS rank
             |  FROM scored)
             |WHERE rank <= 10
             |ORDER BY lang, rank""".stripMargin))
  )
}
