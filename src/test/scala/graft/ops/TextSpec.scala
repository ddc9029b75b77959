package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Edge semantics of the text-analysis columns beyond the SQL oracle
  * (the synthetic corpus never hits these shapes). */
class TextSpec extends SparkSpec {

  test("repetition ratio: short docs 0, looping docs high, unique docs 0") {
    graft.functions.Shingles3.register(spark)
    import spark.implicits._
    val docs = Seq(
      (1L, "a b"),                     // < 3 tokens: no 3-grams → 0
      (2L, "x y z x y z x y z x y z"), // 12 tokens → 10 shingles, 3 distinct
      (3L, "one two three four five")  // all shingles distinct → 0
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), Text.repetitionE6.as("rep"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 0L, "a doc too short to shingle must score 0")
    // 1 - 3/10 = 0.7 → 700000 exactly (floor of an exact double)
    assert(got(2L) == 700000L, s"looping doc scored ${got(2L)}, expected 700000")
    assert(got(3L) == 0L, "an all-distinct doc must score 0")
  }

  test("selectTokenBudget is bucketWidth-invariant (the decomposition never changes the answer)") {
    def rows(w: Long) =
      graft.Graft.selectTokenBudget(spark, sfDir, budget = 20000L, bucketWidth = w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val base = rows(64L)
    assert(base.nonEmpty)
    // budget binds: admitted tokens stay within it and the selection is
    // a strict subset of the corpus
    assert(base.forall(_._3 <= 20000L))
    for (w <- Seq(1L, 16L, 1000000L)) // 1e6 → ONE bucket = the naive plan
      assert(rows(w) == base, s"bucketWidth=$w changed the selection")
  }

  test("chunked sequence packing: per-chunk contiguous math, dense numbering, parallel plan") {
    import spark.implicits._
    // ONE dominant source (the 100 TB worst case for the contiguous
    // default) with irregular doc lengths; budget 10 tokens, chunks of
    // 8 doc_ids → the heavy cumsum runs per (source, chunk), not per
    // source
    val docs = (0L until 64L).map { i =>
      (i, "web", Seq.fill((i % 7 + 1).toInt)("t").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val budget = 10L
    val contiguous = Text.packAssignments(docs, budget, None)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val chunkedDf = Text.packAssignments(docs, budget, Some(8L))
    val chunked = chunkedDf.collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // exact driver replay of the documented semantics: contiguous
    // packing applied independently per chunk, buckets numbered densely
    // by the chunks' ceil(tokens/budget) counts
    var off = 0L
    val expected = chunked.groupBy(_._1 / 8).toSeq.sortBy(_._1).flatMap {
      case (_, rows) =>
        var cum = 0L
        var lastB = 0L
        val assigned = rows.sortBy(_._1).map { case (id, n, _) =>
          val b = off + cum / budget
          lastB = b
          cum += n
          id -> b
        }
        off = lastB + 1 // next chunk numbers from the first unused bucket
        assigned
    }.toMap
    assert(chunked.map(t => t._1 -> t._3).toMap == expected,
      "chunked packing must be contiguous-per-chunk with dense global numbering")
    // buckets are dense 0..max (no gaps — level-2 offsets are exact)
    val buckets = chunked.map(_._3).distinct.sorted.toSeq
    assert(buckets == (0L until off).toSeq,
      s"bucket ids must be dense: $buckets")
    // differs from contiguous ONLY by the fresh-bucket-per-boundary
    // resets: a chunk whose first doc would CONTINUE a contiguous bucket
    // shifts, one that starts budget-aligned doesn't — first chunk
    // always agrees
    val chunkedMap = chunked.map(t => t._1 -> t._3).toMap
    assert((0L until 8L).forall(id => chunkedMap(id) == contiguous(id)),
      "the first chunk must match contiguous packing exactly")
    // a rangeWidth spanning all doc_ids IS contiguous packing
    val oneChunk = Text.packAssignments(docs, budget, Some(1000L))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(oneChunk == contiguous,
      "one covering chunk must reproduce the contiguous assignment")
    // the corpus-sized window partitions by (source, chunk) — the plan
    // carries __chunk into the exchange, so one source ≠ one task
    val p = chunkedDf.queryExecution.executedPlan.toString
    assert(p.contains("__chunk"),
      s"the heavy cumsum must partition by the doc_id chunk:\n$p")
  }

  // ---------------------------------------------------------------------
  // ScalaCheck properties: the fixture tests above pin ONE corpus; these
  // pin the two-level math itself — ∀ random corpora and widths, the
  // parallel decomposition equals a driver brute force of the documented
  // semantics. Fixed seed → deterministic runs.

  private val seedParams = org.scalacheck.Test.Parameters.default
    .withMinSuccessfulTests(8)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def checkProp(prop: org.scalacheck.Prop): Unit = {
    val res = org.scalacheck.Test.check(seedParams, prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }

  test("ScalaCheck: chunked packing ≡ per-chunk contiguous replay, ∀ corpora/widths") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.propBoolean
    import spark.implicits._
    // NoShrink: the default shrinker ignores Gen bounds (it would offer
    // negative token counts), so a shrunk "counterexample" is garbage
    val corpusGen = for {
      n <- Gen.choose(1, 50)
      nSrc <- Gen.choose(1, 3)
      docs <- Gen.listOfN(n, for {
        id <- Gen.choose(0L, 150L)
        src <- Gen.choose(0, nSrc - 1)
        toks <- Gen.choose(1, 12) // above AND below the budget range —
        // oversize docs exercise the overflow rule (skipped bucket slots)
      } yield (id, s"s$src", toks))
    } yield docs.distinctBy(_._1) // doc_id unique, like the real table
    val prop = Prop.forAllNoShrink(corpusGen, Gen.choose(3L, 30L),
      Gen.choose(1L, 40L)) { (corpus, budget, rw) =>
      val docs = corpus
        .map { case (id, src, t) => (id, src, Seq.fill(t)("t").mkString(" ")) }
        .toDF("doc_id", "source", "text")
      // driver replay of the DOCUMENTED semantics: contiguous cumsum
      // (bucket = start offset DIV budget) restarted per
      // (source, doc_id DIV rw) chunk, chunk offsets numbered by each
      // chunk's last-start DIV budget + 1 slot count
      val expected = corpus.groupBy(_._2).flatMap { case (_, srcDocs) =>
        var off = 0L
        srcDocs.groupBy(_._1 / rw).toSeq.sortBy(_._1).flatMap {
          case (_, rows) =>
            val sorted = rows.sortBy(_._1)
            var cum = 0L
            val assigned = sorted.map { case (id, _, t) =>
              val b = off + cum / budget
              cum += t
              id -> b
            }
            off += (cum - sorted.last._3) / budget + 1
            assigned
        }
      }.toMap
      val got = Text.packAssignments(docs, budget, Some(rw))
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      (got == expected) :| s"assignment diverged (budget=$budget rw=$rw)"
    }
    checkProp(prop)
  }

  test("ScalaCheck: bucketed token-budget selection ≡ naive global cumsum, ∀ corpora/widths") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.propBoolean
    import spark.implicits._
    val corpusGen = for {
      n <- Gen.choose(1, 50)
      docs <- Gen.listOfN(n, for {
        id <- Gen.choose(0L, 150L)
        chars <- Gen.choose(0L, 300L) // ties + zero both legal
        toks <- Gen.choose(1, 12)
      } yield (id, chars, toks))
    } yield docs.distinctBy(_._1)
    val prop = Prop.forAllNoShrink(corpusGen, Gen.choose(5L, 120L),
      Gen.choose(1L, 100L)) { (corpus, budget, bw) =>
      val docs = corpus
        .map { case (id, c, t) => (id, c, Seq.fill(t)("t").mkString(" ")) }
        .toDF("doc_id", "n_chars", "text")
      // naive driver cumsum in the global (n_chars DESC, doc_id) order —
      // what ONE window over the whole corpus would compute
      var cum = 0L
      val expected = corpus.sortBy(d => (-d._2, d._1)).flatMap {
        case (id, _, t) =>
          cum += t
          if (cum <= budget) Some((id, t.toLong, cum)) else None
      }.toSet
      val got = Text.selectTokenBudgetDf(docs, budget, bw)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      (got == expected) :| s"selection diverged (budget=$budget bw=$bw)"
    }
    checkProp(prop)
  }

  test("ScalaCheck: salted two-level top-N ≡ naive per-group rank, ∀ corpora/n/salts") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.propBoolean
    import spark.implicits._
    val corpusGen = for {
      n <- Gen.choose(1, 60)
      nGrp <- Gen.choose(1, 4)
      rows <- Gen.listOfN(n, for {
        id <- Gen.choose(0L, 200L)
        g <- Gen.choose(0, nGrp - 1)
        v <- Gen.choose(0L, 20L) // narrow range → heavy ties at the cut;
        // the unique id tie-break is what makes the cut a total order
      } yield (id, s"g$g", v))
    } yield rows.distinctBy(_._1)
    val prop = Prop.forAllNoShrink(corpusGen, Gen.choose(1, 8),
      Gen.choose(1, 7)) { (corpus, n, salts) =>
      val df = corpus.toDF("doc_id", "grp", "v")
      // naive driver rank: ONE sorted pass per group — what the
      // single-window plan would compute
      val expected = corpus.groupBy(_._2).flatMap { case (g, rows) =>
        rows.sortBy(r => (-r._3, r._1)).take(n).zipWithIndex
          .map { case ((id, _, v), i) => (g, id, v, i + 1L) }
      }.toSet
      val got = Text.topNPerGroup(df, Seq("grp"),
          Seq(col("v").desc, col("doc_id")), n,
          saltKey = col("doc_id"), salts = salts)
        .select("grp", "doc_id", "v", "rank").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      (got == expected) :| s"top-N diverged (n=$n salts=$salts)"
    }
    checkProp(prop)
  }

  test("textChunks matches a sequential chunker for random texts, widths and strides") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val texts = (0L until 30L).map { i =>
      // lengths 0..~40 deliberately straddle width/stride boundaries
      i -> rnd.alphanumeric.take(rnd.nextInt(41)).mkString
    }
    val df = texts.toDF("doc_id", "text")
    for ((w, s) <- Seq((10, 7), (10, 10), (5, 12), (1, 1))) {
      val got = graft.Graft.textChunks(df, width = w, stride = s)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
        .toSet
      val expect = texts.flatMap { case (id, t) =>
        val starts = 1 to math.max(t.length, 1) by s
        starts.zipWithIndex.map { case (st, i) =>
          val chunk = t.slice(st - 1, st - 1 + w)
          (id, i.toLong, chunk, chunk.length.toLong)
        }
      }.toSet
      assert(got == expect, s"chunks diverged at width=$w stride=$s")
    }
    intercept[IllegalArgumentException] { graft.Graft.textChunks(df, 0, 1) }
  }

  test("entropy char split is CODE POINTS: surrogate pairs whole, combining marks separate") {
    import spark.implicits._
    // "a" + U+1F4AF (supplementary, 2 UTF-16 units) + "e" + U+0301
    // (combining acute): code-point splitting must keep the emoji as
    // ONE element (never split the surrogate pair) and the combining
    // mark as its OWN element (never merged into a grapheme) — the
    // contract q_text_entropy shares with the DuckDB oracle's
    // regexp_extract_all('(?s).')
    val text = "a💯é\nz"
    val got = Seq(text).toDF("text")
      .selectExpr("regexp_extract_all(text, '(?s).', 0) AS cps")
      .collect()(0).getSeq[String](0)
    assert(got == Seq("a", "💯", "e", "́", "\n", "z"),
      s"code-point split diverged: ${got.map(_.map(_.toInt.toHexString))}")
  }

  test("guardEpochLadder: in-ladder sources pass through, out-of-ladder raises") {
    import spark.implicits._
    // rate = budget·w_s/(tot·d_s); budget=1000, width=5 ⇒ raise iff
    // 1000·w_s >= 5·tot·d_s
    val ok = Seq(("s1", 100L, 1000L, 1000000L)).toDF("source", "d_s", "w_s", "tot")
    val passed = Text.guardEpochLadder(ok, 1000, 5).collect()
    assert(passed.map(_.getLong(2)).toSeq == Seq(1000L))
    val hot = Seq(("s2", 1L, 999999L, 1000000L)).toDF("source", "d_s", "w_s", "tot")
    val e = intercept[Exception] {
      Text.guardEpochLadder(hot, 1000, 5).collect()
    }
    assert(e.getMessage.contains("epoch ladder too narrow") ||
      Option(e.getCause).exists(_.getMessage.contains("epoch ladder too narrow")),
      s"unexpected failure: $e")
  }

  test("collocations match a sequential BigInt replay of the lift formula") {
    // replay q_text_collocations in driver Scala with exact BigInt
    // arithmetic: lift_ppm = (n_ab·10^6·N²) div (B·n_a·n_b), support
    // floor n_ab ≥ 3, top-10 per lang by (lift desc, w1, w2)
    val docs = graft.warehouse.Tables.table(spark, sfDir, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).toSeq))
    val byLang = docs.groupBy(_._1)
    val want = byLang.toSeq.flatMap { case (lang, ds) =>
      val toks = ds.flatMap(_._2)
      val bgs = ds.flatMap(_._2.sliding(2).filter(_.length == 2)
        .map(p => (p(0), p(1))).toSeq)
      val n = BigInt(toks.size); val b = BigInt(bgs.size)
      val uni = toks.groupBy(identity).view.mapValues(x => BigInt(x.size))
      val ranked = bgs.groupBy(identity).toSeq
        .map { case ((w1, w2), g) => (w1, w2, BigInt(g.size)) }
        .filter(_._3 >= 3)
        .map { case (w1, w2, nab) =>
          val lift = (nab * 1000000 * n * n) / (b * uni(w1) * uni(w2))
          (w1, w2, nab.toLong, lift.toLong)
        }
        .sortBy { case (w1, w2, _, lift) => (-lift, w1, w2) }
        .take(10).zipWithIndex
        .map { case ((w1, w2, nab, lift), i) =>
          (lang, w1, w2, nab, lift, (i + 1).toLong) }
      ranked
    }.toSet
    val got = graft.SparkEntry.queries("q_text_collocations")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == want,
      s"collocations diverged from the replay: ${got.size} vs ${want.size}")
    assert(want.nonEmpty)
  }

  test("gopher rules: keep ≡ all-bits mask, signals replay sequentially, rules discriminate") {
    val stop = Set("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
    val rows = graft.SparkEntry.queries("q_text_gopher_rules")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    val docs = graft.warehouse.Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, nW, meanE6, symE6, alphaE6, hits, mask, keep) =>
      // keep is exactly "every rule bit set"
      assert((keep == 1L) == (mask == 31L),
        s"doc $id: keep=$keep but mask=$mask")
      // sequential replay of the measured signals
      val ws = docs(id).split(" ", -1)
      assert(nW == ws.length, s"doc $id word count")
      assert(meanE6 ==
        math.floor(ws.map(_.length).sum.toDouble / ws.length * 1e6).toLong)
      // ASCII letters ONLY, matching the product's RLIKE '[a-zA-Z]'
      // (and the DuckDB twin) — Character.isLetter would count Unicode
      // letters and falsely fail the replay on an accented fixture
      assert(alphaE6 == math.floor(
        ws.count(_.exists(c => (c >= 'a' && c <= 'z') ||
          (c >= 'A' && c <= 'Z'))).toDouble / ws.length * 1e6).toLong)
      assert(hits == ws.toSet.count(stop), s"doc $id stop hits")
      assert(symE6 >= 0 && (mask & ~31L) == 0L)
      // per-bit consistency with the emitted signals (r1/r4/r5 are
      // exactly recomputable from the integer outputs)
      assert(((mask & 1L) != 0) == (nW >= 50 && nW <= 100000))
      assert(((mask & 16L) != 0) == (hits >= 2))
    }
    // the set discriminates on this corpus: both verdicts occur
    assert(rows.exists(_._8 == 1L) && rows.exists(_._8 == 0L),
      "fixture corpus should produce both keep verdicts")
  }

  test("DSIR vocab dispatch: broadcast and shuffle arms are row-identical; the code makes the call") {
    // r15 verdict task 7: the 'broadcast here, token-shuffle at 100 TB
    // vocabularies' note is now a measured dispatch — pin that forcing
    // the shuffle arm (threshold 0) changes nothing but the join
    // strategy, so the |vocab| count is free to steer purely on size.
    val bc = Text.dsirSelect(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val sh = Text.dsirSelect(spark, sfDir, broadcastMaxVocab = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(bc.nonEmpty, "DSIR accepted nothing at fixture scale")
    assert(bc == sh, "broadcast and shuffle vocabulary arms diverged")
    // the fixture vocabulary is far below the ceiling: the default call
    // must take the broadcast arm (decision = size threshold, nothing
    // else), and the keyed query must BE the default call
    val key = graft.SparkEntry.queries("q_select_dsir")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(key == bc, "q_select_dsir drifted from dsirSelect's default arm")
  }
}
