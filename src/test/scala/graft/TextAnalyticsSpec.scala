package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalytics

/** Golden check for TF-IDF, the one text operator kept out of the DuckDB
  * oracle (float ln — rule R2/R5): expected values are computed in-JVM on a
  * planted corpus, so the comparison is exact. */
class TextAnalyticsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("bpe training: merge order, weights, and greedy application on a planted corpus") {
    // words: aaab ×2, ab ×1. Pair counts: (a,a) = 4, (a,b) = 3.
    // merge1 (a,a)→aa; aaab segments GREEDILY to [aa,a,b] (not [a,aa,b]).
    // merge2 (a,b)→ab (cnt 3: two from aaab's tail + one from ab).
    // merge3 (aa,ab)→aaab (cnt 2).
    val docs = Seq((1L, "aaab ab"), (2L, "aaab")).toDF("doc_id", "text")
    val got = TextAnalytics.vocabTrainDf(docs, nMerges = 3)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "a", "a", "aa", 4L),
      (2L, "a", "b", "ab", 3L),
      (3L, "aa", "ab", "aaab", 2L)))
  }

  test("bpe training: non-overlapping left-to-right merge and pair-asc tie-break") {
    // "aaaaa": (a,a) counts 4 overlapping positions; greedy application
    // must yield aa|aa|a. Round 2 pairs (aa,aa) and (aa,a) tie at 1 —
    // (aa,a) wins the (lhs,rhs)-asc tie ("a" < "aa").
    val docs = Seq((1L, "aaaaa")).toDF("doc_id", "text")
    val got = TextAnalytics.vocabTrainDf(docs, nMerges = 2)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "a", "a", "aa", 4L),
      (2L, "aa", "a", "aaa", 1L)))
  }

  test("bpe inference: merge-order encode, and where it diverges from longest-match") {
    // Corpus: ba ×4, ab ×2, abab ×1. Pass-1 pairs: (b,a) = 4+1 = 5 beats
    // (a,b) = 2+2 = 4 → merge1 (b,a)→ba; "abab" greedily becomes [a,ba,b].
    // Pass-2: (a,b) = 2 beats the abab-internal pairs → merge2 (a,b)→ab.
    // Merge-order encode of "abab": merge1 first → [a,ba,b], and merge2
    // finds no (a,b) adjacency left → 3 pieces. Greedy longest-match over
    // the SAME learned vocab {ba, ab} cuts ab|ab → 2 pieces — the classic
    // BPE-vs-WordPiece inference gap, visible in the fertility.
    val docs = Seq((1L, "ba ba ba ba"), (2L, "ab ab"), (3L, "abab"))
      .toDF("doc_id", "text")
    val bpe = TextAnalytics.tokenizeBpeDf(docs, nMerges = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(bpe === Seq(
      (1L, 4L, 4L, 10000L),
      (2L, 2L, 2L, 10000L),
      (3L, 1L, 3L, 30000L)))
    val lm = TextAnalytics.tokenizeWordpieceDf(docs, vocab = Seq("ba", "ab"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(lm === Seq(
      (1L, 4L, 4L, 10000L),
      (2L, 2L, 2L, 10000L),
      (3L, 1L, 2L, 20000L)))
  }

  test("tokenizer fertility eval: per-source three-paradigm decision table") {
    // The "bpe inference" fixture above, re-cut by source: srcA's words
    // encode identically under both rules (fertility 10000/10000, delta
    // 0); srcB is the divergence case (merge-order 3 pieces vs greedy 2
    // → 30000 vs 20000, delta 10000); srcC has no [a-z]+ tokens at all
    // (zeros, no division blow-up).
    val docs = Seq(
      (1L, "ba ba ba ba", "srcA"),
      (2L, "ab ab", "srcA"),
      (3L, "abab", "srcB"),
      (4L, "123", "srcC")
    ).toDF("doc_id", "text", "source")
    // Three-paradigm table: merges are [(ba, 5), (ab, 2)]. srcB's "abab":
    // merge-order gives a|ba|b (3 pieces), greedy gives ab|ab (2), and
    // the score-maximizing DP also picks a|ba|b (score 5 beats ab|ab's
    // 4) — the DP optimizes SCORE, not piece count, hence dp_delta
    // −10000: the honest cost of frequency-weighted scores on this vocab.
    val got = TextAnalytics.tokenizerFertilityEvalDf(docs, nMerges = 2)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got === Seq(
      ("srcA", 2L, 6L, 6L, 6L, 6L, 10000L, 10000L, 10000L, 0L, 0L),
      ("srcB", 1L, 1L, 3L, 2L, 3L, 30000L, 20000L, 30000L, 10000L, -10000L),
      ("srcC", 1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("quality calibration: per-source percentiles exact, single-doc source pins to 0") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "sA"),
      (2L, "dog lazy the over jumps fox brown quick the", "sA"),
      (3L, "completely different text about query planning", "sA"),
      (4L, "lonely single document here", "sB")
    ).toDF("doc_id", "text", "source")
    val scores = TextAnalytics.lmScoreDf(docs)
      .select("doc_id", "lm_mean_e4").as[(Long, Long)].collect().toMap
    val got = TextAnalytics.qualityCalibratedDf(docs)
      .as[(Long, String, Long, Long, Long, Long)].collect()
    assert(got.length === 4)
    // independent recompute of source sA's ranking and percentiles
    val sA = Seq(1L, 2L, 3L).sortBy(d => (-scores(d), d))
    for ((d, i) <- sA.zipWithIndex) {
      val row = got.find(_._1 == d).get
      assert(row._3 === scores(d))
      assert(row._4 === i + 1L, s"rank of doc $d")
      val pct = math.round(i * 10000.0 / 2)
      assert(row._5 === pct, s"pct of doc $d")
      assert(row._6 === (if (pct <= TextAnalytics.CalibKeepE4) 1L else 0L))
    }
    // a single-doc source is its own best: pct 0, kept
    val b = got.find(_._1 == 4L).get
    assert(b._4 === 1L && b._5 === 0L && b._6 === 1L)
  }

  test("dsir: target-vs-source importance ratios, hand-computed on a planted corpus") {
    // d1 (7 tokens, stopwords present) is the only quality-ok doc → the
    // target corpus. Every d1 word: c_t = c_s = 1, so ratio =
    // (2·(ns+V))/(2·(nt+V)) = (9+9)/(7+9) = 1.125 → 11250. d2's words
    // never appear in the target: ratio = (1·18)/(2·16) = 0.5625 → 5625.
    val docs = Seq(
      (1L, "the good text is here and polished"),
      (2L, "zz qq")).toDF("doc_id", "text")
    val got = TextAnalytics.dsirScoreDf(docs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 7L, 7L * 11250L, 11250L),
      (2L, 2L, 2L * 5625L, 5625L)))
  }

  test("ccnet bucketing: per-language thirds, remainder to head, doc_id tie-break") {
    // Language A: 4 docs — ntile(3) gives 2/1/1 (remainder widens head).
    // "x x x" repeated bigrams score highest; distinct-word docs lowest.
    // Language B: 2 docs — tiles 1 and 2, so B has a head and a middle
    // but NO tail (exactly ntile's small-partition behavior).
    // Docs 3 and 4 tie on score (same text) → doc_id breaks the tie, so
    // doc 3 takes the last head slot deterministically.
    val docs = Seq(
      (1L, "x x x x x x", "aa"), (2L, "q r s t u v", "aa"),
      (3L, "x x q", "aa"), (4L, "x x q", "aa"),
      (5L, "x x x", "bb"), (6L, "m n o", "bb"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalytics.ccnetBucketDf(docs)
      .select("doc_id", "lang", "bucket")
      .as[(Long, String, String)].collect().toSeq
    assert(got.filter(_._2 == "bb") ===
      Seq((5L, "bb", "head"), (6L, "bb", "middle")))
    val aa = got.filter(_._2 == "aa").map(r => r._1 -> r._3).toMap
    assert(aa(1L) === "head")
    assert(aa(3L) === "head", "doc 3 must win the tie for the 2nd head slot")
    assert(aa(4L) === "middle")
    assert(aa(2L) === "tail")
  }

  test("bpe training: batched passes = sequential merge table, fewer jobs") {
    val docs = sources.Tables.documents(spark, TestSpark.sf)
    val (seqTable, seqPasses) = TextAnalytics.vocabTrainRaw(docs, 12, batch = 1)
    val (batTable, batPasses) = TextAnalytics.vocabTrainRaw(docs, 12, batch = 8)
    assert(batTable === seqTable) // bit-identical ranks, pairs, AND counts
    assert(seqPasses === 12)
    assert(batPasses < seqPasses,
      s"batching must reduce passes ($batPasses vs $seqPasses)")
  }

  test("bpe training: batching respects sequential dynamics on a riser corpus") {
    // "the" ×30, "xy" ×25: pass-1 pairs (h,e)=30, (t,h)=30, (x,y)=25 —
    // (h,e) wins the count tie by lhs-asc. Sequential: (h,e) → then the
    // RISER (t,he)=30 (created by merge 1, outranking (x,y)=25) → (x,y).
    // A naive disjoint-top-B batch would grab (x,y) alongside (h,e) in
    // pass 1 and misorder it; the prefix rule stops at (t,h) (shared h),
    // and pass 2 batches (t,he) with (x,y) only because the riser bound
    // proves (x,y)=25 safe. Word-frequency weighting exercised via the
    // multi-doc spread.
    val docs = ((1 to 30).map(i => (i.toLong, "the")) ++
      (31 to 55).map(i => (i.toLong, "xy"))).toDF("doc_id", "text")
    val (seqTable, seqPasses) = TextAnalytics.vocabTrainRaw(docs, 3, batch = 1)
    val (batTable, batPasses) = TextAnalytics.vocabTrainRaw(docs, 3, batch = 8)
    assert(seqTable.map(t => (t._2, t._3, t._5)) ===
      Seq(("h", "e", 30L), ("t", "he", 30L), ("x", "y", 25L)))
    assert(batTable === seqTable)
    assert(seqPasses === 3 && batPasses === 2)
  }

  test("bpe batch selection: prefix-stop, symbol guards, riser arithmetic") {
    import TextAnalytics.selectMergeBatch
    // Disjoint steep-dropoff list: all four accepted (risers are floored
    // at outsideBound=0 and no pair touches another's symbols).
    assert(selectMergeBatch(IndexedSeq(
      ("a", "b", 100L), ("c", "d", 40L), ("e", "f", 10L), ("g", "h", 3L)),
      0L, 8) === Seq(("a", "b", 100L), ("c", "d", 40L), ("e", "f", 10L), ("g", "h", 3L)))
    // Symbol overlap STOPS (does not skip): (a,c) shares a; (e,f) behind
    // it must NOT be taken even though it is disjoint.
    assert(selectMergeBatch(IndexedSeq(
      ("a", "b", 100L), ("a", "c", 40L), ("e", "f", 10L)),
      0L, 8) === Seq(("a", "b", 100L)))
    // Cascade guard: (a,b) after (ab,c) would let one fold scan do
    // sequential-impossible work — merged symbol "ab" is (ab,c)'s input.
    assert(selectMergeBatch(IndexedSeq(
      ("ab", "c", 100L), ("a", "b", 40L)),
      0L, 8) === Seq(("ab", "c", 100L)))
    // Riser guard fires: (h,e)=25 sorts below (x,y)=30, but with
    // outsideBound=10 the bound for merging (t,h) is
    // max(maxRhs(t)+maxRhs(th), maxLhs(h)+maxLhs(th)) =
    // max(10+10, 25+10) = 35 > 30 — the unseen riser (th,e) could reach
    // 35, so (x,y) must wait for the recount.
    assert(selectMergeBatch(IndexedSeq(
      ("t", "h", 60L), ("x", "y", 30L), ("h", "e", 25L)),
      10L, 8) === Seq(("t", "h", 60L)))
    // Same shape, complete list (outsideBound=0): riser bound is
    // maxLhs(h)=25 < 30 → (x,y) is provably safe and rides along.
    assert(selectMergeBatch(IndexedSeq(
      ("t", "h", 60L), ("x", "y", 30L), ("h", "e", 25L)),
      0L, 8) === Seq(("t", "h", 60L), ("x", "y", 30L)))
    // outsideBound floors every max: with a truncated list the second
    // candidate must beat 2×outsideBound.
    assert(selectMergeBatch(IndexedSeq(
      ("a", "b", 100L), ("c", "d", 9L)),
      5L, 8) === Seq(("a", "b", 100L)))
    assert(selectMergeBatch(IndexedSeq(
      ("a", "b", 100L), ("c", "d", 11L)),
      5L, 8) === Seq(("a", "b", 100L), ("c", "d", 11L)))
    // maxB caps the batch.
    assert(selectMergeBatch(IndexedSeq(
      ("a", "b", 100L), ("c", "d", 40L), ("e", "f", 10L)),
      0L, 2) === Seq(("a", "b", 100L), ("c", "d", 40L)))
  }

  test("bpe training: learned vocab improves fertility over characters, monotone in merges") {
    val docs = sources.Tables.documents(spark, TestSpark.sf)
    def meanFertility(vocab: Seq[String]): Double = {
      val d = TextAnalytics.tokenizeWordpieceDf(docs, vocab)
        .select("n_words", "n_pieces").as[(Long, Long)].collect()
      d.map(_._2).sum.toDouble / d.map(_._1).sum
    }
    def learned(n: Int): Seq[String] = TextAnalytics.vocabTrainDf(docs, n)
      .select("merged").as[String].collect().toSeq.distinct
    // Character baseline = mean token length (vocab-less segmentation
    // emits one piece per char; WordPieces itself requires a vocab).
    val charBase = {
      import org.apache.spark.sql.functions.{col, explode, length}
      val lens = docs.select(explode(graft.functions.Fns.tokens(col("text"))).as("w"))
        .select(length(col("w")).cast("long").as("l")).as[Long].collect()
      lens.sum.toDouble / lens.length
    }
    val f12 = meanFertility(learned(12))
    val f24 = meanFertility(learned(24))
    assert(f12 < charBase, s"12 learned merges ($f12) must beat chars ($charBase)")
    assert(f24 <= f12, s"more merges must not hurt fertility ($f24 vs $f12)")
  }

  test("trained quality: separates classes and generalizes past the heuristic gate") {
    // Six heuristic-ok docs (stopwords + a shared "good" vocabulary), two
    // gibberish docs (fail the gate, disjoint vocabulary), and one probe:
    // "cat sat mat" is too short for the gate (ok = 0) but is made of the
    // good class's vocabulary — the trained model must score it ok anyway.
    // That generalization is the entire reason to train a classifier on
    // the gate's weak labels.
    val good = (1L to 6L).map(i => (i, "the cat sat on the mat and a dog ran"))
    val bad = Seq((7L, "zxqv wqrt plik zxqv"), (8L, "mnbv pliq wert mnbv"))
    val probe = Seq((9L, "cat sat mat"))
    val docs = (good ++ bad ++ probe).toDF("doc_id", "text")
    val got = TextAnalytics.qualityTrainedDf(docs)
      .select("doc_id", "ok", "pred_ok")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    for (i <- 1L to 6L)
      assert(got(i) === ((1L, 1L)), s"good doc $i must be ok and predicted ok")
    for (i <- 7L to 8L)
      assert(got(i) === ((0L, 0L)), s"gibberish doc $i must stay bad")
    assert(got(9L) === ((0L, 1L)),
      "the short good-vocab probe must be gate-rejected but model-accepted")
  }

  test("lm score: fluent in-distribution text outranks rare-bigram text") {
    // 8 copies of one sentence dominate the bigram model; a doc made of
    // bigrams seen once scores a far lower mean probability. Also pins the
    // hand-computed value for the dominant doc's first bigram.
    val fluent = "the cat sat on the mat"
    val docs = (1L to 8L).map(i => (i, fluent)).toDF("doc_id", "text")
      .union(Seq((9L, "purple quantum zebra ate mauve gravel")).toDF("doc_id", "text"))
    val out = TextAnalytics.lmScoreDf(docs)
      .select("doc_id", "n_bigrams", "lm_mean_e4")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(out(1L)._2 === 5L)
    assert(out(9L)._2 === 5L)
    assert(out(1L)._3 > out(9L)._3 * 2,
      s"fluent mean ${out(1L)._3} should dwarf gibberish mean ${out(9L)._3}")
    val score = TextAnalytics.lmScoreDf(docs)
      .filter($"doc_id" === 1L).select("lm_score_e4").as[Long].head()
    // V = 11 distinct words (5 fluent + 6 gibberish). Doc 1 bigrams all have
    // c_bi = 8; hist "the" is history of both "the cat" and "the mat"
    // (c_hist = 16, twice), hists cat/sat/on have c_hist = 8 (three times):
    // p_the = round(1e4·9/27) = 3333, p_other = round(1e4·9/19) = 4737.
    val pThe = math.round(10000.0 * 9 / 27)
    val pOther = math.round(10000.0 * 9 / 19)
    assert(score === 2 * pThe + 3 * pOther)
    assert(out(1L)._3 === math.round(score / 5.0))
  }

  test("tf-idf matches hand-computed values on a planted corpus") {
    // 3 docs: "cat" in all (idf=ln(1)=0), "dog" in two, "emu" in one (twice)
    val docs = Seq(
      (1L, "cat dog"),
      (2L, "cat dog"),
      (3L, "cat emu emu")).toDF("doc_id", "text")
    val out = TextAnalytics.tfIdfDf(docs)
      .select("doc_id", "word", "tf", "df", "tfidf_e4")
      .as[(Long, String, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t).toMap
    def e4(tf: Long, df: Long): Long = math.round(tf * math.log(3.0 / df) * 10000)
    assert(out((1L, "cat"))._5 === e4(1, 3) && e4(1, 3) === 0L)
    assert(out((1L, "dog"))._5 === e4(1, 2))
    assert(out((3L, "emu"))._5 === e4(2, 1))
    assert(out.size === 6) // (1,cat)(1,dog)(2,cat)(2,dog)(3,cat)(3,emu)
  }

  test("corpus tf-idf: zero iff term is in every doc, positive otherwise") {
    val rows = TextAnalytics.tfIdf(spark, TestSpark.sf)
      .select("df", "tfidf_e4").as[(Long, Long)].collect()
    val nDocs = sources.Tables.documents(spark, TestSpark.sf).count()
    assert(rows.nonEmpty)
    for ((df, v) <- rows) {
      if (df == nDocs) assert(v === 0L) else assert(v > 0L)
    }
  }

  test("langIdNgram: trained trigram profiles classify planted languages") {
    // Two languages with disjoint character vocabularies; profiles are
    // trained from the labeled rows, then every row must classify as its
    // own language. A token-less doc scores zero overlap -> 'und'.
    val docs = Seq(
      (1L, "xyx zyx xyz zyzyx xyxzy", "xx"),
      (2L, "zyx xyzzy xyxyx zyxzy", "xx"),
      (3L, "qrq srq qrs sqsrq qrqsq", "qq"),
      (4L, "srq qrssq qrqrq srqsq", "qq"),
      (5L, "", "qq")
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalytics.langIdNgramDf(docs)
      .as[(Long, String, String, Long, Long)].collect().toSeq
    for ((id, lang, pred, score, m) <- got if id != 5L) {
      assert(pred === lang, s"doc $id predicted $pred, labeled $lang")
      assert(score > 0L && m === 1L)
    }
    assert(got.find(_._1 == 5L).get._3 === "und")
  }

  test("repetition: planted duplicate bigrams score exactly") {
    val docs = Seq(
      (1L, "a a a a a"),  // "a a" ×4: dup = 3/4, top = 4/4
      (2L, "a b c d"),    // 3 distinct bigrams: dup = 0, top = 1/3
      (3L, "x")           // no bigrams at all
    ).toDF("doc_id", "text")
    val got = TextAnalytics.repetitionDf(docs)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 4L, 1L, 7500L, 10000L),
      (2L, 3L, 3L, 0L, 3333L),
      (3L, 0L, 0L, 0L, 0L)))
  }

  test("gopher rules: each planted violation trips exactly its own rule") {
    val good = (Seq("the", "of") ++ Seq.fill(48)("word")).mkString(" ")
    val bullets = ("- the of " + Seq.fill(22)("word").mkString(" ")) + "\n" +
      ("- " + Seq.fill(24)("word").mkString(" "))
    val ellipsis = (Seq("the", "of") ++ Seq.fill(47)("word")).mkString(" ") + " word..."
    val symbols = (Seq("the", "of") ++ Seq.fill(10)("#") ++ Seq.fill(38)("word")).mkString(" ")
    val noStops = Seq.fill(50)("word").mkString(" ")
    val shortWords = (Seq("the", "of") ++ Seq.fill(48)("ab")).mkString(" ")
    val docs = Seq(
      (1L, good), (2L, "the of word"), (3L, bullets), (4L, ellipsis),
      (5L, symbols), (6L, noStops), (7L, shortWords), (8L, "")
    ).toDF("doc_id", "text")
    val got = TextAnalytics.gopherQualityDf(docs)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(t => t._1 -> t).toMap
    // good: 50 words, all rules green
    assert(got(1L)._9 === 1L)
    assert(got(1L)._2 === 50L && got(1L)._8 === 2L)
    // word-count floor: 3 words
    assert(got(2L)._9 === 0L && got(2L)._2 === 3L)
    // both lines bulleted -> bullet_e4 = 10000; everything else passes
    assert(got(3L)._9 === 0L && got(3L)._5 === 10000L && got(3L)._6 === 0L)
    // the single line ends in "..." -> ellipsis_e4 = 10000, symbol ratio
    // from that one run stays under the cap (200 <= 1000)
    assert(got(4L)._9 === 0L && got(4L)._6 === 10000L && got(4L)._4 === 200L)
    // ten '#' words in fifty -> symbol_e4 = 2000 > 1000; alpha ratio sits
    // exactly on the 0.8 floor and still passes
    assert(got(5L)._9 === 0L && got(5L)._4 === 2000L && got(5L)._7 === 8000L)
    // no stop words at all
    assert(got(6L)._9 === 0L && got(6L)._8 === 0L)
    // mean word length 101/50 = 2.02 < 3
    assert(got(7L)._9 === 0L && got(7L)._3 === 20200L)
    // empty text: zero metrics, fails on word count
    assert(got(8L) === ((8L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("gopher repetition: planted dup lines/paras/grams score their published metrics") {
    // clean: 30 distinct 2-char tokens, one line, dlen = 60 + 29 = 89
    val clean = Seq("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh", "ii", "jj",
      "kk", "ll", "mm", "nn", "oo", "pp", "qq", "rr", "ss", "tt",
      "uu", "vv", "ww", "xx", "yy", "zz", "ab", "ac", "ad", "ae").mkString(" ")
    val dupLines = "aa bb\naa bb\ncc dd ee ff gg hh ii jj"
    val dupParas = "xx yy\n\nxx yy\n\nzz ww vv uu tt ss rr qq"
    val dupGram5 = "p q r s t u v w x y z a b c d p q r s t"
    val docs = Seq((1L, clean), (2L, dupLines), (3L, dupParas), (4L, dupGram5),
      (5L, "")).toDF("doc_id", "text")
    val got = TextAnalytics.gopherRepetitionDf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // clean: zero dup mass anywhere; top-gram masses are the smallest
    // count-1 gram's chars over dlen=89: 5/8/11 chars -> 562/899/1236
    assert(got(1L).getAs[Long]("keep") === 1L)
    assert(got(1L).getAs[Long]("dup_line_e4") === 0L)
    assert(got(1L).getAs[Long]("dup5_e4") === 0L)
    assert(got(1L).getAs[Long]("top2_e4") === 562L)
    assert(got(1L).getAs[Long]("top3_e4") === 899L)
    assert(got(1L).getAs[Long]("top4_e4") === 1236L)
    // dup lines: 3 lines, 2 distinct -> 3333; chars 2*5/(2*5+23) -> 3030
    assert(got(2L).getAs[Long]("keep") === 0L)
    assert(got(2L).getAs[Long]("dup_line_e4") === 3333L)
    assert(got(2L).getAs[Long]("dup_line_char_e4") === 3030L)
    // dup paragraphs trip the paragraph twin the same way
    assert(got(3L).getAs[Long]("keep") === 0L)
    assert(got(3L).getAs[Long]("dup_para_e4") === 3333L)
    assert(got(3L).getAs[Long]("dup_para_char_e4") === 3030L)
    // "p q r s t" twice in 20 tokens (dlen 39): dup5 = 2*9/39 -> 4615,
    // no 6-gram repeats, top3 = "p q r" mass 2*5/39 -> 2564
    assert(got(4L).getAs[Long]("keep") === 0L)
    assert(got(4L).getAs[Long]("dup5_e4") === 4615L)
    assert(got(4L).getAs[Long]("dup6_e4") === 0L)
    assert(got(4L).getAs[Long]("top3_e4") === 2564L)
    // empty text: no items at all, all-zero metrics pass the battery
    // (gopherQuality's word-count floor owns rejecting empties)
    assert(got(5L).getAs[Long]("keep") === 1L)
    assert(got(5L).getAs[Long]("dup_line_e4") === 0L)
    assert(got(5L).getAs[Long]("top2_e4") === 0L)
  }

  test("wordpiece: greedy longest-match segments planted words exactly") {
    import org.apache.spark.sql.functions.col
    val vocab = TextAnalytics.WordPieceVocab
    val pieces = Seq("customer", "spark", "thequick").toDF("word")
      .select(col("word"), org.apache.spark.sql.graft.StringExprs
        .wordPieces(col("word"), vocab).as("p"))
      .as[(String, Seq[String])].collect().toMap
    // 'st' and 'er' are vocab pieces; c/u/o/m fall back to single chars.
    assert(pieces("customer") === Seq("c", "u", "st", "o", "m", "er"))
    // whole-word piece wins over any prefix fragment
    assert(pieces("spark") === Seq("spark"))
    // 'the' (longest at pos 0) then no 'qu'/'ck' in vocab -> char fallbacks
    assert(pieces("thequick") === Seq("the", "q", "u", "i", "c", "k"))
    val stats = TextAnalytics.tokenizeWordpieceDf(
      Seq((1L, "spark spark customer"), (2L, "!!!")).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(stats === Seq((1L, 3L, 8L, 26667L), (2L, 0L, 0L, 0L)))
  }

  test("length bands: planted docs land in their bands, shares sum per source") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, (1 to 5).map(_ => "w").mkString(" "), "sA"),    // 5 tokens → band 0
      (2L, (1 to 16).map(_ => "w").mkString(" "), "sA"),   // exactly 16 → band 16
      (3L, (1 to 100).map(_ => "w").mkString(" "), "sA"),  // → band 64
      (4L, (1 to 2000).map(_ => "w").mkString(" "), "sB"), // → band 1024
      (5L, "", "sC")                                        // zero tokens → band 0
    ).toDF("doc_id", "text", "source")
    // reuse the engine fold via a temp dir? simpler: write and read is
    // heavyweight — call the banding logic through a parquet round-trip.
    val dir = java.nio.file.Files.createTempDirectory("lenbands").toString
    docs.withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val got = TextAnalytics.lengthBands(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("sA", 0L, 1L, 5L, 413L),     // 5 of 121 tokens
      ("sA", 16L, 1L, 16L, 1322L),  // boundary doc: exactly 16 → band 16
      ("sA", 64L, 1L, 100L, 8264L),
      ("sB", 1024L, 1L, 2000L, 10000L),
      ("sC", 0L, 1L, 0L, 0L)))      // zero-token source: share pins to 0
    // shares sum to ~10000 per non-empty source (rounding ±1 per band)
    for ((src, rows) <- got.groupBy(_._1) if rows.map(_._4).sum > 0)
      assert(math.abs(rows.map(_._5).sum - 10000L) <= rows.length,
        s"source $src shares do not sum to one")
  }

  test("unigram dp: beats greedy's myopia on the planted case, optimal on random words") {
    import org.apache.spark.sql.functions.col
    def dp(words: Seq[String], scored: Seq[(String, Long)]) =
      words.toDF("word")
        .select(col("word"), org.apache.spark.sql.graft.StringExprs
          .unigramDp(col("word"), scored.map(_._1), scored.map(_._2)).as("d"))
        .as[(String, Seq[Long])].collect().toMap
    // The canonical myopia case: greedy cuts ab|c (score 5); the DP finds
    // a|bc (score 100, same piece count).
    val planted = dp(Seq("abc", "abab", "zzz", "a"),
      Seq(("ab", 5L), ("bc", 100L)))
    assert(planted("abc") === Seq(100L, 2L))
    assert(planted("abab") === Seq(10L, 2L))
    assert(planted("zzz") === Seq(0L, 3L)) // no vocab hit: all singles
    assert(planted("a") === Seq(0L, 1L))
    // Duplicate piece: FIRST score wins (the min-merge-rank rule).
    assert(dp(Seq("xy"), Seq(("xy", 7L), ("xy", 9L)))("xy") === Seq(7L, 1L))
    // Empty vocab degrades to all singles.
    assert(dp(Seq("abc"), Seq.empty)("abc") === Seq(0L, 3L))
    // Code-POINT indexing (the round-13 advice): a non-BMP character —
    // one code point, TWO UTF-16 code units — is ONE single-char DP cell
    // (DuckDB's len/substr semantics), and a vocab piece containing one
    // matches across it. Code-unit indexing would see 4 cells for "🙂a"
    // + fail the piece lookup at the surrogate boundary.
    val emoji = new String(Character.toChars(0x1F642)) // 🙂, non-BMP
    assert(dp(Seq(emoji + "a"), Seq.empty)(emoji + "a") === Seq(0L, 2L))
    assert(dp(Seq(emoji + "a", "b" + emoji), Seq((emoji + "a", 11L)))
      .apply(emoji + "a") === Seq(11L, 1L))
    // Optimality vs exhaustive search on seeded random words: the DP's
    // (score, -pieces) equals the brute-force best over ALL segmentations.
    val rnd = new scala.util.Random(7)
    def randWord(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    val scored = (1 to 25).map(_ => randWord(2 + rnd.nextInt(3)))
      .distinct.map(p => p -> (1L + rnd.nextInt(50)))
    val smap = scored.reverse.toMap
    val words = (1 to 80).map(_ => randWord(1 + rnd.nextInt(9))).distinct
    def brute(w: String): (Long, Long) = {
      if (w.isEmpty) return (0L, 0L)
      val splits = (1 to w.length).flatMap { l =>
        val piece = w.take(l)
        val sc = if (l == 1) Some(0L) else smap.get(piece)
        sc.map { v => val (rs, rp) = brute(w.drop(l)); (v + rs, rp + 1L) }
      }
      splits.maxBy { case (s, p) => (s, -p) }
    }
    val got = dp(words, scored)
    for (w <- words) {
      val (bs, bp) = brute(w)
      assert(got(w) === Seq(bs, bp), s"dp differs from exhaustive best on '$w'")
    }
    // Semantic relation to greedy: the DP score is never below the score
    // of the greedy walk's pieces (greedy is one of the DP's options).
    val greedy = words.toDF("word")
      .select(col("word"), org.apache.spark.sql.graft.StringExprs
        .wordPieces(col("word"), scored.map(_._1)).as("p"))
      .as[(String, Seq[String])].collect().toMap
    for (w <- words) {
      val gScore = greedy(w).map(p =>
        if (p.length == 1) 0L else smap.getOrElse(p, 0L)).sum
      assert(got(w).head >= gScore, s"dp below greedy on '$w'")
    }
  }

  test("wordpiece: coverage and greediness invariants hold on seeded random words") {
    import org.apache.spark.sql.functions.col
    // Dense 3-letter alphabet so vocab hits are frequent; fixed seed keeps
    // the corpus reproducible run to run.
    val rnd = new scala.util.Random(42)
    def randWord(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    val vocab = (1 to 40).map(_ => randWord(2 + rnd.nextInt(3))).distinct
    val vset = vocab.toSet
    val maxLen = vocab.map(_.length).max
    val words = (1 to 200).map(_ => randWord(1 + rnd.nextInt(12))).distinct
    val got = words.toDF("word")
      .select(col("word"), org.apache.spark.sql.graft.StringExprs
        .wordPieces(col("word"), vocab).as("p"))
      .as[(String, Seq[String])].collect()
    assert(got.length === words.length)
    for ((w, pieces) <- got) {
      assert(pieces.mkString === w, s"pieces must concatenate to '$w': $pieces")
      var pos = 0
      for (p <- pieces) {
        assert(p.length == 1 || vset.contains(p), s"'$p' of '$w' not in vocab")
        // Greediness: no STRICTLY longer vocab piece started at this cut.
        for (l <- p.length + 1 to math.min(maxLen, w.length - pos))
          assert(!vset.contains(w.substring(pos, pos + l)),
            s"'$w' at $pos took '$p' but a longer vocab piece matched")
        pos += p.length
      }
    }
  }

  test("wordcount cms: estimates never undercount; width-1 sketch collapses to total") {
    val docs = Seq((1L, "a a a b b c"), (2L, "a b c d")).toDF("doc_id", "text")
    val wide = TextAnalytics.wordcountCmsDf(docs)
      .as[(String, Long, Long)].collect().toSeq
    assert(wide.map(r => r._1 -> r._2).toMap ===
      Map("a" -> 4L, "b" -> 3L, "c" -> 2L, "d" -> 1L))
    assert(wide.forall(r => r._3 >= r._2), s"CMS undercounted: $wide")
    // Width 1 is the collision worst case: every cell counts ALL tokens,
    // so every estimate is the corpus token total while exact counts stay.
    val collapsed = TextAnalytics.wordcountCmsDf(docs, k = 20, depth = 2, width = 1)
      .as[(String, Long, Long)].collect().toSeq
    assert(collapsed.forall(_._3 === 10L), s"width-1 estimate must be N: $collapsed")
  }

  test("diversity: planted concentration extremes score exactly") {
    val docs = Seq(
      (1L, "aa aa aa aa"),  // one type: simpson = 1.0, ttr = 1/4
      (2L, "a b c d"),      // uniform: simpson = 4/16, ttr = 1
      (3L, "!!! 123"),      // token-less: all zeros
      (4L, "x x y")         // sum_c2 = 5, n = 3
    ).toDF("doc_id", "text")
    val got = TextAnalytics.diversityDf(docs)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 4L, 1L, 2500L, 10000L),
      (2L, 4L, 4L, 10000L, 2500L),
      (3L, 0L, 0L, 0L, 0L),
      (4L, 3L, 2L, 6667L, 5556L)))
  }

  test("textClean: planted PII is redacted stage by stage") {
    val docs = Seq(
      (1L, "contact bob@example.com or visit https://example.com/x.html room 42"),
      (2L, "no pii here"),
      (3L, "write bob@ex.com and carol@ex.org ids 7 and 0042")
    ).toDF("doc_id", "text")
    val got = TextAnalytics.textCleanDf(docs)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 1L, 1L, "contact <EMAIL> or visit <URL> room <NUM>"),
      (2L, 0L, 0L, 0L, "no pii here"),
      (3L, 0L, 2L, 2L, "write <EMAIL> and <EMAIL> ids <NUM> and <NUM>")))
  }

  test("phrases: planted collocation outranks a frequent-word bigram") {
    // "new york" ×6 (words appearing ONLY together) vs "of the" ×6 built
    // from words that also occur 14 more times each elsewhere — classic
    // PMI: the exclusive pair scores far higher than the frequent pair.
    // "rare gem" ×5 misses the δ=5 cutoff entirely (c_ab > δ is strict).
    // Single-word filler docs raise c(of)/c(the) without creating any
    // filler bigram, so exactly two bigrams clear the cutoff.
    val docs = (
      (1 to 6).map(i => (i.toLong, "new york")) ++
      (7 to 12).map(i => (i.toLong, "of the")) ++
      (13 to 26).map(i => (i.toLong, "of")) ++
      (27 to 40).map(i => (i.toLong, "the")) ++
      (41 to 45).map(i => (i.toLong, "rare gem"))).toDF("doc_id", "text")
    val got = TextAnalytics.phrasesDf(docs)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // N = 12 + 12 + 14 + 14 + 10 = 62 unigram occurrences.
    // new york: (6-5)*62/(6*6)   = 1.7222 → 17222
    // of the:   (6-5)*62/(20*20) = 0.155  → 1550
    // rare gem: c_ab = 5 misses the strict c_ab > δ cutoff.
    assert(got === Seq(
      ("new york", 6L, 6L, 6L, 17222L),
      ("of the", 6L, 20L, 20L, 1550L)))
  }

  test("langid confusion: counts total the corpus, shares sum per language") {
    val m = TextAnalytics.langidConfusion(spark, TestSpark.sf)
      .as[(String, String, Long, Long)].collect() // (lang, pred, n, share_e4)
    val nDocs = graft.sources.Tables.documents(spark, TestSpark.sf).count()
    assert(m.map(_._3).sum === nDocs, "confusion counts must partition the corpus")
    for ((lang, rows) <- m.groupBy(_._1)) {
      val shares = rows.map(_._4).sum
      assert(math.abs(shares - 10000L) <= rows.length,
        s"$lang shares sum to $shares — rounding drift only is allowed")
    }
    // matrix agrees cell-by-cell with the per-doc classifier output
    val perDoc = TextAnalytics.langId(spark, TestSpark.sf)
      .select("lang", "pred").as[(String, String)].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(m.map(r => (r._1, r._2) -> r._3).toMap === perDoc)
  }

  test("bm25: planted corpus — scores match the formula, ranked per term") {
    // Corpus: d1 "a a b", d2 "a c", d3 "b b b c". tf: d1{a:2,b:1},
    // d2{a:1,c:1}, d3{b:3,c:1}; df(a)=df(b)=df(c)=2; N=3; Σtok=9, avgdl=3.
    // All three terms are query terms (Bm25Terms=8 > vocabulary).
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "b b b c"))
      .toDF("doc_id", "text")
    def score(tf: Long, df: Long, dl: Long): Long = {
      val idf = (3.0 - df + 0.5) / (df + 0.5)
      val den = tf + 1.2 * (0.25 + 0.75 * (dl / 3.0))
      math.round(idf * ((tf * 2.2) / den) * 10000.0)
    }
    val got = TextAnalytics.bm25Df(docs)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // per-term expected rankings (higher tf wins; doc_id breaks the a-tie)
    assert(got === Seq(
      ("a", 1L, 2L, 2L, score(2, 2, 3), 1L),
      ("a", 2L, 1L, 2L, score(1, 2, 2), 2L),
      ("b", 3L, 3L, 2L, score(3, 2, 4), 1L),
      ("b", 1L, 1L, 2L, score(1, 2, 3), 2L),
      ("c", 2L, 1L, 2L, score(1, 2, 2), 1L),
      ("c", 3L, 1L, 2L, score(1, 2, 4), 2L)))
    // saturation sanity: tf=3 in a longer doc still beats tf=1
    assert(score(3, 2, 4) > score(1, 2, 3))
  }
}
