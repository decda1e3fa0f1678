package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Planted-ground-truth checks for the sketch-based dedup operators that have
  * no SQL oracle (SURVEY §2.D rule R5): known near-duplicates must be found,
  * and the approximate operators must agree with their exact verifiers. */
class DedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // Planted corpus: (1,2) near-dup pair, (3) unrelated, (4,5) identical
  // short docs (< 3 tokens → whole-text fallback shingle), (6) empty.
  private val base =
    "the quick brown fox jumps over the lazy dog and then runs far away home"
  private val docs = Seq(
    (1L, base),
    (2L, base.replace("home", "tonight")), // one word differs → high shingle overlap
    (3L, "completely different content about spark catalyst optimizer internals"),
    (4L, "hi there"),
    (5L, "hi there"),
    (6L, "")
  ).toDF("doc_id", "text")

  test("clustersBest: the LONGEST cluster member survives, not the smallest id") {
    // Letter-only words — the \b[a-z]+\b tokenizer drops digit-bearing ones.
    val base = (0 until 30)
      .map(i => s"w${('a' + i / 26).toChar}${('a' + i % 26).toChar}").mkString(" ")
    val docs = Seq(
      (1L, base),             // 30 tokens, smaller id
      (2L, base + " extra"),  // 31 tokens — the keep-best survivor
      (3L, "completely unrelated text about nothing shared at all")
    ).toDF("doc_id", "text")
    val got = Dedup.clustersBestDf(docs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 30L, 0L), // min-id member but NOT best
      (2L, 1L, 31L, 1L), // longest copy wins
      (3L, 3L, 8L, 1L))) // singleton is its own best
  }

  test("minhash: planted near-dup pair is detected, unrelated docs are not") {
    val pairs = Dedup.minhashPairs(docs, minEstE4 = 5000L)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "planted near-dup (1,2) not found")
    assert(pairs.contains((4L, 5L)), "identical short docs (4,5) not found via fallback shingle")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc 3 paired")
  }

  test("minhash signatures: identical docs get identical signatures; every doc has one") {
    val sigs = Dedup.minhashSignatures(docs)
      .select("doc_id", "sig").as[(Long, Seq[Long])].collect().toMap
    assert(sigs.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L), "every doc (even empty) must have a signature")
    assert(sigs(4L) === sigs(5L))
    assert(sigs.values.forall(_.length === Dedup.K))
  }

  test("ngram Jaccard: near-dup score high, identical short docs exact 1.0") {
    val pairs = Dedup.ngramJaccardPairsDf(docs, minJacE4 = 100L)
      .select("d1", "d2", "jac_e4").as[(Long, Long, Long)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(pairs((4L, 5L)) === 10000L, "identical short docs must score Jaccard 1.0")
    assert(pairs((1L, 2L)) >= 5000L, "planted near-dup must score > 0.5")
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("containment: an embedded document fires where the Jaccard gate cannot") {
    // d1 = a short article; d2 = the SAME article wrapped in ~7x of
    // unrelated boilerplate. Every d1 shingle appears in d2, so
    // containment(d1 in d2) = 1.0 — while Jaccard ≈ n1/n2 is far below
    // the 0.8 decision bar. d3 is unrelated.
    // Letter-only tokens (digits make a word invisible to \b[a-z]+\b):
    // the article is 26 distinct doubled letters, the filler 80 distinct
    // x-suffixed digraphs — disjoint vocabularies by construction.
    val article = (0 until 26)
      .map(i => s"${('a' + i).toChar}${('a' + i).toChar}").mkString(" ")
    val filler = (0 until 80)
      .map(i => s"${('a' + i % 26).toChar}${('a' + (i / 26) % 26).toChar}x")
      .mkString(" ")
    val docs = Seq(
      (1L, article),
      (2L, filler + " " + article),
      (3L, "completely different text about other things entirely"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairsDf(docs)
      .select("d1", "d2", "cont1_e4", "cont2_e4")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(p => (p._1, p._2)).toSeq === Seq((1L, 2L)),
      s"expected exactly the embedded pair, got ${got.mkString(", ")}")
    val (_, _, c1, c2) = got.head
    assert(c1 === 10000L, s"full containment of d1 in d2 expected, got $c1")
    assert(c2 < 8000L, "the long side must NOT read as contained")
    // The same pair is invisible to the decision-grade Jaccard gate —
    // the reason this operator exists.
    val jac = Dedup.ngramJaccardPairsDf(docs, minJacE4 = 100L)
      .select("d1", "d2", "jac_e4").as[(Long, Long, Long)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(jac((1L, 2L)) < 8000L,
      "planted pair unexpectedly clears the Jaccard bar — plant more filler")
  }

  test("bounded collect + pair expansion equal the unbounded collect_list form") {
    // The single-shuffle jaccard shape must agree with the two-shuffle
    // formulation it replaced: df-filter-then-collect_list + nested
    // transform. Random-ish multi-doc shingle sets, several above the cap.
    val cap = 5L
    val sh = (1 to 400).map { i =>
      (i.toLong % 97, (i * 7919 % 13).toLong) // (doc_id, sh): sh df ≈ 30 each
    }.toDF("doc_id", "sh")
      .union((1 to 40).map(i => (i.toLong, 1000L + i % 10)).toDF("doc_id", "sh"))
      .distinct()
    val fast = sh.groupBy("sh")
      .agg(org.apache.spark.sql.graft.AggExprs
        .boundedCollectLong(col("doc_id"), (cap + 1).toInt).as("ids"))
      .filter(size(col("ids")) <= cap)
      .select(col("sh"), explode(
        org.apache.spark.sql.graft.AggExprs.longPairs(col("ids"))).as("p"))
      .select(col("sh"), col("p.d1"), col("p.d2"))
    val eligible = sh.groupBy("sh").agg(count(lit(1)).as("df_"))
      .filter(col("df_") <= cap).select("sh")
    val ref = sh.join(eligible, "sh")
      .groupBy("sh").agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .select(col("sh"), explode(flatten(
        transform(col("ids"), (x, i) =>
          transform(slice(col("ids"), i + lit(2), size(col("ids"))), y =>
            struct(x.as("d1"), y.as("d2")))))).as("p"))
      .select(col("sh"), col("p.d1"), col("p.d2"))
    assert(fast.exceptAll(ref).count() === 0L)
    assert(ref.exceptAll(fast).count() === 0L)
    assert(fast.count() > 0L)
  }

  test("ngram Jaccard: hot-shingle cap drops pairs whose only overlap is capped") {
    // 12 docs sharing one boilerplate sentence; with maxDf < 12 the shared
    // shingles are excluded and no pairs survive.
    val boiler = (1L to 12L).map(i => (i, s"all rights reserved worldwide item$i"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardPairsDf(boiler, minJacE4 = 100L, maxDf = 1000L).count()
    val capped = Dedup.ngramJaccardPairsDf(boiler, minJacE4 = 100L, maxDf = 10L).count()
    assert(uncapped > 0L && capped === 0L)
  }

  test("simhash: identical docs identical, near-dups hamming-close, unrelated far") {
    val fp = Dedup.simhashDf(docs).select("doc_id", "simhash")
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(fp(4L) === fp(5L))
    // 64-bit fingerprints: near-dup threshold scales with width (expected
    // unrelated distance is SimBits/2 = 32).
    assert(hamming(fp(1L), fp(2L)) <= 16, s"near-dup hamming ${hamming(fp(1L), fp(2L))} too large")
    assert(hamming(fp(1L), fp(3L)) > 16, s"unrelated hamming ${hamming(fp(1L), fp(3L))} too small")
  }

  test("simhash: 32-bit parameterization still works and uses only the low word") {
    val fp64 = Dedup.simhashFp(docs).select("doc_id", "simhash")
      .as[(Long, Long)].collect().toMap
    val fp32 = Dedup.simhashFp(docs, bits = 32).select("doc_id", "simhash")
      .as[(Long, Long)].collect().toMap
    // The low 32 bits come from the same token hash in both widths.
    for ((id, v) <- fp32) {
      assert((v & 0xffffffffL) === v, s"32-bit fingerprint for $id exceeds 32 bits")
      assert(v === (fp64(id) & 0xffffffffL),
        s"low word of 64-bit fingerprint for $id disagrees with 32-bit run")
    }
  }

  test("simhash pairs: planted dups found, Hamming exact, pigeonhole recall total") {
    val pairs = Dedup.simhashPairsDf(docs, maxHamming = 3)
      .select("d1", "d2", "hamming").as[(Long, Long, Long)].collect()
    val pairSet = pairs.map(t => (t._1, t._2)).toSet
    assert(pairSet.contains((4L, 5L)), "identical docs (4,5) must pair at Hamming 0")
    assert(pairs.collect { case (4L, 5L, h) => h }.head === 0L)
    // Ground truth by brute force: the band join must find EVERY pair within
    // the Hamming ball (pigeonhole guarantee — candidate recall is exactly 1).
    val fp = Dedup.simhashDf(docs).select("doc_id", "simhash")
      .as[(Long, Long)].collect()
    val brute = (for {
      (d1, h1) <- fp; (d2, h2) <- fp if d1 < d2
      if java.lang.Long.bitCount(h1 ^ h2) <= 3
    } yield (d1, d2)).toSet
    assert(pairSet === brute, "band join must equal the brute-force Hamming ball")
  }

  test("incremental near-dup: batch re-crawl of a corpus doc is dropped") {
    // Corpus: one long doc + one unrelated. Batch: a re-crawl of the corpus
    // doc with one word drifted (the case exact incremental dedup misses),
    // a fresh doc, an exact within-batch dup of the fresh doc, and another
    // fresh doc. Sanity-pin the planted Hamming distances first so the
    // verdict assertions test the operator, not the plant.
    val corpus = Seq(
      (1L, base + " " + base), // long doc: one-word drift flips few bits
      (2L, "completely different content about spark catalyst optimizer internals")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, (base + " " + base).replace("home", "tonight")), // re-crawl drift
      (11L, "fresh unseen writing about distributed query planning tricks"),
      (12L, "fresh unseen writing about distributed query planning tricks"),
      (13L, "entirely novel musings on parquet encodings and column pruning")
    ).toDF("doc_id", "text")
    val fp = Dedup.simhashDf(corpus.union(batch)).select("doc_id", "simhash")
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fp(1L), fp(10L)) <= 3, s"planted re-crawl drifted too far: ${hamming(fp(1L), fp(10L))}")
    assert(hamming(fp(11L), fp(13L)) > 3, "planted fresh docs must not collide")
    assert(hamming(fp(1L), fp(11L)) > 3 && hamming(fp(2L), fp(10L)) > 3)
    val got = Dedup.incrementalNearDupDf(batch, corpus)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (10L, 1L, 0L, 0L), // corpus near-dup → dropped
      (11L, 0L, 0L, 1L), // fresh → kept
      (12L, 0L, 1L, 0L), // within-batch dup of 11 → dropped
      (13L, 0L, 0L, 1L))) // fresh → kept
  }

  test("substring dup: shared exact spans flag window-precisely, unique text scores zero") {
    // Docs 1 and 2 share an exact 6-token run ("alpha beta gamma delta
    // epsilon zeta") inside otherwise-different text -> with window 5 that
    // run contributes exactly 2 duplicated windows per doc. Doc 3 is
    // unique (0 dups); doc 4 is shorter than the window (0 windows); doc 5
    // repeats a 5-token run WITHIN itself (same-doc dup counts).
    val docs = Seq(
      (1L, "one two alpha beta gamma delta epsilon zeta three four"),
      (2L, "five six alpha beta gamma delta epsilon zeta seven eight"),
      (3L, "nothing here repeats anywhere in this little corpus at all"),
      (4L, "too short"),
      (5L, "ho hi ho hi ho ho hi ho hi ho")
    ).toDF("doc_id", "text")
    val got = Dedup.substringDupDf(docs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val byId = got.map(t => t._1 -> t).toMap
    // 10 tokens -> 6 windows; the shared run spans token positions 3-8 ->
    // windows starting at 3 and 4 (both fully inside the run) duplicate.
    assert(byId(1L) === ((1L, 6L, 2L, math.round(2 * 10000.0 / 6))))
    assert(byId(2L) === ((2L, 6L, 2L, math.round(2 * 10000.0 / 6))))
    assert(byId(3L) === ((3L, 6L, 0L, 0L)))
    assert(byId(4L) === ((4L, 0L, 0L, 0L)))
    // "ho hi ho hi ho" occurs at starts 1 AND 6 (the period-2 repeat):
    // those two windows are same-doc dups; the other four are unique.
    assert(byId(5L)._2 === 6L)
    assert(byId(5L)._3 === 2L)
  }

  test("substring rewrite: later span occurrences are removed, the first survives intact") {
    val docs = Seq(
      (1L, "one two alpha beta gamma delta epsilon zeta three four"),
      (2L, "five six alpha beta gamma delta epsilon zeta seven eight"),
      (3L, "nothing here repeats anywhere in this little corpus at all"),
      (4L, "too short"),
      (5L, "ho hi ho hi ho ho hi ho hi ho"),
      (6L, "")
    ).toDF("doc_id", "text")
    val got = Dedup.substringRewriteDf(docs)
      .as[(Long, Long, Long, String)].collect().toSeq
    val byId = got.map(t => t._1 -> t).toMap
    // Doc 1 holds the globally-first occurrence of the shared 6-token run:
    // nothing is removed from it.
    assert(byId(1L) === ((1L, 10L, 0L,
      "one two alpha beta gamma delta epsilon zeta three four")))
    // Doc 2's two redundant windows (starts 2 and 3) union-cover token
    // positions 2..7 — the run is excised ONCE, the unique frame survives.
    assert(byId(2L) === ((2L, 10L, 6L, "five six seven eight")))
    // Unique text and sub-window docs pass through untouched.
    assert(byId(3L) === ((3L, 10L, 0L,
      "nothing here repeats anywhere in this little corpus at all")))
    assert(byId(4L) === ((4L, 2L, 0L, "too short")))
    // Self-repeat: window at start 5 equals the window at start 0 (the
    // period-2 run), so tokens 5..9 drop and the first period survives.
    assert(byId(5L) === ((5L, 10L, 5L, "ho hi ho hi ho")))
    assert(byId(6L) === ((6L, 0L, 0L, "")))
    // Conservation: the cleaned text always holds exactly n_tokens−n_dropped
    // tokens (coverage union never double-drops).
    got.foreach { case (_, n, d, t) =>
      val kept = if (t.isEmpty) 0 else t.split(" ").length
      assert(kept === (n - d).toInt)
    }
  }

  test("line dedup: each boilerplate line survives only at its corpus-first site") {
    val docs = Seq(
      (1L, "header\nunique one\ncommon line"),
      (2L, "common line\nother text\n\nheader"),
      (3L, ""),
      (4L, "common line"),
      (5L, "rep\nrep\nrep")
    ).toDF("doc_id", "text")
    val got = Dedup.lineDedupDf(docs)
      .as[(Long, Long, Long, String)].collect()
      .map(t => t._1 -> t).toMap
    // doc 1 holds the first occurrence of both shared lines — untouched
    assert(got(1L) === ((1L, 3L, 0L, "header\nunique one\ncommon line")))
    // doc 2 loses both shared lines but keeps its empty structural line
    assert(got(2L) === ((2L, 4L, 2L, "other text\n")))
    // empty text is a single empty line, never a dedup target
    assert(got(3L) === ((3L, 1L, 0L, "")))
    // a doc that is ONLY a later duplicate empties out completely
    assert(got(4L) === ((4L, 1L, 1L, "")))
    // within-doc repeats: the first line of the run survives
    assert(got(5L) === ((5L, 3L, 2L, "rep")))
  }

  test("substring dup: a planted 32-bit hash collision is NOT a duplicate window") {
    import org.apache.spark.sql.graft.{PolyHash32, PolyHash57}
    // "qgjyptlw" and "wjbstcwx" collide under the 32-bit base-31 rolling
    // hash (found by birthday search over 8-char lowercase words). Both
    // windows below share the same length and suffix, so the 32-bit hashes
    // of the FULL window strings collide too — under a single 32-bit
    // fingerprint these two distinct windows would count as a duplicate
    // pair and both docs would score dup_e4 = 10000. Salting cannot fix
    // this (equal-length ⇒ any salted base-31 hash collides identically);
    // the second BASE does.
    val winA = "qgjyptlw alpha beta gamma delta"
    val winB = "wjbstcwx alpha beta gamma delta"
    assert(PolyHash32.hash(winA) === PolyHash32.hash(winB)) // the plant is real
    assert(PolyHash32.hash("s2#" + winA) === PolyHash32.hash("s2#" + winB))
    assert(PolyHash57.hash(winA, 31) !== PolyHash57.hash(winB, 31))
    assert(PolyHash57.hash(winA, 37) !== PolyHash57.hash(winB, 37))
    val docs = Seq((1L, winA), (2L, winB)).toDF("doc_id", "text")
    val got = Dedup.substringDupDf(docs)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq((1L, 1L, 0L, 0L), (2L, 1L, 0L, 0L)))
    // positive control: byte-identical windows still flag through the pair
    val same = Seq((1L, winA), (2L, winA)).toDF("doc_id", "text")
    val got2 = Dedup.substringDupDf(same)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got2 === Seq((1L, 1L, 1L, 10000L), (2L, 1L, 1L, 10000L)))
  }

  test("exact dedup on the corpus: survivor is min doc_id, no text lost") {
    val docsSf = sources.Tables.documents(spark, TestSpark.sf)
    val out = Dedup.exact(spark, TestSpark.sf)
    assert(out.count() === docsSf.select("text").distinct().count())
    assert(out.agg(sum("n_dups")).as[Long].head() === docsSf.count())
  }

  test("LSH embedding dedup: subset of exact pairs, full recall on high-sim pairs") {
    val exact = Dedup.embeddingPairs(spark, TestSpark.sf)
      .select("v1", "v2", "sim_e4").as[(Long, Long, Long)].collect()
    val lsh = Dedup.embeddingPairsLsh(spark, TestSpark.sf)
      .select("v1", "v2", "sim_e4").as[(Long, Long, Long)].collect()
    val exactSet = exact.map(t => (t._1, t._2)).toSet
    val lshSet = lsh.map(t => (t._1, t._2)).toSet
    assert(lshSet.subsetOf(exactSet), "LSH found a pair the exact verifier did not")
    val high = exact.filter(_._3 >= 8000L).map(t => (t._1, t._2)).toSet
    if (high.nonEmpty) {
      val recall = high.count(lshSet.contains).toDouble / high.size
      assert(recall >= 0.8, s"high-sim recall $recall below 0.8 (${high.size} high-sim pairs)")
    }
  }

  test("semantic clusters: pairs co-cluster, survivors are cluster minima") {
    val out = Dedup.semanticClusters(spark, TestSpark.sf)
      .as[(Long, Long, Long)].collect()
    val cluster = out.map(r => r._1 -> r._2).toMap
    // every decision-bar pair's ends share a cluster
    val pairs = Dedup.embeddingPairsLsh(spark, TestSpark.sf, Dedup.SemanticClusterSimE4)
      .select("v1", "v2").as[(Long, Long)].collect()
    for ((a, b) <- pairs) assert(cluster(a) === cluster(b))
    // keep = cluster minimum, exactly one survivor per cluster
    for ((id, cl, keep) <- out) assert(keep === (if (id == cl) 1L else 0L))
    val byCluster = out.groupBy(_._2)
    for ((cl, members) <- byCluster) {
      assert(members.map(_._1).min === cl)
      assert(members.count(_._3 == 1L) === 1)
    }
  }

  test("winnowing: t-run coverage guarantee, no false pairs, full overlap on twins") {
    // Docs 1-2 share the 6-token run "the quick brown fox jumps over" —
    // exactly t = w + k − 1 = 4 + 3 − 1, so the coverage theorem
    // GUARANTEES a shared fingerprint. Doc 3 shares no 3-gram with either.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "intro words the quick brown fox jumps over something else entirely"),
      (3L, "completely different vocabulary here with no token overlap at all"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowingPairsDf(docs, minShared = 1L)
      .as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L),
      "guaranteed t-run fingerprint match missing")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // byte-identical twins share their whole fingerprint set and clear
    // the default min-shared bar
    val twins = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val p2 = Dedup.winnowingPairsDf(twins).as[(Long, Long, Long)].collect()
    assert(p2.length === 1 && p2.head._3 >= Dedup.WinnowMinShared)
  }

  test("normalized exact dedup merges case/punct/space variants raw exact misses") {
    val docs = Seq(
      (1L, "Hello,   World!"),
      (2L, "hello world"),
      (3L, "HELLO... world"),
      (4L, "goodbye world")
    ).toDF("doc_id", "text")
    val got = Dedup.exactNormalizedDf(docs)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
      .map(r => (r._1, r._3, r._4, r._5)) // (doc_id, keep_id, n_dups, keep)
    assert(got === Seq(
      (1L, 1L, 3L, 1L), (2L, 1L, 3L, 0L), (3L, 1L, 3L, 0L),
      (4L, 4L, 1L, 1L)))
    // variants share one fingerprint; the distinct text does not
    val fps = Dedup.exactNormalizedDf(docs)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(fps(1L) === fps(2L) && fps(2L) === fps(3L) && fps(1L) != fps(4L))
  }

  test("editdist verify: exact distances on candidates, dup verdicts, empty-pair guard") {
    // Independent ground truth: textbook unit-cost DP over the planted texts.
    def lev(a: String, b: String): Long = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length).toLong
    }
    val out = Dedup.editDistPairsDf(docs)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // verify stage runs on EXACTLY the fingerprint's candidate set
    val cand = Dedup.simhashPairsDf(docs)
      .select("d1", "d2", "hamming").as[(Long, Long, Long)].collect().toSet
    assert(out.map(t => (t._1, t._2, t._3)).toSet === cand,
      "editdist pairs must be the simhash candidate set, verified")
    val texts = docs.as[(Long, String)].collect().toMap
    for ((d1, d2, _, ed, simE4, dup) <- out) {
      val expected = lev(texts(d1), texts(d2))
      assert(ed === expected, s"editdist($d1,$d2)")
      val glen = math.max(math.max(texts(d1).length, texts(d2).length), 1)
      assert(simE4 === math.round((1.0 - ed.toDouble / glen) * 10000))
      assert(dup === (if (simE4 >= Dedup.EditDupSimE4) 1L else 0L))
    }
    // identical short docs: distance 0, similarity 10000, duplicate
    val twin = out.find(t => t._1 == 4L && t._2 == 5L).get
    assert(twin._4 === 0L && twin._5 === 10000L && twin._6 === 1L)
    // two empty texts: identical (lev 0) but len 0 — the max(len, 1)
    // guard must score them 10000, not divide by zero
    val empties = Seq((1L, ""), (2L, "")).toDF("doc_id", "text")
    val e = Dedup.editDistPairsDf(empties)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(e.toSeq === Seq((1L, 2L, 0L, 0L, 10000L, 1L)))
  }

  test("sketch PR evaluation: counts consistent, twins always scored a hit") {
    // Planted corpus: an identical twin pair (Jaccard 1.0 — the sketch
    // cannot miss it: every band key agrees and all 32 signature minima
    // match), a partially-overlapping pair near the decision threshold,
    // and unrelated documents. The evaluation must report set-consistent
    // counts (hit <= min(exact, pred)), e4 rates in range, and both
    // denominators' rates exact when the sets coincide.
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val half = ((1 to 20).map(i => s"tok$i") ++ (1 to 20).map(i => s"alt$i")).mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base),            // twins: exact jac 10000
      (3L, half),                        // ~half overlap with base
      (4L, (1 to 40).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val r = Dedup.sketchPrDf(docs).as[(Long, Long, Long, Long, Long)].collect()
    assert(r.length === 1)
    val (nExact, nPred, nHit, prec, rec) = r.head
    assert(nExact >= 1L, "the twin pair must be in the exact ground truth")
    assert(nPred >= 1L, "the twin pair must be in the sketch prediction")
    assert(nHit >= 1L && nHit <= math.min(nExact, nPred))
    assert(prec >= 0L && prec <= 10000L && rec >= 0L && rec <= 10000L)
    // the SimHash-family evaluation obeys the same invariants: twins are
    // Hamming 0 (always predicted) and Jaccard 10000 (always true)
    val s2 = Dedup.simhashPrDf(docs).as[(Long, Long, Long, Long, Long)].collect()
    assert(s2.length === 1)
    val (se, sp2, sh2, sprec, srec) = s2.head
    assert(se >= 1L && sp2 >= 1L && sh2 >= 1L && sh2 <= math.min(se, sp2))
    assert(sprec >= 0L && sprec <= 10000L && srec >= 0L && srec <= 10000L)
    // empty corpus: zero everywhere, no division blow-up
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val z = Dedup.sketchPrDf(empty).as[(Long, Long, Long, Long, Long)].collect()
    assert(z.toSeq === Seq((0L, 0L, 0L, 0L, 0L)))
    val z2 = Dedup.simhashPrDf(empty).as[(Long, Long, Long, Long, Long)].collect()
    assert(z2.toSeq === Seq((0L, 0L, 0L, 0L, 0L)))
  }

  test("band-geometry sweep: S-curve monotonicity, twins found everywhere") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val half = ((1 to 20).map(i => s"tok$i") ++ (1 to 20).map(i => s"alt$i")).mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base),            // twins: every geometry catches them
      (3L, half),
      (4L, (1 to 40).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val rows = Dedup.minhashBandsPrDf(docs)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(r => (r._1, r._2)).toSeq ===
      Dedup.BandSweep.map { case (b, r) => (b.toLong, r.toLong) })
    // Ground truth is geometry-independent: one n_exact everywhere.
    assert(rows.map(_._3).distinct.length === 1)
    assert(rows.head._3 >= 1L, "the twin pair must be in the exact truth")
    // The S-curve direction: more bands of fewer rows can only ADD
    // candidate pairs (a (2b, r/2) geometry's keys are refinements —
    // agreement on a 16-row band implies agreement on both 8-row halves).
    assert(rows.sliding(2).forall { case Array(a, b) => a._4 <= b._4 },
      s"candidate volume not monotone in bands: ${rows.mkString(", ")}")
    assert(rows.sliding(2).forall { case Array(a, b) => a._5 <= b._5 },
      "hits not monotone in bands")
    // Twins agree on all 32 minima — every geometry must predict them.
    assert(rows.forall(_._4 >= 1L))
    assert(rows.forall(r => r._6 >= 0L && r._6 <= 10000L &&
      r._7 >= 0L && r._7 <= 10000L))
    // Empty corpus: all four geometry rows survive, zeroed.
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val z = Dedup.minhashBandsPrDf(empty)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(z.map(r => (r._3, r._4, r._5, r._6, r._7)).forall(_ == ((0L, 0L, 0L, 0L, 0L))))
    assert(z.length === 4)
  }
}
