package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Pipeline}

/** Zero-row and degenerate inputs through the dedup/pipeline operators: a
  * library operator must return an empty (or fully-defaulted) frame, never
  * throw — empty partitions and empty date-slices are routine at 100 TB. */
class EdgeCaseSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val emptyDocs =
    Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")

  test("dedup operators return empty frames on an empty corpus") {
    assert(Dedup.simhashFp(emptyDocs).count() === 0L)
    assert(Dedup.simhashPairsDf(emptyDocs).count() === 0L)
    assert(Dedup.minhashSignatures(emptyDocs).count() === 0L)
    assert(Dedup.minhashPairs(emptyDocs).count() === 0L)
    assert(Dedup.ngramJaccardPairsDf(emptyDocs).count() === 0L)
    assert(Dedup.clusterAssignmentsDf(emptyDocs).count() === 0L)
  }

  test("near-dup clean pipeline handles an empty corpus") {
    assert(Pipeline.cleanCorpusNearDupDf(emptyDocs).count() === 0L)
  }

  test("single-document corpus: no pairs, doc survives every gate shape") {
    val one = Seq((7L, "the quick brown fox is a friend of mine", "en"))
      .toDF("doc_id", "text", "lang")
    assert(Dedup.simhashPairsDf(one).count() === 0L)
    assert(Dedup.ngramJaccardPairsDf(one).count() === 0L)
    val clusters = Dedup.clusterAssignmentsDf(one).as[(Long, Long)].collect()
    assert(clusters.toSeq === Seq((7L, 7L)))
    val clean = Pipeline.cleanCorpusNearDupDf(one)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(clean.head._2 === 1L, "a singleton must be its own survivor")
  }

  test("round-6 pipeline operators handle empty and degenerate corpora") {
    import graft.operators.TextAnalytics
    // Empty corpus: every operator returns an empty frame, never throws.
    assert(Pipeline.decontaminateDf(emptyDocs).count() === 0L)
    assert(TextAnalytics.repetitionDf(emptyDocs).count() === 0L)
    assert(TextAnalytics.textCleanDf(emptyDocs).count() === 0L)
    // Corpus with no test-split member: nothing can be contaminated.
    // doc_id 0 hashes to the train split (splitBucket(0) = 68 < 80).
    val trainOnly = Seq((0L, "alpha beta gamma delta", "en"))
      .toDF("doc_id", "text", "lang")
    val flags = Pipeline.decontaminateDf(trainOnly)
      .as[(Long, String, Long, Long)].collect()
    assert(flags.length === 1 && flags.head._4 === 0L)
    // Token-less text: repetition scores are all zero, clean text unchanged.
    val degenerate = Seq((1L, ". , !", "en")).toDF("doc_id", "text", "lang")
    assert(TextAnalytics.repetitionDf(degenerate)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq === Seq((1L, 0L, 0L, 0L, 0L)))
  }

  test("retention/anomaly/diversity/bloom handle empty and degenerate inputs") {
    import graft.operators.{Events, TextAnalytics}
    val emptyEvents = Seq.empty[(Long, String, Long)]
      .toDF("user_id", "event_type", "ts_us")
    assert(Events.retentionDf(emptyEvents).count() === 0L)
    assert(Events.anomalyDf(emptyEvents).count() === 0L)
    assert(TextAnalytics.diversityDf(emptyDocs).count() === 0L)
    assert(Pipeline.decontaminateBloomDf(emptyDocs).count() === 0L)
    // One user, one event: a 1x1 retention triangle at 100 % retention.
    val one = Seq((5L, "view", 42L)).toDF("user_id", "event_type", "ts_us")
    assert(Events.retentionDf(one).as[(Long, Long, Long, Long, Long)]
      .collect().toSeq === Seq((0L, 0L, 1L, 1L, 10000L)))
    // A single (type, hour) bucket has zero variance: z pinned to 0.
    assert(Events.anomalyDf(one).as[(String, Long, Long, Long, Long)]
      .collect().toSeq === Seq(("view", 0L, 1L, 0L, 0L)))
  }

  test("cms/wordpiece/paths/centroids/semantic handle empty inputs") {
    import graft.operators.{Events, Similarity, TextAnalytics}
    assert(TextAnalytics.wordcountCmsDf(emptyDocs).count() === 0L)
    assert(TextAnalytics.tokenizeWordpieceDf(emptyDocs).count() === 0L)
    val emptyEvents = Seq.empty[(Long, Long, Long, String)]
      .toDF("user_id", "event_id", "ts_us", "event_type")
    assert(Events.pathsDf(emptyEvents).count() === 0L)
    val emptyEmb = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.embeddingCentroidsDf(emptyEmb).count() === 0L)
    assert(Pipeline.decontaminateSemanticDf(emptyEmb).count() === 0L)
  }

  test("round-7 operators handle empty and degenerate corpora") {
    import graft.operators.{Events, TextAnalytics}
    // Empty corpus: trainers converge to zero merges / empty frames.
    assert(TextAnalytics.vocabTrainDf(emptyDocs).count() === 0L)
    assert(TextAnalytics.qualityTrainedDf(emptyDocs).count() === 0L)
    assert(Dedup.substringDupDf(emptyDocs).count() === 0L)
    assert(Pipeline.sampleStratifiedCappedDf(emptyDocs).count() === 0L)
    assert(Dedup.incrementalNearDupDf(emptyDocs, emptyDocs).count() === 0L)
    val emptyEvents = Seq.empty[(Long, String, Long)]
      .toDF("user_id", "event_type", "ts_us")
    assert(Events.anomalyDenseDf(emptyEvents).count() === 0L)
    // Single-char vocabulary: no adjacent pairs exist, training stops
    // early instead of spinning to the merge budget.
    val single = Seq((1L, "a b a b a", "en")).toDF("doc_id", "text", "lang")
    assert(TextAnalytics.vocabTrainDf(single).count() === 0L)
    // One-class corpora: every doc ok (or every doc bad) must not divide
    // by zero — smoothing keeps the weights defined.
    val allOk = Seq((1L, "the cat sat on the mat and ran"),
      (2L, "the dog sat on the mat and hid")).toDF("doc_id", "text")
    val okOut = TextAnalytics.qualityTrainedDf(allOk)
      .select("doc_id", "pred_ok").as[(Long, Long)].collect().toMap
    assert(okOut.values.forall(_ == 1L), "uniform ok class must predict ok")
    val allBad = Seq((1L, "zx qv"), (2L, "mn bv")).toDF("doc_id", "text")
    val badOut = TextAnalytics.qualityTrainedDf(allBad)
      .select("doc_id", "pred_ok").as[(Long, Long)].collect().toMap
    assert(badOut.values.forall(_ == 0L), "uniform bad class must predict bad")
  }

  test("round-9 operators handle empty and degenerate inputs") {
    import graft.operators.Graph
    // PageRank on an empty edge list: empty ranks, not a division by zero
    // — both the fixed-round and the convergence engines.
    val emptyEdges = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "cnt")
    assert(Graph.pagerankDf(emptyEdges).count() === 0L)
    assert(Graph.pagerankConvergedDf(emptyEdges).count() === 0L)
    // Temperature mixing on an empty corpus: empty frames, not an NPE on
    // the null count aggregate.
    val emptySrc = Seq.empty[(Long, String)].toDF("doc_id", "source")
    assert(Pipeline.dataMixTemperatureDf(emptySrc).count() === 0L)
    assert(Pipeline.dataMixTemperatureCappedDf(emptySrc).count() === 0L)
    // One-source corpus: the whole budget lands on it (capped at n).
    val oneSrc = (1 to 10).map(i => (i.toLong, "only")).toDF("doc_id", "source")
    val t = Pipeline.dataMixTemperatureDf(oneSrc)
      .select("target").distinct().as[Long].collect()
    assert(t.toSeq === Seq(5L), "single source must receive the full budget")
    // Empty-text documents still build and decode a VALID 1×1 image
    // (raster fills from a space byte) — no NPE through the real codec.
    import graft.multimodal.Media
    val degenerate = Seq((1L, "", 0L), (2L, "ab", 2L))
      .toDF("doc_id", "text", "n_chars")
    val feats = Media.ppmFeaturesDf(Media.ppmTableDf(degenerate))
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(feats(0) === ((1L, 1L, 1L, 32L, 32L, 32L))) // three 0x20 bytes
    assert(feats(1)._2 === 3L && feats(1)._3 === 3L)
    val cyc = Array.tabulate(27)(i => "ab".charAt(i % 2).toLong)
    assert((feats(1)._4, feats(1)._5, feats(1)._6) === (
      cyc.indices.filter(_ % 3 == 0).map(cyc).sum,
      cyc.indices.filter(_ % 3 == 1).map(cyc).sum,
      cyc.indices.filter(_ % 3 == 2).map(cyc).sum))
  }

  test("round-9 second-half operators handle empty and degenerate inputs") {
    import graft.operators.{DataQuality, Events, Graph, TextAnalytics}
    // Empty corpus through the shuffle/pack/bm25 family: empty out, no
    // throw (the prefix-count bases collect to an empty list; bm25's
    // query-term collect is empty and avgdl guards its division).
    val emptyIdText = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Pipeline.dataShuffleDf(emptyIdText).count() === 0L)
    assert(Pipeline.packShuffledDf(emptyIdText).count() === 0L)
    assert(TextAnalytics.bm25Df(emptyIdText).count() === 0L)
    // Token-less docs: zero-length packing rows, no bm25 rows (no terms).
    val degenerate = Seq((1L, ""), (2L, " . ")).toDF("doc_id", "text")
    assert(Pipeline.packShuffledDf(degenerate).count() === 2L)
    assert(TextAnalytics.bm25Df(degenerate).count() === 0L)
    // Empty edge lists through the triangle/CC engines.
    val noEdges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Graph.trianglesDf(noEdges).count() === 0L)
    // Correlation: a single-point group has zero variance on both axes.
    val single = Seq(("g", 5L, 7L)).toDF("l_returnflag", "x", "y")
    assert(DataQuality.correlationDf(single)
      .as[(String, Long, Long)].collect().toSeq === Seq(("g", 1L, 0L)))
    // Profiler on an all-null column.
    val nulls = Seq[(Long, Option[String])]((1L, None), (2L, None)).toDF("id", "s")
    val prof = DataQuality.profileDf(nulls, Seq("s"))
      .as[(String, Long, Long, Long, Option[String], Option[String])].collect()
    assert(prof.toSeq === Seq(("s", 2L, 2L, 0L, None, None)))
    // Tolerance as-of with no views at all: every purchase gets sentinels.
    val purchasesOnly = Seq((1L, 10L, "purchase", 100L))
      .toDF("user_id", "event_id", "event_type", "ts_us")
    assert(Events.asofViewToleranceDf(purchasesOnly)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq ===
      Seq((10L, 1L, 100L, -1L, -1L)))
    // Sliding counts on an empty event frame.
    val noEvents = Seq.empty[(Long, String, Long)]
      .toDF("event_id", "event_type", "ts_us")
    assert(Events.slidingCountsDf(noEvents).count() === 0L)
  }

  test("whitespace-only and empty texts flow through fingerprints and shingles") {
    val degenerate = Seq((1L, "", "en"), (2L, "   ", "en"), (3L, ". , !", "en"))
      .toDF("doc_id", "text", "lang")
    // Fingerprint 0 for token-less docs (the declared contract), one
    // whole-text fallback shingle each, no crash anywhere.
    val fps = Dedup.simhashFp(degenerate).as[(Long, Long)].collect().toMap
    assert(fps.values.forall(_ === 0L))
    assert(Dedup.shingles(degenerate).count() === 3L)
    assert(Dedup.clusterAssignmentsDf(degenerate).count() === 3L)
  }

  test("budget trim and repetition plan handle empty and zero-token inputs") {
    assert(Pipeline.dataBudgetTrimDf(emptyDocs).count() === 0L)
    val emptySrc = Seq.empty[(String, String)].toDF("source", "text")
    assert(Pipeline.dataMixEpochsDf(emptySrc).count() === 0L)
    // A zero-token source plans zero epochs and zero kept tokens (the
    // div-by-zero guard); its sibling still consumes its whole share.
    val zt = Seq(("z", ""), ("w", "a a a")).toDF("source", "text")
    val plan = Pipeline.dataMixEpochsDf(zt, budget = 10L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(plan("z")._2 === 0L && plan("z")._4 === 0L && plan("z")._6 === 0L)
    assert(plan("w")._4 === 1L && plan("w")._5 === 2L && plan("w")._6 === 5L)
  }

  test("round-14 operators handle empty and degenerate inputs") {
    import graft.operators.Events
    // Containment pairs and the clean gate on an empty corpus: empty
    // frames, not an NPE in the overlap core or the survivor anti join.
    assert(Dedup.containmentPairsDf(emptyDocs.select("doc_id", "text"))
      .count() === 0L)
    assert(Pipeline.cleanCorpusContainmentDf(emptyDocs).count() === 0L)
    // A single document: no pairs, the doc survives and keeps.
    val one = Seq((1L, "the cat sat on the mat and ran home", "en"))
      .toDF("doc_id", "text", "lang")
    val g = Pipeline.cleanCorpusContainmentDf(one)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(g.toSeq === Seq((1L, 1L, 1L, 1L, 1L)))
    // Histogram and interval join on empty event frames: empty, defined.
    val emptyTyped = Seq.empty[(String, Double)].toDF("event_type", "value")
    assert(Events.valueHistogramDf(emptyTyped).count() === 0L)
    val emptyEv = Seq.empty[(Long, Long, Long)]
      .toDF("user_id", "event_id", "ts_us")
    assert(Events.intervalOverlapDf(emptyEv).count() === 0L)
    // Thumbnail of a 1×1 image (the empty-doc PPM): identity, checksum of
    // the single pixel.
    val px = Array[Byte](32, 32, 32)
    val img = "P6\n1 1\n255\n".getBytes("UTF-8") ++ px
    val (w, h, tw, th, thumb, chk) = graft.multimodal.Media.thumbnailPpm(img)
    assert((w, h, tw, th) === ((1, 1, 1, 1)))
    assert(graft.multimodal.Media.decodePpm(thumb) === ((1, 1, 32L, 32L, 32L)))
    var c = 0L; px.foreach(b => c = (c * 31 + (b & 0xff)) & 0xffffffffL)
    assert(chk === c)
    // The beam walk on a query set of one (nQueries = 1): full coverage.
    val probe = graft.operators.Similarity
      .graphTopK(spark, TestSpark.sf, nQueries = 1)
      .select("qid").distinct().as[Long].collect()
    assert(probe.toSeq === Seq(0L))
  }

  test("round-15 operators handle empty and degenerate inputs") {
    import graft.operators.{Events, Similarity}
    // All-pairs interval join: empty events and a single lone event —
    // no pairs, defined schema, no NPE in the bin explosion.
    val emptyEv = Seq.empty[(Long, Long, Long)]
      .toDF("user_id", "event_id", "ts_us")
    assert(Events.intervalAllPairsDf(emptyEv).count() === 0L)
    val lone = Seq((1L, 1L, 42L)).toDF("user_id", "event_id", "ts_us")
    assert(Events.intervalAllPairsDf(lone).count() === 0L)
    // Two sessions touching at EXACTLY one microsecond: a zero-length
    // overlap is still an overlap under closed intervals, overlap_us = 0.
    val touch = Seq((1L, 1L, 100L), (2L, 2L, 100L))
      .toDF("user_id", "event_id", "ts_us")
    val t = Events.intervalAllPairsDf(touch)
      .select("user_a", "user_b", "overlap_us")
      .as[(Long, Long, Long)].collect()
    assert(t.toSeq === Seq((1L, 2L, 0L)))
    // Insert with batch >= corpus: EVERY vector is an arrival — the
    // delta must still produce a defined, self-loop-free edge set with
    // one up-link per non-entry vector (all-arrival cold start).
    val tiny = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .filter($"vec_id" < 40)
    val delta = Similarity.navInsertDf(tiny, batch = 1000L)
      .select("src", "dst", "edge_class")
      .as[(Long, Long, String)].collect()
    assert(delta.nonEmpty)
    assert(delta.forall { case (s0, d0, _) => s0 != d0 })
    val ups = delta.filter(_._3 == "up").groupBy(_._1).view.mapValues(_.length)
    assert((0L until 40L).filter(_ != Similarity.GraphEntry)
      .forall(v => ups.getOrElse(v, 0) == 1))
  }
}
