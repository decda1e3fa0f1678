package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Pipeline}

/** Planted-graph check for connected components plus determinism/shape
  * checks for the corpus-shipping operators. */
class PipelineSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("c4 clean: each published line and page rule fires on its planted doc") {
    val good = Seq("alpha beta gamma one.", "alpha beta gamma two.",
      "alpha beta gamma three.", "alpha beta gamma four.",
      "alpha beta gamma five.", "he said \"good day friend.\"").mkString("\n")
    val lineRules = "keep this line ok.\nno terminal punct here\ntoo short.\n" +
      "this javascript line is dropped."
    val lorem = Seq("one two three four.", "five six seven eight!",
      "nine ten eleven twelve?", "lorem ipsum dolor sit.",
      "more good words here.", "final line of text.").mkString("\n")
    val braces = Seq("good line number one.", "good line number two.",
      "good line number three.", "good line number four.",
      "good line number five.", "code { brace }").mkString("\n")
    val short = "only two sentences here.\nsecond good sentence now."
    val docs = Seq((1L, good), (2L, lineRules), (3L, lorem), (4L, braces),
      (5L, short), (6L, "")).toDF("doc_id", "text")
    val got = Pipeline.c4CleanDf(docs)
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .map(t => t._1 -> t).toMap
    // all six lines survive (incl. the close-quote ending); 6 sentences
    assert(got(1L) === ((1L, 6L, 6L, 6L, 1L, good)))
    // no-punct, <3-words and javascript lines all drop; page under 5 sentences
    assert(got(2L) === ((2L, 4L, 1L, 1L, 0L, "keep this line ok.")))
    // lines all pass but the raw page mentions lorem ipsum
    assert(got(3L)._5 === 0L && got(3L)._4 === 6L && got(3L)._3 === 6L)
    // the brace line drops AND the raw page's brace kills the page
    assert(got(4L) === ((4L, 6L, 5L, 5L, 0L,
      braces.split("\n").init.mkString("\n"))))
    // clean but too short: 2 sentences < 5
    assert(got(5L) === ((5L, 2L, 2L, 2L, 0L, short)))
    // empty text: one empty line, nothing kept
    assert(got(6L) === ((6L, 1L, 0L, 0L, 0L, "")))
  }

  test("components: chains collapse to min label, disjoint clusters stay apart") {
    // 1-2-3 chain (transitive, no direct 1-3 edge), {7,8} pair, 9 isolated
    // (not in the pair graph at all).
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("d1", "d2")
    val got = Dedup.components(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("components: long chain needs multiple propagation rounds") {
    // Diameter 6 — exercises the iterate-until-fixpoint loop, not just one
    // round of neighbor-min.
    val pairs = (1L until 7L).map(i => (i, i + 1)).toDF("d1", "d2")
    val got = Dedup.components(pairs).as[(Long, Long)].collect().toMap
    assert(got === (1L to 7L).map(_ -> 1L).toMap)
  }

  test("clusters on the corpus: labels are component minima, singletons self-labeled") {
    val pairSet = Dedup.ngramJaccardPairs(spark, TestSpark.sf)
      .select("d1", "d2").as[(Long, Long)].collect()
    val clusters = Dedup.clusters(spark, TestSpark.sf)
      .as[(Long, Long)].collect().toMap
    // Every doc appears; endpoints of a pair share a cluster; the label is
    // the smallest member of its cluster.
    assert(clusters.size === sources.Tables.documents(spark, TestSpark.sf).count())
    for ((a, b) <- pairSet)
      assert(clusters(a) === clusters(b), s"pair ($a,$b) split across clusters")
    val members = clusters.groupBy(_._2).view.mapValues(_.keys.min)
    for ((label, mn) <- members) assert(label === mn)
  }

  test("components: empty pair graph yields no labels, clusters all self-labeled") {
    val empty = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(Dedup.components(empty).count() === 0L)
  }

  test("shipCompacted: per-split parquet file counts hit ceil(bytes/target) exactly") {
    val out = "target/test-scratch/ship_compacted"
    // Tiny target so each split needs several files even on the test corpus.
    val target = 4096L
    val planned = Ship.shipCompacted(spark, TestSpark.sf, out, targetBytes = target)
    assert(planned.nonEmpty)
    for ((split, files) <- planned) {
      val parts = new java.io.File(s"$out/split=$split").listFiles()
        .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(parts.toLong === files, s"split $split planned $files files, wrote $parts")
      assert(files >= 1L)
    }
    // Compaction must not change the data: read-back equals the ship frame.
    val back = spark.read.parquet(out)
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    val expect = Ship.shipFrame(spark, TestSpark.sf)
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(back === expect)
  }

  test("shipCompacted: deletes only stale split dirs, bystander files survive") {
    val out = "target/test-scratch/ship_compacted_scoped"
    val dir = new java.io.File(out)
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    // A stale split dir from "an earlier corpus" and an unrelated bystander.
    new java.io.File(dir, "split=stale").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, "split=stale", "leftover.parquet"), "x")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out, "unrelated.txt"), "precious")
    Ship.shipCompacted(spark, TestSpark.sf, out, targetBytes = 1L << 20)
    val names = dir.listFiles().map(_.getName).toSet
    assert(!names.contains("split=stale"), "stale split dir survived")
    assert(names.contains("unrelated.txt"), "bystander file was destroyed")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(out, "unrelated.txt")) === "precious")
  }

  test("ship: split-partitioned parquet output matches the near-dup clean+split flags") {
    val out = "target/test-scratch/ship_out"
    val counts = Ship.ship(spark, TestSpark.sf, out)
    // Partition layout on disk: one dir per split value.
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.forall(_.startsWith("split=")))
    // Counts reconcile with the flag frames they were derived from — the
    // DEFAULT keep decision is the near-dup-aware one.
    val kept = Pipeline.cleanCorpusNearDup(spark, TestSpark.sf)
      .filter(org.apache.spark.sql.functions.col("keep") === 1)
      .select("doc_id").as[Long].collect().toSet
    val splitOf = Pipeline.dataSplit(spark, TestSpark.sf)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val expected = kept.toSeq.groupBy(splitOf).view.mapValues(_.size.toLong).toMap
    assert(counts === expected)
    // Reading one split back prunes to that partition and round-trips rows.
    val train = spark.read.parquet(out)
      .filter(org.apache.spark.sql.functions.col("split") === "train")
    assert(train.count() === counts.getOrElse("train", 0L))
    // ...and the prune is real: the split predicate lands in the scan's
    // PartitionFilters (directory-level pruning — the other splits' files
    // are never opened), not in a post-scan Filter.
    val plan = train.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("split"),
      s"split read is not partition-pruned:\n${plan.take(1500)}")
  }

  test("ship: near-dup clusters collapse to exactly one shipped survivor") {
    val shipped = Ship.shipFrame(spark, TestSpark.sf)
      .select("doc_id").as[Long].collect().toSet
    // Clusters at the DECISION threshold the ship gate uses (≥ 0.8), not the
    // exploratory pair-query default.
    val clusters = Dedup.clusterAssignmentsDf(
        sources.Tables.documents(spark, TestSpark.sf), Dedup.NearDupJacE4)
      .as[(Long, Long)].collect()
    // No shipped doc is a non-minimum member of its cluster, and from every
    // multi-member cluster at most one member ships (the minimum, if its
    // quality/lang gates pass).
    for ((doc, cl) <- clusters if doc != cl)
      assert(!shipped.contains(doc), s"non-survivor $doc (cluster $cl) was shipped")
    val byCluster = clusters.groupBy(_._2)
    for ((cl, members) <- byCluster if members.length > 1) {
      val shippedMembers = members.map(_._1).filter(shipped.contains)
      assert(shippedMembers.length <= 1,
        s"cluster $cl shipped ${shippedMembers.length} members: ${shippedMembers.mkString(",")}")
    }
    // The near-dup gate is strictly at-most-as-permissive as exact-only.
    val exactShipped = Ship.shipFrame(spark, TestSpark.sf, nearDup = false)
      .select("doc_id").as[Long].collect().toSet
    assert(shipped.subsetOf(exactShipped))
  }

  test("cleanCorpusNearDup: planted near-dups keep only the min-id survivor") {
    // Docs 1,2 near-dup (one word of 40 differs — shingle Jaccard ≈ 0.85,
    // above the 0.8 decision threshold), 3 unrelated — all pass the quality
    // (≥5 tokens + stopword) and lang (en markers) gates.
    val base = "the quick brown fox jumps over the lazy dog and is a friend of " +
      "every creature in the wide green valley where the old river bends " +
      "slowly past the tall stone mill toward home"
    val docs = Seq(
      (1L, base, "en"),
      (2L, base.replace("home", "town"), "en"),
      (3L, "the optimizer of a catalyst engine is a tree and a rule set", "en")
    ).toDF("doc_id", "text", "lang")
    val rows = Pipeline.cleanCorpusNearDupDf(docs)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows(1L)._2 === 1L && rows(1L)._5 === 1L, "cluster min must survive and keep")
    assert(rows(2L)._2 === 0L && rows(2L)._5 === 0L, "near-dup non-min must be dropped")
    assert(rows(3L)._2 === 1L && rows(3L)._5 === 1L, "singleton must survive")
  }

  test("cleanCorpusNearDup: df-capped exact duplicates still collapse to one survivor") {
    // 60 byte-identical copies: every shingle of that text has df = 60 >
    // MaxShingleDf (50), so the pair join sees NO edges among them and each
    // copy is a singleton cluster — the cluster-min gate alone would ship
    // all 60. The exact-text conjunct must keep exactly the min copy.
    assert(60L > Dedup.MaxShingleDf, "fixture must exceed the df cap")
    val hot = "the quick brown fox jumps over the lazy dog and is a friend of every creature"
    val docs = ((1L to 60L).map(i => (i, hot, "en")) :+
      ((100L, "the optimizer of a catalyst engine is a tree and a rule set", "en")))
      .toDF("doc_id", "text", "lang")
    val kept = Pipeline.cleanCorpusNearDupDf(docs)
      .filter(org.apache.spark.sql.functions.col("keep") === 1)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 100L),
      s"expected one survivor per text, got ${kept.toSeq.sorted.mkString(",")}")
  }

  test("cleanCorpusContainment: the contained doc drops, the container keeps") {
    // Doc 1 = an article; doc 2 = the SAME article wrapped in ~3x of other
    // prose (all lowercase letter words with stopwords, so the quality and
    // en-lang gates pass for every doc). Containment(1 in 2) = 1.0 while
    // the pair's Jaccard sits far below 0.8 — the nested-document case the
    // near-dup cluster gate ships both sides of. Docs 3,4 are identical
    // (mutual containment): min id survives. Doc 5 is unrelated.
    val article = "the quick brown fox jumps over the lazy dog and is a " +
      "friend of every creature in the wide green valley of the old river"
    val filler = (0 until 60)
      .map(i => s"${('a' + i % 26).toChar}${('a' + (i / 26) % 26).toChar}x")
      .mkString(" ")
    val twin = "the optimizer of a catalyst engine is a tree and a rule set"
    val docs = Seq(
      (1L, article, "en"),
      (2L, s"the story begins $filler and then $article", "en"),
      (3L, twin, "en"),
      (4L, twin, "en"),
      (5L, "a completely different and unrelated note about the weather is here", "en")
    ).toDF("doc_id", "text", "lang")
    val rows = Pipeline.cleanCorpusContainmentDf(docs)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows(1L)._2 === 0L, "the contained article must drop")
    assert(rows(2L)._2 === 1L && rows(2L)._5 === 1L, "the container must keep")
    assert(rows(3L)._2 === 1L && rows(3L)._5 === 1L, "mutual pair: min id survives")
    assert(rows(4L)._2 === 0L, "mutual pair: non-min drops")
    assert(rows(5L)._2 === 1L && rows(5L)._5 === 1L, "unrelated doc survives")
    // Sanity: the near-dup cluster gate would NOT have linked the nested
    // pair (jac < 0.8) — the reason this gate exists.
    val jac = Dedup.ngramJaccardPairsDf(docs.select("doc_id", "text"), minJacE4 = 100L)
      .select("d1", "d2", "jac_e4").as[(Long, Long, Long)].collect()
      .collect { case (1L, 2L, j) => j }
    assert(jac.forall(_ < 8000L), "fixture lost its asymmetry — add filler")
  }

  test("cleanCorpusSpans: boilerplate-span doc dropped, diluted sibling survives") {
    // 20-token boilerplate block shared by docs 1 and 2. Doc 1 adds only a
    // 2-token tail: 16 of its 18 windows are the shared spans → dup_e4 =
    // round(16·10000/18) = 8889 ≥ 5000 → span gate drops it. Doc 2 carries
    // the same spans but dilutes them with a 20-token unique continuation:
    // 16 of 36 → 4444 < 5000 → survives. Both pass every other gate
    // (distinct texts, ≥5 tokens, en stopwords), so span_ok alone decides.
    val boiler = "the quick brown fox jumps over a lazy dog and walks out " +
      "of the old mill is near the river"
    val docs = Seq(
      (1L, boiler + " alpha beta", "en"),
      (2L, boiler + " gamma delta epsilon zeta eta theta iota kappa lambda " +
        "mu nu xi omicron pi rho sigma tau upsilon phi chi", "en"),
      (3L, "the optimizer of a catalyst engine is a tree and a rule set", "en")
    ).toDF("doc_id", "text", "lang")
    val rows = Pipeline.cleanCorpusSpansDf(docs)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows(1L)._5 === 0L && rows(1L)._6 === 0L,
      s"boilerplate doc must fail the span gate: ${rows(1L)}")
    assert(rows(1L)._2 === 1L && rows(1L)._3 === 1L && rows(1L)._4 === 1L,
      "doc 1 passes every OTHER gate — the span gate alone drops it")
    assert(rows(2L)._5 === 1L && rows(2L)._6 === 1L,
      s"diluted sibling must keep: ${rows(2L)}")
    assert(rows(3L)._5 === 1L && rows(3L)._6 === 1L,
      s"unique doc must keep: ${rows(3L)}")
  }

  test("cleanCorpus: keep is the conjunction of its exposed gates") {
    val rows = Pipeline.cleanCorpus(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    for ((_, surv, q, lm, keep) <- rows)
      assert(keep === (if (surv == 1 && q == 1 && lm == 1) 1L else 0L))
    assert(rows.exists(_._5 == 1L), "no document survives the clean — corpus or gates broken")
  }

  test("dataMix: deterministic, per-source rates coherent, keep = bucket < rate") {
    val a = Pipeline.dataMix(spark, TestSpark.sf)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    val b = Pipeline.dataMix(spark, TestSpark.sf)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(a === b, "mixture sample must be identical across runs")
    assert(a.size.toLong === sources.Tables.documents(spark, TestSpark.sf).count())
    for ((_, rows) <- a.groupBy(_._2))
      assert(rows.map(_._3).distinct.size === 1, "one rate per source")
    for ((id, _, rate, bucket, keep) <- a)
      assert(keep === (if (bucket < rate) 1L else 0L), s"doc $id keep flag wrong")
    // The mixture actually mixes: some sources keep more than others.
    val keptBySource = a.groupBy(_._2).view.mapValues(_.count(_._5 == 1L)).toMap
    assert(keptBySource.values.toSet.size > 1, "all sources sampled identically")
  }

  test("dataSplit: deterministic, total, and roughly proportioned") {
    val a = Pipeline.dataSplit(spark, TestSpark.sf)
      .as[(Long, Long, String)].collect().toSeq
    val b = Pipeline.dataSplit(spark, TestSpark.sf)
      .as[(Long, Long, String)].collect().toSeq
    assert(a === b, "hash split must be identical across runs")
    val n = a.size.toDouble
    val frac = a.groupBy(_._3).view.mapValues(_.size / n).toMap
    assert(frac.keySet === Set("train", "val", "test"))
    // 80/10/10 nominal; wide tolerance — this corpus is small.
    assert(frac("train") > 0.6 && frac("train") < 0.95, s"train frac ${frac("train")}")
    assert(frac("val") > 0.02 && frac("test") > 0.02)
  }

  // The split hash, replicated for test planning: bucket < 90 ⇒ train/val.
  private def splitBucket(docId: Long): Long = {
    val s = s"split:$docId"
    s.foldLeft(0L)((h, c) => (h * 31 + c) & 4294967295L) % 100
  }

  test("decontaminate: a train doc copying a test doc's text is flagged, others are not") {
    // Per-doc-unique vocabulary (letter run repeated), so no two base docs
    // share a shingle — the ONLY overlap is the planted copy.
    def word(i: Int): String = ('a' + i % 26).toChar.toString * (i / 26 + 2)
    val base = (0 until 40).map { i =>
      val w = word(i); (i.toLong, s"$w $w $w $w $w")
    }
    val testIds = base.map(_._1).filter(splitBucket(_) >= 90)
    assert(testIds.nonEmpty, "no base doc landed in the test split — enlarge the corpus")
    val copiedText = base(testIds.head.toInt)._2
    // A planted id that lands in train/val and copies a test doc verbatim.
    val plantedId = (1000L to 1020L).find(splitBucket(_) < 90).get
    val docs = (base :+ (plantedId, copiedText)).toDF("doc_id", "text")
    val got = Pipeline.decontaminateDf(docs)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // Output covers exactly the non-test docs.
    assert(got.keySet === (base.map(_._1).toSet + plantedId -- testIds))
    assert(got(plantedId)._4 === 1L, "verbatim copy of a test doc must be contaminated")
    assert(got(plantedId)._3 > 0L)
    for ((id, row) <- got if id != plantedId)
      assert(row._4 === 0L, s"doc $id shares no shingle with the test split")
  }

  test("decontaminateSemantic: a train vector near a test vector is flagged, distant ones are not") {
    val testId = (0L to 200L).find(splitBucket(_) >= 90).get
    val trainIds = (0L to 200L).filter(splitBucket(_) < 80).take(2)
    val base = Array.tabulate(64)(k => math.sin(k + 1).toFloat)
    val scaled = base.map(_ * 2.0f) // cosine exactly 1, same projection signs
    val distant = Array.tabulate(64)(k => if (k == 0) 1.0f else 0.0f)
    val rows = Seq(
      (testId, base), (trainIds(0), scaled), (trainIds(1), distant)
    ).toDF("vec_id", "embedding")
    val got = Pipeline.decontaminateSemanticDf(rows)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // Only non-test vectors appear in the report.
    assert(got.keySet === trainIds.toSet)
    val flagged = got(trainIds(0))
    assert(flagged._5 === 1L, s"scaled copy of a test vector must flag: $flagged")
    assert(flagged._4 === 10000L, "cosine of a scaled copy is exactly 1")
    assert(got(trainIds(1))._5 === 0L, "a distant vector must not flag")
  }

  test("decontaminateBloom: bloom-gated verify equals the exact operator; candidates superset matches") {
    val docs = sources.Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text")
    val exact = Pipeline.decontaminateDf(docs)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val bloom = Pipeline.decontaminateBloomDf(docs)
      .as[(Long, String, Long, Long, Long)].collect()
    assert(bloom.map(_._1).toSet === exact.keySet)
    for ((id, split, nCand, nShared, cont) <- bloom) {
      val (eSplit, eShared, eCont) = exact(id)
      assert(split === eSplit)
      // No false negatives: the bloom-gated exact count IS the exact count.
      assert(nShared === eShared, s"doc $id bloom verify diverged from exact")
      assert(cont === eCont)
      // Bloom candidates can only over-admit, never under-admit.
      assert(nCand >= nShared, s"doc $id candidates < verified matches")
    }
  }

  test("decontaminateFp: split aggregates reconcile with the per-doc bloom frame") {
    val docs = sources.Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text")
    val perDoc = Pipeline.decontaminateBloomDf(docs)
      .as[(Long, String, Long, Long, Long)].collect()
    val report = Pipeline.decontaminateFpDf(docs)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(report.map(_._1).toSeq.sorted === perDoc.map(_._2).distinct.toSeq.sorted)
    for ((split, nDocs, flagged, cont, fp, shCand, shShared, docP, shP) <- report) {
      val g = perDoc.filter(_._2 == split)
      assert(nDocs === g.size.toLong)
      assert(flagged === g.count(_._3 > 0).toLong, s"$split flagged")
      assert(cont === g.count(_._5 == 1L).toLong, s"$split contaminated")
      // The bitset cannot under-admit, so FP is exactly the flagged excess.
      assert(fp === flagged - cont, s"$split fp identity")
      assert(shCand === g.map(_._3).sum && shShared === g.map(_._4).sum)
      assert(docP === (if (flagged == 0) 0L
        else math.round(cont * 10000.0 / flagged)), s"$split doc precision")
      assert(shP === (if (shCand == 0) 0L
        else math.round(shShared * 10000.0 / shCand)), s"$split shingle precision")
    }
  }

  test("packEfficiency: per-source report reconciles with the packSequences layout") {
    val rows = Pipeline.packSequences(spark, TestSpark.sf)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    val report = Pipeline.packEfficiency(spark, TestSpark.sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
    val L = Pipeline.SeqLen
    assert(report.map(_._1).toSeq.sorted === rows.map(_._2).distinct.sorted)
    for ((src, nDocs, nToks, chunkSeqs, tailPad, splitDocs, splitE4,
        padSeqs, padPad, padTrunc, wasteE4) <- report) {
      val g = rows.filter(_._2 == src)
      assert(nDocs === g.size.toLong && nToks === g.map(_._3).sum)
      assert(chunkSeqs === (nToks + L - 1) / L, s"$src chunk lower bound")
      assert(tailPad === chunkSeqs * L - nToks)
      val expectSplit = g.count { case (_, _, n, off, _) =>
        n > 0 && off / L != (off + n - 1) / L }.toLong
      assert(splitDocs === expectSplit, s"$src boundary-crossing docs")
      assert(splitE4 === math.round(splitDocs * 10000.0 / nDocs))
      assert(padSeqs === nDocs)
      assert(padPad === g.map(r => L - math.min(r._3, L)).sum, s"$src padding")
      assert(padTrunc === g.map(r => math.max(r._3 - L, 0L)).sum)
      assert(wasteE4 === math.round(padPad * 10000.0 / (padSeqs * L)))
      // Chunking trades tail pad for splits; pad-per-doc trades pad for
      // whole documents intact — both sides of the Ding et al. tradeoff.
      assert(tailPad < L, s"$src tail pad is at most one partial sequence")
    }
  }

  test("packEfficiencyDf: a NULL source is its own group, never dropped") {
    // The flat Window.partitionBy(source) treated NULL as its own
    // partition; the keyed prefix sum's base join must be null-SAFE or
    // those rows silently vanish (caught in the round-12 review pass).
    val docs = Seq(
      (1L, "src", "alpha beta"),
      (2L, null.asInstanceOf[String], "gamma delta epsilon"),
      (3L, "src", "zeta")).toDF("doc_id", "source", "text")
    // ONE action: prefix-sum results are checkpoint-backed single-use
    // (see keyedExclusivePrefixSum's pid-staleness note).
    val rows = Pipeline.packEfficiencyDf(docs).collect()
    assert(rows.length === 2, "expected the src group AND the NULL group")
    assert(rows.map(_.getAs[Long]("n_docs")).sum === 3L,
      "the null-source document was dropped")
  }

  test("packEfficiencyDf: planted boundary cases (empty doc, exact fit, multi-sequence doc)") {
    def txt(n: Int) = Seq.fill(n)("w").mkString(" ")
    // s1 layout at SeqLen=256: 100 tokens (seq 0), an empty doc, 156 tokens
    // ending exactly at position 255 (boundary-exact, NOT split), 600 tokens
    // spanning seqs 1-3 (split), 100 tokens inside seq 3.
    val docs = Seq(
      (1L, "s1", txt(100)), (2L, "s1", ""), (3L, "s1", txt(156)),
      (4L, "s1", txt(600)), (5L, "s1", txt(100)),
      (9L, "s2", txt(256))).toDF("doc_id", "source", "text")
    val got = Pipeline.packEfficiencyDf(docs)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    // n_docs 5, tokens 956, ceil(956/256)=4 seqs, tail 68, 1 split doc,
    // pad-per-doc: 668 pad + 344 truncated, waste round(668e4/1280)=5219.
    assert(got("s1") === (("s1", 5L, 956L, 4L, 68L, 1L, 2000L, 5L, 668L, 344L, 5219L)))
    // 256 tokens fill one sequence exactly: no tail, no split, no padding.
    assert(got("s2") === (("s2", 1L, 256L, 1L, 0L, 0L, 0L, 1L, 0L, 0L, 0L)))
  }

  test("packSequences: offsets are running token sums per source, seq boundaries at SeqLen") {
    val rows = Pipeline.packSequences(spark, TestSpark.sf)
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(rows.size.toLong === sources.Tables.documents(spark, TestSpark.sf).count())
    for ((_, group) <- rows.groupBy(_._2)) {
      var expect = 0L
      for ((id, _, nToks, offset, seqId) <- group.sortBy(_._1)) {
        assert(offset === expect, s"doc $id offset")
        assert(seqId === offset / Pipeline.SeqLen, s"doc $id seq_id")
        expect += nToks
      }
    }
  }

  test("packSequencesGlobal: two-phase prefix sum equals the flat corpus-wide running sum") {
    val rows = Pipeline.packSequencesGlobal(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(rows.size.toLong === sources.Tables.documents(spark, TestSpark.sf).count())
    var expect = 0L
    for ((id, nToks, offset, seqId) <- rows) {
      assert(offset === expect, s"doc $id global offset")
      assert(seqId === offset / Pipeline.SeqLen, s"doc $id seq_id")
      expect += nToks
    }
  }

  test("sourceReport: per-source counts reconcile with the clean flags") {
    val report = Pipeline.sourceReport(spark, TestSpark.sf)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    val flags = Pipeline.cleanCorpus(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val srcOf = sources.Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "source").as[(Long, String)].collect().toMap
    assert(report.map(_._2).sum === srcOf.size.toLong, "every doc counted once")
    for ((src, nDocs, nSurv, nQual, nLang, nKeep) <- report) {
      val docs = srcOf.collect { case (id, s) if s == src => flags(id) }.toSeq
      assert(nDocs === docs.size.toLong, s"$src n_docs")
      assert(nSurv === docs.map(_._2).sum, s"$src n_survivor")
      assert(nQual === docs.map(_._3).sum, s"$src n_quality")
      assert(nLang === docs.map(_._4).sum, s"$src n_lang")
      assert(nKeep === docs.map(_._5).sum, s"$src n_keep")
    }
  }

  test("chunkDocuments: overlapping windows cover every token, exact boundaries") {
    // 80 tokens -> starts 0, 24, 48, 72 -> lengths 32, 32, 32, 8.
    val words = (0 until 80).map(i => ('a' + i % 26).toChar.toString * (i / 26 + 1))
    val docs = Seq(
      (1L, words.mkString(" ")),
      (2L, "solo"),
      (3L, ". , !") // token-less: no chunks
    ).toDF("doc_id", "text")
    val got = Pipeline.chunkDocumentsDf(docs)
      .as[(Long, Long, Long, String)].collect().toSeq
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(c => (c._2, c._3)) === Seq((0L, 32L), (1L, 32L), (2L, 32L), (3L, 8L)))
    assert(d1(0)._4 === words.slice(0, 32).mkString(" "))
    assert(d1(3)._4 === words.slice(72, 80).mkString(" "))
    // Overlap: chunk 1 starts at token 24, inside chunk 0's window.
    assert(d1(1)._4.startsWith(words(24)))
    assert(got.filter(_._1 == 2L) === Seq((2L, 0L, 1L, "solo")))
    assert(!got.exists(_._1 == 3L))
  }

  test("sampleStratified: deterministic, capped per language, ranks total") {
    val a = Pipeline.sampleStratified(spark, TestSpark.sf)
      .as[(Long, String, Long, Long)].collect().toSeq
    val b = Pipeline.sampleStratified(spark, TestSpark.sf)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(a === b, "stratified sample must be identical across runs")
    for ((lang, group) <- a.groupBy(_._2)) {
      val kept = group.count(_._4 == 1L).toLong
      assert(kept === math.min(Pipeline.StratCap, group.size.toLong), s"lang $lang cap")
      // Ranks are a permutation of 1..n and the kept set is exactly rn <= cap.
      assert(group.map(_._3).sorted === (1L to group.size.toLong))
      for ((id, _, rn, k) <- group)
        assert(k === (if (rn <= Pipeline.StratCap) 1L else 0L), s"doc $id kept flag")
    }
  }

  test("stratified capped: same sample as the audit view; hot-stratum window input shrinks") {
    import org.apache.spark.sql.functions._
    import graft.functions.Fns.{mix32, polyHash}
    // 1. The scale path returns exactly the audit view's kept rows.
    val audit = Pipeline.sampleStratified(spark, TestSpark.sf)
      .filter(col("kept") === 1L).select("doc_id", "lang", "rn")
      .as[(Long, String, Long)].collect().toSet
    val capped = Pipeline.sampleStratifiedCapped(spark, TestSpark.sf)
      .as[(Long, String, Long)].collect().toSet
    assert(capped === audit, "capped sample must equal the audit view's kept set")
    // 2. Planted hot stratum: 20 000 docs in one language. The admitted set
    // (= the rank window's input) must be ~2·cap, not the stratum size, and
    // the sample must still be the exact top-cap by hash order.
    val n = 20000L
    val hot = spark.range(n).select(col("id").as("doc_id"), lit("xx").as("lang"))
    val got = Pipeline.sampleStratifiedCappedDf(hot)
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._3)
    val h = pmod(mix32(polyHash(concat(lit("strat:"), col("doc_id").cast("string")))),
      lit(Pipeline.StratP))
    val thr = math.ceil(2.0 * Pipeline.StratCap * Pipeline.StratP / n).toLong
    val admitted = hot.select(h.as("h")).filter(col("h") <= thr).count()
    assert(admitted >= Pipeline.StratCap, "threshold under-admitted the planted stratum")
    assert(admitted < n / 10,
      s"window input must shrink on the hot stratum (admitted $admitted of $n)")
    val expected = hot.select(col("doc_id"), h.as("h"))
      .orderBy("h", "doc_id").limit(Pipeline.StratCap.toInt)
      .select("doc_id").as[Long].collect().toSeq
    assert(got.map(_._1) === expected, "capped sample must be the exact hash-order top-cap")
    // 3. Under-admit guard: an absurdly small over-admit factor starves the
    // hot stratum below the cap — the operator must THROW with the stratum
    // named, never silently ship a truncated sample.
    val ex = intercept[IllegalArgumentException] {
      Pipeline.sampleStratifiedCappedDf(hot, overAdmit = 0.0001)
    }
    assert(ex.getMessage.contains("under-admitted") && ex.getMessage.contains("xx"),
      s"guard message must name the starved stratum: ${ex.getMessage}")
  }

  test("bpe packing: offsets are cumulative piece counts and diverge from word packing") {
    val out = Pipeline.packSequencesBpe(spark, TestSpark.sf)
      .select("doc_id", "source", "n_pieces", "offset", "seq_id")
      .as[(Long, String, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // per source: offset(doc) = Σ n_pieces of smaller doc_ids, seq_id = offset // SeqLen
    for ((src, docs) <- out.groupBy(_._2)) {
      var acc = 0L
      for ((_, _, np, off, seq) <- docs.sortBy(_._1)) {
        assert(off === acc, s"offset drift in $src")
        assert(seq === off / Pipeline.SeqLen)
        acc += np
      }
    }
    // the piece budget differs from the word budget somewhere (fertility > 1)
    val words = Pipeline.packSequences(spark, TestSpark.sf)
      .select("doc_id", "n_toks").as[(Long, Long)].collect().toMap
    assert(out.exists { case (id, _, np, _, _) => np != words(id) },
      "piece counts never diverge from word counts — vacuous composition")
  }

  test("incremental packing: appending equals repacking; a new source starts at 0") {
    // 20 docs → cut = 18: batch = {19, 20} per the 0.9·max rule.
    // Corpus: docs 1..18 of source a, one token each (total 18). Batch:
    // doc 19 (a, 2 tokens — offset = corpus total 18) and doc 20 of a
    // NEW source b (3 tokens — no corpus total, offset 0). The batch's
    // intra-batch prefix sits on top of the corpus base.
    val docs = ((1L to 18L).map(i => (i, "a", "w")) ++ Seq(
      (19L, "a", "x y"), (20L, "b", "x y z"))).toDF("doc_id", "source", "text")
    val inc = Pipeline.packSequencesIncrementalDf(docs)
      .as[(Long, String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(inc === Seq((19L, "a", 2L, 18L, 0L), (20L, "b", 3L, 0L, 0L)))
    // ...and a second batch doc of the SAME source stacks on both the
    // corpus total and the earlier batch doc (21 docs → cut still 18)
    val docs2 = ((1L to 18L).map(i => (i, "a", "w")) ++ Seq(
      (19L, "a", "x y"), (20L, "a", "x y z"), (21L, "a", "q"))
      ).toDF("doc_id", "source", "text")
    val inc2 = Pipeline.packSequencesIncrementalDf(docs2)
      .as[(Long, String, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(inc2 === Seq((19L, "a", 2L, 18L, 0L), (20L, "a", 3L, 20L, 0L),
      (21L, "a", 1L, 23L, 0L)))
  }

  test("temperature sweep: hand-checked allocation at all three temperatures") {
    // Skewed sources a×64, b×16, c×4 (ntot 84, budget 42) — the planted
    // shape where the three temperatures genuinely differ:
    //  τ=1  (weight n):          proportional — mix shares equal raw;
    //  τ=.5 (weight floor(√n)):  flattened (8/4/2 of wsum 14 → 24/12/6,
    //                            c capped to its 4 docs);
    //  τ=0  (weight 1):          uniform 14 each, c again capped to 4 —
    //                            the min(n, ·) rule forbids upsampling.
    val docs = ((1 to 64).map(i => (i.toLong, "a")) ++
      (65 to 80).map(i => (i.toLong, "b")) ++
      (81 to 84).map(i => (i.toLong, "c"))).toDF("doc_id", "source")
    val got = Pipeline.dataMixTemperatureSweepDf(docs)
      .as[(Long, String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val expect = Seq(
      (0L, "a", 64L, 1L, 14L, 7619L, 3333L, 2187L),
      (0L, "b", 16L, 1L, 14L, 1904L, 3333L, 8750L),
      (0L, "c", 4L, 1L, 4L, 476L, 952L, 10000L),
      (5L, "a", 64L, 8L, 24L, 7619L, 5714L, 3750L),
      (5L, "b", 16L, 4L, 12L, 1904L, 2857L, 7500L),
      (5L, "c", 4L, 2L, 4L, 476L, 952L, 10000L),
      (10L, "a", 64L, 64L, 32L, 7619L, 7619L, 5000L),
      (10L, "b", 16L, 16L, 8L, 1904L, 1904L, 5000L),
      (10L, "c", 4L, 4L, 2L, 476L, 476L, 5000L))
    assert(got === expect)
    // τ=0.5's targets are EXACTLY the shipped operator's: the eval runs
    // the allocator, it does not model it
    val shipped = Pipeline.dataMixTemperatureDf(docs)
      .select("source", "target").distinct()
      .as[(String, Long)].collect().toMap
    assert(got.filter(_._1 == 5L).map(t => t._2 -> t._5).toMap === shipped)
  }

  test("prefix-sum single-use contract: no silent recompute path exists after release") {
    // The keyed prefix sum's base is localCheckpoint'ed (lineage
    // TRUNCATED) and released by the first terminal action on the result
    // (Caching's single-use contract). The one silent-wrong-rows hazard
    // the in-code comment at keyedExclusivePrefixSum describes — a
    // recompute reseeding the range boundaries so rows land in different
    // pids than the collected bases — is impossible because a recompute
    // over the released checkpoint fails loudly. Measured Spark 4.1
    // behavior, pinned here both ways (the round-12 flake hunt):
    //  1. re-acting on the SAME Dataset reuses its QueryExecution's
    //     already-materialized AQE shuffle stages — rows come back
    //     byte-identical without touching the checkpoint;
    //  2. a FRESH QueryExecution over the released plan must recompute
    //     the checkpoint RDD and throws CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND.
    // Neither path can return different rows.
    val out = Pipeline.packSequences(spark, TestSpark.sf)
    val first = out.collect().toSeq
    assert(first.nonEmpty)
    // wait until the async listener has dropped the checkpoint blocks
    val ckptIds = out.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }.toSet
    assert(ckptIds.nonEmpty, "prefix-sum result no longer checkpoint-backed?")
    val deadline = System.currentTimeMillis() + 15000L
    def stillPersisted = spark.sparkContext.getPersistentRDDs.keySet
      .exists(ckptIds.contains)
    while (stillPersisted && System.currentTimeMillis() < deadline)
      Thread.sleep(50L)
    assert(!stillPersisted,
      "checkpoint blocks never released after the terminal action")
    // path 1: same-Dataset reuse serves the identical materialized result
    assert(out.collect().toSeq === first,
      "same-Dataset reuse diverged from the first action's rows")
    // path 2: a fresh execution over the released checkpoint fails LOUDLY
    val t = intercept[Throwable] {
      out.filter(org.apache.spark.sql.functions.lit(true)).collect()
    }
    val chain = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.toLowerCase.contains("checkpoint"),
      s"fresh execution failed for an unexpected reason: $chain")
  }

  test("temperature capped: same kept set as the audit view; guard throws on starvation") {
    val docs = ((1 to 90).map(i => (i.toLong, "big")) ++
      (91 to 100).map(i => (i.toLong, "small"))).toDF("doc_id", "source")
    val audit = Pipeline.dataMixTemperatureDf(docs)
      .filter($"kept" === 1L).select("doc_id", "source", "rn")
      .as[(Long, String, Long)].collect().toSet
    val capped = Pipeline.dataMixTemperatureCappedDf(docs)
      .as[(Long, String, Long)].collect().toSet
    assert(capped === audit, "capped kept set drifted from the audit view")
    // a pathological over-admit factor must throw, never silently truncate
    val ex = intercept[IllegalArgumentException] {
      Pipeline.dataMixTemperatureCappedDf(docs, overAdmit = 0.0001)
    }
    assert(ex.getMessage.contains("under-admitted"),
      s"guard message: ${ex.getMessage}")
  }

  test("ccnet gate: keep = corpus_clean keep AND bucket != tail, flags agree") {
    val base = Pipeline.cleanCorpus(spark, TestSpark.sf)
      .select("doc_id", "keep").as[(Long, Long)].collect().toMap
    val buckets = operators.TextAnalytics.ccnetBucket(spark, TestSpark.sf)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    val out = Pipeline.cleanCorpusCcnet(spark, TestSpark.sf)
      .select("doc_id", "bucket", "ccnet_ok", "keep")
      .as[(Long, String, Long, Long)].collect()
    assert(out.nonEmpty)
    for ((id, bucket, ok, keep) <- out) {
      assert(bucket === buckets(id))
      assert(ok === (if (bucket != "tail") 1L else 0L))
      assert(keep === (base(id) min ok))
    }
    // the gate actually fires: some docs fall out purely for sitting in
    // the tail (corpus_clean kept them)
    assert(out.exists { case (id, _, ok, _) => base(id) == 1L && ok == 0L })
  }

  test("temperature mixing: sqrt weights flatten the source distribution, all-integer") {
    // big: 90 docs, small: 10 docs. Weights floor(sqrt): 9 and 3;
    // budget = 100/2 = 50; bases: 50·9//12 = 37 (rem 6), 50·3//12 = 12
    // (rem 6); leftover = 50−49 = 1 goes to 'big' (equal remainders tie to
    // the lexicographically smaller source) → targets 38 and min(10,12)=10.
    // The small source keeps 100 %, the big one 42 % — flatter than the
    // natural 90/10 split, which is the entire point of α = 1/2.
    val docs = ((1 to 90).map(i => (i.toLong, "big")) ++
      (91 to 100).map(i => (i.toLong, "small"))).toDF("doc_id", "source")
    val out = Pipeline.dataMixTemperatureDf(docs)
      .select("doc_id", "source", "n_source", "target", "rn", "kept")
      .as[(Long, String, Long, Long, Long, Long)].collect()
    assert(out.length === 100)
    val bySource = out.groupBy(_._2)
    assert(bySource("big").head._4 === 38L)
    assert(bySource("small").head._4 === 10L)
    assert(bySource("big").count(_._6 == 1L) === 38)
    assert(bySource("small").count(_._6 == 1L) === 10)
    // ranks are a permutation of 1..n within each source
    assert(bySource("big").map(_._5).sorted.toSeq === (1L to 90L))
    // deterministic: a re-run keeps the identical doc set
    val again = Pipeline.dataMixTemperatureDf(docs)
      .filter($"kept" === 1L).select("doc_id")
      .as[Long].collect().toSet
    assert(again === out.filter(_._6 == 1L).map(_._1).toSet)
  }

  test("corpus drift: planted cohort shift ranks the moved word first") {
    // Cohort A: 'alpha' dominates; cohort B: 'beta' dominates; 'gamma'
    // appears evenly. N_a = N_b = 8 tokens, so drifts are exact quarters.
    val docs = Seq(
      (true, "alpha alpha alpha alpha alpha alpha gamma gamma"),
      (false, "beta beta beta beta beta beta gamma gamma")
    ).toDF("cohort_a", "text")
    val out = Pipeline.corpusDriftDf(docs)
      .as[(String, Long, Long, Long)].collect()
    // |6/8 − 0/8| = 0.75 for alpha and beta; gamma moved 0.
    assert(out.map(r => (r._1, r._4)).toSeq === Seq(
      ("alpha", 750000L), ("beta", 750000L), ("gamma", 0L)))
    assert(out.find(_._1 == "alpha").get._2 === 6L)
    assert(out.find(_._1 == "beta").get._3 === 6L)
    // one-cohort corpus: drift undefined → empty report, no NaN ranking
    val oneSided = Seq((true, "alpha beta")).toDF("cohort_a", "text")
    assert(Pipeline.corpusDriftDf(oneSided).count() === 0L)
  }

  test("temperature mixing: largest-remainder targets sum exactly to the budget") {
    // a: 100, b: 50, c: 30 → weights 10, 7, 5 (wsum 22), budget 90.
    // Bases 40/28/20 (rems 20/14/10), leftover 2 → a and b get +1:
    // targets 41/29/20 sum to exactly 90, and no source hits its n cap.
    val docs = ((1 to 100).map(i => (i.toLong, "a")) ++
      (101 to 150).map(i => (i.toLong, "b")) ++
      (151 to 180).map(i => (i.toLong, "c"))).toDF("doc_id", "source")
    val targets = Pipeline.dataMixTemperatureDf(docs)
      .select("source", "target").distinct()
      .as[(String, Long)].collect().toMap
    assert(targets === Map("a" -> 41L, "b" -> 29L, "c" -> 20L))
    assert(targets.values.sum === 90L, "remainder not fully distributed")
    // the capped scale path keeps exactly the target count per source
    val kept = Pipeline.dataMixTemperatureCappedDf(docs)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept === targets)
  }

  test("data_shuffle: pos is a permutation, shards balanced to ±1, partition-independent") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    val out = Pipeline.dataShuffleDf(docs)
      .as[(Long, Long, Long, Long)].collect() // (doc_id, shuffle_h, pos, shard)
    val n = out.length
    assert(n > 0)
    // pos is exactly {0..n-1}
    assert(out.map(_._3).sorted.toSeq === (0L until n.toLong))
    // pos agrees with the flat (h, doc_id) rank — the partition-independent
    // definition the two-phase prefix count must reproduce
    val expected = out.sortBy(r => (r._2, r._1)).map(_._1)
      .zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    assert(out.forall(r => expected(r._1) === r._3), "pos drifted from the flat rank")
    // round-robin dealing balances shards to ±1
    val byShard = out.groupBy(_._4).view.mapValues(_.length).toMap
    assert(byShard.keySet.subsetOf((0L until Pipeline.ShuffleShards).toSet))
    assert(byShard.values.max - byShard.values.min <= 1)
    // partition independence: a repartitioned input yields identical rows
    val re = Pipeline.dataShuffleDf(docs.repartition(7))
      .as[(Long, Long, Long, Long)].collect()
    assert(re.sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
  }

  test("data_pack_shuffled: offsets accumulate in exactly the data_shuffle order") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    val packed = Pipeline.packShuffledDf(docs)
      .as[(Long, Long, Long, Long)].collect() // (doc_id, n_toks, offset, seq_id)
    val order = Pipeline.dataShuffleDf(docs)
      .as[(Long, Long, Long, Long)].collect() // (doc_id, h, pos, shard)
      .sortBy(_._3).map(_._1) // doc ids in shuffle order
    val byDoc = packed.map(p => p._1 -> p).toMap
    // walking the shuffle order, the running token total is each doc's offset
    var acc = 0L
    for (id <- order) {
      val (_, nToks, offset, seqId) = byDoc(id)
      assert(offset === acc, s"doc $id offset $offset != running total $acc")
      assert(seqId === offset / Pipeline.SeqLen)
      acc += nToks
    }
    // and both operators saw the same doc set
    assert(packed.length === order.length)
  }

  test("ship_manifest: exactly the all-gates survivors, packed in shuffle order") {
    import org.apache.spark.sql.functions.col
    val manifest = Pipeline.shipManifest(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long)].collect() // (doc_id, n_toks, offset, seq_id)
    // kept set = intersection of the standalone stage audit views
    val cleanKeep = Pipeline.cleanCorpus(spark, TestSpark.sf)
      .filter(col("keep") === 1).select("doc_id").as[Long].collect().toSet
    val deconOk = Pipeline.decontaminate(spark, TestSpark.sf)
      .filter(col("split") === "train" && col("contaminated") === 0)
      .select("doc_id").as[Long].collect().toSet
    val expectedIds = cleanKeep intersect deconOk
    assert(manifest.map(_._1).toSet === expectedIds)
    assert(manifest.nonEmpty && manifest.length < cleanKeep.size,
      "gates must actually drop something for this test to bite")
    // offsets are the running token totals in the shuffle order of the
    // kept docs (data_shuffle's order restricted to the manifest)
    val shuffleOrder = Pipeline.dataShuffleDf(
        graft.sources.Tables.documents(spark, TestSpark.sf))
      .as[(Long, Long, Long, Long)].collect()
      .filter(r => expectedIds(r._1)).sortBy(_._3).map(_._1)
    val byDoc = manifest.map(m => m._1 -> m).toMap
    var acc = 0L
    for (id <- shuffleOrder) {
      assert(byDoc(id)._3 === acc, s"manifest offset for $id drifted")
      acc += byDoc(id)._2
    }
  }

  test("data_budget_trim: whole-doc prefix under the budget, nested across budgets") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    val out = Pipeline.dataBudgetTrimDf(docs)
      .as[(Long, Long, Long, Long)].collect() // (doc_id, n_toks, offset, kept)
    assert(out.nonEmpty)
    val kept = out.filter(_._4 == 1L)
    assert(kept.nonEmpty && kept.length < out.length,
      "the default budget must split the corpus non-trivially")
    // exactly the spans that fit entirely under the budget
    assert(out.forall(r =>
      (r._4 == 1L) === (r._3 + r._2 <= Pipeline.TrimBudgetTokens)))
    // kept tokens never exceed the budget
    assert(kept.map(_._2).sum <= Pipeline.TrimBudgetTokens)
    // the kept set is a PREFIX of the shuffled order (no gaps): every
    // kept doc's offset is below every dropped doc's offset... except
    // zero-token docs, which occupy no span and are kept wherever they
    // sit — exclude them from the boundary check
    val dropMin = out.filter(_._4 == 0L).map(_._3).minOption.getOrElse(Long.MaxValue)
    assert(kept.filter(_._2 > 0).forall(_._3 < dropMin),
      "kept span-bearing docs must precede every dropped doc")
    // nested: doubling the budget only ADDS documents
    val bigger = Pipeline.dataBudgetTrimDf(docs, Pipeline.TrimBudgetTokens * 2)
      .as[(Long, Long, Long, Long)].collect()
      .filter(_._4 == 1L).map(_._1).toSet
    assert(kept.map(_._1).toSet.subsetOf(bigger),
      "a larger budget must be a superset (nested samples)")
  }

  test("data_curriculum: equal-width position stages in fluency order, full coverage") {
    val out = Pipeline.dataCurriculum(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long)].collect() // (doc_id, lm_mean_e4, pos, stage)
    val n = out.length
    assert(n > 0)
    // pos is exactly the flat (fluency desc, doc_id) rank
    val expected = out.sortBy(r => (-r._2, r._1)).map(_._1)
      .zipWithIndex.map { case (id, i) => id -> i.toLong }.toMap
    assert(out.forall(r => expected(r._1) === r._3), "pos drifted from the flat rank")
    // stage = (pos * S) div N + 1 — equal-width quarters, 1-indexed
    assert(out.forall(r =>
      r._4 === r._3 * Pipeline.CurriculumStages / n + 1))
    assert(out.map(_._4).distinct.sorted.toSeq ===
      (1L to Pipeline.CurriculumStages))
    // stages are CONTIGUOUS in the fluency order: max pos of stage s is
    // below min pos of stage s+1
    val byStage = out.groupBy(_._4)
    for (st <- 1L until Pipeline.CurriculumStages)
      assert(byStage(st).map(_._3).max < byStage(st + 1).map(_._3).min)
  }

  test("data_mix_epochs: repetition plan invariants hold for every source") {
    val out = Pipeline.dataMixEpochs(spark, TestSpark.sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    // (source, n_toks, share, full_epochs, rem_tokens, kept_tokens)
    assert(out.nonEmpty)
    val share = out.head._3
    assert(out.forall(_._3 === share), "equal budget share per source")
    for (r <- out) {
      assert(r._4 <= Pipeline.MaxEpochs, "epoch cap violated")
      assert(r._6 === r._4 * r._2 + r._5, "kept != full*n + rem")
      assert(r._6 <= share, "a source's kept tokens exceed its share")
      if (r._4 < Pipeline.MaxEpochs && r._2 > 0)
        assert(r._6 === share, "below the cap the whole share is used")
      if (r._4 >= Pipeline.MaxEpochs)
        assert(r._5 === 0L, "no partial epoch beyond the cap")
      assert(r._5 < math.max(r._2, 1L), "remainder must be a partial epoch")
    }
    assert(out.exists(_._4 >= 1L), "no source affords even one full epoch")
  }

  test("data_mix_epochs: planted corpus exercises BOTH regimes (capped and fresh)") {
    // tiny source: 4 tokens total -> a 100-token share buys far more than
    // MaxEpochs epochs, so it must cap with rem = 0; big source: 80
    // tokens -> the share buys 1 full epoch + a 20-token partial.
    val docs = Seq(
      ("tiny", "a b c d"),
      ("big", Seq.fill(80)("w").mkString(" "))
    ).toDF("source", "text")
    val out = Pipeline.dataMixEpochsDf(docs, budget = 200L)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val tiny = out("tiny")
    assert(tiny._4 === Pipeline.MaxEpochs, "tiny source must repeat to the cap")
    assert(tiny._5 === 0L, "no partial epoch beyond the cap")
    assert(tiny._6 === Pipeline.MaxEpochs * 4L)
    val big = out("big")
    assert(big._4 === 1L, "big source affords exactly one full epoch")
    assert(big._5 === 20L, "partial epoch remainder below the cap")
    assert(big._6 === 100L, "below the cap the whole share is used")
  }
}
