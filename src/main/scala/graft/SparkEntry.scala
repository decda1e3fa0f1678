package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{DataQuality, Dedup, Events, Graph, Pipeline, Relational, Similarity, TextAnalytics}
import graft.multimodal.Media

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every oracle query obeys the determinism rules (SURVEY §2.D): total ORDER
  * BY, integer cents / 1e-4 fixed point for anything float-derived, explicit
  * NULLS placement, BIGINT-cast integer outputs on both engines.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Reference-parity word count top-20 (coordinator.py:123-129). */
  def entry(spark: SparkSession): DataFrame =
    TextAnalytics.wordcountTopK(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // — reference surface (word count pipeline) —
    "wordcount_topk" -> ((s, d) => TextAnalytics.wordcountTopK(s, d)),
    "wordcount_full" -> ((s, d) => TextAnalytics.wordcountFull(s, d)),
    "distinct_words" -> ((s, d) => TextAnalytics.distinctWords(s, d)),
    "distinct_words_approx" -> ((s, d) => TextAnalytics.distinctWordsApprox(s, d)),
    "wordcount_cms" -> ((s, d) => TextAnalytics.wordcountCms(s, d)),
    // — core relational —
    "scan_filter_project" -> ((s, d) => Relational.scanFilterProject(s, d)),
    "agg_pricing_summary" -> ((s, d) => Relational.aggPricingSummary(s, d)),
    "topk_orders" -> ((s, d) => Relational.topkOrders(s, d)),
    "set_ops" -> ((s, d) => Relational.setOps(s, d)),
    "scalar_string" -> ((s, d) => Relational.scalarString(s, d)),
    "scalar_datetime" -> ((s, d) => Relational.scalarDatetime(s, d)),
    "scalar_math" -> ((s, d) => Relational.scalarMath(s, d)),
    "scalar_array" -> ((s, d) => Relational.scalarArray(s, d)),
    "scalar_json" -> ((s, d) => Relational.scalarJson(s, d)),
    // — joins —
    "join_broadcast" -> ((s, d) => Relational.joinBroadcast(s, d)),
    "join_multiway" -> ((s, d) => Relational.joinMultiway(s, d)),
    "join_semi" -> ((s, d) => Relational.joinSemi(s, d)),
    "join_anti" -> ((s, d) => Relational.joinAnti(s, d)),
    "join_outer" -> ((s, d) => Relational.joinOuter(s, d)),
    "pivot_status" -> ((s, d) => Relational.pivotStatus(s, d)),
    "unpivot_status" -> ((s, d) => Relational.unpivotStatus(s, d)),
    "supplier_revenue" -> ((s, d) => Relational.supplierRevenue(s, d)),
    "graph_pagerank" -> ((s, d) => Graph.pagerank(s, d)),
    "graph_triangles" -> ((s, d) => Graph.triangles(s, d)),
    "graph_components" -> ((s, d) => Graph.componentsQuery(s, d)),
    "graph_kcore" -> ((s, d) => Graph.kcoreQuery(s, d)),
    "graph_lpa" -> ((s, d) => Graph.lpaQuery(s, d)),
    "eval_graph_modularity" -> ((s, d) => Graph.modularityEval(s, d)),
    "join_salted" -> ((s, d) => Relational.joinSalted(s, d)),
    "agg_rollup" -> ((s, d) => Relational.aggRollup(s, d)),
    "agg_cube" -> ((s, d) => Relational.aggCube(s, d)),
    "agg_quantiles" -> ((s, d) => Relational.aggQuantiles(s, d)),
    "agg_quantiles_approx" -> ((s, d) => Relational.aggQuantilesApprox(s, d)),
    "agg_grouping_sets" -> ((s, d) => Relational.aggGroupingSets(s, d)),
    "agg_correlation" -> ((s, d) => DataQuality.correlation(s, d)),
    // — data quality / validation —
    "data_profile" -> ((s, d) => DataQuality.profile(s, d)),
    "data_expectations" -> ((s, d) => DataQuality.expectations(s, d)),
    // — windows & events —
    "window_rank" -> ((s, d) => Relational.windowRank(s, d)),
    "window_suite" -> ((s, d) => Relational.windowSuite(s, d)),
    "window_distribution" -> ((s, d) => Relational.windowDistribution(s, d)),
    "window_running" -> ((s, d) => Relational.windowRunning(s, d)),
    "window_range_frame" -> ((s, d) => Relational.windowRangeFrame(s, d)),
    "events_tumbling" -> ((s, d) => Events.tumblingCounts(s, d)),
    "events_sliding" -> ((s, d) => Events.slidingCounts(s, d)),
    "events_sessionize" -> ((s, d) => Events.sessionize(s, d)),
    "events_sessionize_native" -> ((s, d) => Events.sessionizeNative(s, d)),
    "join_interval_overlap" -> ((s, d) => Events.intervalOverlap(s, d)),
    "join_interval_allpairs" -> ((s, d) => Events.intervalAllPairs(s, d)),
    "events_value_histogram" -> ((s, d) => Events.valueHistogram(s, d)),
    "events_funnel" -> ((s, d) => Events.funnel(s, d)),
    "events_funnel_windowed" -> ((s, d) => Events.funnelWindowed(s, d)),
    "events_attribution" -> ((s, d) => Events.attribution(s, d)),
    "events_retention" -> ((s, d) => Events.retention(s, d)),
    "events_paths" -> ((s, d) => Events.paths(s, d)),
    "events_experiment" -> ((s, d) => Events.experiment(s, d)),
    "events_anomaly" -> ((s, d) => Events.anomaly(s, d)),
    "events_anomaly_dense" -> ((s, d) => Events.anomalyDense(s, d)),
    "layout_zorder" -> ((s, d) => Events.zorderLayout(s, d)),
    "eval_layout_skip" -> ((s, d) => Events.zorderSkipEval(s, d)),
    "layout_hilbert" -> ((s, d) => Events.hilbertLayout(s, d)),
    "layout_zorder_3d" -> ((s, d) => Events.zorderLayout3d(s, d)),
    "eval_layout_skip_3d" -> ((s, d) => Events.layoutSkip3dEval(s, d)),
    "eval_layout_tradeoff" -> ((s, d) => Events.layoutTradeoffEval(s, d)),
    "join_asof" -> ((s, d) => Events.asofJoinOrders(s, d)),
    "join_asof_fwd" -> ((s, d) => Events.asofJoinOrdersFwd(s, d)),
    "join_asof_nearest" -> ((s, d) => Events.asofJoinOrdersNearest(s, d)),
    "join_asof_tolerance" -> ((s, d) => Events.asofJoinOrdersTolerance(s, d)),
    "join_range" -> ((s, d) => Events.rangeJoinBands(s, d)),
    // — LLM-pipeline: text analysis —
    "text_ngrams" -> ((s, d) => TextAnalytics.ngramTopK(s, d)),
    "text_df_terms" -> ((s, d) => TextAnalytics.docFrequency(s, d)),
    "text_langid" -> ((s, d) => TextAnalytics.langId(s, d)),
    "text_langid_ngram" -> ((s, d) => TextAnalytics.langIdNgram(s, d)),
    "eval_langid_confusion" -> ((s, d) => TextAnalytics.langidConfusion(s, d)),
    "text_quality" -> ((s, d) => TextAnalytics.quality(s, d)),
    "text_gopher" -> ((s, d) => TextAnalytics.gopherQuality(s, d)),
    "text_gopher_rep" -> ((s, d) => TextAnalytics.gopherRepetition(s, d)),
    "text_quality_trained" -> ((s, d) => TextAnalytics.qualityTrained(s, d)),
    "text_tokens" -> ((s, d) => TextAnalytics.tokenStats(s, d)),
    "text_length_bands" -> ((s, d) => TextAnalytics.lengthBands(s, d)),
    "text_length_filter" -> ((s, d) => TextAnalytics.lengthFilter(s, d)),
    "text_fingerprint" -> ((s, d) => TextAnalytics.fingerprint(s, d)),
    "text_tfidf" -> ((s, d) => TextAnalytics.tfIdf(s, d)),
    "text_tfidf_linear" -> ((s, d) => TextAnalytics.tfIdfLinear(s, d)),
    "text_bm25" -> ((s, d) => TextAnalytics.bm25(s, d)),
    "text_repetition" -> ((s, d) => TextAnalytics.repetition(s, d)),
    "text_diversity" -> ((s, d) => TextAnalytics.diversity(s, d)),
    "tokenize_wordpiece" -> ((s, d) => TextAnalytics.tokenizeWordpiece(s, d)),
    "tokenize_wordpiece_learned" -> ((s, d) => TextAnalytics.tokenizeWordpieceLearned(s, d)),
    "tokenize_unigram" -> ((s, d) => TextAnalytics.tokenizeUnigram(s, d)),
    "vocab_train" -> ((s, d) => TextAnalytics.vocabTrain(s, d)),
    "tokenize_bpe" -> ((s, d) => TextAnalytics.tokenizeBpe(s, d)),
    "eval_tokenizer_fertility" -> ((s, d) => TextAnalytics.tokenizerFertilityEval(s, d)),
    "text_lm_score" -> ((s, d) => TextAnalytics.lmScore(s, d)),
    "text_ccnet_bucket" -> ((s, d) => TextAnalytics.ccnetBucket(s, d)),
    "text_quality_calibrated" -> ((s, d) => TextAnalytics.qualityCalibrated(s, d)),
    "data_selection_dsir" -> ((s, d) => TextAnalytics.dsirScore(s, d)),
    "text_phrases_pmi" -> ((s, d) => TextAnalytics.phrases(s, d)),
    "text_clean" -> ((s, d) => TextAnalytics.textClean(s, d)),
    "vocab_coverage" -> ((s, d) => TextAnalytics.vocabCoverage(s, d)),
    // — LLM-pipeline: dedup —
    "dedup_exact" -> ((s, d) => Dedup.exact(s, d)),
    "dedup_exact_normalized" -> ((s, d) => Dedup.exactNormalized(s, d)),
    "dedup_incremental" -> ((s, d) => Dedup.incremental(s, d)),
    "dedup_incremental_neardup" -> ((s, d) => Dedup.incrementalNearDup(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccardPairs(s, d)),
    "dedup_containment" -> ((s, d) => Dedup.containmentPairs(s, d)),
    "dedup_winnowing" -> ((s, d) => Dedup.winnowingPairs(s, d)),
    "dedup_semantic_clusters" -> ((s, d) => Dedup.semanticClusters(s, d)),
    "dedup_substring" -> ((s, d) => Dedup.substringDup(s, d)),
    "dedup_substring_rewrite" -> ((s, d) => Dedup.substringRewrite(s, d)),
    "dedup_lines" -> ((s, d) => Dedup.lineDedup(s, d)),
    "dedup_clusters" -> ((s, d) => Dedup.clusters(s, d)),
    "dedup_clusters_best" -> ((s, d) => Dedup.clustersBest(s, d)),
    "dedup_embedding" -> ((s, d) => Dedup.embeddingPairs(s, d)),
    "dedup_embedding_lsh" -> ((s, d) => Dedup.embeddingPairsLsh(s, d)),
    "dedup_minhash" -> ((s, d) => Dedup.minhashBucketsQuery(s, d)),
    "dedup_minhash_pairs" -> ((s, d) => Dedup.minhashPairsQuery(s, d)),
    "dedup_simhash" -> ((s, d) => Dedup.simhash(s, d)),
    "dedup_simhash_pairs" -> ((s, d) => Dedup.simhashPairs(s, d)),
    "dedup_editdist" -> ((s, d) => Dedup.editDistPairs(s, d)),
    "eval_dedup_pr" -> ((s, d) => Dedup.sketchPr(s, d)),
    "eval_simhash_pr" -> ((s, d) => Dedup.simhashPr(s, d)),
    "eval_minhash_bands" -> ((s, d) => Dedup.minhashBandsPr(s, d)),
    // — LLM-pipeline: similarity search —
    "sim_topk" -> ((s, d) => Similarity.bruteTopK(s, d)),
    "eval_embedding_health" -> ((s, d) => Similarity.embeddingHealth(s, d)),
    "sim_lsh_topk" -> ((s, d) => Similarity.lshTopK(s, d)),
    "eval_lsh_planes" -> ((s, d) => Similarity.lshPlanesEval(s, d)),
    "sim_range_search" -> ((s, d) => Similarity.rangeSearch(s, d)),
    "sim_sq_topk" -> ((s, d) => Similarity.sqTopK(s, d)),
    "eval_sq_recall" -> ((s, d) => Similarity.sqRecall(s, d)),
    "sim_ivf_topk" -> ((s, d) => Similarity.ivfTopK(s, d)),
    "eval_ivf_nprobe" -> ((s, d) => Similarity.ivfNprobeEval(s, d)),
    "sim_ivf_trained" -> ((s, d) => Similarity.ivfTrainedTopK(s, d)),
    "sim_pq_topk" -> ((s, d) => Similarity.pqTopK(s, d)),
    "eval_opq_allocation" -> ((s, d) => Similarity.opqAllocationEval(s, d)),
    "sim_pq_trained" -> ((s, d) => Similarity.pqTrainedTopK(s, d)),
    "sim_ivfpq_topk" -> ((s, d) => Similarity.ivfPqTopK(s, d)),
    "sim_ivfpq_trained" -> ((s, d) => Similarity.ivfPqTrainedTopK(s, d)),
    "sim_ivfpq_index" -> ((s, d) => Similarity.ivfPqServedCodes(s, d)),
    "sim_ivfpq_served" -> ((s, d) => Similarity.ivfPqServedTopK(s, d)),
    "sim_knn_graph" -> ((s, d) => Similarity.knnGraphQuery(s, d)),
    "sim_nav_graph" -> ((s, d) => Similarity.navGraphQuery(s, d)),
    "sim_nav_insert" -> ((s, d) =>
      Similarity.navInsert(s, d).orderBy("src", "dst", "edge_class")),
    "eval_nav_insert" -> ((s, d) => Similarity.evalNavInsert(s, d)),
    "eval_nav_insert_seq" -> ((s, d) => Similarity.evalNavInsertSeq(s, d)),
    "sim_nav_delete" -> ((s, d) => Similarity.navDeleteTopK(s, d)),
    "sim_graph_topk" -> ((s, d) => Similarity.graphTopK(s, d)),
    "sim_graph_layered" -> ((s, d) => Similarity.graphLayeredTopK(s, d)),
    "sim_graph_layered_banded" ->
      ((s, d) => Similarity.graphLayeredBandedTopK(s, d)),
    "sim_graph_hier" -> ((s, d) => Similarity.graphHierTopK(s, d)),
    "eval_graph_entry" -> ((s, d) => Similarity.evalGraphEntry(s, d)),
    "eval_graph_connectivity" -> ((s, d) => Similarity.graphConnectivityEval(s, d)),
    "eval_graph_recall" -> ((s, d) => Similarity.graphRecall(s, d)),
    "eval_graph_beam" -> ((s, d) => Similarity.graphBeamEval(s, d)),
    "eval_scale_rules" -> ((s, d) => Similarity.scaleRulesEval(s, d)),
    "search_hybrid_rrf" -> ((s, d) => Similarity.hybridRrf(s, d)),
    "search_mmr" -> ((s, d) => Similarity.mmrTopK(s, d)),
    "eval_mmr_diversity" -> ((s, d) => Similarity.mmrDiversityEval(s, d)),
    "search_hybrid_served" -> ((s, d) => Similarity.hybridRrfServed(s, d)),
    "embedding_kmeans" -> ((s, d) => Similarity.kmeansClusters(s, d)),
    "sample_cluster_balanced" -> ((s, d) => Similarity.clusterBalancedSample(s, d)),
    "eval_retrieval_recall" -> ((s, d) => Similarity.retrievalRecall(s, d)),
    "eval_ann_recall_served" -> ((s, d) => Similarity.servedRecall(s, d)),
    "embedding_centroids" -> ((s, d) => Similarity.embeddingCentroids(s, d)),
    // — LLM-pipeline: multimodal —
    "multimodal_features" -> ((s, d) => Media.ppmFeaturesQuery(s, d)),
    "media_thumbnail" -> ((s, d) => Media.thumbnailQuery(s, d)),
    "media_frames" -> ((s, d) => Media.frameSampleQuery(s, d)),
    "media_dedup" -> ((s, d) => Media.mediaDedup(s, d)),
    "media_neardup" -> ((s, d) => Media.mediaNearDup(s, d)),
    "media_phash" -> ((s, d) => Media.phashQuery(s, d)),
    "media_phash_pairs" -> ((s, d) => Media.phashPairsQuery(s, d)),
    // — LLM-pipeline: corpus shipping —
    "corpus_clean" -> ((s, d) => Pipeline.cleanCorpus(s, d)),
    "corpus_clean_ccnet" -> ((s, d) => Pipeline.cleanCorpusCcnet(s, d)),
    "corpus_clean_neardup" -> ((s, d) => Pipeline.cleanCorpusNearDup(s, d)),
    "corpus_clean_containment" -> ((s, d) => Pipeline.cleanCorpusContainment(s, d)),
    "corpus_clean_spans" -> ((s, d) => Pipeline.cleanCorpusSpans(s, d)),
    "corpus_clean_c4" -> ((s, d) => Pipeline.c4Clean(s, d)),
    "corpus_stats" -> ((s, d) => Pipeline.corpusStats(s, d)),
    "corpus_drift" -> ((s, d) => Pipeline.corpusDrift(s, d)),
    "source_report" -> ((s, d) => Pipeline.sourceReport(s, d)),
    "data_split" -> ((s, d) => Pipeline.dataSplit(s, d)),
    "data_mix" -> ((s, d) => Pipeline.dataMix(s, d)),
    "data_mix_epochs" -> ((s, d) => Pipeline.dataMixEpochs(s, d)),
    "data_mix_temperature" -> ((s, d) => Pipeline.dataMixTemperature(s, d)),
    "data_mix_temperature_capped" -> ((s, d) => Pipeline.dataMixTemperatureCapped(s, d)),
    "eval_mix_temperature" -> ((s, d) => Pipeline.dataMixTemperatureSweep(s, d)),
    "decontaminate" -> ((s, d) => Pipeline.decontaminate(s, d)),
    "source_contamination" -> ((s, d) => Pipeline.sourceContamination(s, d)),
    "decontaminate_bloom" -> ((s, d) => Pipeline.decontaminateBloom(s, d)),
    "eval_decontaminate_fp" -> ((s, d) => Pipeline.decontaminateFp(s, d)),
    "decontaminate_semantic" -> ((s, d) => Pipeline.decontaminateSemantic(s, d)),
    "pack_sequences" -> ((s, d) => Pipeline.packSequences(s, d)),
    "pack_sequences_incremental" -> ((s, d) => Pipeline.packSequencesIncremental(s, d)),
    "pack_sequences_global" -> ((s, d) => Pipeline.packSequencesGlobal(s, d)),
    "pack_sequences_bpe" -> ((s, d) => Pipeline.packSequencesBpe(s, d)),
    "eval_pack_efficiency" -> ((s, d) => Pipeline.packEfficiency(s, d)),
    "chunk_documents" -> ((s, d) => Pipeline.chunkDocuments(s, d)),
    "sample_stratified" -> ((s, d) => Pipeline.sampleStratified(s, d)),
    "sample_stratified_capped" -> ((s, d) => Pipeline.sampleStratifiedCapped(s, d)),
    "data_shuffle" -> ((s, d) => Pipeline.dataShuffle(s, d)),
    "data_pack_shuffled" -> ((s, d) => Pipeline.packShuffled(s, d)),
    "data_budget_trim" -> ((s, d) => Pipeline.dataBudgetTrim(s, d)),
    "data_curriculum" -> ((s, d) => Pipeline.dataCurriculum(s, d)),
    "ship_manifest" -> ((s, d) => Pipeline.shipManifest(s, d)),
  )

  private val Tok = """\b[a-z]+\b""" // RE2 string for DuckDB (ASCII text only)

  /** Unrolled-BPE CTE chain — the oracle twin of TextAnalytics.vocabTrain's
    * driver loop, one CTE stage per merge (SQL has no iterate-until-argmax,
    * so the n iterations unroll; the chain is program-generated, which is
    * why it can afford to be explicit). Stage k: positions → weighted
    * adjacent-pair counts → 1-row argmax m{k+1} → greedy NON-OVERLAPPING
    * left-to-right merge application. Greediness in set-based SQL: a
    * candidate position survives iff its offset from the start of its run
    * of CONSECUTIVE candidates is even (runs only arise when lhs = rhs,
    * e.g. merging (a,a) in "aaaa" → aa|aa not a|aa|a); consumed positions
    * (the right half of a selected pair) are dropped by the lag() guard.
    * Ends with bpe_merges(merge_rank, lhs, rhs, merged, pair_cnt); with
    * `finalSeg` the last merge's application also runs, so seg-N (the
    * corpus vocabulary encoded by the full merge sequence — BPE inference)
    * is available to the tokenize_bpe oracle. */
  private def bpeCtes(n: Int, finalSeg: Boolean = false): String = {
    val sb = new StringBuilder
    sb ++= s"bpe_words AS (SELECT w AS word, count(*) AS cnt FROM (SELECT unnest(regexp_extract_all(lower(text), '$Tok')) AS w FROM documents) GROUP BY 1), "
    sb ++= "seg0 AS (SELECT word, cnt, regexp_extract_all(word, '[a-z]') AS pieces FROM bpe_words)"
    // AS MATERIALIZED is load-bearing: each stage references pos$k twice
    // (pair counts + merge application) — inlined, the 12-stage chain
    // re-expands its whole prefix per reference (2^n plan blowup).
    for (k <- 0 until n) {
      sb ++= s", pos$k AS MATERIALIZED (SELECT word, cnt, pieces, unnest(range(1, len(pieces) + 1)) AS i FROM seg$k)"
      sb ++= s", pr$k AS (SELECT pieces[i] AS lhs, pieces[i+1] AS rhs, sum(cnt) AS c FROM pos$k WHERE i < len(pieces) GROUP BY 1, 2)"
      sb ++= s", m${k + 1} AS MATERIALIZED (SELECT lhs, rhs, c FROM pr$k ORDER BY c DESC, lhs, rhs LIMIT 1)"
      if (k < n - 1 || finalSeg) {
        sb ++= s", cand$k AS (SELECT word, cnt, pieces, i, coalesce(i < len(pieces) AND pieces[i] = m.lhs AND pieces[i+1] = m.rhs, false) AS cand FROM pos$k LEFT JOIN m${k + 1} m ON true)"
        sb ++= s", run$k AS (SELECT word, cnt, pieces, i, cand, i - row_number() OVER (PARTITION BY word, cand ORDER BY i) AS grp FROM cand$k)"
        sb ++= s", sel$k AS (SELECT word, cnt, pieces, i, cand AND ((i - min(i) OVER (PARTITION BY word, cand, grp)) % 2 = 0) AS sel FROM run$k)"
        sb ++= s", emit$k AS (SELECT word, cnt, i, CASE WHEN sel THEN pieces[i] || pieces[i+1] ELSE pieces[i] END AS piece, coalesce(lag(sel) OVER (PARTITION BY word ORDER BY i), false) AS consumed FROM sel$k)"
        sb ++= s", seg${k + 1} AS MATERIALIZED (SELECT word, cnt, list(piece ORDER BY i) AS pieces FROM emit$k WHERE NOT consumed GROUP BY word, cnt)"
      }
    }
    sb ++= ", bpe_merges AS (" + (1 to n).map(k =>
      s"SELECT CAST($k AS BIGINT) AS merge_rank, lhs, rhs, lhs || rhs AS merged, CAST(c AS BIGINT) AS pair_cnt FROM m$k").mkString(" UNION ALL ") + ")"
    sb.toString
  }

  // Unrolled k-core peeling rounds over the co-supply `edges` CTE:
  // kd0 = raw degree, then per round ka_i (survivors at ≥ k) and kd_i
  // (degree restricted to survivors). AS MATERIALIZED on both: each
  // ka_i is referenced twice (both join sides) — inlined, the chain
  // re-expands its prefix exponentially.
  // Shared kNN-graph CTE chain (banded sign projections, celebrity-bucket
  // cap, mirrored half-pairs, exact-cosine scoring, per-src ranking) —
  // ends with r(src, dst, sim_e4, rn). sim_knn_graph and the graph-ANN
  // beam search read the same graph by construction.
  private val KnnGraphCtes =
    s"""n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings), planes AS (SELECT j, list_transform(range(0, 64), k -> CAST((1103515245 * (j * 64 + k + 1) + 12345) % 1000003 AS DOUBLE) / 1000003.0 - 0.5) AS p FROM range(0, 32) t(j)), proj AS (SELECT vec_id, j, CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), i -> v[i] * p[i])), (a, x) -> a + x) > 0 THEN 1 ELSE 0 END AS bit FROM n, planes), keys AS (SELECT vec_id, j // 4 AS band_idx, sum(bit * (1 << (j % 4))) AS band_key FROM proj GROUP BY vec_id, j // 4), elig AS (SELECT band_idx, band_key FROM keys GROUP BY band_idx, band_key HAVING count(*) <= ${graft.operators.Similarity.KnnBucketCap}), ck AS (SELECT k.vec_id, k.band_idx, k.band_key FROM keys k JOIN elig e ON k.band_idx = e.band_idx AND k.band_key = e.band_key), half AS (SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst FROM ck a JOIN ck b ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.vec_id < b.vec_id), cand AS (SELECT src, dst FROM half UNION ALL SELECT dst AS src, src AS dst FROM half), s AS (SELECT c.src, c.dst, CAST(round(list_inner_product(x.v, y.v) / (x.nrm * y.nrm) * 10000) AS BIGINT) AS sim_e4 FROM cand c JOIN n x ON c.src = x.vec_id JOIN n y ON c.dst = y.vec_id), r AS (SELECT src, dst, sim_e4, row_number() OVER (PARTITION BY src ORDER BY sim_e4 DESC, dst) AS rn FROM s)"""

  // The NAVIGABLE graph's edge set over the shared kNN-graph CTEs (needs
  // n, ck and r in scope) — the round-15 BANDED build the beam walks
  // consume: the banded kNN edges ∪ per-node up-links to the nearest
  // coarse-layer node AMONG BAND-BUCKET MATES (the same ck candidate
  // chain one level up; bucket-miss vectors fall back to the entry's
  // cell) ∪ capped down-links (each coarse node's NavDownCap best
  // members) ∪ the coarse-coarse highway (NavHighwayK nearest among
  // coarse bucket-mates). Ends with ge(src, dst), the set the engine's
  // navgraph product stores.
  private val NavGraphCtes: String = {
    val sim = (x: String, y: String) =>
      s"CAST(round(list_inner_product($x.v, $y.v) / ($x.nrm * $y.nrm) * 10000) AS BIGINT)"
    val coarseMod = graft.operators.Similarity.CoarseMod
    val entry = graft.operators.Similarity.GraphEntry
    s"gcoarse AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % $coarseMod = 0), " +
    s"gupc AS (SELECT DISTINCT a.vec_id, b.vec_id AS cc FROM ck a JOIN ck b ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND b.vec_id % $coarseMod = 0 AND a.vec_id <> b.vec_id), " +
    s"gupb AS (SELECT vec_id AS src, cc AS dst, cs FROM (SELECT g.vec_id, g.cc, ${sim("x", "c")} AS cs, row_number() OVER (PARTITION BY g.vec_id ORDER BY ${sim("x", "c")} DESC, g.cc) AS rn FROM gupc g JOIN n x ON g.vec_id = x.vec_id JOIN n c ON g.cc = c.vec_id) WHERE rn = 1), " +
    s"gup AS (SELECT src, dst, cs FROM gupb UNION ALL SELECT x.vec_id AS src, CAST($entry AS BIGINT) AS dst, ${sim("x", "e")} AS cs FROM n x JOIN n e ON e.vec_id = $entry WHERE x.vec_id <> $entry AND NOT EXISTS (SELECT 1 FROM gupb u WHERE u.src = x.vec_id)), " +
    s"gdown AS (SELECT dst AS src, src AS dst FROM (SELECT src, dst, row_number() OVER (PARTITION BY dst ORDER BY cs DESC, src) AS rn FROM gup) WHERE rn <= ${graft.operators.Similarity.NavDownCap}), " +
    s"ghwc AS (SELECT DISTINCT a.vec_id AS a, b.vec_id AS b FROM ck a JOIN ck b ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.vec_id % $coarseMod = 0 AND b.vec_id % $coarseMod = 0 AND a.vec_id <> b.vec_id), " +
    s"ghw AS (SELECT a AS src, b AS dst FROM (SELECT h.a, h.b, row_number() OVER (PARTITION BY h.a ORDER BY ${sim("x", "y")} DESC, h.b) AS rn FROM ghwc h JOIN n x ON h.a = x.vec_id JOIN n y ON h.b = y.vec_id) WHERE rn <= ${graft.operators.Similarity.NavHighwayK}), " +
    s"gmir AS (SELECT dst AS src, src AS dst FROM (SELECT src, dst, row_number() OVER (PARTITION BY dst ORDER BY sim_e4 DESC, src) AS mrn FROM r WHERE rn <= ${graft.operators.Similarity.KnnK}) WHERE mrn <= ${graft.operators.Similarity.NavMirrorCap}), " +
    s"ge AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM r WHERE rn <= ${graft.operators.Similarity.KnnK} UNION ALL SELECT src, dst FROM gmir UNION ALL SELECT src, dst FROM gup UNION ALL SELECT src, dst FROM gdown UNION ALL SELECT src, dst FROM ghw) WHERE src <> dst)"
  }

  // The incremental-insert DELTA over the shared kNN-graph CTEs (needs
  // n and ck in scope) — the last NavInsertBatch vec_ids play arrivals;
  // ends with iall(src, dst, edge_class) plus icut(cut) for consumers.
  private val NavInsertCtes: String = {
    val sim = "CAST(round(list_inner_product(x.v, y.v) / (x.nrm * y.nrm) * 10000) AS BIGINT)"
    val k = graft.operators.Similarity.KnnK
    val coarseMod = graft.operators.Similarity.CoarseMod
    val entry = graft.operators.Similarity.GraphEntry
    s"icut AS (SELECT max(vec_id) - ${graft.operators.Similarity.NavInsertBatch} + 1 AS cut FROM n), " +
    "ick AS (SELECT k.vec_id, k.band_idx, k.band_key FROM ck k, icut WHERE k.vec_id >= icut.cut), " +
    "iknnc AS (SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst FROM ick a JOIN ck b ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.vec_id <> b.vec_id), " +
    "iknn AS (SELECT src, dst, sim_e4, row_number() OVER (PARTITION BY src ORDER BY sim_e4 DESC, dst) AS rn FROM (SELECT c.src, c.dst, CAST(round(list_inner_product(x.v, y.v) / (x.nrm * y.nrm) * 10000) AS BIGINT) AS sim_e4 FROM iknnc c JOIN n x ON c.src = x.vec_id JOIN n y ON c.dst = y.vec_id)), " +
    s"iknne AS (SELECT src, dst, sim_e4 FROM iknn WHERE rn <= $k), " +
    s"imir AS (SELECT dst AS src, src AS dst FROM (SELECT src, dst, row_number() OVER (PARTITION BY dst ORDER BY sim_e4 DESC, src) AS mrn FROM iknne) WHERE mrn <= ${graft.operators.Similarity.NavMirrorCap}), " +
    s"iupc AS (SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst FROM ick a JOIN ck b ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND b.vec_id % $coarseMod = 0 AND a.vec_id <> b.vec_id), " +
    s"iupb AS (SELECT src, dst, cs FROM (SELECT c.src, c.dst, $sim AS cs, row_number() OVER (PARTITION BY c.src ORDER BY $sim DESC, c.dst) AS rn FROM iupc c JOIN n x ON c.src = x.vec_id JOIN n y ON c.dst = y.vec_id) WHERE rn = 1), " +
    s"iup AS (SELECT src, dst, cs FROM iupb UNION ALL SELECT x.vec_id AS src, CAST($entry AS BIGINT) AS dst, $sim AS cs FROM n x JOIN n y ON y.vec_id = $entry, icut WHERE x.vec_id >= icut.cut AND x.vec_id <> $entry AND NOT EXISTS (SELECT 1 FROM iupb u WHERE u.src = x.vec_id)), " +
    s"idown AS (SELECT dst AS src, src AS dst FROM (SELECT src, dst, row_number() OVER (PARTITION BY dst ORDER BY cs DESC, src) AS rn FROM iup) WHERE rn <= ${graft.operators.Similarity.NavDownCap}), " +
    s"ihwc AS (SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst FROM ick a JOIN ck b ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.vec_id % $coarseMod = 0 AND b.vec_id % $coarseMod = 0 AND a.vec_id <> b.vec_id), " +
    s"ihw AS (SELECT src, dst FROM (SELECT c.src, c.dst, row_number() OVER (PARTITION BY c.src ORDER BY $sim DESC, c.dst) AS rn FROM ihwc c JOIN n x ON c.src = x.vec_id JOIN n y ON c.dst = y.vec_id) WHERE rn <= ${graft.operators.Similarity.NavHighwayK}), " +
    "iall AS (SELECT src, dst, 'knn' AS edge_class FROM iknne UNION ALL SELECT src, dst, 'mirror' AS edge_class FROM imir UNION ALL SELECT src, dst, 'up' AS edge_class FROM iup UNION ALL SELECT src, dst, 'down' AS edge_class FROM idown UNION ALL SELECT src, dst, 'hw' AS edge_class FROM ihw)"
  }

  // SEQUENTIAL-insert delta CTEs: batch b's delta is the NavInsertCtes
  // chain computed over the corpus PREFIX visible at its arrival time —
  // band-bucket eligibility re-derived per prefix (occupancy counts
  // only vectors that have arrived), arrivals = [c0+(b-1)*size,
  // c0+b*size). Ends with t{b}d(src, dst) per batch plus scut(c0).
  private def navSeqCtes(batches: Int, size: Long): String = {
    val sim = "CAST(round(list_inner_product(x.v, y.v) / (x.nrm * y.nrm) * 10000) AS BIGINT)"
    val k = graft.operators.Similarity.KnnK
    val cap = graft.operators.Similarity.KnnBucketCap
    val coarseMod = graft.operators.Similarity.CoarseMod
    val entry = graft.operators.Similarity.GraphEntry
    val sb = new StringBuilder
    sb ++= s"scut AS (SELECT max(vec_id) - ${batches * size} + 1 AS c0 FROM n)"
    for (b <- 1 to batches) {
      val lo = s"scut.c0 + ${(b - 1) * size}"
      val hi = s"scut.c0 + ${b * size}"
      val p = s"t$b"
      sb ++= s", ${p}e AS (SELECT band_idx, band_key FROM keys k, scut WHERE k.vec_id < $hi GROUP BY band_idx, band_key HAVING count(*) <= $cap)"
      sb ++= s", ${p}ck AS (SELECT k.vec_id, k.band_idx, k.band_key FROM keys k, ${p}e e, scut WHERE k.band_idx = e.band_idx AND k.band_key = e.band_key AND k.vec_id < $hi)"
      sb ++= s", ${p}ick AS (SELECT c.vec_id, c.band_idx, c.band_key FROM ${p}ck c, scut WHERE c.vec_id >= $lo)"
      sb ++= s", ${p}knnc AS (SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst FROM ${p}ick a JOIN ${p}ck b ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.vec_id <> b.vec_id)"
      sb ++= s", ${p}knn AS (SELECT src, dst, sim_e4, row_number() OVER (PARTITION BY src ORDER BY sim_e4 DESC, dst) AS rn FROM (SELECT c.src, c.dst, $sim AS sim_e4 FROM ${p}knnc c JOIN n x ON c.src = x.vec_id JOIN n y ON c.dst = y.vec_id))"
      sb ++= s", ${p}knne AS (SELECT src, dst, sim_e4 FROM ${p}knn WHERE rn <= $k)"
      sb ++= s", ${p}mir AS (SELECT dst AS src, src AS dst FROM (SELECT src, dst, row_number() OVER (PARTITION BY dst ORDER BY sim_e4 DESC, src) AS mrn FROM ${p}knne) WHERE mrn <= ${graft.operators.Similarity.NavMirrorCap})"
      sb ++= s", ${p}upc AS (SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst FROM ${p}ick a JOIN ${p}ck b ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND b.vec_id % $coarseMod = 0 AND a.vec_id <> b.vec_id)"
      sb ++= s", ${p}upb AS (SELECT src, dst, cs FROM (SELECT c.src, c.dst, $sim AS cs, row_number() OVER (PARTITION BY c.src ORDER BY $sim DESC, c.dst) AS rn FROM ${p}upc c JOIN n x ON c.src = x.vec_id JOIN n y ON c.dst = y.vec_id) WHERE rn = 1)"
      sb ++= s", ${p}up AS (SELECT src, dst, cs FROM ${p}upb UNION ALL SELECT x.vec_id AS src, CAST($entry AS BIGINT) AS dst, $sim AS cs FROM n x JOIN n y ON y.vec_id = $entry, scut WHERE x.vec_id >= $lo AND x.vec_id < $hi AND x.vec_id <> $entry AND NOT EXISTS (SELECT 1 FROM ${p}upb u WHERE u.src = x.vec_id))"
      sb ++= s", ${p}down AS (SELECT dst AS src, src AS dst FROM (SELECT src, dst, row_number() OVER (PARTITION BY dst ORDER BY cs DESC, src) AS rn FROM ${p}up) WHERE rn <= ${graft.operators.Similarity.NavDownCap})"
      sb ++= s", ${p}hwc AS (SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst FROM ${p}ick a JOIN ${p}ck b ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.vec_id % $coarseMod = 0 AND b.vec_id % $coarseMod = 0 AND a.vec_id <> b.vec_id)"
      sb ++= s", ${p}hw AS (SELECT src, dst FROM (SELECT c.src, c.dst, row_number() OVER (PARTITION BY c.src ORDER BY $sim DESC, c.dst) AS rn FROM ${p}hwc c JOIN n x ON c.src = x.vec_id JOIN n y ON c.dst = y.vec_id) WHERE rn <= ${graft.operators.Similarity.NavHighwayK})"
      // AS MATERIALIZED is load-bearing (the bpeCtes/eval_nav_insert
      // rule): each delta feeds every later cumulative state and each
      // state feeds 6 walk rounds — inlined, DuckDB re-expands the
      // banded chain per reference and the oracle runs for tens of
      // minutes instead of seconds.
      sb ++= s", ${p}d AS MATERIALIZED (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM ${p}knne UNION ALL SELECT src, dst FROM ${p}mir UNION ALL SELECT src, dst FROM ${p}up UNION ALL SELECT src, dst FROM ${p}down UNION ALL SELECT src, dst FROM ${p}hw) WHERE src <> dst)"
    }
    sb ++= ", sg0 AS MATERIALIZED (SELECT g.src, g.dst FROM ge g, scut WHERE g.src < scut.c0 AND g.dst < scut.c0)"
    for (b <- 1 to batches)
      sb ++= s", sg$b AS MATERIALIZED (SELECT src, dst FROM sg${b - 1} UNION SELECT src, dst FROM t${b}d)"
    sb.toString
  }

  // Unrolled graph-ANN beam rounds over the shared kNN-graph + navigable
  // edge CTEs (needs n, r, and ge in scope): fixed entry, per-round
  // out-neighbor expansion + exact re-score + top-GraphBeam keep. Ends
  // with gb{GraphRounds}(qid, cid, sim_e4). sim_graph_topk and its
  // recall monitor walk identically.
  private def graphBeamCtes(gb0Sql: String, rounds: Int,
      extra: String = "", prefix: String = "",
      edgeCte: String = "ge"): String = {
    val beam = graft.operators.Similarity.GraphBeam
    val p = prefix
    val sb = new StringBuilder
    sb ++= s"${p}gq AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < 10), "
    if (extra.nonEmpty) sb ++= extra + ", "
    sb ++= s"${p}gb0 AS ($gb0Sql), "
    for (i <- 1 to rounds) {
      sb ++= s"${p}gx$i AS (SELECT DISTINCT qid, cid FROM (SELECT b.qid, e.dst AS cid FROM ${p}gb${i - 1} b JOIN $edgeCte e ON b.cid = e.src UNION ALL SELECT qid, cid FROM ${p}gb${i - 1})), "
      sb ++= s"${p}gs$i AS (SELECT x.qid, x.cid, CAST(round(list_inner_product(cv.v, q.qv) / (cv.nrm * q.qn) * 10000) AS BIGINT) AS sim_e4 FROM ${p}gx$i x JOIN n cv ON x.cid = cv.vec_id JOIN ${p}gq q ON x.qid = q.qid), "
      sb ++= s"${p}gb$i AS MATERIALIZED (SELECT qid, cid, sim_e4 FROM (SELECT qid, cid, sim_e4, row_number() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, cid) AS rn FROM ${p}gs$i) WHERE rn <= $beam)"
      sb ++= (if (i < rounds) ", " else "")
    }
    sb.toString
  }

  private val GraphBeamCtes: String = graphBeamCtes(
    s"SELECT q.qid, CAST(${graft.operators.Similarity.GraphEntry} AS BIGINT) AS cid, CAST(round(list_inner_product(x.v, q.qv) / (x.nrm * q.qn) * 10000) AS BIGINT) AS sim_e4 FROM gq q JOIN n x ON x.vec_id = ${graft.operators.Similarity.GraphEntry}",
    graft.operators.Similarity.GraphRounds)

  // Layered entry: per-query best-LayeredEntryK over the deterministic
  // coarse layer (gcoarse, defined by NavGraphCtes) — HNSW's ef > 1
  // descent, covering the cell-boundary misses of the banded build —
  // then the same beam rounds from there.
  private val GraphLayeredCtes: String = graphBeamCtes(
    "SELECT e.qid, e.cid, CAST(round(list_inner_product(x.v, q.qv) / (x.nrm * q.qn) * 10000) AS BIGINT) AS sim_e4 FROM gent e JOIN n x ON e.cid = x.vec_id JOIN gq q ON e.qid = q.qid",
    graft.operators.Similarity.LayeredRounds,
    extra =
      s"gent AS (SELECT qid, cid FROM (SELECT q.qid, c.vec_id AS cid, row_number() OVER (PARTITION BY q.qid ORDER BY CAST(round(list_inner_product(q.qv, c.v) / (q.qn * c.nrm) * 10000) AS BIGINT) DESC, c.vec_id) AS rn FROM gq q, gcoarse c) WHERE rn <= ${graft.operators.Similarity.LayeredEntryK})")

  // Banded-entry layered walk: entry candidates from the query's coarse
  // bucket-mates (the raw `keys` CTE — pre-eligibility, both sides
  // layer-/query-sized), exact-scored, top-LayeredEntryK, fixed-entry
  // fallback on a full band miss; then the same beam rounds.
  private val GraphLayeredBandedCtes: String = graphBeamCtes(
    "SELECT e.qid, e.cid, CAST(round(list_inner_product(x.v, q.qv) / (x.nrm * q.qn) * 10000) AS BIGINT) AS sim_e4 FROM gent e JOIN n x ON e.cid = x.vec_id JOIN gq q ON e.qid = q.qid",
    graft.operators.Similarity.LayeredRounds,
    extra =
      s"gbq AS (SELECT vec_id AS qid, band_idx, band_key FROM keys WHERE vec_id < 10), " +
      s"gbc AS (SELECT vec_id AS cc, band_idx, band_key FROM keys WHERE vec_id % ${graft.operators.Similarity.CoarseMod} = 0), " +
      "gbcand AS (SELECT DISTINCT q.qid, c.cc FROM gbq q JOIN gbc c ON q.band_idx = c.band_idx AND q.band_key = c.band_key AND q.qid <> c.cc), " +
      s"gbent0 AS (SELECT qid, cc AS cid FROM (SELECT g.qid, g.cc, row_number() OVER (PARTITION BY g.qid ORDER BY CAST(round(list_inner_product(q.qv, c.v) / (q.qn * c.nrm) * 10000) AS BIGINT) DESC, g.cc) AS rn FROM gbcand g JOIN gq q ON g.qid = q.qid JOIN n c ON g.cc = c.vec_id) WHERE rn <= ${graft.operators.Similarity.LayeredEntryK}), " +
      s"gent AS (SELECT qid, cid FROM gbent0 UNION ALL SELECT q.qid, CAST(${graft.operators.Similarity.GraphEntry} AS BIGINT) AS cid FROM gq q WHERE NOT EXISTS (SELECT 1 FROM gbent0 e WHERE e.qid = q.qid))")

  // Three-layer hierarchical walk: L2 (vec_id % 1024 = 0) exact best-1
  // entry, a 2-round beam-6 descent over the COARSE-RESTRICTED nav
  // subgraph (hce — highway + coarse-coarse locals of the same ge the
  // L0 walk uses; no separate product), handoff of the best
  // LayeredEntryK coarse nodes, then the standard beam rounds. The
  // coarse-round count 3 is hierCoarseRoundsFor at the oracle corpus
  // (nCoarse = 16), as LayeredRounds is layeredRoundsFor(500).
  private val GraphHierCtes: String = {
    val sim = (x: String, q: String) =>
      s"CAST(round(list_inner_product($x.v, $q.qv) / ($x.nrm * $q.qn) * 10000) AS BIGINT)"
    val l2Mod = graft.operators.Similarity.L2Mod
    val coarseMod = graft.operators.Similarity.CoarseMod
    val cBeam = graft.operators.Similarity.HierCoarseBeam
    val coarseRounds = 3
    val sb = new StringBuilder
    sb ++= s"h2 AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % $l2Mod = 0), "
    sb ++= s"hce AS (SELECT src, dst FROM ge WHERE src % $coarseMod = 0 AND dst % $coarseMod = 0), "
    sb ++= s"hcb0 AS (SELECT qid, cid, cs FROM (SELECT q.qid, c2.vec_id AS cid, ${sim("c2", "q")} AS cs, row_number() OVER (PARTITION BY q.qid ORDER BY ${sim("c2", "q")} DESC, c2.vec_id) AS rn FROM h_gq q, h2 c2) WHERE rn = 1), "
    for (i <- 1 to coarseRounds) {
      sb ++= s"hcx$i AS (SELECT DISTINCT qid, cid FROM (SELECT b.qid, e.dst AS cid FROM hcb${i - 1} b JOIN hce e ON b.cid = e.src UNION ALL SELECT qid, cid FROM hcb${i - 1})), "
      sb ++= s"hcb$i AS (SELECT qid, cid, cs FROM (SELECT x.qid, x.cid, ${sim("cv", "q")} AS cs, row_number() OVER (PARTITION BY x.qid ORDER BY ${sim("cv", "q")} DESC, x.cid) AS rn FROM hcx$i x JOIN n cv ON x.cid = cv.vec_id JOIN h_gq q ON x.qid = q.qid) WHERE rn <= $cBeam), "
    }
    sb ++= s"h_gent AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY cs DESC, cid) AS rn FROM hcb$coarseRounds) WHERE rn <= ${graft.operators.Similarity.LayeredEntryK})"
    graphBeamCtes(
      "SELECT e.qid, e.cid, CAST(round(list_inner_product(x.v, q.qv) / (x.nrm * q.qn) * 10000) AS BIGINT) AS sim_e4 FROM h_gent e JOIN n x ON e.cid = x.vec_id JOIN h_gq q ON e.qid = q.qid",
      graft.operators.Similarity.LayeredRounds, prefix = "h_",
      extra = sb.toString)
  }

  // Entry-strategy decision table: three independent beam chains
  // (prefixes f_/l_/b_), each at its strategy's production round
  // budget, aggregated against the shared brute CTEs.
  private val GraphEntryEvalCtes: String = {
    val entry = graft.operators.Similarity.GraphEntry
    val ek = graft.operators.Similarity.LayeredEntryK
    val coarseMod = graft.operators.Similarity.CoarseMod
    def fixedGb0(p: String) =
      s"SELECT q.qid, CAST($entry AS BIGINT) AS cid, CAST(round(list_inner_product(x.v, q.qv) / (x.nrm * q.qn) * 10000) AS BIGINT) AS sim_e4 FROM ${p}gq q JOIN n x ON x.vec_id = $entry"
    def gentGb0(p: String) =
      s"SELECT e.qid, e.cid, CAST(round(list_inner_product(x.v, q.qv) / (x.nrm * q.qn) * 10000) AS BIGINT) AS sim_e4 FROM ${p}gent e JOIN n x ON e.cid = x.vec_id JOIN ${p}gq q ON e.qid = q.qid"
    val fChain = graphBeamCtes(fixedGb0("f_"),
      graft.operators.Similarity.GraphRounds, prefix = "f_")
    val lChain = graphBeamCtes(gentGb0("l_"),
      graft.operators.Similarity.LayeredRounds, prefix = "l_",
      extra =
        s"l_gent AS (SELECT qid, cid FROM (SELECT q.qid, c.vec_id AS cid, row_number() OVER (PARTITION BY q.qid ORDER BY CAST(round(list_inner_product(q.qv, c.v) / (q.qn * c.nrm) * 10000) AS BIGINT) DESC, c.vec_id) AS rn FROM l_gq q, gcoarse c) WHERE rn <= $ek)")
    val bChain = graphBeamCtes(gentGb0("b_"),
      graft.operators.Similarity.LayeredRounds, prefix = "b_",
      extra =
        s"b_bq AS (SELECT vec_id AS qid, band_idx, band_key FROM keys WHERE vec_id < 10), " +
        s"b_bc AS (SELECT vec_id AS cc, band_idx, band_key FROM keys WHERE vec_id % $coarseMod = 0), " +
        "b_cand AS (SELECT DISTINCT q.qid, c.cc FROM b_bq q JOIN b_bc c ON q.band_idx = c.band_idx AND q.band_key = c.band_key AND q.qid <> c.cc), " +
        s"b_ent0 AS (SELECT qid, cc AS cid FROM (SELECT g.qid, g.cc, row_number() OVER (PARTITION BY g.qid ORDER BY CAST(round(list_inner_product(q.qv, c.v) / (q.qn * c.nrm) * 10000) AS BIGINT) DESC, g.cc) AS rn FROM b_cand g JOIN b_gq q ON g.qid = q.qid JOIN n c ON g.cc = c.vec_id) WHERE rn <= $ek), " +
        s"b_gent AS (SELECT qid, cid FROM b_ent0 UNION ALL SELECT q.qid, CAST($entry AS BIGINT) AS cid FROM b_gq q WHERE NOT EXISTS (SELECT 1 FROM b_ent0 e WHERE e.qid = q.qid))")
    s"$fChain, $lChain, $bChain"
  }

  // The unigram/Viterbi DP as reusable CTEs over `bpe_merges` scores and
  // any `words(word)` universe — shared by tokenize_unigram and the
  // three-way fertility eval so the DP cannot drift between them. Ends
  // with ${px}fin(word, k) where k = best_score·2^20 + (2^20−1−pieces).
  private def unigramDpCtes(words: String, px: String): String =
    s"${px}v2 AS (SELECT piece, score FROM (SELECT merged AS piece, pair_cnt AS score, row_number() OVER (PARTITION BY merged ORDER BY merge_rank) AS rn FROM bpe_merges) WHERE rn = 1), " +
    s"${px}vs AS (SELECT COALESCE(max(length(piece)), 1) AS ml FROM ${px}v2), " +
    s"${px}vm AS (SELECT map(list(piece ORDER BY piece), list(score ORDER BY piece)) AS vm FROM ${px}v2), " +
    s"${px}dp AS (SELECT word, 1 AS p, [CAST(1048575 AS BIGINT)] AS ks FROM $words " +
    s"UNION ALL SELECT d.word, d.p + 1, list_append(d.ks, list_max(list_filter(list_transform(range(greatest(0, d.p - v.ml), CAST(d.p AS BIGINT)), j -> CASE WHEN d.p - j = 1 THEN d.ks[CAST(j AS INTEGER) + 1] - 1 WHEN len(map_extract(m.vm, substr(d.word, CAST(j AS INTEGER) + 1, CAST(d.p - j AS INTEGER)))) > 0 THEN d.ks[CAST(j AS INTEGER) + 1] + map_extract(m.vm, substr(d.word, CAST(j AS INTEGER) + 1, CAST(d.p - j AS INTEGER)))[1] * 1048576 - 1 ELSE NULL END), x -> x IS NOT NULL))) FROM ${px}dp d, ${px}vm m, ${px}vs v WHERE d.p <= length(d.word)), " +
    s"${px}fin AS (SELECT word, ks[-1] AS k FROM ${px}dp WHERE p = length(word) + 1)"

  // Unrolled synchronous label-propagation rounds over the co-supply
  // edges: per round, count each node's neighbor labels and take the
  // smallest among the most frequent (row_number by (count desc, label
  // asc) — the SQL twin of the Scala side's min-struct argmax). Round
  // count must equal Graph.LpaRounds exactly: synchronous LPA is not
  // fixpoint-stable, so extra rounds are not no-ops.
  private def lpaCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= "pund AS (SELECT a AS u, b AS v FROM edges UNION ALL SELECT b AS u, a AS v FROM edges)"
    sb ++= ", pl0 AS MATERIALIZED (SELECT DISTINCT u, u AS lbl FROM pund)"
    for (i <- 1 to rounds) {
      sb ++= s", pc$i AS (SELECT e.u, l.lbl, count(*) AS c FROM pund e JOIN pl${i - 1} l ON e.v = l.u GROUP BY e.u, l.lbl)"
      sb ++= s", pl$i AS MATERIALIZED (SELECT u, lbl FROM (SELECT u, lbl, row_number() OVER (PARTITION BY u ORDER BY c DESC, lbl) AS rn FROM pc$i) WHERE rn = 1)"
    }
    sb.toString
  }

  private def kcoreCtes(k: Long, rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= "kund AS (SELECT a AS u, b AS v FROM edges UNION ALL SELECT b AS u, a AS v FROM edges)"
    sb ++= ", kd0 AS MATERIALIZED (SELECT u, count(*) AS dg FROM kund GROUP BY u)"
    for (i <- 1 to rounds) {
      sb ++= s", ka$i AS MATERIALIZED (SELECT u FROM kd${i - 1} WHERE dg >= $k)"
      sb ++= s", kd$i AS MATERIALIZED (SELECT e.u, count(*) AS dg FROM kund e JOIN ka$i x ON e.u = x.u JOIN ka$i y ON e.v = y.u GROUP BY e.u)"
    }
    sb.toString
  }

  // Shared sample-order hash CTEs: polyHash of '<salt>'||doc_id, then the
  // mix32 avalanche (xor-shift-multiply ×2 — Fns.mix32's twin) so the
  // VALUE is uniform on [0, P) for the threshold pre-filter. Ends with
  // h(doc_id, <carry>, hh). Different salts = independent sample orders
  // (the Spark side's Pipeline.orderHash twin).
  private def orderHashCtes(salt: String, carry: String): String =
    s"""p0 AS (SELECT doc_id, $carry, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(s) + 1), i -> CAST(ascii(substr(s, i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295) AS h0 FROM (SELECT doc_id, $carry, '$salt' || CAST(doc_id AS VARCHAR) AS s FROM documents)), p1 AS (SELECT doc_id, $carry, (xor(h0 >> 16, h0) * 73244475) & 4294967295 AS x1 FROM p0), p2 AS (SELECT doc_id, $carry, (xor(x1 >> 16, x1) * 73244475) & 4294967295 AS x2 FROM p1), h AS (SELECT doc_id, $carry, xor(x2 >> 16, x2) % 1000000007 AS hh FROM p2)"""

  private val StratHashCtes = orderHashCtes("strat:", "lang")

  // One largest-remainder allocation chain of the temperature sweep
  // (eval_mix_temperature): weight expression `wExpr` over the shared
  // source-count CTE `c`, labeled tau_e1 = `tau`. Ends with
  // t<tau>(tau_e1, source, n_source, w, target, budget, ntot) — the
  // exact integer rule Pipeline.temperatureTargetsW runs.
  private def tempSweepChain(tau: Int, wExpr: String): String =
    s"""c$tau AS (SELECT source, n_source, CAST($wExpr AS BIGINT) AS w FROM c), tot$tau AS (SELECT CAST(sum(w) AS BIGINT) AS wsum, CAST(sum(n_source) AS BIGINT) AS ntot FROM c$tau), t0$tau AS (SELECT source, n_source, w, ((ntot // 2) * w) // wsum AS base, ((ntot // 2) * w) % wsum AS rem, ntot // 2 AS budget, ntot FROM c$tau CROSS JOIN tot$tau), lo$tau AS (SELECT CAST(max(budget) - sum(base) AS BIGINT) AS leftover FROM t0$tau), t$tau AS (SELECT CAST($tau AS BIGINT) AS tau_e1, source, n_source, w, least(n_source, base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source) <= leftover THEN 1 ELSE 0 END) AS target, budget, ntot FROM t0$tau CROSS JOIN lo$tau)"""

  // Shared packed-offset CTEs over the shuffled training order (tokenize,
  // exclusive prefix window on (hh, doc_id)) — data_pack_shuffled and
  // data_budget_trim state identical offsets by construction, which is
  // exactly the trim's whole-document/nesting guarantee. Ends with
  // o(doc_id, n_toks, "offset").
  private val PackShuffledCtes =
    s"""${orderHashCtes("shuf:", "text")}, t AS (SELECT doc_id, hh, CAST(len(regexp_extract_all(lower(text), '$Tok')) AS BIGINT) AS n_toks FROM h), o AS (SELECT doc_id, n_toks, CAST(sum(n_toks) OVER (ORDER BY hh, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_toks AS BIGINT) AS "offset" FROM t)"""

  /** corpus_clean's gate CTEs (quality + language flags, exact-dedup
    * survivors) — shared by the three oracles that compose them so the
    * gates cannot drift. Ends with flags(doc_id, quality_ok, lang_match)
    * and surv(doc_id). */
  private def cleanFlagCtes: String =
    s"""t AS (SELECT doc_id, lang, regexp_extract_all(lower(text), '$Tok') AS w FROM documents), s AS (SELECT doc_id, lang, CAST(len(w) AS BIGINT) AS n_toks, CAST(len(list_filter(w, x -> list_contains(['the','a','and','of','is','to','in'], x))) AS BIGINT) AS stop_hits, CAST(len(list_filter(w, x -> list_contains(['the','a','and','of','is'], x))) AS BIGINT) AS en_s, CAST(len(list_filter(w, x -> list_contains(['der','die','das','und','ist'], x))) AS BIGINT) AS de_s, CAST(len(list_filter(w, x -> list_contains(['el','la','los','que','y'], x))) AS BIGINT) AS es_s, CAST(len(list_filter(w, x -> list_contains(['le','les','des','et','est'], x))) AS BIGINT) AS fr_s FROM t), flags AS (SELECT doc_id, CAST(CASE WHEN n_toks >= 5 AND stop_hits > 0 THEN 1 ELSE 0 END AS BIGINT) AS quality_ok, CAST(CASE WHEN (CASE WHEN en_s >= de_s AND en_s >= es_s AND en_s >= fr_s AND en_s > 0 THEN 'en' WHEN de_s >= es_s AND de_s >= fr_s AND de_s > 0 THEN 'de' WHEN es_s >= fr_s AND es_s > 0 THEN 'es' WHEN fr_s > 0 THEN 'fr' ELSE 'und' END) = lang THEN 1 ELSE 0 END AS BIGINT) AS lang_match FROM s), surv AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text)"""

  /** Unrolled PageRank CTE chain — Graph.pagerank's fixed-round loop, one
    * (contrib, rank) CTE pair per round, all-BIGINT (DuckDB `//` on
    * non-negatives = Spark `div`). Ends with r<n>(node_id, r). */
  private def pagerankCtes(iters: Int): String = {
    import graft.operators.Graph.{PrScale, PrDampNum, PrDampDen}
    val sb = new StringBuilder
    sb ++= "eraw AS (SELECT o_custkey * 2 AS cnode, l_suppkey * 2 + 1 AS snode, count(*) AS cnt FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1, 2)"
    sb ++= ", e0 AS (SELECT cnode AS src, snode AS dst, cnt FROM eraw UNION ALL SELECT snode AS src, cnode AS dst, cnt FROM eraw)"
    sb ++= ", ow AS (SELECT src, CAST(sum(cnt) AS BIGINT) AS wout FROM e0 GROUP BY src)"
    sb ++= ", e AS (SELECT e0.src, e0.dst, e0.cnt, ow.wout FROM e0 JOIN ow ON e0.src = ow.src)"
    sb ++= ", nodes AS (SELECT DISTINCT src AS node_id FROM e0)"
    sb ++= ", nn AS (SELECT count(*) AS n FROM nodes)"
    sb ++= s", r0 AS (SELECT node_id, CAST($PrScale // n AS BIGINT) AS r FROM nodes CROSS JOIN nn)"
    for (k <- 1 to iters) {
      sb ++= s", c$k AS (SELECT e.dst, CAST(sum((r.r * e.cnt) // e.wout) AS BIGINT) AS inflow FROM e JOIN r${k - 1} r ON e.src = r.node_id GROUP BY e.dst)"
      sb ++= s", r$k AS (SELECT nodes.node_id, CAST((${PrDampDen - PrDampNum} * ($PrScale // nn.n)) // $PrDampDen + ($PrDampNum * COALESCE(c$k.inflow, 0)) // $PrDampDen AS BIGINT) AS r FROM nodes CROSS JOIN nn LEFT JOIN c$k ON nodes.node_id = c$k.dst)"
    }
    sb.toString
  }

  /** Shared tail of the two wordpiece-fertility oracles: greedy
    * longest-match segmentation of every distinct word against `vocab`
    * (recursive walk; no match → 1-char step), then the per-doc rollup. */
  // The greedy longest-match walk CTEs (per-distinct-word piece counts
  // under whatever `vocab(piece)` CTE precedes them) — ends with
  // np(word, n_pieces). Shared by both per-doc fertility tails and the
  // per-source tokenizer-selection eval.
  private val WordpieceWalkCtes =
    s"""toks AS (SELECT doc_id, regexp_extract_all(lower(text), '$Tok') AS w FROM documents), occ AS (SELECT doc_id, unnest(w) AS word FROM toks), dw AS (SELECT DISTINCT word FROM occ), pos AS (SELECT word, unnest(range(1, length(word) + 1)) AS p FROM dw), mt AS (SELECT s.word, s.p, max(length(v.piece)) AS mstep FROM pos s JOIN vocab v ON substr(s.word, CAST(s.p AS INTEGER), length(v.piece)) = v.piece GROUP BY s.word, s.p), steps AS (SELECT pos.word, pos.p, COALESCE(mt.mstep, 1) AS step FROM pos LEFT JOIN mt ON pos.word = mt.word AND pos.p = mt.p), walk AS (SELECT word, CAST(1 AS BIGINT) AS p FROM dw UNION ALL SELECT w.word, w.p + s.step FROM walk w JOIN steps s ON s.word = w.word AND s.p = w.p WHERE w.p <= length(w.word)), np AS (SELECT word, count(*) AS n_pieces FROM walk WHERE p <= length(word) GROUP BY word)"""

  private val WordpieceTail =
    s"""$WordpieceWalkCtes, pd AS (SELECT o.doc_id, count(*) AS n_words, CAST(sum(np.n_pieces) AS BIGINT) AS n_pieces FROM occ o JOIN np ON o.word = np.word GROUP BY o.doc_id) SELECT d.doc_id, COALESCE(pd.n_words, 0) AS n_words, COALESCE(pd.n_pieces, 0) AS n_pieces, CAST(CASE WHEN pd.n_words IS NULL THEN 0 ELSE round(pd.n_pieces * 10000.0 / pd.n_words) END AS BIGINT) AS fertility_e4 FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id ORDER BY d.doc_id"""

  // SimHash in portable SQL: the 64-bit fingerprint draws bits 0-31 from the
  // 32-bit polynomial token hash (the text_fingerprint list_reduce twin) and
  // bits 32-63 from the independent salted hash of 's2#' || token, then
  // per-bit sign aggregation and fingerprint reassembly. All integer
  // arithmetic — order-independent sums — so both the fingerprint and the
  // Hamming-ball pair search hash-match the oracle. bit_or keeps BIGINT
  // (sum would widen to HUGEINT and diverge on the sign bit); bit 63 is the
  // explicit Long.MinValue literal because DuckDB overflow-checks 1 << 63.
  // LEFT JOIN back to documents gives token-less docs fingerprint 0, exactly
  // like the Spark aggregate over an empty token array.
  // Shared bigram-LM CTEs (corpus add-one-smoothed model, e4 fixed point —
  // text_lm_score's trained scorer) ending with scored(doc_id, n_bigrams,
  // lm_score_e4); text_lm_score reports it per doc, text_ccnet_bucket
  // splits its per-language distribution into thirds.
  private val LmCtes =
    s"""toks AS (SELECT doc_id, regexp_extract_all(lower(text), '$Tok') AS w FROM documents), tf AS (SELECT doc_id, bigram, count(*) AS tf FROM (SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram FROM toks) GROUP BY doc_id, bigram), bc AS (SELECT bigram, CAST(sum(tf) AS BIGINT) AS c_bi FROM tf GROUP BY bigram), hc AS (SELECT split_part(bigram, ' ', 1) AS hist, CAST(sum(c_bi) AS BIGINT) AS c_hist FROM bc GROUP BY 1), v AS (SELECT count(DISTINCT word) AS v FROM (SELECT unnest(regexp_extract_all(lower(text), '$Tok')) AS word FROM documents)), model AS (SELECT bigram, CAST(round(10000.0 * (c_bi + 1) / (c_hist + v.v)) AS BIGINT) AS p_e4 FROM bc JOIN hc ON split_part(bc.bigram, ' ', 1) = hc.hist CROSS JOIN v), scored AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams, CAST(sum(tf * p_e4) AS BIGINT) AS lm_score_e4 FROM tf JOIN model USING (bigram) GROUP BY doc_id)"""

  /** SimHash fingerprint CTE chain, with every CTE name prefixed by `p` so
    * it can compose in one WITH alongside kits that also define `toks`
    * (the sketch-evaluation query joins it with the shingle kit). Ends
    * with `${p}fpall(doc_id, simhash)`. */
  private def simhashChain(p: String): String =
    s"""${p}toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '$Tok')) AS w FROM documents), ${p}tw AS (SELECT doc_id, w, 's2#' || w AS w2 FROM ${p}toks), ${p}th AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(w) + 1), i -> CAST(ascii(substr(w, i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295) AS ha, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(w2) + 1), i -> CAST(ascii(substr(w2, i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295) AS hb FROM ${p}tw), ${p}bitsum AS (SELECT doc_id, j, sum(((CASE WHEN j < 32 THEN ha >> j ELSE hb >> (j - 32) END) & 1) * 2 - 1) AS sgn FROM ${p}th, range(0, 64) t(j) GROUP BY doc_id, j), ${p}fp AS (SELECT doc_id, CAST(bit_or(CASE WHEN sgn <= 0 THEN 0 WHEN j = 63 THEN (-9223372036854775807 - 1) ELSE (CAST(1 AS BIGINT) << j) END) AS BIGINT) AS simhash FROM ${p}bitsum GROUP BY doc_id), ${p}fpall AS (SELECT d.doc_id, COALESCE(f.simhash, 0) AS simhash FROM documents d LEFT JOIN ${p}fp f ON d.doc_id = f.doc_id)"""

  private val SimhashCtes = "WITH " + simhashChain("")

  // The simhash band-collision candidate pairs with their Hamming verify
  // (≤ 3) — ends with ham(d1, d2, hamming). dedup_simhash_pairs and the
  // edit-distance verify stage read the same candidate set by
  // construction.
  private val SimhashPairCtes =
    s"""$SimhashCtes, bands AS (SELECT doc_id, b AS band_idx, (simhash >> (b * 16)) & 65535 AS band_bits FROM fpall, range(0, 4) t(b)), cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2 FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.band_bits = b.band_bits AND a.doc_id < b.doc_id), ham AS (SELECT d1, d2, hamming FROM (SELECT d1, d2, CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming FROM cand JOIN fpall x ON d1 = x.doc_id JOIN fpall y ON d2 = y.doc_id) WHERE hamming <= 3)"""

  // MinHash in portable SQL: distinct 3-shingles (with the short-doc
  // whole-text fallback), the 32-bit polynomial shingle hash, K=32
  // per-permutation minima of (a_i·h + b_i) mod P — a_i < P ≈ 1e9 and
  // h < 2^32, so a·h + b < 2^63: no BIGINT overflow on either engine —
  // then 8 bands of 4 minima serialized "_"-joined. All integer
  // arithmetic, so buckets AND candidate pairs hash-match the oracle.
  // Common 3-shingle prefix (tokenize → distinct shingles with the
  // short-doc fallback) shared by the MinHash kit, the exact-Jaccard kit,
  // and the sketch-evaluation query that composes both in one WITH.
  private val ShingleCtes =
    s"""toks AS (SELECT doc_id, text, regexp_extract_all(lower(text), '$Tok') AS w FROM documents), sh AS (SELECT DISTINCT doc_id, sh FROM (SELECT doc_id, unnest(CASE WHEN len(w) >= 3 THEN list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) ELSE ['#' || text] END) AS sh FROM toks))"""

  private val MinhashTailCtes =
    """hv AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(sh) + 1), i -> CAST(ascii(substr(sh, i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295) AS h FROM sh), mins AS (SELECT doc_id, i, min((((1103515245 * (i + 1) + 7) % 1000000007) * h + ((12345 * (i + 1) + 678910) % 1000000007)) % 1000000007) AS m FROM hv, range(0, 32) t(i) GROUP BY doc_id, i), bands AS (SELECT doc_id, i // 4 AS band_idx, string_agg(CAST(m AS VARCHAR), '_' ORDER BY i) AS band_key FROM mins GROUP BY doc_id, i // 4)"""

  private val MinhashCtes = s"WITH $ShingleCtes, $MinhashTailCtes"

  // Shared banded sign-projection CTEs (6 bands × 6 bits, planes from the
  // same LCG as Similarity.plane) — dedup_embedding_lsh and
  // decontaminate_semantic band identically by construction.
  private val EmbLshCtes =
    """n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings), planes AS (SELECT j, list_transform(range(0, 64), k -> CAST((1103515245 * (j * 64 + k + 1) + 12345) % 1000003 AS DOUBLE) / 1000003.0 - 0.5) AS p FROM range(0, 36) t(j)), proj AS (SELECT vec_id, j, CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), i -> v[i] * p[i])), (a, x) -> a + x) > 0 THEN 1 ELSE 0 END AS bit FROM n, planes), keys AS (SELECT vec_id, j // 6 AS band_idx, sum(bit * (1 << (j % 6))) AS band_key FROM proj GROUP BY vec_id, j // 6)"""

  // Shared n-gram-Jaccard pipeline CTEs (shingles with the short-doc
  // fallback, df cap, per-doc counts, pair scores) — the pair query and the
  // connected-components clustering both build on `jpairs`.
  private val NgramTailCtes =
    """eligible AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 50), shf AS (SELECT s.doc_id, s.sh FROM sh s JOIN eligible e ON s.sh = e.sh), cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), cm AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id), jpairs AS (SELECT d1, d2, CAST(round(common * 10000.0 / (ca.n + cb.n - common)) AS BIGINT) AS jac_e4 FROM cm JOIN cnt ca ON d1 = ca.doc_id JOIN cnt cb ON d2 = cb.doc_id)"""

  // The Bloom decontamination chain as shared CTEs ending in the per-doc
  // frame `bdoc` — consumed by both decontaminate_bloom and its FP report.
  private val BloomDocCtes =
    s"""toks AS (SELECT doc_id, text, regexp_extract_all(lower(text), '$Tok') AS w FROM documents), sh AS (SELECT DISTINCT doc_id, sh FROM (SELECT doc_id, unnest(CASE WHEN len(w) >= 3 THEN list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) ELSE ['#' || text] END) AS sh FROM toks)), sps AS (SELECT doc_id, CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split FROM (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(s) + 1), i -> CAST(ascii(substr(s, i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295) % 100 AS bucket FROM (SELECT doc_id, 'split:' || CAST(doc_id AS VARCHAR) AS s FROM documents))), tsh AS (SELECT DISTINCT s.sh FROM sh s JOIN sps p ON s.doc_id = p.doc_id WHERE p.split = 'test'), bp AS (SELECT h % 2097152 AS p FROM (SELECT unnest([list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length('b1#' || sh) + 1), i -> CAST(ascii(substr('b1#' || sh, i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295), list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length('b2#' || sh) + 1), i -> CAST(ascii(substr('b2#' || sh, i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295)]) AS h FROM tsh)), bits AS (SELECT p // 64 AS w, bit_or(CASE WHEN p % 64 = 63 THEN (-9223372036854775807 - 1) ELSE (CAST(1 AS BIGINT) << CAST(p % 64 AS INTEGER)) END) AS bits FROM bp GROUP BY 1), corp AS (SELECT s.doc_id, s.sh, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length('b1#' || s.sh) + 1), i -> CAST(ascii(substr('b1#' || s.sh, i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295) % 2097152 AS p1, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length('b2#' || s.sh) + 1), i -> CAST(ascii(substr('b2#' || s.sh, i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295) % 2097152 AS p2 FROM sh s JOIN sps p ON s.doc_id = p.doc_id WHERE p.split <> 'test'), hit AS (SELECT c.doc_id, c.sh, CASE WHEN b1.bits IS NOT NULL AND ((b1.bits >> CAST(c.p1 % 64 AS INTEGER)) & 1) = 1 AND b2.bits IS NOT NULL AND ((b2.bits >> CAST(c.p2 % 64 AS INTEGER)) & 1) = 1 THEN 1 ELSE 0 END AS is_cand FROM corp c LEFT JOIN bits b1 ON c.p1 // 64 = b1.w LEFT JOIN bits b2 ON c.p2 // 64 = b2.w), agg AS (SELECT h.doc_id, CAST(sum(h.is_cand) AS BIGINT) AS n_candidates, CAST(sum(CASE WHEN h.is_cand = 1 AND t.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared FROM hit h LEFT JOIN tsh t ON h.is_cand = 1 AND h.sh = t.sh GROUP BY h.doc_id), bdoc AS (SELECT p.doc_id, p.split, COALESCE(a.n_candidates, 0) AS n_candidates, COALESCE(a.n_shared, 0) AS n_shared, CAST(CASE WHEN COALESCE(a.n_shared, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS contaminated FROM sps p LEFT JOIN agg a ON p.doc_id = a.doc_id WHERE p.split <> 'test')"""

  private val NgramCtes = s"$ShingleCtes, $NgramTailCtes"

  // Shared marker-language-ID CTEs (tokenize + per-language marker hits)
  // and the argmax CASE — text_langid and eval_langid_confusion classify
  // identically by construction. Ends with s(doc_id, lang, *_s).
  private val LangidCtes =
    s"""t AS (SELECT doc_id, lang, regexp_extract_all(lower(text), '$Tok') AS w FROM documents), s AS (SELECT doc_id, lang, CAST(len(list_filter(w, x -> list_contains(['the','a','and','of','is'], x))) AS BIGINT) AS en_s, CAST(len(list_filter(w, x -> list_contains(['der','die','das','und','ist'], x))) AS BIGINT) AS de_s, CAST(len(list_filter(w, x -> list_contains(['el','la','los','que','y'], x))) AS BIGINT) AS es_s, CAST(len(list_filter(w, x -> list_contains(['le','les','des','et','est'], x))) AS BIGINT) AS fr_s FROM t)"""
  private val LangPredSql =
    """CASE WHEN en_s >= de_s AND en_s >= es_s AND en_s >= fr_s AND en_s > 0 THEN 'en' WHEN de_s >= es_s AND de_s >= fr_s AND de_s > 0 THEN 'de' WHEN es_s >= fr_s AND es_s > 0 THEN 'es' WHEN fr_s > 0 THEN 'fr' ELSE 'und' END"""

  // Shared brute-force cosine top-k CTEs — sim_topk and the retrieval-
  // recall evaluation rank against the same baseline by construction.
  // Ends with brk(qid, cid, sim_e4, rn).
  private val BruteTopkCtes =
    """bq AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 10), bc AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings), bs AS (SELECT qid, cid, list_inner_product(qv, cv) / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(cv, cv))) AS sim FROM bc, bq), brk AS (SELECT qid, cid, CAST(round(sim * 10000) AS BIGINT) AS sim_e4, row_number() OVER (PARTITION BY qid ORDER BY CAST(round(sim * 10000) AS BIGINT) DESC, cid) AS rn FROM bs)"""

  // Shared SQ8 scalar-quantization CTEs: per-dimension min/step model,
  // integer codes, asymmetric decode, broadcast-query scoring, per-query
  // ranking — ends with sqrk(qid, cid, sim_e4, rn). sim_sq_topk and the
  // SQ recall evaluation read the same quantized index by construction.
  // Arithmetic parity with the Spark side: step = (max-min)/255.0 and
  // decode = min + code*step are the same two IEEE ops in the same
  // order; codes round a single correctly-rounded divide.
  private val SqTopkCtes =
    """sqn AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), sqd AS (SELECT t.k, min(v[t.k]) AS mn, max(v[t.k]) AS mx FROM sqn, range(1, 65) t(k) GROUP BY t.k), sqmm AS (SELECT list(mn ORDER BY k) AS mns, list(CASE WHEN mx > mn THEN (mx - mn) / 255.0 ELSE 0.0 END ORDER BY k) AS steps FROM sqd), sqc AS (SELECT vec_id, list_transform(range(1, 65), i -> CASE WHEN steps[i] > 0 THEN CAST(round((v[i] - mns[i]) / steps[i]) AS BIGINT) ELSE 0 END) AS q FROM sqn, sqmm), sqdec AS (SELECT vec_id AS cid, list_transform(range(1, 65), i -> mns[i] + q[i] * steps[i]) AS dv FROM sqc, sqmm), sqdn AS (SELECT cid, dv, sqrt(list_inner_product(dv, dv)) AS dnrm FROM sqdec), sqq AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv, sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS qn FROM embeddings WHERE vec_id < 10), sqs AS (SELECT q.qid, c.cid, CAST(round(list_inner_product(c.dv, q.qv) / (c.dnrm * q.qn) * 10000) AS BIGINT) AS sim_e4 FROM sqdn c, sqq q), sqrk AS (SELECT qid, cid, sim_e4, row_number() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, cid) AS rn FROM sqs)"""

  // Unrolled greedy MMR rounds (λ = 1/2 → doubled integer scores):
  // relevance tower top-`depth` per query (self excluded), candidate
  // pair similarities, then per round the penalty = max similarity to
  // the selected-so-far set, argmax(sim − penalty) with cid tiebreak.
  // AS MATERIALIZED on the accumulators: each round references the
  // previous accumulator twice (penalty + remaining) — inlined, the
  // chain re-expands its prefix exponentially.
  private def mmrCtes(nq: Int, depth: Int, k: Int): String = {
    def cos(a: String, b: String) =
      s"CAST(round(list_inner_product($a.v, $b.v) / ($a.nrm * $b.nrm) * 10000) AS BIGINT)"
    val sb = new StringBuilder
    sb ++= s"mnn AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings)"
    sb ++= s", mq AS (SELECT vec_id, v, nrm FROM mnn WHERE vec_id < $nq)"
    sb ++= s", mc AS MATERIALIZED (SELECT qid, cid, sim_e4 FROM (SELECT q.vec_id AS qid, c.vec_id AS cid, ${cos("c", "q")} AS sim_e4, row_number() OVER (PARTITION BY q.vec_id ORDER BY ${cos("c", "q")} DESC, c.vec_id) AS rn FROM mnn c, mq q WHERE c.vec_id <> q.vec_id) WHERE rn <= $depth)"
    sb ++= s", mps AS MATERIALIZED (SELECT a.qid, a.cid AS pd, b.cid AS ps, ${cos("x", "y")} AS ds_e4 FROM mc a JOIN mc b ON a.qid = b.qid AND a.cid <> b.cid JOIN mnn x ON a.cid = x.vec_id JOIN mnn y ON b.cid = y.vec_id)"
    sb ++= ", macc1 AS MATERIALIZED (SELECT qid, cid, sim_e4, sim_e4 AS mmr2x_e4, CAST(1 AS BIGINT) AS pick FROM (SELECT qid, cid, sim_e4, row_number() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, cid) AS r FROM mc) WHERE r = 1)"
    for (i <- 2 to k) {
      sb ++= s", mpen$i AS (SELECT p.qid, p.pd AS cid, max(p.ds_e4) AS pen FROM mps p JOIN macc${i - 1} s ON p.qid = s.qid AND p.ps = s.cid GROUP BY p.qid, p.pd)"
      sb ++= s", msel$i AS (SELECT qid, cid, sim_e4, mmr2x_e4, CAST($i AS BIGINT) AS pick FROM (SELECT r.qid, r.cid, r.sim_e4, r.sim_e4 - p.pen AS mmr2x_e4, row_number() OVER (PARTITION BY r.qid ORDER BY r.sim_e4 - p.pen DESC, r.cid) AS rr FROM mc r JOIN mpen$i p ON r.qid = p.qid AND r.cid = p.cid WHERE NOT EXISTS (SELECT 1 FROM macc${i - 1} s WHERE s.qid = r.qid AND s.cid = r.cid)) WHERE rr = 1)"
      sb ++= s", macc$i AS MATERIALIZED (SELECT * FROM macc${i - 1} UNION ALL SELECT * FROM msel$i)"
    }
    sb.toString
  }

  // Shared LSH top-k CTE chain (8 bands × 4 sign-projection bits, query
  // band keys, exact-cosine verify, per-query ranking) — ends with
  // lshr(qid, cid, sim_e4, rn). sim_lsh_topk and the retrieval-recall
  // evaluation read the same index by construction.
  private val LshTopkCtes =
    """n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings), planes AS (SELECT j, list_transform(range(0, 64), k -> CAST((1103515245 * (j * 64 + k + 1) + 12345) % 1000003 AS DOUBLE) / 1000003.0 - 0.5) AS p FROM range(0, 32) t(j)), proj AS (SELECT vec_id, j, CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), i -> v[i] * p[i])), (a, x) -> a + x) > 0 THEN 1 ELSE 0 END AS bit FROM n, planes), keys AS (SELECT vec_id, j // 4 AS band_idx, sum(bit * (1 << (j % 4))) AS band_key FROM proj GROUP BY vec_id, j // 4), qk AS (SELECT vec_id AS qid, band_idx, band_key FROM keys WHERE vec_id < 10), cand AS (SELECT DISTINCT qk.qid, k.vec_id AS cid FROM keys k JOIN qk ON k.band_idx = qk.band_idx AND k.band_key = qk.band_key), lsc AS (SELECT c.qid, c.cid, CAST(round(list_inner_product(x.v, y.v) / (x.nrm * y.nrm) * 10000) AS BIGINT) AS sim_e4 FROM cand c JOIN n x ON c.cid = x.vec_id JOIN n y ON c.qid = y.vec_id), lshr AS (SELECT qid, cid, sim_e4, row_number() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, cid) AS rn FROM lsc)"""

  // Shared trained-coarse-quantizer CTEs (two unrolled Lloyd iterations in
  // the e6 integer domain, emptied cells carry forward) — ends with
  // nn(vec_id, v, nrm) and c2n(cell_id, cv, cnrm). sim_ivf_trained and
  // embedding_kmeans train identically by construction.
  private val IvfTrainedCtes: String = {
    def iter(i: Int, prev: Int) =
      s"""a$i AS (SELECT vec_id, cell_id FROM (SELECT nn.vec_id, c.cell_id, row_number() OVER (PARTITION BY nn.vec_id ORDER BY CAST(round(list_inner_product(nn.v, c.cv) / (nn.nrm * c.cnrm) * 10000) AS BIGINT) DESC, c.cell_id) AS rn FROM nn, c${prev}n c) WHERE rn = 1), m$i AS (SELECT a.cell_id, t.k, CAST(round(CAST(sum(e.ve6[t.k]) AS DOUBLE) / count(*)) AS BIGINT) AS comp FROM a$i a JOIN e6 e ON a.vec_id = e.vec_id, range(1, 65) t(k) GROUP BY a.cell_id, t.k), c$i AS (SELECT cell_id, list_transform(list(comp ORDER BY k), x -> CAST(x AS DOUBLE)) AS cv FROM m$i GROUP BY cell_id), c${i}f AS (SELECT p.cell_id, COALESCE(u.cv, p.cv) AS cv FROM c${prev}f p LEFT JOIN c$i u ON p.cell_id = u.cell_id), c${i}n AS (SELECT cell_id, cv, sqrt(list_inner_product(cv, cv)) AS cnrm FROM c${i}f)"""
    s"""n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), e6 AS (SELECT vec_id, v, list_transform(v, x -> CAST(round(x * 1000000) AS BIGINT)) AS ve6 FROM n), nn AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM n), c0f AS (SELECT vec_id AS cell_id, list_transform(ve6, x -> CAST(x AS DOUBLE)) AS cv FROM e6 WHERE vec_id < 16), c0n AS (SELECT cell_id, cv, sqrt(list_inner_product(cv, cv)) AS cnrm FROM c0f), ${iter(1, 0)}, ${iter(2, 1)}"""
  }

  // Shared budget-thresholded co-supply edge CTEs: per-order supplier
  // pairs with shared-order counts, then the smallest count threshold
  // whose ≥-cumulative edge total fits 25·n (the Graph.coSupplyEdges
  // twin). Ends with edges(a, b), a < b.
  private val CoSupplyCtes =
    s"""os AS (SELECT DISTINCT l_orderkey AS o, l_suppkey AS sk FROM lineitem), e0 AS (SELECT x.sk AS a, y.sk AS b, count(*) AS cnt FROM os x JOIN os y ON x.o = y.o AND x.sk < y.sk GROUP BY 1, 2), hst AS (SELECT cnt, count(*) AS m FROM e0 GROUP BY cnt), cum AS (SELECT cnt, CAST(sum(m) OVER (ORDER BY cnt DESC) AS BIGINT) AS ge FROM hst), nsup AS (SELECT count(DISTINCT sk) AS n FROM os), thr AS (SELECT COALESCE(min(cnt), 9223372036854775807) AS t FROM cum CROSS JOIN nsup WHERE ge <= ${graft.operators.Graph.TriEdgesPerNode} * n), edges AS (SELECT a, b FROM e0 CROSS JOIN thr WHERE cnt >= t)"""

  // The kmeans assignment CTE (winning cluster + e4 cosine per vector) on
  // top of IvfTrainedCtes — shared by embedding_kmeans and the
  // cluster-balanced sampler.
  private val KmeansAsgCte =
    """asg AS (SELECT vec_id, cell_id AS cluster_id, sim_e4 FROM (SELECT nn.vec_id, c.cell_id, CAST(round(list_inner_product(nn.v, c.cv) / (nn.nrm * c.cnrm) * 10000) AS BIGINT) AS sim_e4, row_number() OVER (PARTITION BY nn.vec_id ORDER BY CAST(round(list_inner_product(nn.v, c.cv) / (nn.nrm * c.cnrm) * 10000) AS BIGINT) DESC, c.cell_id) AS rn FROM nn, c2n c) WHERE rn = 1)"""

  // Shared perceptual-hash CTEs: rebuild each P6 raster's grayscale from
  // the cyclic text bytes (the multimodal_features reconstruction), box-
  // filter onto the 8×8 grid, set a bit where the block mean beats the
  // global mean by integer cross-multiply, fold bits with bit_or (bit 63
  // via the explicit Long.MinValue literal). Ends with d(doc_id, t, len,
  // w, h) and ph(doc_id, phash); all-uniform images are absent from ph
  // (COALESCE to 0 at the consumer).
  private val PhashCtes =
    """d AS (SELECT doc_id, CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t, length(CASE WHEN length(text) = 0 THEN ' ' ELSE text END) AS len, n_chars % 64 + 1 AS w, n_chars % 48 + 1 AS h FROM documents), g AS (SELECT doc_id, w, h, p, ascii(substr(t, CAST((3*p) % len AS INTEGER) + 1, 1)) + ascii(substr(t, CAST((3*p+1) % len AS INTEGER) + 1, 1)) + ascii(substr(t, CAST((3*p+2) % len AS INTEGER) + 1, 1)) AS gray FROM (SELECT doc_id, t, len, w, h, unnest(range(0, w*h)) AS p FROM d)), blk AS (SELECT doc_id, w, h, ((p // w) * 8 // h) * 8 + ((p % w) * 8 // w) AS idx, gray FROM g), bs AS (SELECT doc_id, idx, CAST(w AS BIGINT) * CAST(h AS BIGINT) AS npix, CAST(sum(gray) AS BIGINT) AS bsum, CAST(count(*) AS BIGINT) AS bcnt FROM blk GROUP BY doc_id, idx, w, h), ts AS (SELECT doc_id, CAST(sum(gray) AS BIGINT) AS tsum FROM g GROUP BY doc_id), bits AS (SELECT b.doc_id, b.idx FROM bs b JOIN ts t ON b.doc_id = t.doc_id WHERE b.bsum * b.npix > t.tsum * b.bcnt), ph AS (SELECT doc_id, bit_or(CASE WHEN idx = 63 THEN (-9223372036854775807 - 1) ELSE (CAST(1 AS BIGINT) << CAST(idx AS INTEGER)) END) AS phash FROM bits GROUP BY doc_id)"""

  // Shared exact-substring duplication CTEs: token windows reduce to the
  // 114-bit fingerprint pair (two 57-bit checked-BIGINT polynomial folds
  // with coprime bases 31/37 — the recurrences the Spark PolyHash57
  // expression generates; mask 2^57-1 keeps h*base + c inside DuckDB's
  // overflow-checked int64), occurrence counts flag windows seen more than
  // once corpus-wide, `pd` holds the per-doc totals. No pair enumeration
  // anywhere. The dedup_substring score query and the corpus_clean_spans
  // gate both end on `pd`.
  private val SubstrCtes = {
    val w = graft.operators.Dedup.SubstrWindow
    val cat = (0 until w).map(j => if (j == 0) "w[i]" else s"w[i+$j]")
      .mkString(" || ' ' || ")
    val m = org.apache.spark.sql.graft.PolyHash57.Mask
    def fold(base: Int) =
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(win) + 1), i -> CAST(ascii(substr(win, i, 1)) AS BIGINT))), (h, c) -> (h * $base + c) & $m)"
    s"""stoks AS (SELECT doc_id, regexp_extract_all(lower(text), '$Tok') AS w FROM documents), wins AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - ${w - 2}), i -> $cat)) AS win FROM stoks), wh AS (SELECT doc_id, ${fold(31)} AS h1, ${fold(37)} AS h2 FROM wins), occ AS (SELECT h1, h2, count(*) AS occ FROM wh GROUP BY h1, h2), pd AS (SELECT x.doc_id, count(*) AS n_windows, CAST(sum(CASE WHEN o.occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows FROM wh x JOIN occ o ON x.h1 = o.h1 AND x.h2 = o.h2 GROUP BY x.doc_id)"""
  }
  /** The 57-bit polynomial fold over `item` — the gopher-repetition
    * battery's per-item fingerprint half (same recurrence as SubstrCtes'). */
  private def GopherRepFold(base: Int) = {
    val m = org.apache.spark.sql.graft.PolyHash57.Mask
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(item) + 1), i -> CAST(ascii(substr(item, i, 1)) AS BIGINT))), (h, c) -> (h * $base + c) & $m)"
  }

  private val SubstrDupE4 =
    "CAST(CASE WHEN pd.n_windows IS NULL THEN 0 ELSE round(pd.n_dup_windows * 10000.0 / pd.n_windows) END AS BIGINT)"

  // Positioned variant for the span-removal REWRITE: windows carry their
  // 1-based start position (DuckDB zips parallel unnests of equal-length
  // lists), the first occurrence of each fingerprint is row_number()=1
  // over (doc_id, pos), redundant occurrences expand to their covered
  // token positions, and the cleaned text is the ordered string_agg of
  // the surviving tokens. Position bases differ across engines (Spark
  // posexplode is 0-based) but the first-occurrence rule and coverage
  // arithmetic are shift-invariant within a document, so results agree.
  private val SubstrRewriteCtes = {
    val w = graft.operators.Dedup.SubstrWindow
    val cat = (0 until w).map(j => if (j == 0) "w[i]" else s"w[i+$j]")
      .mkString(" || ' ' || ")
    val m = org.apache.spark.sql.graft.PolyHash57.Mask
    def fold(base: Int) =
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(win) + 1), i -> CAST(ascii(substr(win, i, 1)) AS BIGINT))), (h, c) -> (h * $base + c) & $m)"
    s"""stoks AS (SELECT doc_id, regexp_extract_all(lower(text), '$Tok') AS w FROM documents), toks AS (SELECT doc_id, unnest(range(1, len(w) + 1)) AS pos, unnest(w) AS tok FROM stoks), wins AS (SELECT doc_id, unnest(range(1, len(w) - ${w - 2})) AS pos, unnest(list_transform(range(1, len(w) - ${w - 2}), i -> $cat)) AS win FROM stoks), wh AS (SELECT doc_id, pos, ${fold(31)} AS h1, ${fold(37)} AS h2 FROM wins), wr AS (SELECT doc_id, pos, row_number() OVER (PARTITION BY h1, h2 ORDER BY doc_id, pos) AS rn FROM wh), drops AS (SELECT DISTINCT doc_id, p AS pos FROM (SELECT doc_id, unnest(range(pos, pos + $w)) AS p FROM wr WHERE rn > 1)), reb AS (SELECT t.doc_id, count(*) AS n_kept, string_agg(t.tok, ' ' ORDER BY t.pos) AS text_clean FROM toks t LEFT JOIN drops dr ON t.doc_id = dr.doc_id AND t.pos = dr.pos WHERE dr.doc_id IS NULL GROUP BY t.doc_id)"""
  }

  /** Shared trained-IVF-PQ training CTEs — the full unrolled model build
    * (e4-normalized corpus → two coarse Lloyd iterations → final
    * assignment `af` → residual sub-vectors → two anisotropic codebook
    * iterations → final `codes`), consumed by both the retrieval oracle
    * (`sim_ivfpq_trained`) and the index oracle (`sim_ivfpq_index`). */
  private lazy val IvfPqTrainedCtes: String = {
    val etaM1 = graft.operators.Similarity.PqEta - 1
    val aloss =
      s"$etaM1 * CAST(list_inner_product(s.rm, s.xq) - list_inner_product(c.cm, s.xq) AS BIGINT) * CAST(list_inner_product(s.rm, s.xq) - list_inner_product(c.cm, s.xq) AS BIGINT) + CAST(list_inner_product(s.xq, s.xq) AS BIGINT) * CAST(list_inner_product(s.rm, s.rm) - 2.0 * list_inner_product(s.rm, c.cm) + list_inner_product(c.cm, c.cm) AS BIGINT)"
    def cIter(i: Int, prev: Int) =
      s"a$i AS (SELECT vec_id, cell_id FROM (SELECT e.vec_id, c.cell_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY CAST(round(list_inner_product(e.ve, c.cv) / (e.vn * c.cnrm) * 10000) AS BIGINT) DESC, c.cell_id) AS rn FROM en e, c${prev}n c) WHERE rn = 1), " +
      s"m$i AS (SELECT a.cell_id, t.k, CAST(round(CAST(sum(e.ve[CAST(t.k AS INTEGER)]) AS DOUBLE) / count(*)) AS BIGINT) AS comp FROM a$i a JOIN e4v e ON a.vec_id = e.vec_id, range(1, 65) t(k) GROUP BY a.cell_id, t.k), " +
      s"c$i AS (SELECT cell_id, list_transform(list(comp ORDER BY k), x -> CAST(x AS DOUBLE)) AS cv FROM m$i GROUP BY cell_id), " +
      s"c${i}f AS (SELECT p.cell_id, COALESCE(u.cv, p.cv) AS cv FROM c${prev}f p LEFT JOIN c$i u ON p.cell_id = u.cell_id), " +
      s"c${i}n AS (SELECT cell_id, cv, sqrt(list_inner_product(cv, cv)) AS cnrm FROM c${i}f)"
    def pIter(i: Int, prev: String) =
      s"q$i AS (SELECT vec_id, m, j FROM (SELECT s.vec_id, s.m, c.j, row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY $aloss, c.j) AS rn FROM rsubs s JOIN $prev c ON s.m = c.m) WHERE rn = 1), " +
      s"u$i AS (SELECT a.m, a.j, t.k, CAST(round(sum(s.rm[CAST(t.k AS INTEGER)]) / count(*)) AS DOUBLE) AS comp FROM q$i a JOIN rsubs s ON a.vec_id = s.vec_id AND a.m = s.m, range(1, 9) t(k) GROUP BY a.m, a.j, t.k), " +
      s"p$i AS MATERIALIZED (SELECT p.m, p.j, COALESCE(u.cm, p.cm) AS cm FROM $prev p LEFT JOIN (SELECT m, j, list(comp ORDER BY k) AS cm FROM u$i GROUP BY m, j) u ON p.m = u.m AND p.j = u.j)"
    "WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
    "nrm AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nr FROM n), " +
    "e4v AS MATERIALIZED (SELECT vec_id, list_transform(v, x -> CAST(round(x / nr * 10000) AS DOUBLE)) AS ve FROM nrm), " +
    "en AS MATERIALIZED (SELECT vec_id, ve, sqrt(list_inner_product(ve, ve)) AS vn FROM e4v), " +
    "c0f AS (SELECT vec_id AS cell_id, ve AS cv FROM e4v WHERE vec_id < 16), " +
    "c0n AS (SELECT cell_id, cv, sqrt(list_inner_product(cv, cv)) AS cnrm FROM c0f), " +
    cIter(1, 0) + ", " + cIter(2, 1) + ", " +
    "af AS MATERIALIZED (SELECT vec_id, cell_id FROM (SELECT e.vec_id, c.cell_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY CAST(round(list_inner_product(e.ve, c.cv) / (e.vn * c.cnrm) * 10000) AS BIGINT) DESC, c.cell_id) AS rn FROM en e, c2n c) WHERE rn = 1), " +
    "resid AS (SELECT e.vec_id, list_transform(range(1, 65), i -> e.ve[CAST(i AS INTEGER)] - c.cv[CAST(i AS INTEGER)]) AS r, e.ve FROM e4v e JOIN af a ON e.vec_id = a.vec_id JOIN c2f c ON a.cell_id = c.cell_id), " +
    "mm AS (SELECT unnest(range(8)) AS m), " +
    "rsubs AS MATERIALIZED (SELECT vec_id, m, r[m*8+1 : m*8+8] AS rm, list_transform(ve[m*8+1 : m*8+8], x -> round(x / 10)) AS xq FROM resid CROSS JOIN mm), " +
    "p0 AS MATERIALIZED (SELECT vec_id AS j, m, rm AS cm FROM rsubs WHERE vec_id < 16), " +
    pIter(1, "p0") + ", " + pIter(2, "p1") + ", " +
    s"codes AS (SELECT vec_id, m, j FROM (SELECT s.vec_id, s.m, c.j, row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY $aloss, c.j) AS rn FROM rsubs s JOIN p2 c ON s.m = c.m) WHERE rn = 1)"
  }

  /** Trained IVF-PQ retrieval oracle (see the map-entry comment at
    * `sim_ivfpq_trained`): the shared training CTEs plus probes → ADC with
    * the per-cell offset → exact re-rank. Shared verbatim by
    * `sim_ivfpq_trained` (retrains in-query) and `sim_ivfpq_served`
    * (reads the persisted index) — the two paths are the same
    * deterministic encode, so one oracle covers both. */
  private lazy val IvfPqTrainedRetrievalSql: String =
    IvfPqTrainedCtes + ", " +
    "qsubs AS (SELECT vec_id AS qid, m, ve[m*8+1 : m*8+8] AS qm FROM e4v CROSS JOIN mm WHERE vec_id < 10), " +
    "qtab AS (SELECT s.qid, s.m, c.j, list_inner_product(s.qm, c.cm) AS t FROM qsubs s JOIN p2 c ON s.m = c.m), " +
    "probes AS (SELECT qid, cell_id, pdot FROM (SELECT e.vec_id AS qid, c.cell_id, list_inner_product(e.ve, c.cv) AS pdot, row_number() OVER (PARTITION BY e.vec_id ORDER BY CAST(round(list_inner_product(e.ve, c.cv) / (e.vn * c.cnrm) * 10000) AS BIGINT) DESC, c.cell_id) AS rn FROM en e, c2n c WHERE e.vec_id < 10) WHERE rn <= 4), " +
    "cand AS (SELECT p.qid, a.vec_id AS cid, p.pdot FROM probes p JOIN af a ON p.cell_id = a.cell_id), " +
    "adc AS (SELECT cd.qid, cd.cid, cd.pdot + sum(q.t) AS approx FROM cand cd JOIN codes co ON cd.cid = co.vec_id JOIN qtab q ON q.qid = cd.qid AND co.m = q.m AND co.j = q.j GROUP BY cd.qid, cd.cid, cd.pdot), " +
    "short AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY approx DESC, cid) AS srn FROM adc) WHERE srn <= 25), " +
    "ex AS (SELECT sh.qid, sh.cid, CAST(round(list_inner_product(x.v, y.v) / (x.nr * y.nr) * 10000) AS BIGINT) AS sim_e4 FROM short sh JOIN nrm x ON sh.cid = x.vec_id JOIN nrm y ON sh.qid = y.vec_id) " +
    "SELECT qid, cid, sim_e4, CAST(rn AS BIGINT) AS rn FROM (SELECT qid, cid, sim_e4, row_number() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, cid) AS rn FROM ex) WHERE rn <= 5 ORDER BY qid, rn"

  /** Hybrid RRF with the SEMANTIC TOWER swapped for the served IVF-PQ
    * index (the map-entry comment at `search_hybrid_served`): the shared
    * training CTEs re-run the index's deterministic encode, retrieval
    * runs at the hybrid's query set (vec_id < 5) to depth 21, the self
    * hit is excluded and ranks recomputed, then the fusion tail is
    * `search_hybrid_rrf`'s verbatim. One oracle therefore proves the
    * persisted index and the fusion compose end-to-end. */
  private lazy val HybridServedSql: String =
    IvfPqTrainedCtes + ", " + NgramCtes + ", " +
    "qsubs AS (SELECT vec_id AS qid, m, ve[m*8+1 : m*8+8] AS qm FROM e4v CROSS JOIN mm WHERE vec_id < 5), " +
    "qtab AS (SELECT s.qid, s.m, c.j, list_inner_product(s.qm, c.cm) AS t FROM qsubs s JOIN p2 c ON s.m = c.m), " +
    "probes AS (SELECT qid, cell_id, pdot FROM (SELECT e.vec_id AS qid, c.cell_id, list_inner_product(e.ve, c.cv) AS pdot, row_number() OVER (PARTITION BY e.vec_id ORDER BY CAST(round(list_inner_product(e.ve, c.cv) / (e.vn * c.cnrm) * 10000) AS BIGINT) DESC, c.cell_id) AS rn FROM en e, c2n c WHERE e.vec_id < 5) WHERE rn <= 4), " +
    "cand AS (SELECT p.qid, a.vec_id AS cid, p.pdot FROM probes p JOIN af a ON p.cell_id = a.cell_id), " +
    "adc AS (SELECT cd.qid, cd.cid, cd.pdot + sum(q.t) AS approx FROM cand cd JOIN codes co ON cd.cid = co.vec_id JOIN qtab q ON q.qid = cd.qid AND co.m = q.m AND co.j = q.j GROUP BY cd.qid, cd.cid, cd.pdot), " +
    "short AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY approx DESC, cid) AS srn FROM adc) WHERE srn <= 25), " +
    "ivex AS (SELECT sh.qid, sh.cid, CAST(round(list_inner_product(x.v, y.v) / (x.nr * y.nr) * 10000) AS BIGINT) AS sim_e4 FROM short sh JOIN nrm x ON sh.cid = x.vec_id JOIN nrm y ON sh.qid = y.vec_id), " +
    "ivr AS (SELECT qid, cid, rn FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, cid) AS rn FROM ivex) WHERE rn <= 21), " +
    "hsem AS (SELECT qid, cid, r FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY rn) AS r FROM ivr WHERE cid <> qid) WHERE r <= 20), " +
    "hlex0 AS (SELECT d1 AS qid, d2 AS cid, jac_e4 FROM jpairs WHERE jac_e4 >= 100 AND d1 < 5 UNION ALL SELECT d2 AS qid, d1 AS cid, jac_e4 FROM jpairs WHERE jac_e4 >= 100 AND d2 < 5), " +
    "hlex AS (SELECT qid, cid, r FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY jac_e4 DESC, cid) AS r FROM hlex0) WHERE r <= 20), " +
    "hf AS (SELECT COALESCE(l.qid, s.qid) AS qid, COALESCE(l.cid, s.cid) AS cid, l.r AS rl, s.r AS rs FROM hlex l FULL OUTER JOIN hsem s ON l.qid = s.qid AND l.cid = s.cid), " +
    "hr AS (SELECT qid, cid, CAST(COALESCE(rl, 0) AS BIGINT) AS r_lex, CAST(COALESCE(rs, 0) AS BIGINT) AS r_sem, CAST(CASE WHEN rl IS NULL THEN 0 ELSE round(10000.0 / (60 + rl)) END + CASE WHEN rs IS NULL THEN 0 ELSE round(10000.0 / (60 + rs)) END AS BIGINT) AS rrf_e4 FROM hf) " +
    "SELECT qid, cid, r_lex, r_sem, rrf_e4, CAST(rn AS BIGINT) AS rn FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rrf_e4 DESC, cid) AS rn FROM hr) WHERE rn <= 10 ORDER BY qid, rn"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted (→ rows-only check): distinct_words_approx
    * (HLL registers are engine-specific), text_tfidf (libm ln, rule R2),
    * and agg_quantiles_approx (GK summary merge is engine-specific) — each
    * with ground-truth ScalaTest checks instead (rule R5; see
    * RelationalSpec, TextAnalyticsSpec). Every other query — including
    * every LSH/sketch/clustering operator and the real-codec
    * multimodal_features — hash-matches: the sketches are deterministic
    * integer arithmetic (MinHash, SimHash) or fixed-op-order float
    * projections with e4-rounded outputs (sign-projection LSH, IVF). */
  def oracleSql: Map[String, String] = Map(
    "corpus_clean" ->
      s"""WITH $cleanFlagCtes SELECT d.doc_id, CAST(CASE WHEN sv.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_survivor, f.quality_ok, f.lang_match, CAST(CASE WHEN sv.doc_id IS NOT NULL AND f.quality_ok = 1 AND f.lang_match = 1 THEN 1 ELSE 0 END AS BIGINT) AS keep FROM documents d JOIN flags f ON d.doc_id = f.doc_id LEFT JOIN surv sv ON d.doc_id = sv.doc_id ORDER BY d.doc_id""",
    // corpus_clean plus CCNet's perplexity gate: the per-language tail
    // third of the LM score distribution is dropped; bucket rides along
    // for the audit view.
    "corpus_clean_ccnet" ->
      s"""WITH $LmCtes, lm AS (SELECT d.doc_id, d.lang, CAST(CASE WHEN s.n_bigrams IS NULL THEN 0 ELSE round(s.lm_score_e4 * 1.0 / s.n_bigrams) END AS BIGINT) AS lm_mean_e4 FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id), tiled AS (SELECT doc_id, ntile(3) OVER (PARTITION BY lang ORDER BY lm_mean_e4 DESC, doc_id) AS tile FROM lm), bkt AS (SELECT doc_id, CASE WHEN tile = 1 THEN 'head' WHEN tile = 2 THEN 'middle' ELSE 'tail' END AS bucket FROM tiled), $cleanFlagCtes SELECT d.doc_id, CAST(CASE WHEN sv.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_survivor, f.quality_ok, f.lang_match, b.bucket, CAST(CASE WHEN b.bucket <> 'tail' THEN 1 ELSE 0 END AS BIGINT) AS ccnet_ok, CAST(CASE WHEN sv.doc_id IS NOT NULL AND f.quality_ok = 1 AND f.lang_match = 1 AND b.bucket <> 'tail' THEN 1 ELSE 0 END AS BIGINT) AS keep FROM documents d JOIN flags f ON d.doc_id = f.doc_id LEFT JOIN surv sv ON d.doc_id = sv.doc_id JOIN bkt b ON d.doc_id = b.doc_id ORDER BY d.doc_id""",
    // Per-source gate report: corpus_clean's flag CTEs grouped by source
    // (DuckDB sum(BIGINT) widens to HUGEINT, hence the casts).
    "source_report" ->
      s"""WITH $cleanFlagCtes SELECT d.source, count(*) AS n_docs, CAST(sum(CASE WHEN sv.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_survivor, CAST(sum(f.quality_ok) AS BIGINT) AS n_quality, CAST(sum(f.lang_match) AS BIGINT) AS n_lang, CAST(sum(CASE WHEN sv.doc_id IS NOT NULL AND f.quality_ok = 1 AND f.lang_match = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep FROM documents d JOIN flags f ON d.doc_id = f.doc_id LEFT JOIN surv sv ON d.doc_id = sv.doc_id GROUP BY d.source ORDER BY d.source""",
    // Near-dup-aware clean: the survivor CTEs are the dedup_clusters
    // transitive closure at the decision-grade Jaccard ≥ 0.8 threshold
    // (Dedup.NearDupJacE4 — a doc survives iff no smaller doc_id is
    // reachable) CONJOINED with the exact-text minimum (`xs` — the df cap
    // drops pair edges among texts duplicated more than MaxShingleDf times,
    // so the cluster gate alone would ship every copy of hot boilerplate);
    // quality/lang CTEs are corpus_clean's.
    "corpus_clean_neardup" ->
      s"""WITH RECURSIVE $NgramCtes, fpairs AS (SELECT d1, d2 FROM jpairs WHERE jac_e4 >= 8000), edges AS (SELECT d1 AS a, d2 AS b FROM fpairs UNION ALL SELECT d2 AS a, d1 AS b FROM fpairs), reach AS (SELECT a, b FROM edges UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a), mn AS (SELECT a, min(b) AS m FROM reach GROUP BY a), xs AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text), t AS (SELECT doc_id, lang, regexp_extract_all(lower(text), '$Tok') AS w FROM documents), s AS (SELECT doc_id, lang, CAST(len(w) AS BIGINT) AS n_toks, CAST(len(list_filter(w, x -> list_contains(['the','a','and','of','is','to','in'], x))) AS BIGINT) AS stop_hits, CAST(len(list_filter(w, x -> list_contains(['the','a','and','of','is'], x))) AS BIGINT) AS en_s, CAST(len(list_filter(w, x -> list_contains(['der','die','das','und','ist'], x))) AS BIGINT) AS de_s, CAST(len(list_filter(w, x -> list_contains(['el','la','los','que','y'], x))) AS BIGINT) AS es_s, CAST(len(list_filter(w, x -> list_contains(['le','les','des','et','est'], x))) AS BIGINT) AS fr_s FROM t), flags AS (SELECT doc_id, CAST(CASE WHEN n_toks >= 5 AND stop_hits > 0 THEN 1 ELSE 0 END AS BIGINT) AS quality_ok, CAST(CASE WHEN (CASE WHEN en_s >= de_s AND en_s >= es_s AND en_s >= fr_s AND en_s > 0 THEN 'en' WHEN de_s >= es_s AND de_s >= fr_s AND de_s > 0 THEN 'de' WHEN es_s >= fr_s AND es_s > 0 THEN 'es' WHEN fr_s > 0 THEN 'fr' ELSE 'und' END) = lang THEN 1 ELSE 0 END AS BIGINT) AS lang_match FROM s) SELECT d.doc_id, CAST(CASE WHEN (m.m IS NULL OR m.m >= d.doc_id) AND xs.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_survivor, f.quality_ok, f.lang_match, CAST(CASE WHEN (m.m IS NULL OR m.m >= d.doc_id) AND xs.doc_id IS NOT NULL AND f.quality_ok = 1 AND f.lang_match = 1 THEN 1 ELSE 0 END AS BIGINT) AS keep FROM documents d JOIN flags f ON d.doc_id = f.doc_id LEFT JOIN mn m ON d.doc_id = m.a LEFT JOIN xs ON d.doc_id = xs.doc_id ORDER BY d.doc_id""",
    // corpus_clean's flag/survivor CTEs + the exact-substring CTEs; the
    // span gate is dup_e4 < threshold on pd's per-doc window totals.
    "corpus_clean_spans" ->
      s"""WITH $SubstrCtes, t AS (SELECT doc_id, lang, regexp_extract_all(lower(text), '$Tok') AS w FROM documents), s AS (SELECT doc_id, lang, CAST(len(w) AS BIGINT) AS n_toks, CAST(len(list_filter(w, x -> list_contains(['the','a','and','of','is','to','in'], x))) AS BIGINT) AS stop_hits, CAST(len(list_filter(w, x -> list_contains(['the','a','and','of','is'], x))) AS BIGINT) AS en_s, CAST(len(list_filter(w, x -> list_contains(['der','die','das','und','ist'], x))) AS BIGINT) AS de_s, CAST(len(list_filter(w, x -> list_contains(['el','la','los','que','y'], x))) AS BIGINT) AS es_s, CAST(len(list_filter(w, x -> list_contains(['le','les','des','et','est'], x))) AS BIGINT) AS fr_s FROM t), flags AS (SELECT doc_id, CAST(CASE WHEN n_toks >= 5 AND stop_hits > 0 THEN 1 ELSE 0 END AS BIGINT) AS quality_ok, CAST(CASE WHEN (CASE WHEN en_s >= de_s AND en_s >= es_s AND en_s >= fr_s AND en_s > 0 THEN 'en' WHEN de_s >= es_s AND de_s >= fr_s AND de_s > 0 THEN 'de' WHEN es_s >= fr_s AND es_s > 0 THEN 'es' WHEN fr_s > 0 THEN 'fr' ELSE 'und' END) = lang THEN 1 ELSE 0 END AS BIGINT) AS lang_match FROM s), surv AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text), sp AS (SELECT d.doc_id, CAST(CASE WHEN $SubstrDupE4 < ${graft.operators.Pipeline.SpanDupE4Max} THEN 1 ELSE 0 END AS BIGINT) AS span_ok FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id) SELECT d.doc_id, CAST(CASE WHEN sv.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_survivor, f.quality_ok, f.lang_match, sp.span_ok, CAST(CASE WHEN sv.doc_id IS NOT NULL AND f.quality_ok = 1 AND f.lang_match = 1 AND sp.span_ok = 1 THEN 1 ELSE 0 END AS BIGINT) AS keep FROM documents d JOIN flags f ON d.doc_id = f.doc_id JOIN sp ON d.doc_id = sp.doc_id LEFT JOIN surv sv ON d.doc_id = sv.doc_id ORDER BY d.doc_id""",
    // C4 line + page cleaning (Raffel et al. 2020 §2.2): line survives iff
    // terminal punctuation AND >= 3 words AND no "javascript"; page keep =
    // >= 5 sentences in the cleaned text AND no "lorem ipsum" / curly
    // brace in the raw page. Thresholds interpolated from the Pipeline
    // constants so they cannot drift.
    "corpus_clean_c4" ->
      s"""WITH g AS (SELECT doc_id, text, lower(text) AS lt, string_split(text, chr(10)) AS lines FROM documents), k AS (SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines, list_filter(lines, l -> (ends_with(rtrim(l), '.') OR ends_with(rtrim(l), '!') OR ends_with(rtrim(l), '?') OR ends_with(rtrim(l), '"')) AND len(list_filter(string_split(l, ' '), w -> w <> '')) >= ${graft.operators.Pipeline.C4MinLineWords} AND NOT contains(lower(l), 'javascript')) AS kept, lt FROM g), s AS (SELECT doc_id, n_lines, CAST(len(kept) AS BIGINT) AS n_kept, COALESCE(array_to_string(kept, chr(10)), '') AS text_clean, lt FROM k), m AS (SELECT doc_id, n_lines, n_kept, CAST(length(text_clean) - length(replace(replace(replace(text_clean, '.', ''), '!', ''), '?', '')) AS BIGINT) AS n_sentences, text_clean, lt FROM s) SELECT doc_id, n_lines, n_kept, n_sentences, CAST(CASE WHEN n_sentences >= ${graft.operators.Pipeline.C4MinSentences} AND NOT contains(lt, 'lorem ipsum') AND NOT contains(lt, '{') AND NOT contains(lt, '}') THEN 1 ELSE 0 END AS BIGINT) AS keep, text_clean FROM m ORDER BY doc_id""",
    "data_split" ->
      """SELECT doc_id, bucket, CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split FROM (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(s) + 1), i -> CAST(ascii(substr(s, i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295) % 100 AS bucket FROM (SELECT doc_id, 'split:' || CAST(doc_id AS VARCHAR) AS s FROM documents)) ORDER BY doc_id""",
    // Per-source mixture sampling: both hashes are the same salted
    // list_reduce rolling hash the split uses.
    "data_mix" ->
      """WITH h AS (SELECT doc_id, source, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length('rate:' || source) + 1), i -> CAST(ascii(substr('rate:' || source, i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295) AS rh, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length('mix:' || CAST(doc_id AS VARCHAR)) + 1), i -> CAST(ascii(substr('mix:' || CAST(doc_id AS VARCHAR), i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295) AS mh FROM documents) SELECT doc_id, source, 2000 + (rh % 8001) AS rate_e4, mh % 10000 AS bucket, CAST(CASE WHEN mh % 10000 < 2000 + (rh % 8001) THEN 1 ELSE 0 END AS BIGINT) AS keep FROM h ORDER BY doc_id""",
    // Data-constrained repetition plan: equal integer budget share per
    // source; full epochs = min(share div n, cap); partial remainder only
    // below the cap. All div/mod.
    "data_mix_epochs" ->
      s"""WITH ps AS (SELECT source, CAST(sum(len(regexp_extract_all(lower(text), '$Tok'))) AS BIGINT) AS n_toks FROM documents GROUP BY source), sc AS (SELECT count(*) AS s_cnt FROM ps), j AS (SELECT source, n_toks, CAST(${graft.operators.Pipeline.EpochBudgetTokens} // s_cnt AS BIGINT) AS share FROM ps CROSS JOIN sc), f AS (SELECT source, n_toks, share, CAST(CASE WHEN n_toks = 0 THEN 0 ELSE least(share // n_toks, ${graft.operators.Pipeline.MaxEpochs}) END AS BIGINT) AS full_epochs FROM j) SELECT source, n_toks, share, full_epochs, CAST(CASE WHEN full_epochs >= ${graft.operators.Pipeline.MaxEpochs} OR n_toks = 0 THEN 0 ELSE share % n_toks END AS BIGINT) AS rem_tokens, CAST(full_epochs * n_toks + CASE WHEN full_epochs >= ${graft.operators.Pipeline.MaxEpochs} OR n_toks = 0 THEN 0 ELSE share % n_toks END AS BIGINT) AS kept_tokens FROM f ORDER BY source""",
    // Temperature (α = 1/2) source mixing: integer floor-sqrt weights,
    // integer-div base targets with the remainder distributed
    // largest-remainder (rem DESC, source ASC — so uncapped targets sum
    // exactly to the budget), smallest-salted-hash selection per source —
    // every step exact on both engines (sqrt of an exact-double count is
    // correctly rounded identically; everything else is BIGINT).
    "data_mix_temperature" ->
      s"""WITH ${orderHashCtes("tmix:", "source")}, c AS (SELECT source, count(*) AS n_source, CAST(floor(sqrt(count(*))) AS BIGINT) AS sw FROM h GROUP BY source), tot AS (SELECT CAST(sum(sw) AS BIGINT) AS wsum, CAST(sum(n_source) AS BIGINT) AS ntot FROM c), t0 AS (SELECT source, n_source, ((ntot // 2) * sw) // wsum AS base, ((ntot // 2) * sw) % wsum AS rem, ntot // 2 AS budget FROM c CROSS JOIN tot), lo AS (SELECT CAST(max(budget) - sum(base) AS BIGINT) AS leftover FROM t0), t AS (SELECT source, n_source, least(n_source, base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source) <= leftover THEN 1 ELSE 0 END) AS target FROM t0 CROSS JOIN lo), r AS (SELECT h.doc_id, h.source, t.n_source, t.target, row_number() OVER (PARTITION BY h.source ORDER BY h.hh, h.doc_id) AS rn FROM h JOIN t ON h.source = t.source) SELECT doc_id, source, n_source, target, CAST(rn AS BIGINT) AS rn, CAST(CASE WHEN rn <= target THEN 1 ELSE 0 END AS BIGINT) AS kept FROM r ORDER BY doc_id""",
    // Scale path: the oracle states the UNFILTERED rank's kept rows — the
    // hash-threshold pre-filter admits a consistent prefix of the sample
    // order, so the capped plan computes the identical kept set.
    "data_mix_temperature_capped" ->
      s"""WITH ${orderHashCtes("tmix:", "source")}, c AS (SELECT source, count(*) AS n_source, CAST(floor(sqrt(count(*))) AS BIGINT) AS sw FROM h GROUP BY source), tot AS (SELECT CAST(sum(sw) AS BIGINT) AS wsum, CAST(sum(n_source) AS BIGINT) AS ntot FROM c), t0 AS (SELECT source, n_source, ((ntot // 2) * sw) // wsum AS base, ((ntot // 2) * sw) % wsum AS rem, ntot // 2 AS budget FROM c CROSS JOIN tot), lo AS (SELECT CAST(max(budget) - sum(base) AS BIGINT) AS leftover FROM t0), t AS (SELECT source, n_source, least(n_source, base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source) <= leftover THEN 1 ELSE 0 END) AS target FROM t0 CROSS JOIN lo), r AS (SELECT h.doc_id, h.source, t.target, row_number() OVER (PARTITION BY h.source ORDER BY h.hh, h.doc_id) AS rn FROM h JOIN t ON h.source = t.source) SELECT doc_id, source, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= target ORDER BY doc_id""",
    // The τ-sweep decision table: the SAME largest-remainder allocator
    // at three temperatures (weight = n^τ as exact integers), shares as
    // pinned e4 divisions.
    "eval_mix_temperature" ->
      s"""WITH c AS (SELECT source, count(*) AS n_source FROM documents GROUP BY source), ${tempSweepChain(0, "1")}, ${tempSweepChain(5, "floor(sqrt(n_source))")}, ${tempSweepChain(10, "n_source")} SELECT tau_e1, source, n_source, CAST(w AS BIGINT) AS weight, CAST(target AS BIGINT) AS target, CAST(n_source * 10000 // ntot AS BIGINT) AS raw_share_e4, CAST(CASE WHEN budget = 0 THEN 0 ELSE target * 10000 // budget END AS BIGINT) AS mix_share_e4, CAST(target * 10000 // n_source AS BIGINT) AS epochs_e4 FROM (SELECT * FROM t0 UNION ALL SELECT * FROM t5 UNION ALL SELECT * FROM t10) ORDER BY tau_e1, source""",
    "corpus_stats" ->
      s"""SELECT lang, count(*) AS n_docs, CAST(sum(len(regexp_extract_all(lower(text), '$Tok'))) AS BIGINT) AS n_tokens, CAST(sum(n_chars) AS BIGINT) AS n_chars FROM documents GROUP BY lang ORDER BY lang""",
    // Drift monitor: top words by relative-frequency shift between the
    // even- and odd-numbered source cohorts — exact integer counts, then
    // the pinned float tail (div, div, sub, abs, e6 round) on both engines.
    "corpus_drift" ->
      s"""WITH t AS (SELECT CAST(substr(source, 4) AS BIGINT) % 2 = 0 AS a, unnest(regexp_extract_all(lower(text), '$Tok')) AS word FROM documents), c AS (SELECT word, CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a, CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b FROM t GROUP BY word), n AS (SELECT CAST(sum(cnt_a) AS DOUBLE) AS na, CAST(sum(cnt_b) AS DOUBLE) AS nb FROM c) SELECT word, cnt_a, cnt_b, CAST(round(abs(CAST(cnt_a AS DOUBLE) / na - CAST(cnt_b AS DOUBLE) / nb) * 1000000) AS BIGINT) AS diff_e6 FROM c CROSS JOIN n ORDER BY diff_e6 DESC, word LIMIT ${graft.operators.Pipeline.DriftTopK}""",
    "wordcount_topk" ->
      s"""SELECT word, count(*) AS cnt FROM (SELECT unnest(regexp_extract_all(lower(text), '$Tok')) AS word FROM documents) GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 20""",
    // Count-min sketch word counts: every token occurrence increments 4
    // salted-hash cells of an 8192-wide row; a word's estimate is the min
    // over its cells (over-counts only). Integer counts + deterministic
    // hashes ⇒ the sketch — collisions included — hash-matches.
    "wordcount_cms" ->
      s"""WITH toks AS (SELECT unnest(regexp_extract_all(lower(text), '$Tok')) AS word FROM documents), ex AS (SELECT word, count(*) AS cnt FROM toks GROUP BY word ORDER BY cnt DESC, word LIMIT 20), cells AS (SELECT j, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length('c' || CAST(j AS VARCHAR) || '#' || word) + 1), i -> CAST(ascii(substr('c' || CAST(j AS VARCHAR) || '#' || word, i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295) % 8192 AS ccol, count(*) AS cell FROM toks, range(0, 4) t(j) GROUP BY 1, 2), ep AS (SELECT e.word, e.cnt, t.j, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length('c' || CAST(t.j AS VARCHAR) || '#' || e.word) + 1), i -> CAST(ascii(substr('c' || CAST(t.j AS VARCHAR) || '#' || e.word, i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295) % 8192 AS ccol FROM ex e, range(0, 4) t(j)) SELECT ep.word, ep.cnt, CAST(min(c.cell) AS BIGINT) AS cms_cnt FROM ep JOIN cells c ON ep.j = c.j AND ep.ccol = c.ccol GROUP BY ep.word, ep.cnt ORDER BY ep.cnt DESC, ep.word""",
    "wordcount_full" ->
      s"""SELECT word, count(*) AS cnt FROM (SELECT unnest(regexp_extract_all(lower(text), '$Tok')) AS word FROM documents) GROUP BY word ORDER BY cnt DESC, word ASC""",
    "distinct_words" ->
      s"""SELECT lang, count(DISTINCT word) AS n_words FROM (SELECT lang, unnest(regexp_extract_all(lower(text), '$Tok')) AS word FROM documents) GROUP BY lang ORDER BY lang""",
    "scan_filter_project" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS net_cents FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' ORDER BY l_orderkey, l_linenumber""",
    "agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt, CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c, CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c, CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_c FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "topk_orders" ->
      """SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS total_c FROM orders ORDER BY total_c DESC, o_orderkey LIMIT 20""",
    "set_ops" ->
      """WITH a AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000), b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') SELECT 'both' AS op, c_custkey FROM (SELECT * FROM a INTERSECT SELECT * FROM b) UNION ALL SELECT 'high_bal_only' AS op, c_custkey FROM (SELECT * FROM a EXCEPT SELECT * FROM b) UNION ALL SELECT 'either' AS op, c_custkey FROM (SELECT * FROM a UNION SELECT * FROM b) ORDER BY op, c_custkey""",
    "scalar_string" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u, substr(p_name, 1, 8) AS name8, CAST(length(p_type) AS BIGINT) AS type_len, p_brand || ':' || p_type AS brand_type, CAST(CASE WHEN p_name LIKE '%ar%' THEN 1 ELSE 0 END AS BIGINT) AS has_ar FROM part ORDER BY p_partkey""",
    "scalar_datetime" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS y, CAST(month(o_orderdate) AS BIGINT) AS m, CAST(date_trunc('month', o_orderdate) AS DATE) AS mstart, CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since FROM orders ORDER BY o_orderkey""",
    "scalar_math" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, CAST(round(abs(l_discount - 0.05) * 10000) AS BIGINT) AS absdisc_e4, CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil, CAST(floor(l_quantity) AS BIGINT) AS qty_floor, CAST(l_orderkey % 7 AS BIGINT) AS okmod7, CAST(sign(l_discount - 0.05) AS BIGINT) AS sgn FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "scalar_array" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim, CAST(round(CAST(embedding[1] AS DOUBLE) * 10000) AS BIGINT) AS e1_e4, CAST(round(CAST(embedding[33] AS DOUBLE) * 10000) AS BIGINT) AS e33_e4, CAST(round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(embedding[1:4], x -> CAST(x AS DOUBLE))), (a, x) -> a + x) * 10000) AS BIGINT) AS head4_sum_e4 FROM embeddings ORDER BY vec_id""",
    "scalar_json" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events ORDER BY event_id""",
    "join_broadcast" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey ORDER BY n_nationkey""",
    "join_multiway" ->
      """SELECT n_name, CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY revenue_c DESC, n_name""",
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey""",
    "supplier_revenue" ->
      """SELECT s_suppkey, s_name, n_name, CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c FROM lineitem JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey GROUP BY s_suppkey, s_name, n_name ORDER BY revenue_c DESC, s_suppkey LIMIT 20""",
    // The salted join re-routes rows between reducers without changing the
    // result, so its oracle is the plain unsalted join.
    "join_salted" ->
      """SELECT o_orderpriority, count(*) AS n_items, CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    // Weighted PageRank over the customer-supplier trade graph, 3 rounds
    // unrolled, exact-integer fixed point (div-per-edge mass loss is
    // deterministic on both engines).
    "graph_pagerank" ->
      s"""WITH ${pagerankCtes(graft.operators.Graph.PrIters)} SELECT node_id, CASE WHEN node_id % 2 = 0 THEN 'c' ELSE 's' END AS kind, node_id // 2 AS key, r AS rank_e12 FROM r${graft.operators.Graph.PrIters} ORDER BY node_id""",
    // Triangle counting on the budget-thresholded co-supply graph:
    // canonical a<b edges kept up to 25·n by the shared-count histogram
    // threshold, degree-ordered orientation (u→w from the lower
    // (degree, key) endpoint — ties keep u=a since a<b), wedges over
    // ordered out-neighbor pairs closed against the canonical edge set.
    "graph_triangles" ->
      s"""WITH $CoSupplyCtes, deg AS (SELECT v, count(*) AS dg FROM (SELECT a AS v FROM edges UNION ALL SELECT b AS v FROM edges) GROUP BY v), o AS (SELECT CASE WHEN da.dg <= db.dg THEN e.a ELSE e.b END AS u, CASE WHEN da.dg <= db.dg THEN e.b ELSE e.a END AS w FROM edges e JOIN deg da ON e.a = da.v JOIN deg db ON e.b = db.v), tri AS (SELECT e1.u AS u, e1.w AS v, e2.w AS x FROM o e1 JOIN o e2 ON e1.u = e2.u AND e1.w < e2.w JOIN edges c ON c.a = e1.w AND c.b = e2.w), nodes AS (SELECT u AS n FROM tri UNION ALL SELECT v AS n FROM tri UNION ALL SELECT x AS n FROM tri) SELECT n AS s_suppkey, count(*) AS n_tri FROM nodes GROUP BY n ORDER BY s_suppkey""",
    // Connected components of the co-supply graph: the same recursive-CTE
    // transitive closure the dedup cluster oracles use, over the
    // thresholded co-supply edges, joined back to the full supplier dim so
    // isolated suppliers appear as singleton components.
    "graph_components" ->
      s"""WITH RECURSIVE $CoSupplyCtes, bedges AS (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges), reach AS (SELECT a, b FROM bedges UNION SELECT r.a, e.b FROM reach r JOIN bedges e ON r.b = e.a), mn AS (SELECT a, min(b) AS m FROM reach GROUP BY a), lab AS (SELECT s.s_suppkey, CAST(CASE WHEN m.m IS NOT NULL AND m.m < s.s_suppkey THEN m.m ELSE s.s_suppkey END AS BIGINT) AS component_id FROM supplier s LEFT JOIN mn m ON s.s_suppkey = m.a), sz AS (SELECT component_id, count(*) AS component_size FROM lab GROUP BY component_id) SELECT l.s_suppkey, l.component_id, sz.component_size FROM lab l JOIN sz ON l.component_id = sz.component_id ORDER BY l.s_suppkey""",
    // k-core peeling unrolled to a fixed depth ≥ the oracle-scale fixpoint
    // round count (extra rounds are no-ops on a fixpoint); the engine
    // side loops to the measured fixpoint, so the two agree row for row.
    "graph_kcore" ->
      s"""WITH $CoSupplyCtes, ${kcoreCtes(graft.operators.Graph.KCoreK, 8)} SELECT d.u AS s_suppkey, CAST(d.dg AS BIGINT) AS degree, CAST(CASE WHEN f.u IS NULL THEN 0 ELSE 1 END AS BIGINT) AS in_core, CAST(COALESCE(f.dg, 0) AS BIGINT) AS core_deg FROM kd0 d LEFT JOIN kd8 f ON d.u = f.u ORDER BY s_suppkey""",
    "graph_lpa" ->
      s"""WITH $CoSupplyCtes, ${lpaCtes(graft.operators.Graph.LpaRounds)}, psz AS (SELECT lbl, CAST(count(*) AS BIGINT) AS csize FROM pl${graft.operators.Graph.LpaRounds} GROUP BY lbl) SELECT l.u AS s_suppkey, l.lbl AS community, s.csize FROM pl${graft.operators.Graph.LpaRounds} l JOIN psz s ON l.lbl = s.lbl ORDER BY s_suppkey""",
    // Newman–Girvan modularity of both partitionings over the co-supply
    // graph, exact integers: Q_e4 = round((4m·intra − Σd_c²)·1e4/(4m²)).
    // Component labels via the same transitive-closure min-label the
    // graph_components oracle uses; LPA labels via the shared unrolled
    // rounds. One branch of aggregates per method, UNION ALL'd.
    "eval_graph_modularity" -> {
      def branch(lab: String, method: String, px: String) =
        s"${px}dc AS (SELECT l.lbl, sum(g.deg) AS d_c FROM $lab l JOIN gdeg g ON l.u = g.u GROUP BY l.lbl), " +
        s"${px}ag AS (SELECT CAST(count(*) AS BIGINT) AS n_communities, CAST(sum(d_c * d_c) AS BIGINT) AS sum_d2 FROM ${px}dc), " +
        s"${px}in AS (SELECT CAST(count(*) AS BIGINT) AS intra_edges FROM edges e JOIN $lab x ON e.a = x.u JOIN $lab y ON e.b = y.u WHERE x.lbl = y.lbl), " +
        s"${px}row AS (SELECT '$method' AS method, (SELECT CAST(count(*) AS BIGINT) FROM $lab) AS n_nodes, a.n_communities, i.intra_edges, CAST(CASE WHEN mm.m = 0 THEN 0 ELSE round((4 * mm.m * i.intra_edges - a.sum_d2) * 10000.0 / (4 * mm.m * mm.m)) END AS BIGINT) AS modularity_e4 FROM ${px}ag a, ${px}in i, gm mm)"
      s"WITH RECURSIVE $CoSupplyCtes, ${lpaCtes(graft.operators.Graph.LpaRounds)}, " +
      "gm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM edges), " +
      "gund AS (SELECT a AS u FROM edges UNION ALL SELECT b AS u FROM edges), " +
      "gdeg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM gund GROUP BY u), " +
      "gbe AS (SELECT a, b FROM edges UNION ALL SELECT b AS a, a AS b FROM edges), " +
      "greach AS (SELECT a, b FROM gbe UNION SELECT r.a, e.b FROM greach r JOIN gbe e ON r.b = e.a), " +
      "gmn AS (SELECT a, min(b) AS mb FROM greach GROUP BY a), " +
      "clab AS (SELECT d.u, CAST(CASE WHEN n.mb IS NOT NULL AND n.mb < d.u THEN n.mb ELSE d.u END AS BIGINT) AS lbl FROM (SELECT DISTINCT u FROM gund) d LEFT JOIN gmn n ON d.u = n.a), " +
      s"llab AS (SELECT u, lbl FROM pl${graft.operators.Graph.LpaRounds}), " +
      branch("clab", "components", "c") + ", " + branch("llab", "lpa", "l") + " " +
      "SELECT * FROM crow UNION ALL SELECT * FROM lrow ORDER BY method"
    },
    "dedup_minhash" ->
      s"""$MinhashCtes SELECT doc_id, band_idx, band_key FROM bands ORDER BY doc_id, band_idx""",
    // Sketch-quality evaluation: MinHash-LSH pairs (est >= 5000) scored
    // against the exact n-gram Jaccard pairs (jac >= 5000) — both kits'
    // shared shingle prefix plus their tails in ONE WITH, a full outer
    // join on the pair key, and a 1-row precision/recall aggregate with
    // pinned e4 divisions (0 when a denominator is empty).
    "eval_dedup_pr" ->
      s"""WITH $ShingleCtes, $MinhashTailCtes, $NgramTailCtes, cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2 FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id), mp AS (SELECT d1, d2 FROM (SELECT c.d1, c.d2, CAST(round(sum(CASE WHEN ma.m = mb.m THEN 1 ELSE 0 END) * 10000.0 / 32) AS BIGINT) AS est_jac_e4 FROM cand c JOIN mins ma ON ma.doc_id = c.d1 JOIN mins mb ON mb.doc_id = c.d2 AND mb.i = ma.i GROUP BY c.d1, c.d2) WHERE est_jac_e4 >= 5000), ex AS (SELECT d1, d2 FROM jpairs WHERE jac_e4 >= 5000), u AS (SELECT CASE WHEN e.d1 IS NOT NULL THEN 1 ELSE 0 END AS exf, CASE WHEN m.d1 IS NOT NULL THEN 1 ELSE 0 END AS prf FROM ex e FULL JOIN mp m ON e.d1 = m.d1 AND e.d2 = m.d2) SELECT CAST(COALESCE(sum(exf), 0) AS BIGINT) AS n_exact, CAST(COALESCE(sum(prf), 0) AS BIGINT) AS n_pred, CAST(COALESCE(sum(exf * prf), 0) AS BIGINT) AS n_hit, CAST(CASE WHEN COALESCE(sum(prf), 0) = 0 THEN 0 ELSE round(sum(exf * prf) * 10000.0 / sum(prf)) END AS BIGINT) AS precision_e4, CAST(CASE WHEN COALESCE(sum(exf), 0) = 0 THEN 0 ELSE round(sum(exf * prf) * 10000.0 / sum(exf)) END AS BIGINT) AS recall_e4 FROM u ORDER BY n_exact""",
    // SimHash sketch evaluation: the Hamming<=3 band search's pairs scored
    // against the DECISION-GRADE exact Jaccard truth (jac >= 8000 —
    // NearDupJacE4). The simhash chain composes prefix-renamed (sx) so its
    // `toks` cannot collide with the shingle kit's in one WITH.
    "eval_simhash_pr" ->
      s"""WITH $ShingleCtes, $NgramTailCtes, ${simhashChain("sx")}, sbands AS (SELECT doc_id, b AS band_idx, (simhash >> (b * 16)) & 65535 AS band_bits FROM sxfpall, range(0, 4) t(b)), scand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2 FROM sbands a JOIN sbands b ON a.band_idx = b.band_idx AND a.band_bits = b.band_bits AND a.doc_id < b.doc_id), sp AS (SELECT d1, d2 FROM (SELECT d1, d2, CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming FROM scand JOIN sxfpall x ON d1 = x.doc_id JOIN sxfpall y ON d2 = y.doc_id) WHERE hamming <= 3), ex AS (SELECT d1, d2 FROM jpairs WHERE jac_e4 >= ${graft.operators.Dedup.NearDupJacE4}), u AS (SELECT CASE WHEN e.d1 IS NOT NULL THEN 1 ELSE 0 END AS exf, CASE WHEN m.d1 IS NOT NULL THEN 1 ELSE 0 END AS prf FROM ex e FULL JOIN sp m ON e.d1 = m.d1 AND e.d2 = m.d2) SELECT CAST(COALESCE(sum(exf), 0) AS BIGINT) AS n_exact, CAST(COALESCE(sum(prf), 0) AS BIGINT) AS n_pred, CAST(COALESCE(sum(exf * prf), 0) AS BIGINT) AS n_hit, CAST(CASE WHEN COALESCE(sum(prf), 0) = 0 THEN 0 ELSE round(sum(exf * prf) * 10000.0 / sum(prf)) END AS BIGINT) AS precision_e4, CAST(CASE WHEN COALESCE(sum(exf), 0) = 0 THEN 0 ELSE round(sum(exf * prf) * 10000.0 / sum(exf)) END AS BIGINT) AS recall_e4 FROM u ORDER BY n_exact""",
    // Band-geometry sweep: the same 32 minima re-banded at every
    // (bands × rows) split, candidates per geometry from one
    // (bands, band_idx, band_key)-keyed self-join, PR'd against the
    // decision-grade exact truth (jac >= 8000). The cfg LEFT JOIN at the
    // end guarantees all four rows even for an empty geometry.
    "eval_minhash_bands" ->
      s"""WITH $ShingleCtes, $MinhashTailCtes, $NgramTailCtes, cfg AS (SELECT CAST(b AS BIGINT) AS bands, CAST(r AS BIGINT) AS rows_per_band FROM (VALUES (2, 16), (4, 8), (8, 4), (16, 2)) t(b, r)), bx AS (SELECT c.bands, c.rows_per_band, m.doc_id, m.i // c.rows_per_band AS band_idx, string_agg(CAST(m.m AS VARCHAR), '_' ORDER BY m.i) AS band_key FROM mins m CROSS JOIN cfg c GROUP BY c.bands, c.rows_per_band, m.doc_id, m.i // c.rows_per_band), cd AS (SELECT DISTINCT a.bands, a.rows_per_band, a.doc_id AS d1, x.doc_id AS d2 FROM bx a JOIN bx x ON a.bands = x.bands AND a.band_idx = x.band_idx AND a.band_key = x.band_key AND a.doc_id < x.doc_id), ex AS (SELECT c.bands, c.rows_per_band, j.d1, j.d2 FROM jpairs j CROSS JOIN cfg c WHERE j.jac_e4 >= ${graft.operators.Dedup.NearDupJacE4}), u AS (SELECT COALESCE(e.bands, m.bands) AS bands, COALESCE(e.rows_per_band, m.rows_per_band) AS rows_per_band, CASE WHEN e.d1 IS NOT NULL THEN 1 ELSE 0 END AS exf, CASE WHEN m.d1 IS NOT NULL THEN 1 ELSE 0 END AS prf FROM ex e FULL JOIN cd m ON e.bands = m.bands AND e.rows_per_band = m.rows_per_band AND e.d1 = m.d1 AND e.d2 = m.d2), ag AS (SELECT bands, rows_per_band, CAST(sum(exf) AS BIGINT) AS n_exact, CAST(sum(prf) AS BIGINT) AS n_pred, CAST(sum(exf * prf) AS BIGINT) AS n_hit FROM u GROUP BY bands, rows_per_band) SELECT c.bands, c.rows_per_band, COALESCE(a.n_exact, 0) AS n_exact, COALESCE(a.n_pred, 0) AS n_pred, COALESCE(a.n_hit, 0) AS n_hit, CAST(CASE WHEN COALESCE(a.n_pred, 0) = 0 THEN 0 ELSE round(a.n_hit * 10000.0 / a.n_pred) END AS BIGINT) AS precision_e4, CAST(CASE WHEN COALESCE(a.n_exact, 0) = 0 THEN 0 ELSE round(a.n_hit * 10000.0 / a.n_exact) END AS BIGINT) AS recall_e4 FROM cfg c LEFT JOIN ag a ON c.bands = a.bands AND c.rows_per_band = a.rows_per_band ORDER BY c.bands""",
    "dedup_minhash_pairs" ->
      s"""$MinhashCtes, cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2 FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id) SELECT d1, d2, est_jac_e4 FROM (SELECT c.d1, c.d2, CAST(round(sum(CASE WHEN ma.m = mb.m THEN 1 ELSE 0 END) * 10000.0 / 32) AS BIGINT) AS est_jac_e4 FROM cand c JOIN mins ma ON ma.doc_id = c.d1 JOIN mins mb ON mb.doc_id = c.d2 AND mb.i = ma.i GROUP BY c.d1, c.d2) WHERE est_jac_e4 >= 5000 ORDER BY d1, d2""",
    "sim_lsh_topk" ->
      s"""WITH $LshTopkCtes SELECT qid, cid, sim_e4, CAST(rn AS BIGINT) AS rn FROM lshr WHERE rn <= 5 ORDER BY qid, rn""",
    // LSH geometry sweep: the same 32 sign projections re-banded at
    // 4×8 / 8×4 / 16×2, each geometry's candidates exact-scored (each
    // distinct pair once) and ranked; recall vs brute + scan fraction
    // per geometry — the vector-side twin of eval_minhash_bands.
    "eval_lsh_planes" ->
      s"""WITH lpn AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings), lppl AS (SELECT j, list_transform(range(0, 64), k -> CAST((1103515245 * (j * 64 + k + 1) + 12345) % 1000003 AS DOUBLE) / 1000003.0 - 0.5) AS p FROM range(0, 32) t(j)), lpproj AS (SELECT vec_id, j, CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), i -> v[i] * p[i])), (a, x) -> a + x) > 0 THEN 1 ELSE 0 END AS bit FROM lpn, lppl), lpcfg AS (SELECT CAST(b AS BIGINT) AS bands, CAST(r AS BIGINT) AS bits_per_band FROM (VALUES (4, 8), (8, 4), (16, 2)) t(b, r)), lpkeys AS (SELECT c.bands, c.bits_per_band, p.vec_id, p.j // c.bits_per_band AS band_idx, sum(p.bit * (1 << (p.j % c.bits_per_band))) AS band_key FROM lpproj p CROSS JOIN lpcfg c GROUP BY c.bands, c.bits_per_band, p.vec_id, p.j // c.bits_per_band), lpqk AS (SELECT bands, bits_per_band, vec_id AS qid, band_idx, band_key FROM lpkeys WHERE vec_id < 10), lpcand AS (SELECT DISTINCT k.bands, k.bits_per_band, q.qid, k.vec_id AS cid FROM lpkeys k JOIN lpqk q ON k.bands = q.bands AND k.bits_per_band = q.bits_per_band AND k.band_idx = q.band_idx AND k.band_key = q.band_key), lpsc AS (SELECT d.bands, d.bits_per_band, d.qid, d.cid, CAST(round(list_inner_product(x.v, y.v) / (x.nrm * y.nrm) * 10000) AS BIGINT) AS sim_e4 FROM lpcand d JOIN lpn x ON d.cid = x.vec_id JOIN lpn y ON d.qid = y.vec_id), lpsel AS (SELECT bands, bits_per_band, qid, cid FROM (SELECT bands, bits_per_band, qid, cid, row_number() OVER (PARTITION BY bands, bits_per_band, qid ORDER BY sim_e4 DESC, cid) AS rn FROM lpsc) WHERE rn <= 5), $BruteTopkCtes, lpbr AS (SELECT c.bands, c.bits_per_band, b.qid, b.cid FROM brk b CROSS JOIN lpcfg c WHERE b.rn <= 5), lph AS (SELECT b.bands, b.bits_per_band, CASE WHEN s.cid IS NULL THEN 0 ELSE 1 END AS hit FROM lpbr b LEFT JOIN lpsel s ON b.bands = s.bands AND b.bits_per_band = s.bits_per_band AND b.qid = s.qid AND b.cid = s.cid), lpha AS (SELECT bands, bits_per_band, CAST(sum(hit) AS BIGINT) AS hits, CAST(round(sum(hit) * 10000.0 / count(*)) AS BIGINT) AS recall_e4 FROM lph GROUP BY bands, bits_per_band), lpcc AS (SELECT bands, bits_per_band, CAST(count(*) AS BIGINT) AS cand_rows FROM lpcand GROUP BY bands, bits_per_band), lpdn AS (SELECT (SELECT count(*) FROM lpn) AS n_corpus, (SELECT count(*) FROM lpn WHERE vec_id < 10) AS n_q) SELECT h.bands, h.bits_per_band, h.hits, h.recall_e4, c.cand_rows, CAST(round(c.cand_rows * 10000.0 / (d.n_q * d.n_corpus)) AS BIGINT) AS scan_e4 FROM lpha h JOIN lpcc c ON h.bands = c.bands AND h.bits_per_band = c.bits_per_band CROSS JOIN lpdn d ORDER BY h.bands""",
    // Range (radius) search over the same LSH candidate chain: threshold
    // tail instead of rank tail — every verified candidate at cosine
    // ≥ 0.30, however many there are.
    "sim_range_search" ->
      s"""WITH $LshTopkCtes SELECT qid, cid, sim_e4 FROM lsc WHERE sim_e4 >= ${graft.operators.Similarity.RangeThrE4} ORDER BY qid, sim_e4 DESC, cid""",
    // SQ8 scalar-quantized top-k: per-dimension min/step model, one-byte
    // codes, asymmetric decode (query full-precision), exact ranking over
    // the decoded corpus.
    "sim_sq_topk" ->
      s"""WITH $SqTopkCtes SELECT qid, cid, sim_e4, CAST(rn AS BIGINT) AS rn FROM sqrk WHERE rn <= 5 ORDER BY qid, rn""",
    // SQ8 recall@5 against the exact baseline — the compression-quality
    // monitor; denominator is the per-query brute row count.
    "eval_sq_recall" ->
      s"""WITH $BruteTopkCtes, $SqTopkCtes, bsel AS (SELECT qid, cid FROM brk WHERE rn <= 5), ssel AS (SELECT qid, cid FROM sqrk WHERE rn <= 5), hsel AS (SELECT b.qid, CASE WHEN s.cid IS NULL THEN 0 ELSE 1 END AS hit FROM bsel b LEFT JOIN ssel s ON b.qid = s.qid AND b.cid = s.cid) SELECT qid, CAST(sum(hit) AS BIGINT) AS hits, CAST(round(sum(hit) * 10000.0 / count(*)) AS BIGINT) AS recall_e4 FROM hsel GROUP BY qid ORDER BY qid""",
    // Retrieval recall@5 as a query: the brute baseline's top-5 LEFT
    // JOINed against the LSH index's top-5, hits counted per query, one
    // pinned division for the e4 recall. The denominator is the per-query
    // brute row count (count(*) over the group), matching the Scala side's
    // corpus-smaller-than-k behavior.
    "eval_retrieval_recall" ->
      s"""WITH $LshTopkCtes, $BruteTopkCtes, br AS (SELECT qid, cid FROM brk WHERE rn <= 5), ls AS (SELECT qid, cid FROM lshr WHERE rn <= 5) SELECT b.qid, CAST(sum(CASE WHEN l.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits, CAST(round(sum(CASE WHEN l.cid IS NOT NULL THEN 1 ELSE 0 END) * 10000.0 / count(*)) AS BIGINT) AS recall_e4 FROM br b LEFT JOIN ls l ON b.qid = l.qid AND b.cid = l.cid GROUP BY b.qid ORDER BY b.qid""",
    // Serving-quality monitor: recall@5 of the SERVED IVF-PQ index vs
    // the brute baseline — the trained retrieval CTEs (the index's own
    // deterministic encode) replayed and LEFT JOINed against brute top-5,
    // the same evaluation core as eval_retrieval_recall.
    "eval_ann_recall_served" ->
      (IvfPqTrainedCtes + ", " + BruteTopkCtes + ", " +
      "qsubs AS (SELECT vec_id AS qid, m, ve[m*8+1 : m*8+8] AS qm FROM e4v CROSS JOIN mm WHERE vec_id < 10), " +
      "qtab AS (SELECT s.qid, s.m, c.j, list_inner_product(s.qm, c.cm) AS t FROM qsubs s JOIN p2 c ON s.m = c.m), " +
      "probes AS (SELECT qid, cell_id, pdot FROM (SELECT e.vec_id AS qid, c.cell_id, list_inner_product(e.ve, c.cv) AS pdot, row_number() OVER (PARTITION BY e.vec_id ORDER BY CAST(round(list_inner_product(e.ve, c.cv) / (e.vn * c.cnrm) * 10000) AS BIGINT) DESC, c.cell_id) AS rn FROM en e, c2n c WHERE e.vec_id < 10) WHERE rn <= 4), " +
      "cand AS (SELECT p.qid, a.vec_id AS cid, p.pdot FROM probes p JOIN af a ON p.cell_id = a.cell_id), " +
      "adc AS (SELECT cd.qid, cd.cid, cd.pdot + sum(q.t) AS approx FROM cand cd JOIN codes co ON cd.cid = co.vec_id JOIN qtab q ON q.qid = cd.qid AND co.m = q.m AND co.j = q.j GROUP BY cd.qid, cd.cid, cd.pdot), " +
      "short AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY approx DESC, cid) AS srn FROM adc) WHERE srn <= 25), " +
      "ivex AS (SELECT sh.qid, sh.cid, CAST(round(list_inner_product(x.v, y.v) / (x.nr * y.nr) * 10000) AS BIGINT) AS sim_e4 FROM short sh JOIN nrm x ON sh.cid = x.vec_id JOIN nrm y ON sh.qid = y.vec_id), " +
      "sv AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, cid) AS rn FROM ivex) WHERE rn <= 5), " +
      "br AS (SELECT qid, cid FROM brk WHERE rn <= 5) " +
      "SELECT b.qid, CAST(sum(CASE WHEN s.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits, CAST(round(sum(CASE WHEN s.cid IS NOT NULL THEN 1 ELSE 0 END) * 10000.0 / count(*)) AS BIGINT) AS recall_e4 FROM br b LEFT JOIN sv s ON b.qid = s.qid AND b.cid = s.cid GROUP BY b.qid ORDER BY b.qid"),
    // k-NN graph build: every vector's top-4 neighbors among the banded
    // sign-projection bucket candidates (each undirected candidate computed
    // once at a < b, then mirrored), exact-cosine verified with e4/dst
    // determinism — the same LSH machinery as sim_lsh_topk with every
    // vector as a query. Celebrity buckets (occupancy > KnnBucketCap) are
    // dropped from the pairing join, the Jaccard family's df-cap rule —
    // inert at this corpus (max occupancy 329 at sf0.1) but mirrored here
    // so the twin stays faithful at any scale.
    "sim_knn_graph" ->
      s"""WITH $KnnGraphCtes SELECT src, dst, sim_e4, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= ${graft.operators.Similarity.KnnK} ORDER BY src, rn""",
    // The navigable edge set itself — the exact (src, dst) union the
    // walks traverse, pinned as a declared query so an engine/oracle
    // drift in ANY link class (kNN, mirror, up, down, highway) fails
    // here before it shows as a recall regression.
    "sim_nav_graph" ->
      s"""WITH $KnnGraphCtes, $NavGraphCtes SELECT src, dst FROM ge ORDER BY src, dst""",
    // Incremental insert delta: the last NavInsertBatch vec_ids play
    // arrivals; same banded candidate rule as the build, every class
    // capped, additive down/mirror reconciled by the next rebuild.
    "sim_nav_insert" ->
      s"""WITH $KnnGraphCtes, $NavInsertCtes SELECT DISTINCT src, dst, edge_class FROM iall WHERE src <> dst ORDER BY src, dst, edge_class""",
    // Insert-quality decision table: the same fixed-entry walk over the
    // base graph (stored edges with arrival-touching edges removed) and
    // over base + delta, each scored against brute over the FULL corpus
    // — the recall delta is attributable to the insert alone.
    "eval_nav_insert" -> {
      val entry = graft.operators.Similarity.GraphEntry
      val k = 5
      def entrySql(p: String) =
        s"SELECT q.qid, CAST($entry AS BIGINT) AS cid, CAST(round(list_inner_product(x.v, q.qv) / (x.nrm * q.qn) * 10000) AS BIGINT) AS sim_e4 FROM ${p}gq q JOIN n x ON x.vec_id = $entry"
      val rounds = graft.operators.Similarity.GraphRounds
      val baseWalk = graphBeamCtes(entrySql("b_"), rounds, prefix = "b_",
        edgeCte = "ibase")
      val postWalk = graphBeamCtes(entrySql("p_"), rounds, prefix = "p_",
        edgeCte = "ipost")
      def rowSql(label: String, p: String, edge: String) =
        s"SELECT '$label' AS graph_state, CAST(sum(hit) AS BIGINT) AS hits, CAST(count(*) AS BIGINT) AS n_brute, CAST(round(sum(hit) * 10000.0 / count(*)) AS BIGINT) AS recall_e4, (SELECT count(*) FROM $edge) AS n_edges FROM (SELECT CASE WHEN s.cid IS NULL THEN 0 ELSE 1 END AS hit FROM (SELECT qid, cid FROM brk WHERE rn <= $k) b LEFT JOIN (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, cid) AS rn FROM ${p}gb$rounds) WHERE rn <= $k) s ON b.qid = s.qid AND b.cid = s.cid)"
      s"""WITH $KnnGraphCtes, $NavGraphCtes, $NavInsertCtes, $BruteTopkCtes, idelta AS (SELECT DISTINCT src, dst FROM iall WHERE src <> dst), ibase AS (SELECT g.src, g.dst FROM ge g, icut WHERE g.src < icut.cut AND g.dst < icut.cut), ipost AS (SELECT src, dst FROM ibase UNION SELECT src, dst FROM idelta), $baseWalk, $postWalk SELECT * FROM (${rowSql("base", "b_", "ibase")} UNION ALL ${rowSql("post_insert", "p_", "ipost")}) ORDER BY graph_state"""
    },
    // Multi-batch sequential insert: per cumulative state b in 0..B,
    // the fixed-entry walk's recall vs full-corpus brute plus max/mean
    // out-degree — batch b's delta computed over the corpus prefix
    // visible at its arrival time (eligibility re-derived per prefix).
    "eval_nav_insert_seq" -> {
      val entry = graft.operators.Similarity.GraphEntry
      val k = 5
      val batches = graft.operators.Similarity.NavSeqBatches
      val rounds = graft.operators.Similarity.GraphRounds
      def entrySql(p: String) =
        s"SELECT q.qid, CAST($entry AS BIGINT) AS cid, CAST(round(list_inner_product(x.v, q.qv) / (x.nrm * q.qn) * 10000) AS BIGINT) AS sim_e4 FROM ${p}gq q JOIN n x ON x.vec_id = $entry"
      val walks = (0 to batches).map { b =>
        graphBeamCtes(entrySql(s"w${b}_"), rounds, prefix = s"w${b}_",
          edgeCte = s"sg$b")
      }.mkString(", ")
      val degs = (0 to batches).map { b =>
        s"sdeg$b AS (SELECT CAST(max(c) AS BIGINT) AS mx, CAST(count(*) AS BIGINT) AS ns, CAST(sum(c) AS BIGINT) AS te FROM (SELECT src, count(*) AS c FROM sg$b GROUP BY src))"
      }.mkString(", ")
      val rows = (0 to batches).map { b =>
        s"SELECT CAST($b AS BIGINT) AS batch, d.te AS n_edges, CAST(sum(hit) AS BIGINT) AS hits, CAST(count(*) AS BIGINT) AS n_brute, CAST(round(sum(hit) * 10000.0 / count(*)) AS BIGINT) AS recall_e4, d.mx AS max_out_deg, CAST(round(d.te * 10000.0 / d.ns) AS BIGINT) AS mean_deg_e4 FROM (SELECT CASE WHEN s.cid IS NULL THEN 0 ELSE 1 END AS hit FROM (SELECT qid, cid FROM brk WHERE rn <= $k) b LEFT JOIN (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, cid) AS rn FROM w${b}_gb$rounds) WHERE rn <= $k) s ON b.qid = s.qid AND b.cid = s.cid), sdeg$b d GROUP BY d.te, d.mx, d.ns"
      }.mkString(" UNION ALL ")
      s"""WITH $KnnGraphCtes, $NavGraphCtes, ${navSeqCtes(batches, graft.operators.Similarity.NavInsertBatch)}, $BruteTopkCtes, $walks, $degs SELECT * FROM ($rows) ORDER BY batch"""
    },
    // Navigability audit: unrolled frontier expansions from the fixed
    // entry over the shared navigable edges; AS MATERIALIZED per hop —
    // each rc_i feeds both the next hop and its count row.
    "eval_graph_connectivity" -> {
      val hops = graft.operators.Similarity.GraphRounds
      val entry = graft.operators.Similarity.GraphEntry
      val chain = (1 to hops).map { h =>
        s"rc$h AS MATERIALIZED (SELECT DISTINCT node FROM (SELECT node FROM rc${h - 1} UNION ALL SELECT e.dst AS node FROM rc${h - 1} r JOIN ge e ON r.node = e.src))"
      }.mkString(", ")
      val rows = (1 to hops).map { h =>
        s"SELECT CAST($h AS BIGINT) AS hops, (SELECT CAST(count(*) AS BIGINT) FROM rc$h) AS n_reachable, CAST(round((SELECT count(*) FROM rc$h) * 10000.0 / (SELECT count(*) FROM embeddings)) AS BIGINT) AS frac_e4"
      }.mkString(" UNION ALL ")
      s"WITH $KnnGraphCtes, $NavGraphCtes, rc0 AS (SELECT CAST($entry AS BIGINT) AS node), $chain $rows ORDER BY hops"
    },
    // Graph-ANN beam search: fixed-entry, fixed-round best-first walk
    // over the kNN graph's kept edges — each round expands the beam's
    // out-neighbors, exact-scores the union, keeps top-BEAM by
    // (sim desc, cid). Rounds and widths match the engine constants
    // exactly (beam search has no fixpoint to hide behind).
    "sim_graph_topk" ->
      (s"WITH $KnnGraphCtes, $NavGraphCtes, $GraphBeamCtes " +
      s"SELECT qid, cid, sim_e4, CAST(rn AS BIGINT) AS rn FROM (SELECT qid, cid, sim_e4, row_number() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, cid) AS rn FROM gb${graft.operators.Similarity.GraphRounds}) WHERE rn <= 5 ORDER BY qid, rn"),
    // Tombstone-filtered serving: the SAME fixed-entry walk (gb chain
    // shared with sim_graph_topk), tombstoned ids (vec_id % mod = res)
    // filtered from the FINAL beam BEFORE the top-k window — deleted
    // vectors are never returned, survivors re-rank into the freed
    // slots; traversal is unchanged (the node still routes).
    "sim_nav_delete" ->
      (s"WITH $KnnGraphCtes, $NavGraphCtes, $GraphBeamCtes " +
      s"SELECT qid, cid, sim_e4, CAST(rn AS BIGINT) AS rn FROM (SELECT qid, cid, sim_e4, row_number() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, cid) AS rn FROM gb${graft.operators.Similarity.GraphRounds} WHERE cid % ${graft.operators.Similarity.NavDeleteMod} <> ${graft.operators.Similarity.NavDeleteRes}) WHERE rn <= 5 ORDER BY qid, rn"),
    // Layered: entry per query = argmax over the coarse layer, then the
    // same beam rounds from there — measured to buy recall at equal
    // rounds (the banded graph lacks the long-range links that would
    // let the better entry also cut rounds; see the engine docstring).
    "sim_graph_layered" ->
      (s"WITH $KnnGraphCtes, $NavGraphCtes, $GraphLayeredCtes " +
      s"SELECT qid, cid, sim_e4, CAST(rn AS BIGINT) AS rn FROM (SELECT qid, cid, sim_e4, row_number() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, cid) AS rn FROM gb${graft.operators.Similarity.LayeredRounds}) WHERE rn <= 5 ORDER BY qid, rn"),
    // Three-layer hierarchical walk: L2 exact entry, coarse-subgraph
    // descent, standard L0 rounds (GraphHierCtes).
    "sim_graph_hier" ->
      (s"WITH $KnnGraphCtes, $NavGraphCtes, $GraphHierCtes " +
      s"SELECT qid, cid, sim_e4, CAST(rn AS BIGINT) AS rn FROM (SELECT qid, cid, sim_e4, row_number() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, cid) AS rn FROM h_gb${graft.operators.Similarity.LayeredRounds}) WHERE rn <= 5 ORDER BY qid, rn"),
    // Entry-strategy decision table: per strategy at its production
    // round budget, hits vs the shared brute top-k.
    "eval_graph_entry" -> {
      val k = 5
      def rowSql(st: String, p: String, rounds: Int) =
        s"SELECT '$st' AS strategy, CAST($rounds AS BIGINT) AS rounds, CAST(sum(hit) AS BIGINT) AS hits, CAST(count(*) AS BIGINT) AS n_brute, CAST(round(sum(hit) * 10000.0 / count(*)) AS BIGINT) AS recall_e4 FROM (SELECT CASE WHEN s.cid IS NULL THEN 0 ELSE 1 END AS hit FROM (SELECT qid, cid FROM brk WHERE rn <= $k) b LEFT JOIN (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, cid) AS rn FROM ${p}gb$rounds) WHERE rn <= $k) s ON b.qid = s.qid AND b.cid = s.cid)"
      s"WITH $KnnGraphCtes, $NavGraphCtes, $GraphEntryEvalCtes, $BruteTopkCtes " +
      s"SELECT * FROM (${rowSql("fixed", "f_", graft.operators.Similarity.GraphRounds)} UNION ALL ${rowSql("layered_banded", "b_", graft.operators.Similarity.LayeredRounds)} UNION ALL ${rowSql("layered_exact", "l_", graft.operators.Similarity.LayeredRounds)}) ORDER BY strategy"
    },
    // Banded-entry layered search: entry candidates are the query's
    // coarse bucket-mates (keys, pre-eligibility — no cap on a
    // layer-sized side), fixed-entry fallback for full band misses.
    "sim_graph_layered_banded" ->
      (s"WITH $KnnGraphCtes, $NavGraphCtes, $GraphLayeredBandedCtes " +
      s"SELECT qid, cid, sim_e4, CAST(rn AS BIGINT) AS rn FROM (SELECT qid, cid, sim_e4, row_number() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, cid) AS rn FROM gb${graft.operators.Similarity.LayeredRounds}) WHERE rn <= 5 ORDER BY qid, rn"),
    // Round-budget sweep: the SAME walk's prefixes priced at rounds
    // 2/4/6 — per budget, the beam state's top-5 hits vs brute and the
    // cumulative distinct scored candidates (gx1..gxR).
    "eval_graph_beam" -> {
      val budgets = graft.operators.Similarity.BeamSweep
      val rowsSql = budgets.map { r =>
        s"gsel$r AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, cid) AS rn FROM gb$r) WHERE rn <= 5), " +
        s"ghit$r AS (SELECT CAST(sum(CASE WHEN s.cid IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS hits, CAST(count(*) AS BIGINT) AS n_brute FROM gbr b LEFT JOIN gsel$r s ON b.qid = s.qid AND b.cid = s.cid), " +
        s"gsc$r AS (SELECT CAST(count(*) AS BIGINT) AS scored_rows FROM (SELECT DISTINCT qid, cid FROM (${(1 to r).map(i => s"SELECT qid, cid FROM gx$i").mkString(" UNION ALL ")}))), " +
        s"grow$r AS (SELECT CAST($r AS BIGINT) AS rounds, h.hits, CAST(round(h.hits * 10000.0 / h.n_brute) AS BIGINT) AS recall_e4, s.scored_rows FROM ghit$r h, gsc$r s)"
      }.mkString(", ")
      s"WITH $KnnGraphCtes, $NavGraphCtes, $GraphBeamCtes, $BruteTopkCtes, " +
      "gbr AS (SELECT qid, cid FROM brk WHERE rn <= 5), " + rowsSql + " " +
      budgets.map(r => s"SELECT * FROM grow$r").mkString(" UNION ALL ") +
      " ORDER BY rounds"
    },
    // Scale-rule table: the engine's plan-time knob resolutions, each
    // reproduced in integer arithmetic (bit shifts — the rules are
    // integer-exact in the engine too, so no libm ceil can diverge at
    // the power-of-two boundaries the contract corpora sit on).
    // band_rows: smallest r >= 4 with 125*2^r >= n; log_layers:
    // smallest L >= 1 with 32^L >= max(n, 32); rounds/beam derive.
    "eval_scale_rules" ->
      ("WITH n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM embeddings), " +
      "nc AS (SELECT CAST(count(*) AS BIGINT) AS c FROM embeddings WHERE vec_id % 32 = 0), " +
      "ll AS (SELECT CAST(min(l) AS BIGINT) AS l FROM range(1, 13) t(l), n WHERE (CAST(1 AS BIGINT) << CAST(5*l AS INTEGER)) >= greatest(n.c, 32)), " +
      "br AS (SELECT CAST(min(r) AS BIGINT) AS r FROM range(4, 57) t(r), n WHERE (CAST(125 AS BIGINT) << CAST(r AS INTEGER)) >= n.c), " +
      "er AS (SELECT CAST(min(r) AS BIGINT) AS r FROM range(4, 57) t(r), nc WHERE (CAST(125 AS BIGINT) << CAST(r AS INTEGER)) >= nc.c) " +
      "SELECT * FROM (" +
      "SELECT 'band_rows' AS rule, n.c AS input_n, br.r AS resolved FROM n, br " +
      "UNION ALL SELECT 'entry_band_rows', nc.c, er.r FROM nc, er " +
      "UNION ALL SELECT 'graph_beam', n.c, greatest(24, 12 * ll.l) FROM n, ll " +
      "UNION ALL SELECT 'layered_rounds', n.c, greatest(4, ll.l + 2) FROM n, ll " +
      "UNION ALL SELECT 'log_layers', n.c, ll.l FROM n, ll" +
      ") ORDER BY rule"),
    // The graph index's recall monitor: the beam search's top-5 LEFT
    // JOINed against brute top-5 per query — the same evaluation core as
    // the other index families' monitors.
    "eval_graph_recall" ->
      (s"WITH $KnnGraphCtes, $NavGraphCtes, $GraphBeamCtes, $BruteTopkCtes, " +
      s"gsel AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, cid) AS rn FROM gb${graft.operators.Similarity.GraphRounds}) WHERE rn <= 5), " +
      "gbr AS (SELECT qid, cid FROM brk WHERE rn <= 5) " +
      "SELECT b.qid, CAST(sum(CASE WHEN s.cid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits, CAST(round(sum(CASE WHEN s.cid IS NOT NULL THEN 1 ELSE 0 END) * 10000.0 / count(*)) AS BIGINT) AS recall_e4 FROM gbr b LEFT JOIN gsel s ON b.qid = s.qid AND b.cid = s.cid GROUP BY b.qid ORDER BY b.qid"),
    // IVF: deterministic coarse quantizer (first-16 vectors as centroids),
    // e4-rounded cosine for ALL ordering decisions (assignment, probing,
    // final rank) with id tie-breaks — so even this approximate ANN path
    // hash-matches. Float ops run in the same order on both engines
    // (sequential dot, then one divide, then round).
    // Product quantization: normalized sub-vector codebook (stub = first-16
    // slices, same swap-in contract as IVF), argmin-L2 codes with e4-rounded
    // distances and centroid-id ties, ADC scoring = integer sum of the
    // query's e4 lookup table over the codes — every step pinned to the
    // identical op order on both engines.
    // OPQ dimension-allocation eval: exact per-dim variance numerators in
    // HUGEINT (n·Σx² − (Σx)² over e4 coords), snake assignment off one
    // row_number window, per-layout imbalance as a scale-free e4 fraction,
    // and the stub-codebook encode error with gathered (list ORDER BY d)
    // sub-vectors — the natural layout's gather equals the slice form.
    "eval_opq_allocation" ->
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), nn AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS vn FROM n), el AS (SELECT vec_id, g.i AS d, vn[g.i + 1] AS x FROM nn CROSS JOIN generate_series(0, 63) g(i)), mom AS (SELECT d, CAST(count(*) AS HUGEINT) AS cnt, sum(CAST(round(x * 10000) AS HUGEINT)) AS sx, sum(CAST(round(x * 10000) AS HUGEINT) * CAST(round(x * 10000) AS HUGEINT)) AS sxx FROM el GROUP BY d), vr AS (SELECT d, cnt * sxx - sx * sx AS vnum FROM mom), rk AS (SELECT d, vnum, row_number() OVER (ORDER BY vnum DESC, d) - 1 AS r0 FROM vr), lay AS (SELECT 'natural' AS layout, d, vnum, d // 8 AS m FROM rk UNION ALL SELECT 'opq_snake' AS layout, d, vnum, CASE WHEN (r0 // 8) % 2 = 0 THEN r0 % 8 ELSE 7 - (r0 % 8) END AS m FROM rk), imb AS (SELECT layout, CAST(CASE WHEN max(sv) <= 0 THEN 0 ELSE (max(sv) - min(sv)) * 10000 // max(sv) END AS BIGINT) AS var_imbalance_e4 FROM (SELECT layout, m, sum(vnum) AS sv FROM lay GROUP BY layout, m) GROUP BY layout), ps AS (SELECT l.layout, e.vec_id, l.m, list(e.x ORDER BY e.d) AS xm FROM el e JOIN lay l USING (d) GROUP BY l.layout, e.vec_id, l.m), cb AS (SELECT layout, vec_id AS j, m, xm AS cm FROM ps WHERE vec_id < 16), dist AS (SELECT s.layout, s.vec_id, s.m, CAST(round((list_inner_product(s.xm, s.xm) - 2.0 * list_inner_product(s.xm, c.cm) + list_inner_product(c.cm, c.cm)) * 10000) AS BIGINT) AS d2_e4 FROM ps s JOIN cb c ON s.layout = c.layout AND s.m = c.m), enc AS (SELECT layout, vec_id, m, min(d2_e4) AS mn FROM dist GROUP BY layout, vec_id, m), err AS (SELECT layout, CAST(sum(mn) AS BIGINT) AS total_err_e4 FROM enc GROUP BY layout) SELECT i.layout, i.var_imbalance_e4, e.total_err_e4 FROM imb i JOIN err e USING (layout) ORDER BY layout""",
    "sim_pq_topk" ->
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), nn AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS vn FROM n), mm AS (SELECT unnest(range(8)) AS m), subs AS (SELECT vec_id, m, vn[m*8+1 : m*8+8] AS xm FROM nn CROSS JOIN mm), cb AS (SELECT vec_id AS j, m, xm AS cm FROM subs WHERE vec_id < 16), dist AS (SELECT s.vec_id, s.m, c.j, CAST(round((list_inner_product(s.xm, s.xm) - 2.0 * list_inner_product(s.xm, c.cm) + list_inner_product(c.cm, c.cm)) * 10000) AS BIGINT) AS d2_e4 FROM subs s JOIN cb c ON s.m = c.m), codes AS (SELECT vec_id, m, j FROM (SELECT vec_id, m, j, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2_e4, j) AS rn FROM dist) WHERE rn = 1), qtab AS (SELECT s.vec_id AS qid, s.m, c.j, CAST(round(list_inner_product(s.xm, c.cm) * 10000) AS BIGINT) AS t_e4 FROM subs s JOIN cb c ON s.m = c.m WHERE s.vec_id < 10), scored AS (SELECT q.qid, co.vec_id AS cid, CAST(sum(q.t_e4) AS BIGINT) AS approx_e4 FROM codes co JOIN qtab q ON co.m = q.m AND co.j = q.j GROUP BY q.qid, co.vec_id) SELECT qid, cid, approx_e4, CAST(rn AS BIGINT) AS rn FROM (SELECT qid, cid, approx_e4, row_number() OVER (PARTITION BY qid ORDER BY approx_e4 DESC, cid) AS rn FROM scored) WHERE rn <= 5 ORDER BY qid, rn""",
    // Trained PQ: two unrolled per-subspace Lloyd iterations in the e4
    // integer domain — sub-vectors quantize once, then every distance,
    // centroid sum and ADC score is exact integer arithmetic carried in
    // DOUBLE (≤ 8e8 ≪ 2^53), so no rounding exists to diverge between
    // engines. Same carry-forward COALESCE for emptied codes as trained IVF.
    "sim_pq_trained" -> {
      // Anisotropic assignment loss (η = PqEta), exact in BIGINT at the
      // e4 scale (tops out near 5.2e18 < 2^63 — DuckDB's overflow check
      // stays quiet): (η−1)·⟨e,x⟩² + ⟨x,x⟩·⟨e,e⟩ with ⟨e,x⟩ =
      // ⟨x,x⟩−⟨x,c⟩ — the same 64-bit integers the Spark side carries in
      // LONG.
      val etaM1 = graft.operators.Similarity.PqEta - 1
      val aloss =
        s"$etaM1 * CAST(list_inner_product(s.xm, s.xm) - list_inner_product(s.xm, c.cm) AS BIGINT) * CAST(list_inner_product(s.xm, s.xm) - list_inner_product(s.xm, c.cm) AS BIGINT) + CAST(list_inner_product(s.xm, s.xm) AS BIGINT) * CAST(list_inner_product(s.xm, s.xm) - 2.0 * list_inner_product(s.xm, c.cm) + list_inner_product(c.cm, c.cm) AS BIGINT)"
      def iter(i: Int, prev: String) =
        s"a$i AS (SELECT vec_id, m, j FROM (SELECT s.vec_id, s.m, c.j, row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY $aloss, c.j) AS rn FROM subs s JOIN $prev c ON s.m = c.m) WHERE rn = 1), " +
        s"u$i AS (SELECT a.m, a.j, t.k, CAST(round(sum(s.xm[CAST(t.k AS INTEGER)]) / count(*)) AS DOUBLE) AS comp FROM a$i a JOIN subs s ON a.vec_id = s.vec_id AND a.m = s.m, range(1, 9) t(k) GROUP BY a.m, a.j, t.k), " +
        s"cb$i AS MATERIALIZED (SELECT p.m, p.j, COALESCE(u.cm, p.cm) AS cm FROM $prev p LEFT JOIN (SELECT m, j, list(comp ORDER BY k) AS cm FROM u$i GROUP BY m, j) u ON p.m = u.m AND p.j = u.j)"
      "WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "nn AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS vn FROM n), " +
      "mm AS (SELECT unnest(range(8)) AS m), " +
      "subs AS MATERIALIZED (SELECT vec_id, m, list_transform(vn[m*8+1 : m*8+8], x -> CAST(round(x * 10000) AS DOUBLE)) AS xm FROM nn CROSS JOIN mm), " +
      "cb0 AS MATERIALIZED (SELECT vec_id AS j, m, xm AS cm FROM subs WHERE vec_id < 16), " +
      iter(1, "cb0") + ", " + iter(2, "cb1") + ", " +
      s"codes AS (SELECT vec_id, m, j FROM (SELECT s.vec_id, s.m, c.j, row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY $aloss, c.j) AS rn FROM subs s JOIN cb2 c ON s.m = c.m) WHERE rn = 1), " +
      "qtab AS (SELECT s.vec_id AS qid, s.m, c.j, list_inner_product(s.xm, c.cm) AS t FROM subs s JOIN cb2 c ON s.m = c.m WHERE s.vec_id < 10), " +
      "scored AS (SELECT q.qid, co.vec_id AS cid, sum(q.t) AS approx FROM codes co JOIN qtab q ON co.m = q.m AND co.j = q.j GROUP BY q.qid, co.vec_id), " +
      "short AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY approx DESC, cid) AS srn FROM scored) WHERE srn <= 25), " +
      "nrm AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nr FROM n), " +
      "ex AS (SELECT sh.qid, sh.cid, CAST(round(list_inner_product(x.v, y.v) / (x.nr * y.nr) * 10000) AS BIGINT) AS sim_e4 FROM short sh JOIN nrm x ON sh.cid = x.vec_id JOIN nrm y ON sh.qid = y.vec_id) " +
      "SELECT qid, cid, sim_e4, CAST(rn AS BIGINT) AS rn FROM (SELECT qid, cid, sim_e4, row_number() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, cid) AS rn FROM ex) WHERE rn <= 5 ORDER BY qid, rn"
    },
    "sim_ivf_topk" ->
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings), cents AS (SELECT vec_id AS cell_id, v AS cv, nrm AS cnrm FROM n WHERE vec_id < 16), asgn AS (SELECT vec_id, cell_id FROM (SELECT n.vec_id, c.cell_id, row_number() OVER (PARTITION BY n.vec_id ORDER BY CAST(round(list_inner_product(n.v, c.cv) / (n.nrm * c.cnrm) * 10000) AS BIGINT) DESC, c.cell_id) AS rn FROM n, cents c) WHERE rn = 1), q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < 10), probes AS (SELECT qid, cell_id FROM (SELECT q.qid, c.cell_id, row_number() OVER (PARTITION BY q.qid ORDER BY CAST(round(list_inner_product(q.qv, c.cv) / (q.qn * c.cnrm) * 10000) AS BIGINT) DESC, c.cell_id) AS rn FROM q, cents c) WHERE rn <= 4), cand AS (SELECT DISTINCT p.qid, a.vec_id AS cid FROM probes p JOIN asgn a ON p.cell_id = a.cell_id), s AS (SELECT cd.qid, cd.cid, CAST(round(list_inner_product(x.v, y.qv) / (x.nrm * y.qn) * 10000) AS BIGINT) AS sim_e4 FROM cand cd JOIN n x ON cd.cid = x.vec_id JOIN q y ON cd.qid = y.qid), r AS (SELECT qid, cid, sim_e4, row_number() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, cid) AS rn FROM s) SELECT qid, cid, sim_e4, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 5 ORDER BY qid, rn""",
    // Pre-index corpus health: e6-integer per-dim sums, the integer sum
    // vector AS the mean direction (cosine is scale-invariant), e4 norms
    // and mean-cosine anisotropy with pinned divisions, dead dims by
    // min = max spread. center_ratio's 100 = the e6/e4 scale factors and
    // the two 1/n factors cancelling.
    "eval_embedding_health" ->
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings), el AS (SELECT t.d, CAST(round(v[t.d + 1] * 1000000) AS BIGINT) AS x6 FROM n, range(0, 64) t(d)), sums AS (SELECT d, sum(x6) AS sx, min(x6) AS mn, max(x6) AS mx FROM el GROUP BY d), mv AS (SELECT list(CAST(sx AS DOUBLE) ORDER BY d) AS m FROM sums), dd AS (SELECT CAST(sum(CASE WHEN mn = mx THEN 1 ELSE 0 END) AS BIGINT) AS dead_dims FROM sums), pc AS (SELECT CAST(round(n.nrm * 10000) AS BIGINT) AS nrm_e4, CAST(round(list_inner_product(n.v, mv.m) / (n.nrm * sqrt(list_inner_product(mv.m, mv.m))) * 10000) AS BIGINT) AS cos_e4 FROM n, mv) SELECT CAST(count(*) AS BIGINT) AS n_vectors, CAST(64 AS BIGINT) AS dim, min(nrm_e4) AS norm_min_e4, max(nrm_e4) AS norm_max_e4, CAST(round(sum(nrm_e4) * 1.0 / count(*)) AS BIGINT) AS norm_mean_e4, CAST(round(sum(cos_e4) * 1.0 / count(*)) AS BIGINT) AS aniso_e4, CAST(round((SELECT sqrt(list_inner_product(m, m)) FROM mv) * 100.0 / sum(nrm_e4)) AS BIGINT) AS center_ratio_e4, (SELECT dead_dims FROM dd) AS dead_dims FROM pc""",
    // nprobe sweep: the IVF oracle's chain with the probe window ranked to
    // the sweep's max depth; each candidate keeps the probe rank at which
    // it first appears (its cell's rank — one cell per vector), is scored
    // once, and is fanned out to every sweep setting ≥ that rank. recall
    // denominator = total brute rows (matching the recall monitors); scan
    // denominator = queries × corpus.
    "eval_ivf_nprobe" ->
      s"""WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings), cents AS (SELECT vec_id AS cell_id, v AS cv, nrm AS cnrm FROM n WHERE vec_id < 16), asgn AS (SELECT vec_id, cell_id FROM (SELECT n.vec_id, c.cell_id, row_number() OVER (PARTITION BY n.vec_id ORDER BY CAST(round(list_inner_product(n.v, c.cv) / (n.nrm * c.cnrm) * 10000) AS BIGINT) DESC, c.cell_id) AS rn FROM n, cents c) WHERE rn = 1), q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < 10), prk AS (SELECT qid, cell_id, CAST(rn AS BIGINT) AS pr FROM (SELECT q.qid, c.cell_id, row_number() OVER (PARTITION BY q.qid ORDER BY CAST(round(list_inner_product(q.qv, c.cv) / (q.qn * c.cnrm) * 10000) AS BIGINT) DESC, c.cell_id) AS rn FROM q, cents c) WHERE rn <= 8), sc AS (SELECT cd.qid, cd.cid, cd.pr, CAST(round(list_inner_product(x.v, y.qv) / (x.nrm * y.qn) * 10000) AS BIGINT) AS sim_e4 FROM (SELECT p.qid, a.vec_id AS cid, p.pr FROM prk p JOIN asgn a ON p.cell_id = a.cell_id) cd JOIN n x ON cd.cid = x.vec_id JOIN q y ON cd.qid = y.qid), np AS (SELECT CAST(unnest([1, 2, 4, 8]) AS BIGINT) AS nprobe), ex AS (SELECT np.nprobe, s.qid, s.cid, s.sim_e4 FROM sc s JOIN np ON s.pr <= np.nprobe), sel AS (SELECT nprobe, qid, cid FROM (SELECT nprobe, qid, cid, row_number() OVER (PARTITION BY nprobe, qid ORDER BY sim_e4 DESC, cid) AS rn FROM ex) WHERE rn <= 5), $BruteTopkCtes, br AS (SELECT qid, cid FROM brk WHERE rn <= 5), hv AS (SELECT np.nprobe, CASE WHEN s.cid IS NULL THEN 0 ELSE 1 END AS hit FROM br b CROSS JOIN np LEFT JOIN sel s ON s.nprobe = np.nprobe AND s.qid = b.qid AND s.cid = b.cid), ha AS (SELECT nprobe, CAST(sum(hit) AS BIGINT) AS hits, CAST(round(sum(hit) * 10000.0 / count(*)) AS BIGINT) AS recall_e4 FROM hv GROUP BY nprobe), cc AS (SELECT nprobe, CAST(count(*) AS BIGINT) AS cand_rows FROM ex GROUP BY nprobe), dn AS (SELECT (SELECT count(*) FROM n) AS n_corpus, (SELECT count(*) FROM q) AS n_q) SELECT h.nprobe, h.hits, h.recall_e4, c.cand_rows, CAST(round(c.cand_rows * 10000.0 / (d.n_q * d.n_corpus)) AS BIGINT) AS scan_e4 FROM ha h JOIN cc c USING (nprobe) CROSS JOIN dn d ORDER BY h.nprobe""",
    // IVF-PQ composed: the IVF oracle's cells/probes/candidates routed into
    // the PQ oracle's codes/ADC, then the exact re-rank of the shortlist —
    // every stage verbatim from its standalone oracle.
    "sim_ivfpq_topk" ->
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings), cents AS (SELECT vec_id AS cell_id, v AS cv, nrm AS cnrm FROM n WHERE vec_id < 16), asgn AS (SELECT vec_id, cell_id FROM (SELECT n.vec_id, c.cell_id, row_number() OVER (PARTITION BY n.vec_id ORDER BY CAST(round(list_inner_product(n.v, c.cv) / (n.nrm * c.cnrm) * 10000) AS BIGINT) DESC, c.cell_id) AS rn FROM n, cents c) WHERE rn = 1), q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM n WHERE vec_id < 10), probes AS (SELECT qid, cell_id FROM (SELECT q.qid, c.cell_id, row_number() OVER (PARTITION BY q.qid ORDER BY CAST(round(list_inner_product(q.qv, c.cv) / (q.qn * c.cnrm) * 10000) AS BIGINT) DESC, c.cell_id) AS rn FROM q, cents c) WHERE rn <= 4), cand AS (SELECT DISTINCT p.qid, a.vec_id AS cid FROM probes p JOIN asgn a ON p.cell_id = a.cell_id), nn AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS vn FROM n), mm AS (SELECT unnest(range(8)) AS m), subs AS (SELECT vec_id, m, vn[m*8+1 : m*8+8] AS xm FROM nn CROSS JOIN mm), cb AS (SELECT vec_id AS j, m, xm AS cm FROM subs WHERE vec_id < 16), dist AS (SELECT s.vec_id, s.m, c.j, CAST(round((list_inner_product(s.xm, s.xm) - 2.0 * list_inner_product(s.xm, c.cm) + list_inner_product(c.cm, c.cm)) * 10000) AS BIGINT) AS d2_e4 FROM subs s JOIN cb c ON s.m = c.m), codes AS (SELECT vec_id AS cid, m, j FROM (SELECT vec_id, m, j, row_number() OVER (PARTITION BY vec_id, m ORDER BY d2_e4, j) AS rn FROM dist) WHERE rn = 1), qtab AS (SELECT s.vec_id AS qid, s.m, c.j, CAST(round(list_inner_product(s.xm, c.cm) * 10000) AS BIGINT) AS t_e4 FROM subs s JOIN cb c ON s.m = c.m WHERE s.vec_id < 10), adc AS (SELECT cd.qid, cd.cid, CAST(sum(qt.t_e4) AS BIGINT) AS approx_e4 FROM cand cd JOIN codes co ON cd.cid = co.cid JOIN qtab qt ON qt.qid = cd.qid AND co.m = qt.m AND co.j = qt.j GROUP BY cd.qid, cd.cid), short AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY approx_e4 DESC, cid) AS srn FROM adc) WHERE srn <= 25), ex AS (SELECT sh.qid, sh.cid, CAST(round(list_inner_product(x.v, y.v) / (x.nrm * y.nrm) * 10000) AS BIGINT) AS sim_e4 FROM short sh JOIN n x ON sh.cid = x.vec_id JOIN n y ON sh.qid = y.vec_id) SELECT qid, cid, sim_e4, CAST(rn AS BIGINT) AS rn FROM (SELECT qid, cid, sim_e4, row_number() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, cid) AS rn FROM ex) WHERE rn <= 5 ORDER BY qid, rn""",
    // Trained IVF-PQ with per-cell residual encoding: coarse k-means over
    // the e4 NORMALIZED corpus (two unrolled Lloyd iterations, integer
    // means with COALESCE carry-forward), residual r = x − c(cell) in
    // exact e4 integers, anisotropic residual-codebook k-means (direction
    // = the original vector at e3 so the loss stays BIGINT), linear-ADC
    // scoring ⟨q,c_cell⟩ + Σ⟨q_m,cm⟩, exact re-rank of the 25-shortlist.
    "sim_ivfpq_trained" -> IvfPqTrainedRetrievalSql,
    // Serve-from-index: the retrieval result is IDENTICAL whether the
    // model is retrained in-query or read from the persisted index (the
    // stored assignment/codes are the same deterministic encode), so the
    // served query shares the trained oracle verbatim.
    "sim_ivfpq_served" -> IvfPqTrainedRetrievalSql,
    // The serving index itself: the shared training CTEs' final assignment
    // + codes, pivoted to one BIGINT column per subspace.
    "sim_ivfpq_index" ->
      (IvfPqTrainedCtes +
      " SELECT af.vec_id, af.cell_id, " +
      (0 until 8).map(i =>
        s"CAST(min(CASE WHEN co.m = $i THEN co.j END) AS BIGINT) AS c$i")
        .mkString(", ") +
      " FROM af JOIN codes co ON af.vec_id = co.vec_id GROUP BY af.vec_id, af.cell_id ORDER BY af.vec_id"),
    // Trained IVF: two unrolled deterministic Lloyd iterations. Centroids in
    // 1e-6 fixed point (exact integer sums → exact double division →
    // round-half-away), cosine is scale-invariant so the e6 integer vectors
    // are used directly; every ordering decision is e4-rounded with cell/id
    // ties — so even the TRAINED ANN path hash-matches. Cells that lose all
    // members keep their previous centroid (the COALESCE).
    "sim_ivf_trained" ->
      s"""WITH $IvfTrainedCtes, af AS (SELECT vec_id, cell_id FROM (SELECT nn.vec_id, c.cell_id, row_number() OVER (PARTITION BY nn.vec_id ORDER BY CAST(round(list_inner_product(nn.v, c.cv) / (nn.nrm * c.cnrm) * 10000) AS BIGINT) DESC, c.cell_id) AS rn FROM nn, c2n c) WHERE rn = 1), q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM nn WHERE vec_id < 10), probes AS (SELECT qid, cell_id FROM (SELECT q.qid, c.cell_id, row_number() OVER (PARTITION BY q.qid ORDER BY CAST(round(list_inner_product(q.qv, c.cv) / (q.qn * c.cnrm) * 10000) AS BIGINT) DESC, c.cell_id) AS rn FROM q, c2n c) WHERE rn <= 4), cand AS (SELECT DISTINCT p.qid, a.vec_id AS cid FROM probes p JOIN af a ON p.cell_id = a.cell_id), sc AS (SELECT cd.qid, cd.cid, CAST(round(list_inner_product(x.v, y.qv) / (x.nrm * y.qn) * 10000) AS BIGINT) AS sim_e4 FROM cand cd JOIN nn x ON cd.cid = x.vec_id JOIN q y ON cd.qid = y.qid), r AS (SELECT qid, cid, sim_e4, row_number() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, cid) AS rn FROM sc) SELECT qid, cid, sim_e4, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 5 ORDER BY qid, rn""",
    // Full k-means clustering product: the IvfTrainedCtes training chain,
    // then one assignment pass KEEPING the winning e4 cosine, plus the
    // cluster-size rollup.
    "embedding_kmeans" ->
      s"""WITH $IvfTrainedCtes, $KmeansAsgCte, sz AS (SELECT cluster_id, count(*) AS cluster_size FROM asg GROUP BY cluster_id) SELECT a.vec_id, a.cluster_id, a.sim_e4, sz.cluster_size FROM asg a JOIN sz ON a.cluster_id = sz.cluster_id ORDER BY a.vec_id""",
    // Cluster-balanced sampling: the kmeans assignment + the mix32 salted
    // hash order (salt cbal:) ranked per cluster, kept = rn <= cap.
    "sample_cluster_balanced" ->
      s"""WITH $IvfTrainedCtes, $KmeansAsgCte, p0 AS (SELECT vec_id, cluster_id, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(s2) + 1), i -> CAST(ascii(substr(s2, i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295) AS h0 FROM (SELECT vec_id, cluster_id, 'cbal:' || CAST(vec_id AS VARCHAR) AS s2 FROM asg)), p1 AS (SELECT vec_id, cluster_id, (xor(h0 >> 16, h0) * 73244475) & 4294967295 AS x1 FROM p0), p2 AS (SELECT vec_id, cluster_id, (xor(x1 >> 16, x1) * 73244475) & 4294967295 AS x2 FROM p1), hh AS (SELECT vec_id, cluster_id, xor(x2 >> 16, x2) % 1000000007 AS hv FROM p2), r AS (SELECT vec_id, cluster_id, CAST(row_number() OVER (PARTITION BY cluster_id ORDER BY hv, vec_id) AS BIGINT) AS rn FROM hh) SELECT vec_id, cluster_id, rn, CAST(CASE WHEN rn <= ${graft.operators.Similarity.ClusterCap} THEN 1 ELSE 0 END AS BIGINT) AS kept FROM r ORDER BY vec_id""",
    "dedup_simhash" ->
      s"""$SimhashCtes SELECT doc_id, simhash FROM fpall ORDER BY doc_id""",
    "dedup_simhash_pairs" ->
      s"""$SimhashPairCtes SELECT d1, d2, hamming FROM ham ORDER BY d1, d2""",
    // Edit-distance verify stage on the SAME simhash candidate set: both
    // engines run textbook unit-cost Levenshtein (ASCII corpus, so char
    // and codepoint distances coincide); greatest(len, 1) pins the
    // two-empty-texts pair to similarity 10000 instead of 0/0.
    "dedup_editdist" ->
      s"""$SimhashPairCtes, ed AS (SELECT h.d1, h.d2, h.hamming, CAST(levenshtein(x.text, y.text) AS BIGINT) AS editdist, CAST(greatest(length(x.text), length(y.text), 1) AS BIGINT) AS glen FROM ham h JOIN documents x ON h.d1 = x.doc_id JOIN documents y ON h.d2 = y.doc_id) SELECT d1, d2, hamming, editdist, CAST(round((1.0 - CAST(editdist AS DOUBLE) / glen) * 10000) AS BIGINT) AS sim_e4, CAST(CASE WHEN round((1.0 - CAST(editdist AS DOUBLE) / glen) * 10000) >= ${graft.operators.Dedup.EditDupSimE4} THEN 1 ELSE 0 END AS BIGINT) AS dup FROM ed ORDER BY d1, d2""",
    // Incremental near-dup: the oracle checks the Hamming balls DIRECTLY
    // (batch × corpus quadratic is fine at oracle scale); the Spark side's
    // band join has exact pigeonhole recall for maxHamming < bands, so the
    // two formulations agree row for row.
    "dedup_incremental_neardup" ->
      s"""$SimhashCtes, src AS (SELECT f.doc_id, f.simhash, d.source FROM fpall f JOIN documents d ON f.doc_id = d.doc_id), bfp AS (SELECT doc_id, simhash FROM src WHERE source = 'src19'), cfp AS (SELECT doc_id, simhash FROM src WHERE source <> 'src19'), ch AS (SELECT DISTINCT b.doc_id FROM bfp b JOIN cfp c ON bit_count(xor(b.simhash, c.simhash)) <= 3), bh AS (SELECT DISTINCT b.doc_id FROM bfp b JOIN bfp a ON a.doc_id < b.doc_id AND bit_count(xor(a.simhash, b.simhash)) <= 3) SELECT b.doc_id, CAST(CASE WHEN ch.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS corpus_dup, CAST(CASE WHEN bh.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS batch_dup, CAST(CASE WHEN ch.doc_id IS NULL AND bh.doc_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep FROM bfp b LEFT JOIN ch ON b.doc_id = ch.doc_id LEFT JOIN bh ON b.doc_id = bh.doc_id ORDER BY b.doc_id""",
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01') ORDER BY c_custkey""",
    "join_outer" ->
      """WITH oc AS (SELECT o_custkey, count(*) AS n_orders, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_c FROM orders GROUP BY o_custkey) SELECT c_custkey, c_name, COALESCE(n_orders, 0) AS n_orders, COALESCE(spend_c, 0) AS spend_c FROM customer LEFT JOIN oc ON c_custkey = o_custkey ORDER BY c_custkey""",
    "pivot_status" ->
      """SELECT o_orderpriority, CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F", CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O", CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P" FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    // Unpivot = the pivot's long form INCLUDING the zero-filled cells
    // (the semantics a direct groupBy would lose): every priority ×
    // status combination, count coalesced to 0.
    "unpivot_status" ->
      """WITH st AS (SELECT unnest(['F', 'O', 'P']) AS o_orderstatus), pr AS (SELECT DISTINCT o_orderpriority FROM orders), c AS (SELECT o_orderpriority, o_orderstatus, count(*) AS n FROM orders GROUP BY 1, 2) SELECT p.o_orderpriority, s.o_orderstatus, CAST(COALESCE(c.n, 0) AS BIGINT) AS n FROM pr p CROSS JOIN st s LEFT JOIN c ON p.o_orderpriority = c.o_orderpriority AND s.o_orderstatus = c.o_orderstatus ORDER BY p.o_orderpriority, s.o_orderstatus""",
    "window_range_frame" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, CAST(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day, CAST(round(o_totalprice * 100) AS BIGINT) AS total_c FROM orders) SELECT o_custkey, o_orderkey, day, CAST(sum(total_c) OVER (PARTITION BY o_custkey ORDER BY day RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS window_c FROM o ORDER BY o_custkey, day, o_orderkey""",
    "agg_quantiles" ->
      """SELECT o_orderpriority, count(*) AS cnt, CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS p50_c, CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS p90_c, CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS p99_c FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "agg_rollup" ->
      """SELECT CAST(grouping(n_name) AS BIGINT) AS g_n, CAST(grouping(o_orderpriority) AS BIGINT) AS g_p, n_name, o_orderpriority, count(*) AS cnt FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey GROUP BY ROLLUP (n_name, o_orderpriority) ORDER BY g_n, g_p, n_name ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    "window_rank" ->
      """SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn FROM (SELECT o_custkey, o_orderkey, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "window_suite" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS total_c FROM orders) SELECT o_custkey, o_orderkey, total_c, CAST(rank() OVER w AS BIGINT) AS rnk, CAST(dense_rank() OVER w AS BIGINT) AS drnk, lag(total_c, 1) OVER w AS prev_c, lead(total_c, 1) OVER w AS next_c FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY total_c DESC, o_orderkey) ORDER BY o_custkey, rnk, o_orderkey""",
    // Distribution windows: percent_rank/cume_dist are one double divide
    // in the same op order on both engines (singleton partitions give
    // 0.0/1.0 identically — verified), e4-rounded; nth_value(2) under
    // the default running frame is NULL until the second row.
    "window_distribution" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS total_c FROM orders) SELECT o_custkey, o_orderkey, total_c, CAST(round(percent_rank() OVER w * 10000) AS BIGINT) AS pr_e4, CAST(round(cume_dist() OVER w * 10000) AS BIGINT) AS cd_e4, first_value(total_c) OVER w AS best_c, nth_value(total_c, 2) OVER w AS second_c FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY total_c DESC, o_orderkey) ORDER BY o_custkey, o_orderkey""",
    "agg_cube" ->
      """SELECT CAST(grouping(o_orderstatus) AS BIGINT) AS g_s, CAST(grouping(o_orderpriority) AS BIGINT) AS g_p, o_orderstatus, o_orderpriority, count(*) AS cnt, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_c FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority) ORDER BY g_s, g_p, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    "window_running" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, CAST(round(value * 100) AS BIGINT) AS v_c FROM events) SELECT user_id, event_id, ts_us, CAST(sum(v_c) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_c FROM e ORDER BY user_id, ts_us, event_id""",
    "events_tumbling" ->
      """WITH e AS (SELECT epoch_us(ts) // 3600000000 AS hour_idx, event_type FROM events) SELECT hour_idx, event_type, count(*) AS cnt FROM e GROUP BY hour_idx, event_type ORDER BY hour_idx, event_type""",
    // Hilbert layout audit: the zorder comparison extended with the
    // stronger curve at a common 15-bit code. The Hilbert index is
    // sequential per bit level, so the oracle folds a PACKED state
    // (x | y<<16 | d<<32) through the classic xy2d step with
    // list_reduce — the same packed fold the Spark side runs in its
    // aggregate HOF, integer CASE/shift/mask only.
    "layout_hilbert" ->
      """WITH e AS (SELECT event_id, user_id AS u, epoch_us(ts) AS t FROM events), st AS (SELECT min(u) AS minu, max(u) AS maxu, min(t) AS mint, max(t) AS maxt, (max(u) - min(u)) // 32767 + 1 AS qu, (max(t) - min(t)) // 32767 + 1 AS qt FROM e), nrm AS (SELECT event_id, u, t, ((u - minu) // qu) * 32767 // greatest(1, (maxu - minu) // qu) AS ua, ((t - mint) // qt) * 32767 // greatest(1, (maxt - mint) // qt) AS ta, (t - mint) // ((maxt - mint) // 64 + 1) AS lb FROM e CROSS JOIN st), hk AS (SELECT event_id, (list_reduce(list_prepend(ua | (ta << 16), list_transform(generate_series(14, 0, -1), i -> CAST(i AS BIGINT))), (acc, i) -> (CASE WHEN ((((acc >> 16) & 32767) >> i) & 1) = 1 THEN (acc & 32767) WHEN (((acc & 32767) >> i) & 1) = 1 THEN 32767 - ((acc >> 16) & 32767) ELSE ((acc >> 16) & 32767) END) | ((CASE WHEN ((((acc >> 16) & 32767) >> i) & 1) = 1 THEN ((acc >> 16) & 32767) WHEN (((acc & 32767) >> i) & 1) = 1 THEN 32767 - (acc & 32767) ELSE (acc & 32767) END) << 16) | (((acc >> 32) + (xor(3 * (((acc & 32767) >> i) & 1), (((acc >> 16) & 32767) >> i) & 1) << (2*i))) << 32)) >> 56) AS bucket FROM nrm), zk AS (SELECT nrm.event_id, CAST(sum((((nrm.ua >> s.i) & 1) << (2*s.i)) + (((nrm.ta >> s.i) & 1) << (2*s.i + 1))) AS BIGINT) >> 24 AS bucket FROM nrm CROSS JOIN generate_series(0, 14) s(i) GROUP BY nrm.event_id), a AS (SELECT 'hilbert' AS layout, hk.bucket, nrm.u, nrm.t FROM hk JOIN nrm USING (event_id) UNION ALL SELECT 'linear' AS layout, lb AS bucket, u, t FROM nrm UNION ALL SELECT 'zorder' AS layout, zk.bucket, nrm.u, nrm.t FROM zk JOIN nrm USING (event_id)) SELECT layout, bucket, count(*) AS n, min(u) AS min_u, max(u) AS max_u, max(u) - min(u) AS span_u, min(t) AS min_t, max(t) AS max_t, max(t) - min(t) AS span_t FROM a GROUP BY layout, bucket ORDER BY layout, bucket""",
    // Layout trade-off eval: scan fraction for BOTH query shapes
    // (point-user probes, equal-spaced time-range windows) under all
    // three layouts — the decision table, both sides of the trade.
    "eval_layout_tradeoff" ->
      """WITH e AS (SELECT event_id, user_id AS u, epoch_us(ts) AS t FROM events), st AS (SELECT min(u) AS minu, max(u) AS maxu, min(t) AS mint, max(t) AS maxt, (max(u) - min(u)) // 32767 + 1 AS qu, (max(t) - min(t)) // 32767 + 1 AS qt FROM e), nrm AS (SELECT event_id, u, t, ((u - minu) // qu) * 32767 // greatest(1, (maxu - minu) // qu) AS ua, ((t - mint) // qt) * 32767 // greatest(1, (maxt - mint) // qt) AS ta, (t - mint) // ((maxt - mint) // 64 + 1) AS lb FROM e CROSS JOIN st), hk AS (SELECT event_id, (list_reduce(list_prepend(ua | (ta << 16), list_transform(generate_series(14, 0, -1), i -> CAST(i AS BIGINT))), (acc, i) -> (CASE WHEN ((((acc >> 16) & 32767) >> i) & 1) = 1 THEN (acc & 32767) WHEN (((acc & 32767) >> i) & 1) = 1 THEN 32767 - ((acc >> 16) & 32767) ELSE ((acc >> 16) & 32767) END) | ((CASE WHEN ((((acc >> 16) & 32767) >> i) & 1) = 1 THEN ((acc >> 16) & 32767) WHEN (((acc & 32767) >> i) & 1) = 1 THEN 32767 - (acc & 32767) ELSE (acc & 32767) END) << 16) | (((acc >> 32) + (xor(3 * (((acc & 32767) >> i) & 1), (((acc >> 16) & 32767) >> i) & 1) << (2*i))) << 32)) >> 56) AS bucket FROM nrm), zk AS (SELECT nrm.event_id, CAST(sum((((nrm.ua >> s.i) & 1) << (2*s.i)) + (((nrm.ta >> s.i) & 1) << (2*s.i + 1))) AS BIGINT) >> 24 AS bucket FROM nrm CROSS JOIN generate_series(0, 14) s(i) GROUP BY nrm.event_id), a AS (SELECT 'hilbert' AS layout, hk.bucket, nrm.u, nrm.t FROM hk JOIN nrm USING (event_id) UNION ALL SELECT 'linear' AS layout, lb AS bucket, u, t FROM nrm UNION ALL SELECT 'zorder' AS layout, zk.bucket, nrm.u, nrm.t FROM zk JOIN nrm USING (event_id)), aud AS (SELECT layout, bucket, min(u) AS min_u, max(u) AS max_u, min(t) AS min_t, max(t) AS max_t FROM a GROUP BY layout, bucket), pu AS (SELECT DISTINCT user_id AS pv FROM events ORDER BY pv LIMIT 10), pt AS (SELECT DISTINCT mint + k * ((maxt - mint) // 10) AS ps, mint + k * ((maxt - mint) // 10) + ((maxt - mint) // 64) AS pe FROM st CROSS JOIN generate_series(0, 9) g(k)), r AS (SELECT layout, 'user_point' AS probe, count(DISTINCT bucket) AS n_buckets, count(DISTINCT pv) AS n_probes, CAST(sum(CASE WHEN pv BETWEEN min_u AND max_u THEN 1 ELSE 0 END) AS BIGINT) AS scanned FROM aud CROSS JOIN pu GROUP BY layout UNION ALL SELECT layout, 'time_range' AS probe, count(DISTINCT bucket) AS n_buckets, count(DISTINCT ps) AS n_probes, CAST(sum(CASE WHEN min_t <= pe AND max_t >= ps THEN 1 ELSE 0 END) AS BIGINT) AS scanned FROM aud CROSS JOIN pt GROUP BY layout) SELECT layout, probe, n_buckets, n_probes, scanned, scanned * 10000 // (n_buckets * n_probes) AS scan_e4 FROM r ORDER BY layout, probe""",
    // Layout skip eval: scan fraction of a user_id point query under
    // each layout — a file bucket is scanned iff the probe lands in
    // its [min_u, max_u] footer range (min/max pruning, measured).
    "eval_layout_skip" ->
      """WITH e AS (SELECT event_id, user_id AS u, epoch_us(ts) AS t FROM events), st AS (SELECT min(u) AS minu, max(u) AS maxu, min(t) AS mint, max(t) AS maxt, (max(u) - min(u)) // 65535 + 1 AS qu, (max(t) - min(t)) // 65535 + 1 AS qt FROM e), nrm AS (SELECT event_id, u, t, ((u - minu) // qu) * 65535 // greatest(1, (maxu - minu) // qu) AS ua, ((t - mint) // qt) * 65535 // greatest(1, (maxt - mint) // qt) AS ta, (t - mint) // ((maxt - mint) // 64 + 1) AS lb FROM e CROSS JOIN st), zk AS (SELECT nrm.event_id, CAST(sum((((nrm.ua >> s.i) & 1) << (2*s.i)) + (((nrm.ta >> s.i) & 1) << (2*s.i + 1))) AS BIGINT) >> 26 AS bucket FROM nrm CROSS JOIN generate_series(0, 15) s(i) GROUP BY nrm.event_id), a AS (SELECT 'zorder' AS layout, zk.bucket, nrm.u FROM zk JOIN nrm USING (event_id) UNION ALL SELECT 'linear' AS layout, lb AS bucket, u FROM nrm), aud AS (SELECT layout, bucket, min(u) AS min_u, max(u) AS max_u FROM a GROUP BY layout, bucket), p AS (SELECT DISTINCT user_id AS pu FROM events ORDER BY pu LIMIT 10) SELECT layout, count(DISTINCT bucket) AS n_buckets, count(DISTINCT pu) AS n_probes, CAST(sum(CASE WHEN pu BETWEEN min_u AND max_u THEN 1 ELSE 0 END) AS BIGINT) AS scanned, CAST(sum(CASE WHEN pu BETWEEN min_u AND max_u THEN 1 ELSE 0 END) AS BIGINT) * 10000 // (count(DISTINCT bucket) * count(DISTINCT pu)) AS scan_e4 FROM aud CROSS JOIN p GROUP BY layout ORDER BY layout""",
    // Z-order layout audit: per candidate file bucket under the Morton
    // layout vs the time-linear one, the min/max footer stats a pruner
    // consults. Dimension codes by the two-step exact normalization
    // (scale down by q = range//65535+1, overflow-free, then stretch
    // over the full 16 bits so small domains reach the top key bits),
    // the 32-bit key as a 16-step bit-interleave over generate_series,
    // buckets as fixed-width key ranges (zkey >> 26 → 64).
    "layout_zorder" ->
      """WITH e AS (SELECT event_id, user_id AS u, epoch_us(ts) AS t FROM events), st AS (SELECT min(u) AS minu, max(u) AS maxu, min(t) AS mint, max(t) AS maxt, (max(u) - min(u)) // 65535 + 1 AS qu, (max(t) - min(t)) // 65535 + 1 AS qt FROM e), nrm AS (SELECT event_id, u, t, ((u - minu) // qu) * 65535 // greatest(1, (maxu - minu) // qu) AS ua, ((t - mint) // qt) * 65535 // greatest(1, (maxt - mint) // qt) AS ta, (t - mint) // ((maxt - mint) // 64 + 1) AS lb FROM e CROSS JOIN st), zk AS (SELECT nrm.event_id, CAST(sum((((nrm.ua >> s.i) & 1) << (2*s.i)) + (((nrm.ta >> s.i) & 1) << (2*s.i + 1))) AS BIGINT) >> 26 AS bucket FROM nrm CROSS JOIN generate_series(0, 15) s(i) GROUP BY nrm.event_id), a AS (SELECT 'zorder' AS layout, zk.bucket, nrm.u, nrm.t FROM zk JOIN nrm USING (event_id) UNION ALL SELECT 'linear' AS layout, lb AS bucket, u, t FROM nrm) SELECT layout, bucket, count(*) AS n, min(u) AS min_u, max(u) AS max_u, max(u) - min(u) AS span_u, min(t) AS min_t, max(t) AS max_t, max(t) - min(t) AS span_t FROM a GROUP BY layout, bucket ORDER BY layout, bucket""",
    // 3-D z-order audit: event_type enters as its dense alphabetical
    // code; 10 bits/dim, 30-bit key, bucket = key >> 24 (64 buckets).
    // Same divide-first normalization and per-event bit-sum fold as the
    // 2-D oracle, one more interleaved dimension.
    "layout_zorder_3d" ->
      """WITH e0 AS (SELECT event_id, user_id AS u, epoch_us(ts) AS t, event_type FROM events), cm AS (SELECT event_type, CAST(dense_rank() OVER (ORDER BY event_type) - 1 AS BIGINT) AS c FROM (SELECT DISTINCT event_type FROM e0)), e AS (SELECT e0.event_id, e0.u, e0.t, cm.c FROM e0 JOIN cm USING (event_type)), st AS (SELECT min(u) AS minu, max(u) AS maxu, min(t) AS mint, max(t) AS maxt, min(c) AS minc, max(c) AS maxc, (max(u) - min(u)) // 1023 + 1 AS qu, (max(t) - min(t)) // 1023 + 1 AS qt, (max(c) - min(c)) // 1023 + 1 AS qc FROM e), nrm AS (SELECT event_id, u, t, c, ((u - minu) // qu) * 1023 // greatest(1, (maxu - minu) // qu) AS ua, ((t - mint) // qt) * 1023 // greatest(1, (maxt - mint) // qt) AS ta, ((c - minc) // qc) * 1023 // greatest(1, (maxc - minc) // qc) AS ca, (t - mint) // ((maxt - mint) // 64 + 1) AS lb FROM e CROSS JOIN st), zk AS (SELECT nrm.event_id, CAST(sum((((nrm.ua >> s.i) & 1) << (3*s.i)) + (((nrm.ta >> s.i) & 1) << (3*s.i + 1)) + (((nrm.ca >> s.i) & 1) << (3*s.i + 2))) AS BIGINT) >> 24 AS bucket FROM nrm CROSS JOIN generate_series(0, 9) s(i) GROUP BY nrm.event_id), a AS (SELECT 'zorder' AS layout, zk.bucket, nrm.u, nrm.t, nrm.c FROM zk JOIN nrm USING (event_id) UNION ALL SELECT 'linear' AS layout, lb AS bucket, u, t, c FROM nrm) SELECT layout, bucket, count(*) AS n, min(u) AS min_u, max(u) AS max_u, max(u) - min(u) AS span_u, min(t) AS min_t, max(t) AS max_t, max(t) - min(t) AS span_t, min(c) AS min_c, max(c) AS max_c, max(c) - min(c) AS span_c FROM a GROUP BY layout, bucket ORDER BY layout, bucket""",
    // 3-D skip eval: the 3-D audit's CTE chain reduced to scan fractions
    // for all three probe shapes (user-point / time-range / type-point)
    // under zorder vs linear — the modeled twin of LayoutMeasure's
    // measured table. Time probes dedup by ps (pe is ps-functional).
    "eval_layout_skip_3d" ->
      """WITH e0 AS (SELECT event_id, user_id AS u, epoch_us(ts) AS t, event_type FROM events), cm AS (SELECT event_type, CAST(dense_rank() OVER (ORDER BY event_type) - 1 AS BIGINT) AS c FROM (SELECT DISTINCT event_type FROM e0)), e AS (SELECT e0.event_id, e0.u, e0.t, cm.c FROM e0 JOIN cm USING (event_type)), st AS (SELECT min(u) AS minu, max(u) AS maxu, min(t) AS mint, max(t) AS maxt, min(c) AS minc, max(c) AS maxc, (max(u) - min(u)) // 1023 + 1 AS qu, (max(t) - min(t)) // 1023 + 1 AS qt, (max(c) - min(c)) // 1023 + 1 AS qc FROM e), nrm AS (SELECT event_id, u, t, c, ((u - minu) // qu) * 1023 // greatest(1, (maxu - minu) // qu) AS ua, ((t - mint) // qt) * 1023 // greatest(1, (maxt - mint) // qt) AS ta, ((c - minc) // qc) * 1023 // greatest(1, (maxc - minc) // qc) AS ca, (t - mint) // ((maxt - mint) // 64 + 1) AS lb FROM e CROSS JOIN st), zk AS (SELECT nrm.event_id, CAST(sum((((nrm.ua >> s.i) & 1) << (3*s.i)) + (((nrm.ta >> s.i) & 1) << (3*s.i + 1)) + (((nrm.ca >> s.i) & 1) << (3*s.i + 2))) AS BIGINT) >> 24 AS bucket FROM nrm CROSS JOIN generate_series(0, 9) s(i) GROUP BY nrm.event_id), a AS (SELECT 'zorder' AS layout, zk.bucket, nrm.u, nrm.t, nrm.c FROM zk JOIN nrm USING (event_id) UNION ALL SELECT 'linear' AS layout, lb AS bucket, u, t, c FROM nrm), aud AS (SELECT layout, bucket, min(u) AS min_u, max(u) AS max_u, min(t) AS min_t, max(t) AS max_t, min(c) AS min_c, max(c) AS max_c FROM a GROUP BY layout, bucket), up AS (SELECT u AS pv FROM (SELECT DISTINCT u FROM e) ORDER BY u LIMIT 10), tp AS (SELECT DISTINCT c AS pv FROM e), tr AS (SELECT mint + k * ((maxt - mint) // 10) AS ps, mint + k * ((maxt - mint) // 10) + ((maxt - mint) // 64) AS pe FROM st CROSS JOIN generate_series(0, 9) s(k) GROUP BY 1, 2), r1 AS (SELECT layout, 'user_point' AS probe, count(DISTINCT bucket) AS n_buckets, count(DISTINCT pv) AS n_probes, CAST(sum(CASE WHEN pv BETWEEN min_u AND max_u THEN 1 ELSE 0 END) AS BIGINT) AS scanned FROM aud CROSS JOIN up GROUP BY layout), r2 AS (SELECT layout, 'time_range' AS probe, count(DISTINCT bucket) AS n_buckets, count(DISTINCT ps) AS n_probes, CAST(sum(CASE WHEN min_t <= pe AND max_t >= ps THEN 1 ELSE 0 END) AS BIGINT) AS scanned FROM aud CROSS JOIN tr GROUP BY layout), r3 AS (SELECT layout, 'type_point' AS probe, count(DISTINCT bucket) AS n_buckets, count(DISTINCT pv) AS n_probes, CAST(sum(CASE WHEN pv BETWEEN min_c AND max_c THEN 1 ELSE 0 END) AS BIGINT) AS scanned FROM aud CROSS JOIN tp GROUP BY layout) SELECT layout, probe, n_buckets, n_probes, scanned, scanned * 10000 // (n_buckets * n_probes) AS scan_e4 FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3) ORDER BY layout, probe""",
    // A/B readout: variant by salted user hash (stable under growth),
    // per-arm users/converters/e4 rate (one pinned integer division).
    "events_experiment" ->
      """WITH u AS (SELECT user_id, max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted FROM events GROUP BY user_id), v AS (SELECT CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length('exp:' || CAST(user_id AS VARCHAR)) + 1), i -> CAST(ascii(substr('exp:' || CAST(user_id AS VARCHAR), i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295) % 2 = 0 THEN 'control' ELSE 'treatment' END AS variant, converted FROM u) SELECT variant, count(*) AS n_users, CAST(sum(converted) AS BIGINT) AS n_converted, CAST(round(sum(converted) * 10000.0 / count(*)) AS BIGINT) AS rate_e4 FROM v GROUP BY variant ORDER BY variant""",
    // Sliding 1h/15min windows: each event belongs to the 4 windows
    // starting at its slide quarter minus 0..3.
    "events_sliding" ->
      """WITH e AS (SELECT epoch_us(ts) // 900000000 AS slide_idx, event_type FROM events), x AS (SELECT slide_idx - k AS win_idx, event_type FROM e CROSS JOIN range(0, 4) t(k) WHERE slide_idx - k >= 0) SELECT win_idx, CAST(win_idx * 900000000 AS BIGINT) AS win_start_us, event_type, count(*) AS cnt FROM x GROUP BY win_idx, event_type ORDER BY win_idx, event_type""",
    "events_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events), l AS (SELECT user_id, event_id, ts_us, CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) > 1800000000 THEN 1 ELSE 0 END AS new_s FROM e), s AS (SELECT user_id, event_id, ts_us, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM l) SELECT user_id, session_id, count(*) AS n_events, CAST(min(ts_us) AS BIGINT) AS start_us, CAST(max(ts_us) AS BIGINT) AS end_us FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""",
    // Interval overlap join: the shared sessionize CTEs (intervals A) x
    // the top-K busiest hours (intervals B, exact integer counts with
    // hour ties) on s < hr+1h AND e >= hr.
    "join_interval_overlap" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events), l AS (SELECT user_id, event_id, ts_us, CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) > 1800000000 THEN 1 ELSE 0 END AS new_s FROM e), s AS (SELECT user_id, event_id, ts_us, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM l), sess AS (SELECT user_id, session_id, CAST(min(ts_us) AS BIGINT) AS start_us, CAST(max(ts_us) AS BIGINT) AS end_us FROM s GROUP BY user_id, session_id), busy AS (SELECT hour_us, n_events_hour FROM (SELECT CAST(ts_us - ts_us % 3600000000 AS BIGINT) AS hour_us, count(*) AS n_events_hour FROM e GROUP BY 1) ORDER BY n_events_hour DESC, hour_us LIMIT ${graft.operators.Events.BusyHoursK}) SELECT sess.user_id, sess.session_id, sess.start_us, sess.end_us, busy.hour_us, CAST(busy.n_events_hour AS BIGINT) AS n_events_hour FROM sess JOIN busy ON sess.start_us < busy.hour_us + 3600000000 AND sess.end_us >= busy.hour_us ORDER BY user_id, session_id, hour_us""",
    // Corpus x corpus interval join: bin each session to its covering
    // hours, equi-join on the bin, verify real overlap, distinct the
    // boundary-straddling double hits.
    "join_interval_allpairs" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events), l AS (SELECT user_id, event_id, ts_us, CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) > 1800000000 THEN 1 ELSE 0 END AS new_s FROM e), s AS (SELECT user_id, event_id, ts_us, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM l), sess AS (SELECT user_id, session_id, CAST(min(ts_us) AS BIGINT) AS start_us, CAST(max(ts_us) AS BIGINT) AS end_us FROM s GROUP BY user_id, session_id), binned AS (SELECT user_id, session_id, start_us, end_us, unnest(range(start_us // 3600000000, end_us // 3600000000 + 1)) AS bin FROM sess) SELECT DISTINCT a.user_id AS user_a, a.session_id AS session_a, b.user_id AS user_b, b.session_id AS session_b, greatest(a.start_us, b.start_us) AS ov_start_us, least(a.end_us, b.end_us) AS ov_end_us, least(a.end_us, b.end_us) - greatest(a.start_us, b.start_us) AS overlap_us FROM binned a JOIN binned b ON a.bin = b.bin AND (a.user_id < b.user_id OR (a.user_id = b.user_id AND a.session_id < b.session_id)) AND a.start_us <= b.end_us AND b.start_us <= a.end_us ORDER BY user_a, session_a, user_b, session_b""",
    // Per-type value histogram: integer cents, width = (hi-lo+bins) div
    // bins, bin = (v-lo) div width — all-integer equal-width binning.
    "events_value_histogram" -> {
      val b = graft.operators.Events.HistBins
      s"""WITH c AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events), bd AS (SELECT event_type, min(v) AS lo, max(v) AS hi, (max(v) - min(v) + $b) // $b AS w FROM c GROUP BY event_type) SELECT c.event_type, CAST((c.v - bd.lo) // bd.w AS BIGINT) AS bin, CAST(bd.lo + ((c.v - bd.lo) // bd.w) * bd.w AS BIGINT) AS lo_e2, CAST(bd.lo + ((c.v - bd.lo) // bd.w + 1) * bd.w AS BIGINT) AS hi_e2, count(*) AS n FROM c JOIN bd USING (event_type) GROUP BY 1, 2, 3, 4 ORDER BY event_type, bin"""
    },
    // Native session_window twin: the operator merges on INCLUSIVE
    // overlap (an exact 30:00 gap still merges — verified by planted
    // test, same split rule as the lag form's strict >), with its window
    // output (start = first event, end = last event + gap).
    "events_sessionize_native" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events), l AS (SELECT user_id, event_id, ts_us, CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) > 1800000000 THEN 1 ELSE 0 END AS new_s FROM e), s AS (SELECT user_id, ts_us, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid FROM l) SELECT user_id, CAST(min(ts_us) AS BIGINT) AS start_us, CAST(max(ts_us) + 1800000000 AS BIGINT) AS end_us, CAST(count(*) AS BIGINT) AS n_events FROM s GROUP BY user_id, sid ORDER BY user_id, start_us""",
    // Ordered first-touch funnel: each stage's min is constrained to land
    // strictly after the previous stage's min — same CTE chain shape as
    // the Spark side's keyed aggregates.
    "events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events), t1 AS (SELECT user_id, min(ts_us) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id), t2 AS (SELECT e.user_id, min(e.ts_us) AS t2 FROM e JOIN t1 ON e.user_id = t1.user_id WHERE e.event_type = 'click' AND e.ts_us > t1.t1 GROUP BY e.user_id), t3 AS (SELECT e.user_id, min(e.ts_us) AS t3 FROM e JOIN t2 ON e.user_id = t2.user_id WHERE e.event_type = 'purchase' AND e.ts_us > t2.t2 GROUP BY e.user_id), u AS (SELECT DISTINCT user_id FROM e) SELECT u.user_id, CAST(COALESCE(t1.t1, -1) AS BIGINT) AS view_us, CAST(COALESCE(t2.t2, -1) AS BIGINT) AS click_us, CAST(COALESCE(t3.t3, -1) AS BIGINT) AS purchase_us, CAST(CASE WHEN t3.t3 IS NOT NULL THEN 3 WHEN t2.t2 IS NOT NULL THEN 2 WHEN t1.t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage FROM u LEFT JOIN t1 ON u.user_id = t1.user_id LEFT JOIN t2 ON u.user_id = t2.user_id LEFT JOIN t3 ON u.user_id = t3.user_id ORDER BY u.user_id""",
    // Windowed funnel: the same first-touch staging with each stage
    // bounded to one hour past the previous stage's time.
    "events_funnel_windowed" -> {
      val w = graft.operators.Events.FunnelWindowUs
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events), t1 AS (SELECT user_id, min(ts_us) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id), t2 AS (SELECT e.user_id, min(e.ts_us) AS t2 FROM e JOIN t1 ON e.user_id = t1.user_id WHERE e.event_type = 'click' AND e.ts_us > t1.t1 AND e.ts_us <= t1.t1 + $w GROUP BY e.user_id), t3 AS (SELECT e.user_id, min(e.ts_us) AS t3 FROM e JOIN t2 ON e.user_id = t2.user_id WHERE e.event_type = 'purchase' AND e.ts_us > t2.t2 AND e.ts_us <= t2.t2 + $w GROUP BY e.user_id), u AS (SELECT DISTINCT user_id FROM e) SELECT u.user_id, CAST(COALESCE(t1.t1, -1) AS BIGINT) AS view_us, CAST(COALESCE(t2.t2, -1) AS BIGINT) AS click_us, CAST(COALESCE(t3.t3, -1) AS BIGINT) AS purchase_us, CAST(CASE WHEN t3.t3 IS NOT NULL THEN 3 WHEN t2.t2 IS NOT NULL THEN 2 WHEN t1.t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage FROM u LEFT JOIN t1 ON u.user_id = t1.user_id LEFT JOIN t2 ON u.user_id = t2.user_id LEFT JOIN t3 ON u.user_id = t3.user_id ORDER BY u.user_id"""
    },
    // Last-touch attribution: native ASOF picks the same deterministic
    // (user, µs)-deduped event representative as the carry-forward window.
    "events_attribution" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS t, arg_max(event_type, event_id) AS etype FROM events WHERE event_type <> 'purchase' GROUP BY 1, 2), p AS (SELECT user_id, epoch_us(ts) AS t, CAST(round(value * 100) AS BIGINT) AS val_c FROM events WHERE event_type = 'purchase'), j AS (SELECT p.val_c, t.etype FROM p ASOF LEFT JOIN t ON p.user_id = t.user_id AND p.t >= t.t) SELECT COALESCE(etype, 'none') AS touch_type, count(*) AS n_purchases, CAST(sum(val_c) AS BIGINT) AS value_c FROM j GROUP BY 1 ORDER BY 1""",
    // Cohort retention triangle: cohort = first active day; a user is at
    // most one row per day after the DISTINCT, so cells are plain counts.
    "events_retention" ->
      """WITH days AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events), cohort AS (SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id), act AS (SELECT c.cohort_day, d.day - c.cohort_day AS offset_days, count(*) AS n_users FROM days d JOIN cohort c ON d.user_id = c.user_id GROUP BY 1, 2), sizes AS (SELECT cohort_day, count(*) AS cohort_size FROM cohort GROUP BY 1) SELECT a.cohort_day, a.offset_days, a.n_users, s.cohort_size, CAST(round(a.n_users * 10000.0 / s.cohort_size) AS BIGINT) AS ret_e4 FROM act a JOIN sizes s ON a.cohort_day = s.cohort_day ORDER BY a.cohort_day, a.offset_days""",
    // Event-path transitions: one lead() window over the sessionize
    // ordering, counts per (from, to) type pair, rank-total-ordered.
    "events_paths" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events), l AS (SELECT event_type AS from_type, lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS to_type FROM e) SELECT from_type, to_type, count(*) AS cnt FROM l WHERE to_type IS NOT NULL GROUP BY 1, 2 ORDER BY cnt DESC, from_type, to_type""",
    // Hourly volume z-scores per event type: moments are exact integer sums
    // (n, Σc, Σc²), the float tail (one divide, IEEE sqrt, one divide,
    // e4-round) runs in the same op order on both engines; zero-variance
    // series pin z to 0 via the CASE guard.
    "events_anomaly" ->
      """WITH hourly AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour_idx, count(*) AS cnt FROM events GROUP BY 1, 2), stats AS (SELECT event_type, count(*) AS n, sum(CAST(cnt AS HUGEINT)) AS s, sum(CAST(cnt AS HUGEINT) * cnt) AS q FROM hourly GROUP BY 1), z AS (SELECT h.event_type, h.hour_idx, h.cnt, CAST(CASE WHEN st.n * st.q = st.s * st.s THEN 0 ELSE round((h.cnt - CAST(st.s AS DOUBLE) / st.n) / sqrt(CAST(st.n * st.q - st.s * st.s AS DOUBLE) / (st.n * st.n)) * 10000) END AS BIGINT) AS z_e4 FROM hourly h JOIN stats st USING (event_type)) SELECT event_type, hour_idx, cnt, z_e4, CAST(CASE WHEN abs(z_e4) >= 30000 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly FROM z ORDER BY event_type, hour_idx""",
    // Dense twin: the same moments/z/flag tail over the zero-filled
    // (global hour range × observed types) calendar, so silent hours flag.
    "events_anomaly_dense" ->
      """WITH hourly AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour_idx, count(*) AS cnt FROM events GROUP BY 1, 2), b AS (SELECT min(hour_idx) AS lo, max(hour_idx) AS hi FROM hourly), hrs AS (SELECT unnest(range(lo, hi + 1)) AS hour_idx FROM b), dense AS (SELECT t.event_type, h.hour_idx, COALESCE(x.cnt, 0) AS cnt FROM (SELECT DISTINCT event_type FROM hourly) t CROSS JOIN hrs h LEFT JOIN hourly x ON t.event_type = x.event_type AND h.hour_idx = x.hour_idx), stats AS (SELECT event_type, count(*) AS n, sum(CAST(cnt AS HUGEINT)) AS s, sum(CAST(cnt AS HUGEINT) * cnt) AS q FROM dense GROUP BY 1), z AS (SELECT h.event_type, h.hour_idx, h.cnt, CAST(CASE WHEN st.n * st.q = st.s * st.s THEN 0 ELSE round((h.cnt - CAST(st.s AS DOUBLE) / st.n) / sqrt(CAST(st.n * st.q - st.s * st.s AS DOUBLE) / (st.n * st.n)) * 10000) END AS BIGINT) AS z_e4 FROM dense h JOIN stats st USING (event_type)) SELECT event_type, hour_idx, cnt, z_e4, CAST(CASE WHEN abs(z_e4) >= 30000 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly FROM z ORDER BY event_type, hour_idx""",
    "join_asof" ->
      """WITH o AS (SELECT o_custkey AS user_id, epoch_us(o_orderdate) AS t, max(o_orderkey) AS o_orderkey FROM orders GROUP BY 1, 2), e AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events) SELECT e.event_id, e.user_id, e.t AS ts_us, COALESCE(o.o_orderkey, -1) AS asof_orderkey, COALESCE(o.t, -1) AS asof_us FROM e ASOF LEFT JOIN o ON e.user_id = o.user_id AND e.t >= o.t ORDER BY event_id""",
    // Tolerance-bounded as-of (attribution window): each purchase's native
    // ASOF view match survives only within the 24h staleness bound; older
    // matches collapse to the -1 sentinel.
    "join_asof_tolerance" ->
      s"""WITH v AS (SELECT user_id, epoch_us(ts) AS t, max(event_id) AS view_id FROM events WHERE event_type = 'view' GROUP BY 1, 2), p AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events WHERE event_type = 'purchase') SELECT p.event_id, p.user_id, p.t AS ts_us, CASE WHEN v.t IS NOT NULL AND p.t - v.t <= ${graft.operators.Events.AsofTolUs} THEN v.view_id ELSE -1 END AS asof_view_id, CASE WHEN v.t IS NOT NULL AND p.t - v.t <= ${graft.operators.Events.AsofTolUs} THEN v.t ELSE -1 END AS asof_us FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.t >= v.t ORDER BY event_id""",
    // Forward as-of: DuckDB's native ASOF with the <= comparator picks the
    // smallest order time at-or-after each event.
    "join_asof_fwd" ->
      """WITH o AS (SELECT o_custkey AS user_id, epoch_us(o_orderdate) AS t, max(o_orderkey) AS o_orderkey FROM orders GROUP BY 1, 2), e AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events) SELECT e.event_id, e.user_id, e.t AS ts_us, COALESCE(o.o_orderkey, -1) AS next_orderkey, COALESCE(o.t, -1) AS next_us FROM e ASOF LEFT JOIN o ON e.user_id = o.user_id AND e.t <= o.t ORDER BY event_id""",
    // Nearest as-of: both native ASOF directions composed, then the
    // row-local distance choice with backward winning ties — the same
    // decision the engine's two carry windows make.
    "join_asof_nearest" ->
      """WITH o AS (SELECT o_custkey AS user_id, epoch_us(o_orderdate) AS t, max(o_orderkey) AS o_orderkey FROM orders GROUP BY 1, 2), e AS (SELECT event_id, user_id, epoch_us(ts) AS t FROM events), bk AS (SELECT e.event_id, o.o_orderkey AS pk, o.t AS pu FROM e ASOF LEFT JOIN o ON e.user_id = o.user_id AND e.t >= o.t), fw AS (SELECT e.event_id, o.o_orderkey AS nk, o.t AS nu FROM e ASOF LEFT JOIN o ON e.user_id = o.user_id AND e.t <= o.t) SELECT e.event_id, e.user_id, e.t AS ts_us, CASE WHEN b.pu IS NOT NULL AND (f.nu IS NULL OR e.t - b.pu <= f.nu - e.t) THEN b.pk ELSE COALESCE(f.nk, -1) END AS nearest_orderkey, CASE WHEN b.pu IS NOT NULL AND (f.nu IS NULL OR e.t - b.pu <= f.nu - e.t) THEN b.pu ELSE COALESCE(f.nu, -1) END AS nearest_us FROM e JOIN bk b ON e.event_id = b.event_id JOIN fw f ON e.event_id = f.event_id ORDER BY e.event_id""",
    "join_range" ->
      """WITH bands(band_id, lo, hi) AS (SELECT * FROM (VALUES (CAST(0 AS BIGINT), 0.0, 1.0), (CAST(1 AS BIGINT), 1.0, 4.0), (CAST(2 AS BIGINT), 4.0, 16.0), (CAST(3 AS BIGINT), 16.0, 64.0), (CAST(4 AS BIGINT), 64.0, 128.0), (CAST(5 AS BIGINT), 128.0, 256.0), (CAST(6 AS BIGINT), 256.0, 1024.0))) SELECT band_id, count(*) AS cnt, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi GROUP BY band_id ORDER BY band_id""",
    "text_ngrams" ->
      s"""WITH toks AS (SELECT regexp_extract_all(lower(text), '$Tok') AS w FROM documents), bi AS (SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram FROM toks) SELECT bigram, count(*) AS cnt FROM bi GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 20""",
    // Bigram LM quality score: add-one-smoothed bigram probabilities from
    // the corpus itself, e4-rounded per bigram TYPE before the per-doc sum
    // — all-long arithmetic, so the trained scorer hash-matches (rule R2
    // keeps log-probs out; this is the rational-probability analog).
    "text_lm_score" ->
      s"""WITH $LmCtes SELECT d.doc_id, COALESCE(s.n_bigrams, 0) AS n_bigrams, COALESCE(s.lm_score_e4, 0) AS lm_score_e4, CAST(CASE WHEN s.n_bigrams IS NULL THEN 0 ELSE round(s.lm_score_e4 * 1.0 / s.n_bigrams) END AS BIGINT) AS lm_mean_e4 FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id ORDER BY d.doc_id""",
    // DSIR importance weights: smoothed target/source unigram ratio per
    // term (target = the quality gate's accepted set), one pinned
    // divide-then-scale double per term, all-long document sums.
    "data_selection_dsir" ->
      s"""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '$Tok') AS w FROM documents), tf AS (SELECT doc_id, word, count(*) AS tf FROM (SELECT doc_id, unnest(w) AS word FROM toks) GROUP BY doc_id, word), q AS (SELECT doc_id FROM (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_toks, CAST(len(list_filter(w, x -> list_contains(['the','a','and','of','is','to','in'], x))) AS BIGINT) AS stop_hits FROM toks) WHERE n_toks >= 5 AND stop_hits > 0), cs AS (SELECT word, CAST(sum(tf) AS BIGINT) AS c_s FROM tf GROUP BY word), ct AS (SELECT word, CAST(sum(tf) AS BIGINT) AS c_t FROM tf JOIN q USING (doc_id) GROUP BY word), tot AS (SELECT CAST(COALESCE(sum(c_s), 0) AS BIGINT) AS ns, count(*) AS v FROM cs), tt AS (SELECT CAST(COALESCE(sum(c_t), 0) AS BIGINT) AS nt FROM ct), model AS (SELECT cs.word, CAST(round((CAST((COALESCE(ct.c_t, 0) + 1) * (tot.ns + tot.v) AS DOUBLE) / CAST((cs.c_s + 1) * (tt.nt + tot.v) AS DOUBLE)) * 10000.0) AS BIGINT) AS ratio_e4 FROM cs LEFT JOIN ct ON cs.word = ct.word CROSS JOIN tot CROSS JOIN tt), scored AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_terms, CAST(sum(tf * ratio_e4) AS BIGINT) AS dsir_sum_e4 FROM tf JOIN model USING (word) GROUP BY doc_id) SELECT d.doc_id, COALESCE(s.n_terms, 0) AS n_terms, COALESCE(s.dsir_sum_e4, 0) AS dsir_sum_e4, CAST(CASE WHEN s.n_terms IS NULL THEN 0 ELSE round(s.dsir_sum_e4 * 1.0 / s.n_terms) END AS BIGINT) AS dsir_mean_e4 FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id ORDER BY d.doc_id""",
    // CCNet bucketing: the LM score's per-doc mean split into per-language
    // thirds by ntile over a TOTAL order (score desc, doc_id) — positional
    // assignment, so both engines agree including remainder handling.
    "text_ccnet_bucket" ->
      s"""WITH $LmCtes, lm AS (SELECT d.doc_id, d.lang, CAST(CASE WHEN s.n_bigrams IS NULL THEN 0 ELSE round(s.lm_score_e4 * 1.0 / s.n_bigrams) END AS BIGINT) AS lm_mean_e4 FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id), tiled AS (SELECT doc_id, lang, lm_mean_e4, ntile(3) OVER (PARTITION BY lang ORDER BY lm_mean_e4 DESC, doc_id) AS tile FROM lm) SELECT doc_id, lang, lm_mean_e4, CASE WHEN tile = 1 THEN 'head' WHEN tile = 2 THEN 'middle' ELSE 'tail' END AS bucket FROM tiled ORDER BY doc_id""",
    // Per-source percentile calibration of the shared LM-fluency score:
    // rank within source (score desc, doc_id), pct = (rank-1)e4/(n-1)
    // (single-doc sources pin to 0), keep = each source's top half.
    "text_quality_calibrated" ->
      s"""WITH $LmCtes, lm AS (SELECT d.doc_id, d.source, CAST(CASE WHEN s.n_bigrams IS NULL THEN 0 ELSE round(s.lm_score_e4 * 1.0 / s.n_bigrams) END AS BIGINT) AS lm_mean_e4 FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id), rk AS (SELECT doc_id, source, lm_mean_e4, CAST(row_number() OVER (PARTITION BY source ORDER BY lm_mean_e4 DESC, doc_id) AS BIGINT) AS rn, CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_source FROM lm) SELECT doc_id, source, lm_mean_e4, rn, CAST(CASE WHEN n_source = 1 THEN 0 ELSE round((rn - 1) * 10000.0 / (n_source - 1)) END AS BIGINT) AS pct_e4, CAST(CASE WHEN (CASE WHEN n_source = 1 THEN 0 ELSE round((rn - 1) * 10000.0 / (n_source - 1)) END) <= ${graft.operators.TextAnalytics.CalibKeepE4} THEN 1 ELSE 0 END AS BIGINT) AS keep FROM rk ORDER BY doc_id""",
    // Discounted normalized PMI (Mikolov 2013 phrase score), one pinned
    // double expression over exact integer counts — multiplication order
    // mirrors the Spark column exactly: ((1e4·(c_ab−δ))·N)/(c_a·c_b).
    "text_phrases_pmi" ->
      s"""WITH t AS (SELECT regexp_extract_all(lower(text), '$Tok') AS toks FROM documents), uc AS (SELECT w, count(*) AS c FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w), n AS (SELECT COALESCE(CAST(sum(c) AS BIGINT), 0) AS n_uni FROM uc), bc AS (SELECT bigram, count(*) AS c_ab FROM (SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bigram FROM t) GROUP BY bigram HAVING count(*) > ${TextAnalytics.PhraseDelta}), j AS (SELECT bigram, c_ab, a.c AS c_a, b.c AS c_b FROM bc JOIN uc a ON split_part(bc.bigram, ' ', 1) = a.w JOIN uc b ON split_part(bc.bigram, ' ', 2) = b.w) SELECT bigram, c_ab, c_a, c_b, CAST(round(10000.0 * (c_ab - ${TextAnalytics.PhraseDelta}) * n_uni / (c_a * c_b)) AS BIGINT) AS score_e4 FROM j CROSS JOIN n ORDER BY score_e4 DESC, bigram LIMIT ${TextAnalytics.PhraseTopK}""",
    "text_df_terms" ->
      s"""WITH t AS (SELECT DISTINCT doc_id, word FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '$Tok')) AS word FROM documents)) SELECT word, count(*) AS df FROM t GROUP BY word ORDER BY df DESC, word""",
    "text_langid" ->
      s"""WITH $LangidCtes SELECT doc_id, lang, en_s, de_s, es_s, fr_s, $LangPredSql AS pred FROM s ORDER BY doc_id""",
    // Confusion matrix of the marker classifier against the labeled
    // corpus: per (true, predicted) counts + the within-language share —
    // the same LangidCtes/LangPredSql as text_langid by construction.
    "eval_langid_confusion" ->
      s"""WITH $LangidCtes, p AS (SELECT lang, $LangPredSql AS pred FROM s), m AS (SELECT lang, pred, count(*) AS n FROM p GROUP BY 1, 2) SELECT lang, pred, n, CAST(round(n * 10000.0 / sum(n) OVER (PARTITION BY lang)) AS BIGINT) AS share_e4 FROM m ORDER BY lang, pred""",
    // Trained character-trigram language ID: per-lang top-20 trigram
    // profiles (count-desc/trigram-asc ties) from the labeled corpus, then
    // distinct-trigram overlap argmax (score-desc/lang-asc ties, 'und' on
    // zero overlap). All integer counts + pinned ties ⇒ the trained
    // classifier hash-matches.
    "text_langid_ngram" ->
      """WITH base AS (SELECT doc_id, lang, CASE WHEN length(text) >= 3 THEN list_transform(range(1, length(text) - 1), i -> substr(lower(text), i, 3)) ELSE CAST([] AS VARCHAR[]) END AS tgs FROM documents), tr AS (SELECT lang, unnest(tgs) AS tg FROM base), pc AS (SELECT lang, tg, count(*) AS c FROM tr GROUP BY lang, tg), prof AS (SELECT lang AS plang, tg FROM (SELECT lang, tg, row_number() OVER (PARTITION BY lang ORDER BY c DESC, tg) AS rn FROM pc) WHERE rn <= 20), dt AS (SELECT DISTINCT doc_id, tg FROM (SELECT doc_id, unnest(tgs) AS tg FROM base)), sc AS (SELECT doc_id, plang, count(*) AS score FROM dt JOIN prof ON dt.tg = prof.tg GROUP BY doc_id, plang), best AS (SELECT doc_id, plang, score FROM (SELECT doc_id, plang, score, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang) AS rn FROM sc) WHERE rn = 1) SELECT d.doc_id, d.lang, COALESCE(best.plang, 'und') AS pred_ng, CAST(COALESCE(best.score, 0) AS BIGINT) AS score, CAST(CASE WHEN COALESCE(best.plang, 'und') = d.lang THEN 1 ELSE 0 END AS BIGINT) AS is_match FROM documents d LEFT JOIN best ON d.doc_id = best.doc_id ORDER BY d.doc_id""",
    "text_quality" ->
      s"""WITH t AS (SELECT doc_id, length(replace(text, ' ', '')) AS alpha_len, regexp_extract_all(lower(text), '$Tok') AS w FROM documents), s AS (SELECT doc_id, alpha_len, CAST(len(w) AS BIGINT) AS n_toks, CAST(len(list_filter(w, x -> list_contains(['the','a','and','of','is','to','in'], x))) AS BIGINT) AS stop_hits FROM t) SELECT doc_id, n_toks, CAST(round(alpha_len * 10000.0 / n_toks) AS BIGINT) AS avg_len_e4, CAST(round(stop_hits * 10000.0 / n_toks) AS BIGINT) AS stop_e4, CAST(CASE WHEN n_toks >= 5 AND stop_hits > 0 THEN 1 ELSE 0 END AS BIGINT) AS ok FROM s ORDER BY doc_id""",
    // Gopher rule battery (Rae et al. 2021 App. A): raw-text word/line
    // metrics in e4 fixed point, stop-word presence over the tokenizer
    // stream, keep = the full conjunction at the paper's thresholds.
    "text_gopher" ->
      s"""WITH g AS (SELECT doc_id, text, list_filter(string_split(text, ' '), w -> w <> '') AS ws, string_split(text, chr(10)) AS lines, regexp_extract_all(lower(text), '$Tok') AS toks FROM documents), m AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words, CAST(length(replace(text, ' ', '')) AS BIGINT) AS wchars, CAST(length(text) - length(replace(text, '#', '')) AS BIGINT) AS hash_n, CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT) AS ell_n, CAST(len(list_filter(lines, l -> list_contains(['•','-','*'], substr(ltrim(l), 1, 1)))) AS BIGINT) AS bullet_lines, CAST(len(list_filter(lines, l -> ends_with(rtrim(l), '...') OR ends_with(rtrim(l), '…'))) AS BIGINT) AS ell_lines, CAST(len(lines) AS BIGINT) AS n_lines, CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS alpha_words, CAST(len(list_filter(['the','a','and','of','is','to','in'], x -> list_contains(toks, x))) AS BIGINT) AS stop_present FROM g), sc AS (SELECT doc_id, n_words, CAST(CASE WHEN n_words = 0 THEN 0 ELSE round(wchars * 10000.0 / n_words) END AS BIGINT) AS mean_len_e4, CAST(CASE WHEN n_words = 0 THEN 0 ELSE round((hash_n + ell_n) * 10000.0 / n_words) END AS BIGINT) AS symbol_e4, CAST(CASE WHEN n_lines = 0 THEN 0 ELSE round(bullet_lines * 10000.0 / n_lines) END AS BIGINT) AS bullet_e4, CAST(CASE WHEN n_lines = 0 THEN 0 ELSE round(ell_lines * 10000.0 / n_lines) END AS BIGINT) AS ellipsis_e4, CAST(CASE WHEN n_words = 0 THEN 0 ELSE round(alpha_words * 10000.0 / n_words) END AS BIGINT) AS alpha_e4, stop_present FROM m) SELECT doc_id, n_words, mean_len_e4, symbol_e4, bullet_e4, ellipsis_e4, alpha_e4, stop_present, CAST(CASE WHEN n_words BETWEEN 50 AND 100000 AND mean_len_e4 BETWEEN 30000 AND 100000 AND symbol_e4 <= 1000 AND bullet_e4 <= 1000 AND ellipsis_e4 <= 3000 AND alpha_e4 >= 8000 AND stop_present >= 2 THEN 1 ELSE 0 END AS BIGINT) AS keep FROM sc ORDER BY doc_id""",
    // Gopher repetition battery (Rae et al. 2021 App. A table A1): one
    // UNION ALL fan-out over lines / paragraphs / nine gram widths; items
    // reduce to the same 114-bit fingerprint pair the Spark side shuffles
    // (grams never group as strings), then per-unit duplicate fractions
    // and count-weighted character masses; the top gram is row_number()=1
    // by (count desc, h1, h2) — the mirror of the Spark
    // min(struct(-c, h1, h2)) pick. Thresholds are interpolated from the
    // TextAnalytics constants so they cannot drift.
    "text_gopher_rep" -> {
      val grams = (2 to 10).map { n =>
        val cat = (0 until n).map(j => if (j == 0) "w[i]" else s"w[i+$j]")
          .mkString(" || ' ' || ")
        s"UNION ALL SELECT doc_id, dlen, 'G$n' AS unit, unnest(list_transform(range(1, len(w) + ${2 - n}), i -> $cat)) AS item FROM dd"
      }.mkString(" ")
      val pivotCols = (Seq(
        ("L", "dup_frac_e4", "dup_line_e4"), ("L", "dup_char_e4", "dup_line_char_e4"),
        ("P", "dup_frac_e4", "dup_para_e4"), ("P", "dup_char_e4", "dup_para_char_e4")) ++
        (2 to 4).map(n => (s"G$n", "top_doc_e4", s"top${n}_e4")) ++
        (5 to 10).map(n => (s"G$n", "dup_doc_e4", s"dup${n}_e4")))
      val pivotSql = pivotCols.map { case (u, src, out) =>
        s"COALESCE(max(CASE WHEN unit = '$u' THEN $src END), 0) AS $out" }.mkString(", ")
      val finalCols = pivotCols.map(_._3)
      val finalSql = finalCols.map(c => s"COALESCE(p.$c, 0) AS $c").mkString(", ")
      val ta = graft.operators.TextAnalytics
      val keepConds = Seq(
        s"COALESCE(p.dup_line_e4, 0) <= ${ta.GopherMaxDupLineE4}",
        s"COALESCE(p.dup_para_e4, 0) <= ${ta.GopherMaxDupParaE4}",
        s"COALESCE(p.dup_line_char_e4, 0) <= ${ta.GopherMaxDupLineCharE4}",
        s"COALESCE(p.dup_para_char_e4, 0) <= ${ta.GopherMaxDupParaCharE4}") ++
        (2 to 4).map(n => s"COALESCE(p.top${n}_e4, 0) <= ${ta.GopherMaxTopGramE4(n)}") ++
        (5 to 10).map(n => s"COALESCE(p.dup${n}_e4, 0) <= ${ta.GopherMaxDupGramE4(n)}")
      s"""WITH dd AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS dlen, regexp_extract_all(lower(text), '$Tok') AS w FROM documents), items AS (SELECT doc_id, dlen, 'L' AS unit, unnest(list_filter(string_split(text, chr(10)), x -> x <> '')) AS item FROM dd UNION ALL SELECT doc_id, dlen, 'P' AS unit, unnest(list_filter(string_split(text, chr(10) || chr(10)), x -> x <> '')) AS item FROM dd $grams), ph AS (SELECT doc_id, dlen, unit, ${GopherRepFold(31)} AS h1, ${GopherRepFold(37)} AS h2, CAST(length(item) AS BIGINT) AS len FROM items), pc AS (SELECT doc_id, dlen, unit, h1, h2, max(len) AS len, count(*) AS c FROM ph GROUP BY doc_id, dlen, unit, h1, h2), pu AS (SELECT doc_id, dlen, unit, CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS nd, CAST(sum(c * len) AS BIGINT) AS tot, CAST(sum(CASE WHEN c > 1 THEN c * len ELSE 0 END) AS BIGINT) AS dupchars FROM pc GROUP BY doc_id, dlen, unit), tp AS (SELECT doc_id, unit, CAST(c * len AS BIGINT) AS topmass FROM (SELECT doc_id, unit, c, len, row_number() OVER (PARTITION BY doc_id, unit ORDER BY c DESC, h1, h2) AS rn FROM pc) WHERE rn = 1), m AS (SELECT pu.doc_id, pu.unit, CAST(CASE WHEN n = 0 THEN 0 ELSE round((n - nd) * 10000.0 / n) END AS BIGINT) AS dup_frac_e4, CAST(CASE WHEN tot = 0 THEN 0 ELSE round(dupchars * 10000.0 / tot) END AS BIGINT) AS dup_char_e4, CAST(CASE WHEN dlen = 0 THEN 0 ELSE round(topmass * 10000.0 / dlen) END AS BIGINT) AS top_doc_e4, CAST(CASE WHEN dlen = 0 THEN 0 ELSE round(dupchars * 10000.0 / dlen) END AS BIGINT) AS dup_doc_e4 FROM pu JOIN tp ON pu.doc_id = tp.doc_id AND pu.unit = tp.unit), p AS (SELECT doc_id, $pivotSql FROM m GROUP BY doc_id) SELECT d.doc_id, $finalSql, CAST(CASE WHEN ${keepConds.mkString(" AND ")} THEN 1 ELSE 0 END AS BIGINT) AS keep FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id ORDER BY d.doc_id"""
    },
    // Trained quality twin: weak labels from the heuristic ok flag,
    // add-one-smoothed per-token likelihood ratios in pinned-order double
    // arithmetic, integer sums for the document scores.
    "text_quality_trained" ->
      s"""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '$Tok') AS w FROM documents), lab AS (SELECT doc_id, CAST(CASE WHEN len(w) >= 5 AND len(list_filter(w, x -> list_contains(['the','a','and','of','is','to','in'], x))) > 0 THEN 1 ELSE 0 END AS BIGINT) AS ok FROM t), occ AS (SELECT doc_id, unnest(w) AS word FROM t), tf AS (SELECT doc_id, word, count(*) AS tf FROM occ GROUP BY 1, 2), tfl AS (SELECT tf.doc_id, tf.word, tf.tf, lab.ok FROM tf JOIN lab ON tf.doc_id = lab.doc_id), tot AS (SELECT sum(CASE WHEN ok = 1 THEN tf ELSE 0 END) AS n_ok, sum(CASE WHEN ok = 0 THEN tf ELSE 0 END) AS n_bad, count(DISTINCT word) AS v FROM tfl), model AS (SELECT word, CAST(round(10000.0 * (sum(CASE WHEN ok = 1 THEN tf ELSE 0 END) + 1) * CAST(t2.n_bad + t2.v AS DOUBLE) / ((sum(CASE WHEN ok = 0 THEN tf ELSE 0 END) + 1) * CAST(t2.n_ok + t2.v AS DOUBLE))) AS BIGINT) AS w_e4 FROM tfl, tot t2 GROUP BY word, t2.n_ok, t2.n_bad, t2.v), sc AS (SELECT f.doc_id, CAST(sum(f.tf) AS BIGINT) AS n_toks, CAST(sum(f.tf * m.w_e4) AS BIGINT) AS score_e4 FROM tfl f JOIN model m ON f.word = m.word GROUP BY f.doc_id) SELECT d.doc_id, lab.ok, COALESCE(sc.n_toks, 0) AS n_toks, COALESCE(sc.score_e4, 0) AS score_e4, CAST(CASE WHEN sc.n_toks IS NULL THEN 0 ELSE round(sc.score_e4 / sc.n_toks) END AS BIGINT) AS mean_e4, CAST(CASE WHEN sc.n_toks IS NOT NULL AND round(sc.score_e4 / sc.n_toks) > 10000 THEN 1 ELSE 0 END AS BIGINT) AS pred_ok FROM documents d JOIN lab ON d.doc_id = lab.doc_id LEFT JOIN sc ON d.doc_id = sc.doc_id ORDER BY d.doc_id""",
    "text_tokens" ->
      s"""SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens, CAST(len(regexp_extract_all(lower(text), '$Tok')) AS BIGINT) AS re_tokens, CAST(len(regexp_extract_all(lower(text), '[a-z]+|[^a-z ]')) AS BIGINT) AS piece_tokens, CAST(length(text) AS BIGINT) AS text_len FROM documents ORDER BY doc_id""",
    // Context-length planning table: fixed token-length bands per source
    // (band_lo = largest edge <= n, descending CASE generated from the
    // same LengthBands constant the engine folds), per-band doc/token
    // mass with a pinned per-source e4 share.
    "text_length_bands" -> {
      val cases = graft.operators.TextAnalytics.LengthBands.tail.reverse
        .map(e => s"WHEN n >= $e THEN $e").mkString(" ")
      s"""WITH d AS (SELECT source, CAST(len(regexp_extract_all(lower(text), '$Tok')) AS BIGINT) AS n FROM documents), b AS (SELECT source, CAST(CASE $cases ELSE ${graft.operators.TextAnalytics.LengthBands.head} END AS BIGINT) AS band_lo, n FROM d), g AS (SELECT source, band_lo, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n) AS BIGINT) AS tokens FROM b GROUP BY source, band_lo), t AS (SELECT source, sum(tokens) AS st FROM g GROUP BY source) SELECT g.source, g.band_lo, g.n_docs, g.tokens, CAST(CASE WHEN t.st = 0 THEN 0 ELSE round(g.tokens * 10000.0 / t.st) END AS BIGINT) AS share_e4 FROM g JOIN t ON g.source = t.source ORDER BY g.source, g.band_lo"""
    },
    // Corpus-relative length trim: exact discrete percentiles over BIGINT
    // token counts, one 2-value aggregate cross-joined back.
    "text_length_filter" ->
      s"""WITH c AS (SELECT doc_id, CAST(len(regexp_extract_all(lower(text), '$Tok')) AS BIGINT) AS n_toks FROM documents), cuts AS (SELECT CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY n_toks) AS BIGINT) AS lo, CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY n_toks) AS BIGINT) AS hi FROM c) SELECT doc_id, n_toks, lo, hi, CAST(CASE WHEN n_toks >= lo AND n_toks <= hi THEN 1 ELSE 0 END AS BIGINT) AS keep FROM c, cuts ORDER BY doc_id""",
    "agg_grouping_sets" ->
      """SELECT CAST(grouping(o_orderstatus) AS BIGINT) AS g_s, CAST(grouping(o_orderpriority) AS BIGINT) AS g_p, o_orderstatus, o_orderpriority, count(*) AS cnt, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_c FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority)) ORDER BY g_s, g_p, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    // Per-group Pearson correlation: integer-cent moments in HUGEINT (the
    // Decimal(38,0) twin), then the pinned tail — numerator and the two
    // variance terms cast to double, two IEEE sqrts, one divide, e4 round.
    "agg_correlation" ->
      """WITH m AS (SELECT l_returnflag, count(*) AS n, sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sx, sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy, sum(CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy, sum(CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT)) AS sxx, sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS syy FROM lineitem GROUP BY l_returnflag) SELECT l_returnflag, n, CAST(CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN 0 ELSE round(CAST(n * sxy - sx * sy AS DOUBLE) / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) * 10000) END AS BIGINT) AS corr_e4 FROM m ORDER BY l_returnflag""",
    // Column profiles: one 1-row aggregate per profiled column, unioned;
    // min/max cast to string for the uniform report schema (integer and
    // varchar columns only — doubles stay out by rule R2).
    "data_profile" -> {
      def prof(c: String) =
        s"""SELECT '$c' AS "column", count(*) AS n_rows, CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, count(DISTINCT $c) AS n_distinct, CAST(min($c) AS VARCHAR) AS min_v, CAST(max($c) AS VARCHAR) AS max_v FROM documents"""
      Seq("doc_id", "lang", "source", "n_chars").map(prof)
        .mkString("SELECT * FROM (", " UNION ALL ", """) ORDER BY "column"""")
    },
    // Expectation battery: PK uniqueness, FK anti-joins, null rates,
    // domain constraints — one row per check with the violation count.
    "data_expectations" ->
      """WITH pk AS (SELECT CAST(COALESCE(sum(CASE WHEN c > 1 THEN c ELSE 0 END), 0) AS BIGINT) AS violations FROM (SELECT o_orderkey, count(*) AS c FROM orders GROUP BY 1)), fko AS (SELECT count(*) AS violations FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)), fkl AS (SELECT count(*) AS violations FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)), nc AS (SELECT CAST(COALESCE(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS violations FROM customer), rd AS (SELECT CAST(COALESCE(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS violations FROM lineitem), rq AS (SELECT CAST(COALESCE(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS violations FROM lineitem), eo AS (SELECT CAST(COALESCE(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END), 0) AS BIGINT) AS violations FROM orders), u AS (SELECT 'pk_orders_unique' AS "check", violations FROM pk UNION ALL SELECT 'fk_orders_customer', violations FROM fko UNION ALL SELECT 'fk_lineitem_orders', violations FROM fkl UNION ALL SELECT 'null_customer_name', violations FROM nc UNION ALL SELECT 'range_discount_0_1', violations FROM rd UNION ALL SELECT 'range_quantity_pos', violations FROM rq UNION ALL SELECT 'enum_orderstatus', violations FROM eo) SELECT "check", violations, CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS pass FROM u ORDER BY "check"""",
    // Log-free TF-IDF twin: tf·N/df — rule-R2-clean (no libm ln), so unlike
    // text_tfidf this weighting is hash-checked end to end.
    "text_tfidf_linear" ->
      s"""WITH terms AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '$Tok')) AS word FROM documents), tf AS (SELECT doc_id, word, count(*) AS tf FROM terms GROUP BY doc_id, word), df AS (SELECT word, count(*) AS df FROM (SELECT DISTINCT doc_id, word FROM terms) GROUP BY word), n AS (SELECT count(*) AS n FROM documents) SELECT tf.doc_id, tf.word, tf.tf, df.df, CAST(round(tf.tf * 10000.0 * n.n / df.df) AS BIGINT) AS w_e4 FROM tf JOIN df ON tf.word = df.word, n ORDER BY tf.doc_id, tf.word""",
    // BM25 retrieval scoring with the log-free Robertson–Spärck Jones idf
    // kernel (rule R2 — no libm log in hash-matched outputs): exact-integer
    // tf/df/dl/N in, a pinned IEEE float chain (idf division; dl/avgdl → ·b
    // → +(1−b) → ·k1 → +tf; tf·(k1+1); multiply) then one e4 round.
    "text_bm25" -> {
      val (k1, b) = (TextAnalytics.Bm25K1, TextAnalytics.Bm25B)
      s"""WITH tf AS (SELECT doc_id, word, count(*) AS tf FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '$Tok')) AS word FROM documents) GROUP BY 1, 2), dfx AS (SELECT word, count(*) AS df FROM tf GROUP BY word), q AS (SELECT word, df FROM dfx ORDER BY df DESC, word LIMIT ${TextAnalytics.Bm25Terms}), dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id), st AS (SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS nd, CAST((SELECT sum(tf) FROM tf) AS DOUBLE) / CAST((SELECT count(*) FROM documents) AS DOUBLE) AS avgdl), sc AS (SELECT q.word, t.doc_id, t.tf, q.df, CAST(round(((st.nd - q.df + 0.5) / (q.df + 0.5)) * ((t.tf * ${k1 + 1.0}) / (t.tf + $k1 * (${1.0 - b} + $b * (d.dl / st.avgdl)))) * 10000.0) AS BIGINT) AS score_e4 FROM tf t JOIN q ON t.word = q.word JOIN dl d ON t.doc_id = d.doc_id CROSS JOIN st), r AS (SELECT word, doc_id, tf, df, score_e4, row_number() OVER (PARTITION BY word ORDER BY score_e4 DESC, doc_id) AS rn FROM sc) SELECT word, doc_id, tf, df, score_e4, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= ${TextAnalytics.Bm25TopK} ORDER BY word, rn"""
    },
    "text_fingerprint" ->
      """SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(text) + 1), i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))), (h, c) -> ((h * 31 + c) & 4294967295)) AS fp FROM documents ORDER BY doc_id""",
    "dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_dups, text FROM documents GROUP BY text ORDER BY keep_id""",
    // CCNet-normalized exact dedup: lowercase → strip non-[a-z0-9 ] →
    // collapse spaces → trim, then the min-survivor group; the audit
    // fingerprint is the shared polyHash of the normalized text.
    "dedup_exact_normalized" ->
      """WITH nt AS (SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm FROM documents), g AS (SELECT norm, min(doc_id) AS keep_id, count(*) AS n_dups FROM nt GROUP BY norm) SELECT nt.doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(nt.norm) + 1), i -> CAST(ascii(substr(nt.norm, i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295) AS norm_fp, g.keep_id, g.n_dups, CAST(CASE WHEN nt.doc_id = g.keep_id THEN 1 ELSE 0 END AS BIGINT) AS keep FROM nt JOIN g ON nt.norm = g.norm ORDER BY nt.doc_id""",
    // Incremental dedup: batch = source 'src19', corpus = everything else;
    // batch docs whose text exists in the corpus are dropped, survivors
    // exact-deduped within the batch (min doc_id).
    "dedup_incremental" ->
      """WITH batch AS (SELECT doc_id, text FROM documents WHERE source = 'src19'), corpus AS (SELECT DISTINCT text FROM documents WHERE source <> 'src19'), novel AS (SELECT b.doc_id, b.text FROM batch b WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text = b.text)) SELECT min(doc_id) AS keep_id, count(*) AS n_dups, text FROM novel GROUP BY text ORDER BY keep_id""",
    // Binary-payload dedup: grouping by text ≡ grouping by its UTF-8 bytes
    // (injective encoding), so the oracle needs no blob arithmetic.
    "media_dedup" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_dups, CAST(max(octet_length(encode(text))) AS BIGINT) AS n_bytes FROM documents GROUP BY text ORDER BY keep_id""",
    // Real-codec multimodal features: the engine BUILDS binary P6 PPM
    // images (header + text bytes cycled through the raster) and DECODES
    // them with an actual header parse + pixel fold; the oracle
    // reconstructs the identical per-channel sums by pure integer
    // arithmetic over the source text (ASCII ⇒ byte = code point; raster
    // byte i = text byte i mod len, channel c = raster index 3p + c).
    "multimodal_features" ->
      """WITH d AS (SELECT doc_id, CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t, length(CASE WHEN length(text) = 0 THEN ' ' ELSE text END) AS len, n_chars % 64 + 1 AS w, n_chars % 48 + 1 AS h FROM documents) SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height, CAST(list_sum(list_transform(range(0, w*h), p -> ascii(substr(t, CAST((3*p) % len AS INTEGER) + 1, 1)))) AS BIGINT) AS r_sum, CAST(list_sum(list_transform(range(0, w*h), p -> ascii(substr(t, CAST((3*p+1) % len AS INTEGER) + 1, 1)))) AS BIGINT) AS g_sum, CAST(list_sum(list_transform(range(0, w*h), p -> ascii(substr(t, CAST((3*p+2) % len AS INTEGER) + 1, 1)))) AS BIGINT) AS b_sum FROM d ORDER BY doc_id""",
    // Thumbnail resize: per-channel box means on the phash block geometry
    // (floor(x·tw/w)), floor-division means, rolling checksum of the thumb
    // raster row-major r,g,b — all integers, so even the RESIZE output is
    // pinned byte-exactly (via its checksum) against the oracle.
    "media_thumbnail" -> {
      val g = graft.multimodal.Media.ThumbGrid
      s"""WITH d AS (SELECT doc_id, CASE WHEN length(text) = 0 THEN ' ' ELSE text END AS t, length(CASE WHEN length(text) = 0 THEN ' ' ELSE text END) AS len, n_chars % 64 + 1 AS w, n_chars % 48 + 1 AS h FROM documents), dd AS (SELECT doc_id, t, len, w, h, LEAST(w, $g) AS tw, LEAST(h, $g) AS th FROM d), px AS (SELECT doc_id, t, len, w, h, tw, th, unnest(range(0, w*h)) AS p FROM dd), bl AS (SELECT doc_id, w, h, tw, th, ((p // w) * th // h) * tw + (p % w) * tw // w AS idx, CAST(ascii(substr(t, CAST((3*p) % len AS INTEGER) + 1, 1)) AS BIGINT) AS r, CAST(ascii(substr(t, CAST((3*p+1) % len AS INTEGER) + 1, 1)) AS BIGINT) AS g, CAST(ascii(substr(t, CAST((3*p+2) % len AS INTEGER) + 1, 1)) AS BIGINT) AS b FROM px), bm AS (SELECT doc_id, any_value(w) AS w, any_value(h) AS h, any_value(tw) AS tw, any_value(th) AS th, idx, CAST(sum(r) // count(*) AS BIGINT) AS rm, CAST(sum(g) // count(*) AS BIGINT) AS gm, CAST(sum(b) // count(*) AS BIGINT) AS bm FROM bl GROUP BY doc_id, idx) SELECT doc_id, CAST(any_value(w) AS BIGINT) AS width, CAST(any_value(h) AS BIGINT) AS height, CAST(any_value(tw) AS BIGINT) AS thumb_w, CAST(any_value(th) AS BIGINT) AS thumb_h, list_reduce(list_prepend(CAST(0 AS BIGINT), flatten(list([rm, gm, bm] ORDER BY idx))), (acc, c) -> (acc * 31 + c) & 4294967295) AS checksum FROM bm GROUP BY doc_id ORDER BY doc_id"""
    },
    // Frame sampling: one 64-byte frame per 256-byte window of the raw
    // media payload (= the text bytes; ASCII ⇒ byte = code point, the
    // media family's standing byte model). Frame count = ceil(len/256)
    // via the floor-division upper bound (len−1)//256, which is −1 (an
    // empty series) for empty payloads. energy = byte sum; checksum =
    // the corpus-standard (h·31+b) & 0xffffffff rolling hash.
    "media_frames" ->
      s"""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents), fr0 AS (SELECT doc_id, text, n, unnest(range(0, (n + ${graft.multimodal.Media.FrameStride - 1}) // ${graft.multimodal.Media.FrameStride})) AS i FROM d), fr AS (SELECT doc_id, CAST(i AS BIGINT) AS frame_idx, CAST(i * ${graft.multimodal.Media.FrameStride} AS BIGINT) AS frame_off, LEAST(${graft.multimodal.Media.FrameLen}, n - i * ${graft.multimodal.Media.FrameStride}) AS n_bytes, substr(text, CAST(i * ${graft.multimodal.Media.FrameStride} AS INTEGER) + 1, CAST(LEAST(${graft.multimodal.Media.FrameLen}, n - i * ${graft.multimodal.Media.FrameStride}) AS INTEGER)) AS fs FROM fr0) SELECT doc_id, frame_idx, frame_off, CAST(n_bytes AS BIGINT) AS n_bytes, CAST(list_sum(list_transform(range(1, CAST(n_bytes AS INTEGER) + 1), j -> CAST(ascii(substr(fs, j, 1)) AS BIGINT))) AS BIGINT) AS energy, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, CAST(n_bytes AS INTEGER) + 1), j -> CAST(ascii(substr(fs, j, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295) AS checksum FROM fr ORDER BY doc_id, frame_idx""",
    // Average-hash perceptual fingerprint of the P6 corpus: per-pixel
    // gray = r+g+b reconstructed from the cyclic text bytes, 8×8 block
    // sums, block-vs-global mean by integer cross-multiply, bits folded
    // with bit_or (bit 63 is the explicit Long.MinValue literal — DuckDB
    // overflow-checks 1 << 63). Uniform images fold to phash 0.
    "media_phash" ->
      s"""WITH $PhashCtes SELECT d.doc_id, CAST(d.w AS BIGINT) AS width, CAST(d.h AS BIGINT) AS height, COALESCE(ph.phash, 0) AS phash FROM d LEFT JOIN ph ON d.doc_id = ph.doc_id ORDER BY d.doc_id""",
    // Perceptual near-dup pairs: pigeonhole recall is exact for
    // maxHamming 3 < 4 bands, so the oracle checks the Hamming balls
    // DIRECTLY on the per-doc hashes (quadratic is fine at oracle scale).
    "media_phash_pairs" ->
      s"""WITH $PhashCtes, hp AS (SELECT d.doc_id, COALESCE(ph.phash, 0) AS phash FROM d LEFT JOIN ph ON d.doc_id = ph.doc_id) SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming FROM hp a JOIN hp b ON a.doc_id < b.doc_id WHERE bit_count(xor(a.phash, b.phash)) <= 3 ORDER BY d1, d2""",
    "dedup_ngram_jaccard" ->
      s"""WITH $NgramCtes SELECT d1, d2, jac_e4 FROM jpairs WHERE jac_e4 >= 100 ORDER BY d1, d2""",
    // Asymmetric containment over the SAME overlap core (cm/cnt CTEs):
    // common/na and common/nb, kept where either side clears the 0.8
    // bar — the quoted/embedded-document form Jaccard misses.
    "dedup_containment" ->
      s"""WITH $NgramCtes SELECT d1, d2, CAST(round(common * 10000.0 / ca.n) AS BIGINT) AS cont1_e4, CAST(round(common * 10000.0 / cb.n) AS BIGINT) AS cont2_e4 FROM cm JOIN cnt ca ON d1 = ca.doc_id JOIN cnt cb ON d2 = cb.doc_id WHERE greatest(round(common * 10000.0 / ca.n), round(common * 10000.0 / cb.n)) >= ${graft.operators.Dedup.ContainmentThrE4} ORDER BY d1, d2""",
    // Containment clean gate: drop the CONTAINED side of each qualifying
    // pair (mutual containment keeps min id), intersected with the
    // exact-min survivor (the df-cap escape), conjoined with the shared
    // quality/lang flag CTEs.
    "corpus_clean_containment" -> {
      val thr = graft.operators.Dedup.ContainmentThrE4
      s"""WITH $NgramCtes, cpr AS (SELECT d1, d2, round(common * 10000.0 / ca.n) AS c1, round(common * 10000.0 / cb.n) AS c2 FROM cm JOIN cnt ca ON d1 = ca.doc_id JOIN cnt cb ON d2 = cb.doc_id WHERE greatest(round(common * 10000.0 / ca.n), round(common * 10000.0 / cb.n)) >= $thr), cdrop AS (SELECT DISTINCT CASE WHEN c1 >= $thr AND c2 < $thr THEN d1 ELSE d2 END AS doc_id FROM cpr), $cleanFlagCtes SELECT d.doc_id, CAST(CASE WHEN dr.doc_id IS NULL AND xs.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_survivor, f.quality_ok, f.lang_match, CAST(CASE WHEN dr.doc_id IS NULL AND xs.doc_id IS NOT NULL AND f.quality_ok = 1 AND f.lang_match = 1 THEN 1 ELSE 0 END AS BIGINT) AS keep FROM documents d JOIN flags f ON d.doc_id = f.doc_id LEFT JOIN cdrop dr ON d.doc_id = dr.doc_id LEFT JOIN surv xs ON d.doc_id = xs.doc_id ORDER BY d.doc_id"""
    },
    // Winnowing (Schleimer et al. 2003): ORDERED 3-gram hash sequence →
    // min per sliding window of WinnowW → distinct selected values are the
    // fingerprints; pairs share ≥ WinnowMinShared under the same df cap as
    // the Jaccard kit. All-integer → hash-matched.
    "dedup_winnowing" -> {
      val w = graft.operators.Dedup.WinnowW
      val cap = graft.operators.Dedup.MaxShingleDf
      val minSh = graft.operators.Dedup.WinnowMinShared
      s"""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '$Tok') AS tw FROM documents), g AS (SELECT doc_id, list_transform(range(1, len(tw) - 1), i -> tw[i] || ' ' || tw[i+1] || ' ' || tw[i+2]) AS grams FROM toks WHERE len(tw) >= 3), hx AS (SELECT doc_id, list_transform(grams, s -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(s) + 1), i -> CAST(ascii(substr(s, i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295)) AS hs FROM g), fp AS (SELECT DISTINCT doc_id, fp FROM (SELECT doc_id, unnest(CASE WHEN len(hs) <= $w THEN [list_min(hs)] ELSE list_transform(range(1, len(hs) - $w + 2), i -> list_min(hs[i:i+${w - 1}])) END) AS fp FROM hx)), eligible AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) <= $cap), fpf AS (SELECT f.doc_id, f.fp FROM fp f JOIN eligible e ON f.fp = e.fp), pr AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared FROM fpf a JOIN fpf b ON a.fp = b.fp AND a.doc_id < b.doc_id GROUP BY 1, 2) SELECT d1, d2, CAST(n_shared AS BIGINT) AS n_shared FROM pr WHERE n_shared >= $minSh ORDER BY d1, d2"""
    },
    // Exact-substring (token-window) duplication: windows reduce to the
    // 114-bit fingerprint pair immediately — two 57-bit checked-BIGINT
    // polynomial folds with coprime bases (31, 37), the same recurrences
    // the Spark PolyHash57 expression generates — and occurrence counts
    // flag windows seen more than once corpus-wide. No pair enumeration
    // anywhere; mask 2^57-1 keeps h*base + c inside DuckDB's
    // overflow-checked int64.
    "dedup_substring" ->
      s"""WITH $SubstrCtes SELECT d.doc_id, COALESCE(pd.n_windows, 0) AS n_windows, COALESCE(pd.n_dup_windows, 0) AS n_dup_windows, $SubstrDupE4 AS dup_e4 FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id ORDER BY d.doc_id""",
    "dedup_substring_rewrite" ->
      s"""WITH $SubstrRewriteCtes SELECT s.doc_id, CAST(len(s.w) AS BIGINT) AS n_tokens, CAST(len(s.w) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_dropped, COALESCE(r.text_clean, '') AS text_clean FROM stoks s LEFT JOIN reb r ON s.doc_id = r.doc_id ORDER BY s.doc_id""",
    // Corpus-wide exact line dedup (C4-style, line granularity): non-empty
    // lines reduce to the same 114-bit fingerprint pair, row_number()=1
    // over (doc_id, pos) is the corpus-first winner (the mirror of the
    // Spark min(struct) aggregate; 1-based vs 0-based positions are
    // shift-invariant within a document), later occurrences drop, and the
    // text reassembles from surviving lines — empty lines always survive.
    "dedup_lines" -> {
      val m = org.apache.spark.sql.graft.PolyHash57.Mask
      def fold(base: Int) =
        s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(line) + 1), i -> CAST(ascii(substr(line, i, 1)) AS BIGINT))), (h, c) -> (h * $base + c) & $m)"
      s"""WITH dl AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents), lines AS (SELECT doc_id, unnest(range(1, len(ls) + 1)) AS pos, unnest(ls) AS line FROM dl), fp AS (SELECT doc_id, pos, ${fold(31)} AS h1, ${fold(37)} AS h2 FROM lines WHERE line <> ''), wr AS (SELECT doc_id, pos, row_number() OVER (PARTITION BY h1, h2 ORDER BY doc_id, pos) AS rn FROM fp), drops AS (SELECT doc_id, pos FROM wr WHERE rn > 1), reb AS (SELECT l.doc_id, count(*) AS n_kept, COALESCE(string_agg(l.line, chr(10) ORDER BY l.pos), '') AS text_clean FROM lines l LEFT JOIN drops dr ON l.doc_id = dr.doc_id AND l.pos = dr.pos WHERE dr.doc_id IS NULL GROUP BY l.doc_id) SELECT d.doc_id, CAST(len(dl.ls) AS BIGINT) AS n_lines, CAST(len(dl.ls) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed, COALESCE(r.text_clean, '') AS text_clean FROM documents d JOIN dl ON d.doc_id = dl.doc_id LEFT JOIN reb r ON d.doc_id = r.doc_id ORDER BY d.doc_id"""
    },
    // Byte-shingle near-dup on binary payloads: the payload is the UTF-8
    // encoding of text, so 16-byte windows ARE 16-char substrings
    // (injective, ASCII corpus) — the oracle states them on the text
    // directly, hashed to the same 32-bit polynomial the Spark side joins
    // on (half the shuffle key bytes of the raw window); the df cap /
    // pair / Jaccard CTEs mirror the word-n-gram pipeline's. Only windows
    // whose scrambled hash ≡ 0 mod 4 enter the pipeline (content-defined
    // mod-p sampling, Media.SampleMod — shift-invariant, identical on both
    // engines); a payload with NO sampled windows — short, or unlucky at
    // barely over the window width — keeps the whole-payload fallback
    // shingle, so no payload vanishes from the pair search.
    "media_neardup" ->
      """WITH wf AS (SELECT doc_id, CASE WHEN length(text) >= 16 THEN list_filter(list_transform(list_transform(range(1, length(text) - 14), i -> substr(text, i, 16)), w -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(w) + 1), j -> CAST(ascii(substr(w, j, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295)), h -> xor(h, h >> 16) % 4 = 0) ELSE CAST([] AS BIGINT[]) END AS wins, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length('#' || text) + 1), j -> CAST(ascii(substr('#' || text, j, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295) AS fb FROM documents), sh AS (SELECT DISTINCT doc_id, sh FROM (SELECT doc_id, unnest(CASE WHEN len(wins) > 0 THEN wins ELSE [fb] END) AS sh FROM wf)), eligible AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 50), shf AS (SELECT s.doc_id, s.sh FROM sh s JOIN eligible e ON s.sh = e.sh), cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), cm AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id), jpairs AS (SELECT d1, d2, CAST(round(common * 10000.0 / (ca.n + cb.n - common)) AS BIGINT) AS jac_e4 FROM cm JOIN cnt ca ON d1 = ca.doc_id JOIN cnt cb ON d2 = cb.doc_id) SELECT d1, d2, jac_e4 FROM jpairs WHERE jac_e4 >= 8000 ORDER BY d1, d2""",
    // Connected components as a recursive transitive closure: cluster id =
    // min doc_id reachable through the (undirected) near-dup pair graph —
    // the same fixpoint the Spark min-label propagation loop converges to.
    "dedup_clusters" ->
      s"""WITH RECURSIVE $NgramCtes, fpairs AS (SELECT d1, d2 FROM jpairs WHERE jac_e4 >= 100), edges AS (SELECT d1 AS a, d2 AS b FROM fpairs UNION ALL SELECT d2 AS a, d1 AS b FROM fpairs), reach AS (SELECT a, b FROM edges UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a), mn AS (SELECT a, min(b) AS m FROM reach GROUP BY a) SELECT d.doc_id, CAST(CASE WHEN m.m IS NOT NULL AND m.m < d.doc_id THEN m.m ELSE d.doc_id END AS BIGINT) AS cluster_id FROM documents d LEFT JOIN mn m ON d.doc_id = m.a ORDER BY doc_id""",
    // Keep-best cluster survivor: the decision-grade (≥ 0.8) transitive
    // closure of corpus_clean_neardup, with the survivor chosen by token
    // count (desc, doc_id ties) instead of min id — the policy knob.
    "dedup_clusters_best" ->
      s"""WITH RECURSIVE $NgramCtes, fpairs AS (SELECT d1, d2 FROM jpairs WHERE jac_e4 >= 8000), edges AS (SELECT d1 AS a, d2 AS b FROM fpairs UNION ALL SELECT d2 AS a, d1 AS b FROM fpairs), reach AS (SELECT a, b FROM edges UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a), mn AS (SELECT a, min(b) AS m FROM reach GROUP BY a), cl AS (SELECT d.doc_id, CAST(CASE WHEN m.m IS NOT NULL AND m.m < d.doc_id THEN m.m ELSE d.doc_id END AS BIGINT) AS cluster_id FROM documents d LEFT JOIN mn m ON d.doc_id = m.a), tk AS (SELECT doc_id, CAST(len(regexp_extract_all(lower(text), '$Tok')) AS BIGINT) AS n_toks FROM documents) SELECT c.doc_id, c.cluster_id, t.n_toks, CAST(CASE WHEN row_number() OVER (PARTITION BY c.cluster_id ORDER BY t.n_toks DESC, c.doc_id) = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_best FROM cl c JOIN tk t ON c.doc_id = t.doc_id ORDER BY c.doc_id""",
    "dedup_embedding" ->
      """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm FROM embeddings) SELECT v1, v2, sim_e4 FROM (SELECT a.vec_id AS v1, b.vec_id AS v2, CAST(round(list_inner_product(a.v, b.v) / (a.nrm * b.nrm) * 10000) AS BIGINT) AS sim_e4 FROM n a JOIN n b ON a.vec_id < b.vec_id) WHERE sim_e4 >= 3500 ORDER BY v1, v2""",
    // Per-label centroids: components quantize to e6 integers BEFORE the
    // sums (exact, order-independent); the mean is one pinned double
    // division (sum / n / 100) at the end.
    "embedding_centroids" ->
      """WITH q AS (SELECT CAST(label AS BIGINT) AS label, CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT) AS e1, CAST(round(CAST(embedding[2] AS DOUBLE) * 1000000) AS BIGINT) AS e2, CAST(round(CAST(embedding[3] AS DOUBLE) * 1000000) AS BIGINT) AS e3, CAST(round(CAST(embedding[4] AS DOUBLE) * 1000000) AS BIGINT) AS e4 FROM embeddings), a AS (SELECT label, count(*) AS n, CAST(sum(e1) AS BIGINT) AS s1, CAST(sum(e2) AS BIGINT) AS s2, CAST(sum(e3) AS BIGINT) AS s3, CAST(sum(e4) AS BIGINT) AS s4 FROM q GROUP BY label) SELECT label, n, CAST(round(CAST(s1 AS DOUBLE) / n / 100) AS BIGINT) AS c1_e4, CAST(round(CAST(s2 AS DOUBLE) / n / 100) AS BIGINT) AS c2_e4, CAST(round(CAST(s3 AS DOUBLE) / n / 100) AS BIGINT) AS c3_e4, CAST(round(CAST(s4 AS DOUBLE) / n / 100) AS BIGINT) AS c4_e4 FROM a ORDER BY label""",
    // Banded sign-projection LSH (6 bands × 6 bits, planes from the same LCG
    // as Similarity.plane): identical float op order on both engines, so even
    // the approximate operator hash-matches.
    "dedup_embedding_lsh" ->
      s"""WITH $EmbLshCtes, cand AS (SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2 FROM keys a JOIN keys b ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.vec_id < b.vec_id) SELECT v1, v2, sim_e4 FROM (SELECT v1, v2, CAST(round(list_inner_product(x.v, y.v) / (x.nrm * y.nrm) * 10000) AS BIGINT) AS sim_e4 FROM cand JOIN n x ON v1 = x.vec_id JOIN n y ON v2 = y.vec_id) WHERE sim_e4 >= 3500 ORDER BY v1, v2""",
    // SemDeDup decision: LSH-banded candidates exact-verified at the
    // decision bar, transitive closure, min-id survivor per semantic
    // cluster.
    "dedup_semantic_clusters" ->
      s"""WITH RECURSIVE $EmbLshCtes, cand AS (SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2 FROM keys a JOIN keys b ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.vec_id < b.vec_id), sp AS (SELECT v1, v2 FROM (SELECT v1, v2, CAST(round(list_inner_product(x.v, y.v) / (x.nrm * y.nrm) * 10000) AS BIGINT) AS sim_e4 FROM cand JOIN n x ON v1 = x.vec_id JOIN n y ON v2 = y.vec_id) WHERE sim_e4 >= ${graft.operators.Dedup.SemanticClusterSimE4}), edges AS (SELECT v1 AS a, v2 AS b FROM sp UNION ALL SELECT v2 AS a, v1 AS b FROM sp), reach AS (SELECT a, b FROM edges UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a), mn AS (SELECT a, min(b) AS m FROM reach GROUP BY a) SELECT e.vec_id, CAST(CASE WHEN m.m IS NOT NULL AND m.m < e.vec_id THEN m.m ELSE e.vec_id END AS BIGINT) AS cluster_id, CAST(CASE WHEN m.m IS NULL OR m.m >= e.vec_id THEN 1 ELSE 0 END AS BIGINT) AS keep FROM embeddings e LEFT JOIN mn m ON e.vec_id = m.a ORDER BY e.vec_id""",
    // Semantic decontamination: the LSH banding CTEs above + the data_split
    // hash rule applied to vec_id; train/val vectors whose verified cosine
    // to any test vector reaches the near-dup bar are flagged.
    "decontaminate_semantic" ->
      s"""WITH $EmbLshCtes, sp AS (SELECT vec_id, CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split FROM (SELECT vec_id, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length('split:' || CAST(vec_id AS VARCHAR)) + 1), i -> CAST(ascii(substr('split:' || CAST(vec_id AS VARCHAR), i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295) % 100 AS bucket FROM embeddings)), tk AS (SELECT k.vec_id AS tid, k.band_idx, k.band_key FROM keys k JOIN sp ON k.vec_id = sp.vec_id WHERE sp.split = 'test'), cand AS (SELECT DISTINCT k.vec_id AS cid, tk.tid FROM keys k JOIN sp ON k.vec_id = sp.vec_id JOIN tk ON k.band_idx = tk.band_idx AND k.band_key = tk.band_key WHERE sp.split <> 'test'), m AS (SELECT c.cid, CAST(round(list_inner_product(x.v, y.v) / (x.nrm * y.nrm) * 10000) AS BIGINT) AS sim_e4 FROM cand c JOIN n x ON c.cid = x.vec_id JOIN n y ON c.tid = y.vec_id), agg AS (SELECT cid, count(*) AS n_matches, CAST(max(sim_e4) AS BIGINT) AS max_sim_e4 FROM m WHERE sim_e4 >= 3500 GROUP BY cid) SELECT sp.vec_id, sp.split, COALESCE(a.n_matches, 0) AS n_matches, COALESCE(a.max_sim_e4, 0) AS max_sim_e4, CAST(CASE WHEN COALESCE(a.n_matches, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS contaminated FROM sp LEFT JOIN agg a ON sp.vec_id = a.cid WHERE sp.split <> 'test' ORDER BY sp.vec_id""",
    "sim_topk" ->
      s"""WITH $BruteTopkCtes SELECT qid, cid, sim_e4, CAST(rn AS BIGINT) AS rn FROM brk WHERE rn <= 5 ORDER BY qid, rn""",
    // Hybrid retrieval via reciprocal rank fusion: lexical tower = the
    // exact n-gram Jaccard pairs re-oriented around query docs (< 5),
    // semantic tower = exact cosine with self excluded; each tower's top
    // 20 fuses with integer-exact e4 RRF terms (no half-way rounding
    // case exists at this depth), top 10 per query kept.
    "search_hybrid_rrf" ->
      s"""WITH $NgramCtes, hbq AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5), hbs AS (SELECT q.qid, c.vec_id AS cid, CAST(round(list_inner_product(CAST(c.embedding AS DOUBLE[]), q.qv) / (sqrt(list_inner_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))) * sqrt(list_inner_product(q.qv, q.qv))) * 10000) AS BIGINT) AS sim_e4 FROM embeddings c, hbq q WHERE c.vec_id <> q.qid), hsem AS (SELECT qid, cid, r FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, cid) AS r FROM hbs) WHERE r <= 20), hlex0 AS (SELECT d1 AS qid, d2 AS cid, jac_e4 FROM jpairs WHERE jac_e4 >= 100 AND d1 < 5 UNION ALL SELECT d2 AS qid, d1 AS cid, jac_e4 FROM jpairs WHERE jac_e4 >= 100 AND d2 < 5), hlex AS (SELECT qid, cid, r FROM (SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY jac_e4 DESC, cid) AS r FROM hlex0) WHERE r <= 20), hf AS (SELECT COALESCE(l.qid, s.qid) AS qid, COALESCE(l.cid, s.cid) AS cid, l.r AS rl, s.r AS rs FROM hlex l FULL OUTER JOIN hsem s ON l.qid = s.qid AND l.cid = s.cid), hr AS (SELECT qid, cid, CAST(COALESCE(rl, 0) AS BIGINT) AS r_lex, CAST(COALESCE(rs, 0) AS BIGINT) AS r_sem, CAST(CASE WHEN rl IS NULL THEN 0 ELSE round(10000.0 / (60 + rl)) END + CASE WHEN rs IS NULL THEN 0 ELSE round(10000.0 / (60 + rs)) END AS BIGINT) AS rrf_e4 FROM hf) SELECT qid, cid, r_lex, r_sem, rrf_e4, CAST(rn AS BIGINT) AS rn FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rrf_e4 DESC, cid) AS rn FROM hr) WHERE rn <= 10 ORDER BY qid, rn""",
    // Greedy MMR diversification at λ = 1/2: unrolled per-round CTEs —
    // doubled integer scores (sim_e4 − max selected-similarity), cid
    // tiebreak, round 1 = pure relevance.
    "search_mmr" -> {
      import graft.operators.Similarity.{MmrNq, MmrDepth, MmrK}
      s"""WITH ${mmrCtes(MmrNq, MmrDepth, MmrK)} SELECT qid, cid, sim_e4, mmr2x_e4, pick FROM macc$MmrK ORDER BY qid, pick"""
    },
    // MMR diversity evaluation: mean relevance + intra-list similarity of
    // the plain top-k vs the MMR picks, both lists' pairwise sims drawn
    // from the greedy loop's own candidate-pair table; pinned one-divide
    // e4 means.
    "eval_mmr_diversity" -> {
      import graft.operators.Similarity.{MmrNq, MmrDepth, MmrK}
      s"""WITH ${mmrCtes(MmrNq, MmrDepth, MmrK)}, drel AS (SELECT qid, cid, sim_e4 FROM (SELECT qid, cid, sim_e4, row_number() OVER (PARTITION BY qid ORDER BY sim_e4 DESC, cid) AS r FROM mc) WHERE r <= $MmrK), dr1 AS (SELECT qid, CAST(round(sum(sim_e4) * 1.0 / count(*)) AS BIGINT) AS rel_sim_e4 FROM drel GROUP BY qid), dm1 AS (SELECT qid, CAST(round(sum(sim_e4) * 1.0 / count(*)) AS BIGINT) AS mmr_sim_e4 FROM macc$MmrK GROUP BY qid), dr2 AS (SELECT a.qid, CAST(round(sum(p.ds_e4) * 1.0 / count(*)) AS BIGINT) AS rel_ils_e4 FROM drel a JOIN drel b ON a.qid = b.qid AND a.cid <> b.cid JOIN mps p ON p.qid = a.qid AND p.pd = a.cid AND p.ps = b.cid GROUP BY a.qid), dm2 AS (SELECT a.qid, CAST(round(sum(p.ds_e4) * 1.0 / count(*)) AS BIGINT) AS mmr_ils_e4 FROM macc$MmrK a JOIN macc$MmrK b ON a.qid = b.qid AND a.cid <> b.cid JOIN mps p ON p.qid = a.qid AND p.pd = a.cid AND p.ps = b.cid GROUP BY a.qid) SELECT dr1.qid, rel_sim_e4, mmr_sim_e4, rel_ils_e4, mmr_ils_e4, rel_ils_e4 - mmr_ils_e4 AS ils_drop_e4 FROM dr1 JOIN dm1 ON dr1.qid = dm1.qid JOIN dr2 ON dr1.qid = dr2.qid JOIN dm2 ON dr1.qid = dm2.qid ORDER BY dr1.qid"""
    },
    // The tower swap proved end-to-end: hybrid RRF whose semantic tower
    // is the SERVED IVF-PQ index (probe + ADC + re-rank over the persisted
    // artifacts) instead of exact cosine; lexical tower and fusion tail
    // identical to search_hybrid_rrf.
    "search_hybrid_served" -> HybridServedSql,
    // Vocabulary coverage: top-10 corpus vocab (count desc, word asc ties),
    // per-doc OOV token fraction in e4 fixed point; token-less docs score 0.
    "vocab_coverage" ->
      s"""WITH terms AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '$Tok')) AS word FROM documents), vocab AS (SELECT word FROM (SELECT word, count(*) AS cnt FROM terms GROUP BY word ORDER BY cnt DESC, word LIMIT 10)), pd AS (SELECT t.doc_id, count(*) AS n_toks, sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS n_oov FROM terms t LEFT JOIN vocab v ON t.word = v.word GROUP BY t.doc_id) SELECT d.doc_id, CAST(COALESCE(p.n_toks, 0) AS BIGINT) AS n_toks, CAST(COALESCE(p.n_oov, 0) AS BIGINT) AS n_oov, CAST(CASE WHEN p.n_toks IS NULL THEN 0 ELSE round(p.n_oov * 10000.0 / p.n_toks) END AS BIGINT) AS oov_e4 FROM documents d LEFT JOIN pd p ON d.doc_id = p.doc_id ORDER BY d.doc_id""",
    // Gopher-style repetition: duplicate-bigram-occurrence fraction and
    // top-bigram share per doc, 1e-4 fixed point; <2-token docs score 0.
    "text_repetition" ->
      s"""WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '$Tok') AS w FROM documents), bi AS (SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bigram FROM toks), pb AS (SELECT doc_id, bigram, count(*) AS c FROM bi GROUP BY doc_id, bigram), pd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, count(*) AS n_distinct, CAST(max(c) AS BIGINT) AS max_c FROM pb GROUP BY doc_id) SELECT d.doc_id, COALESCE(p.n_bigrams, 0) AS n_bigrams, COALESCE(p.n_distinct, 0) AS n_distinct, CAST(CASE WHEN p.n_bigrams IS NULL THEN 0 ELSE round((p.n_bigrams - p.n_distinct) * 10000.0 / p.n_bigrams) END AS BIGINT) AS dup_e4, CAST(CASE WHEN p.n_bigrams IS NULL THEN 0 ELSE round(p.max_c * 10000.0 / p.n_bigrams) END AS BIGINT) AS top_e4 FROM documents d LEFT JOIN pd p ON d.doc_id = p.doc_id ORDER BY d.doc_id""",
    // Subword tokenization fertility: the greedy longest-match segmenter as
    // a recursive CTE — per-position longest-step table, then the walk
    // follows steps from position 1 (cut positions == the native
    // expression's loop; no-match steps are 1). The VALUES vocabulary is
    // generated from TextAnalytics.WordPieceVocab so the two inventories
    // cannot drift.
    "tokenize_wordpiece" -> {
      val values = TextAnalytics.WordPieceVocab.map(p => s"('$p')").mkString(", ")
      s"WITH RECURSIVE vocab(piece) AS (SELECT * FROM (VALUES $values) v(piece)), $WordpieceTail"
    },
    // Trained twin: the vocab CTE is the unrolled BPE merge chain's merged
    // pieces (DISTINCT — two different pairs can concatenate to one string);
    // single chars need no vocab entry, both segmenters 1-char-step on miss.
    "tokenize_wordpiece_learned" ->
      s"WITH RECURSIVE ${bpeCtes(TextAnalytics.BpeMerges)}, vocab(piece) AS (SELECT DISTINCT merged FROM bpe_merges), $WordpieceTail",
    // Unigram/Viterbi DP segmentation over the SAME learned symbols:
    // per distinct word, maximize total piece score (= pair count at
    // merge time; singles always legal at 0), ties to fewer pieces. The
    // (score, pieces) pair packs into one BIGINT key k = score·2^20 +
    // (2^20−1−pieces), so the whole DP transition is k(j) + sc·2^20 − 1
    // and the recursive CTE carries ONE growing best-key list per word
    // (position p's row computes prefix p from the carried ks[1..p]).
    // first-wins on duplicate merged strings = min merge_rank.
    "tokenize_unigram" ->
      (s"WITH RECURSIVE ${bpeCtes(TextAnalytics.BpeMerges)}, " +
      s"uocc AS (SELECT unnest(regexp_extract_all(lower(text), '$Tok')) AS word FROM documents), " +
      "uwc AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM uocc GROUP BY word), " +
      unigramDpCtes("uwc", "u") + " " +
      "SELECT w.word, w.cnt, CAST(u.k // 1048576 AS BIGINT) AS best_score, CAST(1048575 - (u.k % 1048576) AS BIGINT) AS n_pieces FROM uwc w JOIN ufin u USING (word) ORDER BY w.word"),
    "vocab_train" ->
      s"WITH ${bpeCtes(TextAnalytics.BpeMerges)} SELECT merge_rank, lhs, rhs, merged, pair_cnt FROM bpe_merges ORDER BY merge_rank",
    // Tokenizer-selection decision table: per source, fertility under BOTH
    // inference rules over the SAME learned symbols — true BPE merge-order
    // replay (the seg table) vs greedy longest-match (the walk CTEs) —
    // plus their delta. One vocabulary definition feeds both.
    "eval_tokenizer_fertility" ->
      s"""WITH RECURSIVE ${bpeCtes(TextAnalytics.BpeMerges, finalSeg = true)}, vocab(piece) AS (SELECT DISTINCT merged FROM bpe_merges), $WordpieceWalkCtes, ${unigramDpCtes("dw", "f")}, fnp AS (SELECT word, CAST(1048575 - (k % 1048576) AS BIGINT) AS dp_p FROM ffin), bnp AS (SELECT word, CAST(len(pieces) AS BIGINT) AS bpe_p FROM seg${TextAnalytics.BpeMerges}), osrc AS (SELECT o.word, d.source FROM occ o JOIN documents d ON o.doc_id = d.doc_id), ps AS (SELECT s.source, count(*) AS n_words, CAST(sum(b.bpe_p) AS BIGINT) AS bpe_pieces, CAST(sum(np.n_pieces) AS BIGINT) AS wp_pieces, CAST(sum(f.dp_p) AS BIGINT) AS dp_pieces FROM osrc s JOIN bnp b ON s.word = b.word JOIN np ON s.word = np.word JOIN fnp f ON s.word = f.word GROUP BY s.source), nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source), ft AS (SELECT nd.source, nd.n_docs, COALESCE(ps.n_words, 0) AS n_words, COALESCE(ps.bpe_pieces, 0) AS bpe_pieces, COALESCE(ps.wp_pieces, 0) AS wp_pieces, COALESCE(ps.dp_pieces, 0) AS dp_pieces, CAST(CASE WHEN COALESCE(ps.n_words, 0) = 0 THEN 0 ELSE round(ps.bpe_pieces * 10000.0 / ps.n_words) END AS BIGINT) AS bpe_fertility_e4, CAST(CASE WHEN COALESCE(ps.n_words, 0) = 0 THEN 0 ELSE round(ps.wp_pieces * 10000.0 / ps.n_words) END AS BIGINT) AS wp_fertility_e4, CAST(CASE WHEN COALESCE(ps.n_words, 0) = 0 THEN 0 ELSE round(ps.dp_pieces * 10000.0 / ps.n_words) END AS BIGINT) AS dp_fertility_e4 FROM nd LEFT JOIN ps ON nd.source = ps.source) SELECT source, n_docs, n_words, bpe_pieces, wp_pieces, dp_pieces, bpe_fertility_e4, wp_fertility_e4, dp_fertility_e4, bpe_fertility_e4 - wp_fertility_e4 AS delta_e4, wp_fertility_e4 - dp_fertility_e4 AS dp_delta_e4 FROM ft ORDER BY source""",
    // True BPE inference: the chain's final segmentation table (merges
    // applied in rank order) rolled up per doc — NOT the greedy
    // longest-match walk the two wordpiece oracles share.
    "tokenize_bpe" ->
      s"""WITH ${bpeCtes(TextAnalytics.BpeMerges, finalSeg = true)}, occ AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '$Tok')) AS word FROM documents), np AS (SELECT word, CAST(len(pieces) AS BIGINT) AS n_pieces FROM seg${TextAnalytics.BpeMerges}), pd AS (SELECT o.doc_id, count(*) AS n_words, CAST(sum(np.n_pieces) AS BIGINT) AS n_pieces FROM occ o JOIN np ON o.word = np.word GROUP BY o.doc_id) SELECT d.doc_id, COALESCE(pd.n_words, 0) AS n_words, COALESCE(pd.n_pieces, 0) AS n_pieces, CAST(CASE WHEN pd.n_words IS NULL THEN 0 ELSE round(pd.n_pieces * 10000.0 / pd.n_words) END AS BIGINT) AS fertility_e4 FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id ORDER BY d.doc_id""",
    // Lexical diversity: type-token ratio + Simpson concentration of the
    // unigram distribution — integer Σc/Σc²/distinct until one double
    // divide + e4 round.
    "text_diversity" ->
      s"""WITH terms AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '$Tok')) AS word FROM documents), pw AS (SELECT doc_id, word, count(*) AS c FROM terms GROUP BY doc_id, word), pd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_toks, count(*) AS n_types, CAST(sum(c * c) AS BIGINT) AS sum_c2 FROM pw GROUP BY doc_id) SELECT d.doc_id, COALESCE(p.n_toks, 0) AS n_toks, COALESCE(p.n_types, 0) AS n_types, CAST(CASE WHEN p.n_toks IS NULL THEN 0 ELSE round(p.n_types * 10000.0 / p.n_toks) END AS BIGINT) AS ttr_e4, CAST(CASE WHEN p.n_toks IS NULL THEN 0 ELSE round(p.sum_c2 * 10000.0 / (p.n_toks * p.n_toks)) END AS BIGINT) AS simpson_e4 FROM documents d LEFT JOIN pd p ON d.doc_id = p.doc_id ORDER BY d.doc_id""",
    // PII redaction: URL → email → digit-run passes, each count measured on
    // the previous pass's output. Same pattern strings as the Spark side;
    // RE2 and the JVM engine agree on these greedy character-class forms —
    // and because the synthetic corpus contains no PII (the hash-match only
    // proves the no-op path), the engines were ALSO compared on planted
    // PII rows: DuckDB reproduces TextAnalyticsSpec's planted expectations
    // byte for byte (URL/email/number counts and the redacted text).
    "text_clean" ->
      s"""WITH s1 AS (SELECT doc_id, text, regexp_replace(text, 'https?://[a-zA-Z0-9./_%+-]+', '<URL>', 'g') AS t1 FROM documents), s2 AS (SELECT doc_id, text, t1, regexp_replace(t1, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g') AS t2 FROM s1) SELECT doc_id, CAST(len(regexp_extract_all(text, 'https?://[a-zA-Z0-9./_%+-]+')) AS BIGINT) AS n_urls, CAST(len(regexp_extract_all(t1, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails, CAST(len(regexp_extract_all(t2, '[0-9]+')) AS BIGINT) AS n_nums, regexp_replace(t2, '[0-9]+', '<NUM>', 'g') AS clean_text FROM s2 ORDER BY doc_id""",
    // Decontamination: train/val docs sharing any distinct 3-shingle with a
    // test-split doc (shingle CTE = the dedup family's; split = data_split's
    // salted hash — one definition of each on the Spark side too).
    "decontaminate" ->
      s"""WITH toks AS (SELECT doc_id, text, regexp_extract_all(lower(text), '$Tok') AS w FROM documents), sh AS (SELECT DISTINCT doc_id, sh FROM (SELECT doc_id, unnest(CASE WHEN len(w) >= 3 THEN list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) ELSE ['#' || text] END) AS sh FROM toks)), sps AS (SELECT doc_id, CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split FROM (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(s) + 1), i -> CAST(ascii(substr(s, i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295) % 100 AS bucket FROM (SELECT doc_id, 'split:' || CAST(doc_id AS VARCHAR) AS s FROM documents))), tsh AS (SELECT DISTINCT s.sh FROM sh s JOIN sps p ON s.doc_id = p.doc_id WHERE p.split = 'test'), shr AS (SELECT s.doc_id, count(*) AS n_shared FROM sh s JOIN sps p ON s.doc_id = p.doc_id JOIN tsh t ON s.sh = t.sh WHERE p.split <> 'test' GROUP BY s.doc_id) SELECT p.doc_id, p.split, COALESCE(r.n_shared, 0) AS n_shared, CAST(CASE WHEN COALESCE(r.n_shared, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS contaminated FROM sps p LEFT JOIN shr r ON p.doc_id = r.doc_id WHERE p.split <> 'test' ORDER BY p.doc_id""",
    // Per-source rollup of the decontamination flags (the governance view).
    "source_contamination" ->
      s"""WITH toks AS (SELECT doc_id, text, regexp_extract_all(lower(text), '$Tok') AS w FROM documents), sh AS (SELECT DISTINCT doc_id, sh FROM (SELECT doc_id, unnest(CASE WHEN len(w) >= 3 THEN list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) ELSE ['#' || text] END) AS sh FROM toks)), sps AS (SELECT doc_id, CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split FROM (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(s) + 1), i -> CAST(ascii(substr(s, i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295) % 100 AS bucket FROM (SELECT doc_id, 'split:' || CAST(doc_id AS VARCHAR) AS s FROM documents))), tsh AS (SELECT DISTINCT s.sh FROM sh s JOIN sps p ON s.doc_id = p.doc_id WHERE p.split = 'test'), shr AS (SELECT s.doc_id, count(*) AS n_shared FROM sh s JOIN sps p ON s.doc_id = p.doc_id JOIN tsh t ON s.sh = t.sh WHERE p.split <> 'test' GROUP BY s.doc_id), fl AS (SELECT p.doc_id, COALESCE(r.n_shared, 0) AS n_shared, CASE WHEN COALESCE(r.n_shared, 0) > 0 THEN 1 ELSE 0 END AS cont FROM sps p LEFT JOIN shr r ON p.doc_id = r.doc_id WHERE p.split <> 'test') SELECT d.source, count(*) AS n_docs, CAST(sum(fl.cont) AS BIGINT) AS n_contaminated, CAST(sum(fl.n_shared) AS BIGINT) AS n_shared, CAST(round(sum(fl.cont) * 10000.0 / count(*)) AS BIGINT) AS rate_e4 FROM fl JOIN documents d ON fl.doc_id = d.doc_id GROUP BY d.source ORDER BY d.source""",
    // Bloom-filter decontamination: the eval split's shingles fold into a
    // 2^21-bit / k=2 Bloom bitset (bit_or per 64-bit word; bit 63 is the
    // explicit Long.MinValue literal — DuckDB overflow-checks 1 << 63);
    // corpus shingles probe both salted hash positions, and only Bloom
    // candidates reach the exact verify join. Deterministic hashes ⇒ both
    // engines build bit-identical filters ⇒ hash-matched, fp included.
    "decontaminate_bloom" ->
      s"""WITH $BloomDocCtes SELECT doc_id, split, n_candidates, n_shared, contaminated FROM bdoc ORDER BY doc_id""",
    // Bloom gate FP report: the per-doc bloom frame re-aggregated per split
    // — flagged vs verified docs and shingles, pinned e4 precisions (0 when
    // a denominator is empty). docs_fp = flagged - contaminated because the
    // bitset cannot under-admit.
    "eval_decontaminate_fp" ->
      s"""WITH $BloomDocCtes SELECT split, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(CASE WHEN n_candidates > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_flagged, CAST(sum(contaminated) AS BIGINT) AS docs_contaminated, CAST(sum(CASE WHEN n_candidates > 0 AND n_shared = 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_fp, CAST(sum(n_candidates) AS BIGINT) AS shingles_cand, CAST(sum(n_shared) AS BIGINT) AS shingles_shared, CAST(CASE WHEN sum(CASE WHEN n_candidates > 0 THEN 1 ELSE 0 END) = 0 THEN 0 ELSE round(sum(contaminated) * 10000.0 / sum(CASE WHEN n_candidates > 0 THEN 1 ELSE 0 END)) END AS BIGINT) AS doc_precision_e4, CAST(CASE WHEN sum(n_candidates) = 0 THEN 0 ELSE round(sum(n_shared) * 10000.0 / sum(n_candidates)) END AS BIGINT) AS shingle_precision_e4 FROM bdoc GROUP BY split ORDER BY split""",
    // Concat-and-chunk packing per source shard; DuckDB's window sum widens
    // to HUGEINT, hence the explicit BIGINT casts. "offset" needs quoting
    // (reserved word).
    "pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, source, CAST(len(regexp_extract_all(lower(text), '$Tok')) AS BIGINT) AS n_toks FROM documents), o AS (SELECT doc_id, source, n_toks, CAST(sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_toks AS BIGINT) AS "offset" FROM t) SELECT doc_id, source, n_toks, "offset", CAST("offset" // 256 AS BIGINT) AS seq_id FROM o ORDER BY doc_id""",
    // Incremental packing: the oracle IS the correctness statement —
    // appending the batch (doc_id > 0.9·max) onto persisted per-source
    // totals must equal RE-PACKING the whole corpus and keeping the
    // batch rows, i.e. pack_sequences' flat window restricted to the cut.
    "pack_sequences_incremental" ->
      s"""WITH t AS (SELECT doc_id, source, CAST(len(regexp_extract_all(lower(text), '$Tok')) AS BIGINT) AS n_toks FROM documents), cut AS (SELECT max(doc_id) * 9 // 10 AS c FROM t), o AS (SELECT doc_id, source, n_toks, CAST(sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_toks AS BIGINT) AS "offset" FROM t) SELECT doc_id, source, n_toks, "offset", CAST("offset" // 256 AS BIGINT) AS seq_id FROM o CROSS JOIN cut WHERE doc_id > c ORDER BY doc_id""",
    // Packing-efficiency report: the pack_sequences window re-aggregated
    // per source — concat-and-chunk's boundary-split docs and tail pad vs
    // pad-per-doc's padding and truncation, pinned e4 ratios.
    "eval_pack_efficiency" ->
      s"""WITH t AS (SELECT doc_id, source, CAST(len(regexp_extract_all(lower(text), '$Tok')) AS BIGINT) AS n_toks FROM documents), o AS (SELECT doc_id, source, n_toks, CAST(sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_toks AS BIGINT) AS "offset" FROM t), f AS (SELECT source, n_toks, CASE WHEN n_toks > 0 AND "offset" // ${Pipeline.SeqLen} <> ("offset" + n_toks - 1) // ${Pipeline.SeqLen} THEN 1 ELSE 0 END AS is_split FROM o) SELECT source, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS n_tokens, CAST((sum(n_toks) + ${Pipeline.SeqLen - 1}) // ${Pipeline.SeqLen} AS BIGINT) AS chunk_seqs, CAST((sum(n_toks) + ${Pipeline.SeqLen - 1}) // ${Pipeline.SeqLen} * ${Pipeline.SeqLen} - sum(n_toks) AS BIGINT) AS chunk_tail_pad, CAST(sum(is_split) AS BIGINT) AS chunk_split_docs, CAST(round(sum(is_split) * 10000.0 / count(*)) AS BIGINT) AS split_frac_e4, CAST(count(*) AS BIGINT) AS pad_seqs, CAST(count(*) * ${Pipeline.SeqLen} - sum(least(n_toks, ${Pipeline.SeqLen})) AS BIGINT) AS pad_pad_tokens, CAST(sum(greatest(n_toks - ${Pipeline.SeqLen}, 0)) AS BIGINT) AS pad_trunc_tokens, CAST(round((count(*) * ${Pipeline.SeqLen} - sum(least(n_toks, ${Pipeline.SeqLen}))) * 10000.0 / (count(*) * ${Pipeline.SeqLen})) AS BIGINT) AS pad_waste_e4 FROM f GROUP BY source ORDER BY source""",
    // Packing by the trained tokenizer's piece counts: the tokenize_bpe
    // chain's per-doc n_pieces feeds the identical per-source window.
    "pack_sequences_bpe" ->
      s"""WITH ${bpeCtes(TextAnalytics.BpeMerges, finalSeg = true)}, occ AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '$Tok')) AS word FROM documents), np AS (SELECT word, CAST(len(pieces) AS BIGINT) AS n_pieces FROM seg${TextAnalytics.BpeMerges}), pd AS (SELECT o.doc_id, CAST(sum(np.n_pieces) AS BIGINT) AS n_pieces FROM occ o JOIN np ON o.word = np.word GROUP BY o.doc_id), t AS (SELECT d.doc_id, d.source, COALESCE(pd.n_pieces, 0) AS n_pieces FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id), o2 AS (SELECT doc_id, source, n_pieces, CAST(sum(n_pieces) OVER (PARTITION BY source ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_pieces AS BIGINT) AS "offset" FROM t) SELECT doc_id, source, n_pieces, "offset", CAST("offset" // ${Pipeline.SeqLen} AS BIGINT) AS seq_id FROM o2 ORDER BY doc_id""",
    // Global packing: the oracle states the flat corpus-wide running sum;
    // the Spark side computes the identical numbers with the two-phase
    // distributed prefix sum (partition totals → broadcast bases), which is
    // exactly why the output is partition-independent.
    "pack_sequences_global" ->
      s"""WITH t AS (SELECT doc_id, CAST(len(regexp_extract_all(lower(text), '$Tok')) AS BIGINT) AS n_toks FROM documents), o AS (SELECT doc_id, n_toks, CAST(sum(n_toks) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_toks AS BIGINT) AS "offset" FROM t) SELECT doc_id, n_toks, "offset", CAST("offset" // 256 AS BIGINT) AS seq_id FROM o ORDER BY doc_id""",
    // Overlapping token-window chunking: starts every 24 tokens, windows of
    // 32; DuckDB's w[a:b] list slice is 1-based INCLUSIVE (b = a+31) and
    // clamps at the end exactly like Spark's slice(toks, start, len).
    "chunk_documents" ->
      s"""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '$Tok') AS w, len(regexp_extract_all(lower(text), '$Tok')) AS n FROM documents), c AS (SELECT doc_id, unnest(CASE WHEN n = 0 THEN [] ELSE range(0, (n - 1) // 24 + 1) END) AS i, w FROM t) SELECT doc_id, CAST(i AS BIGINT) AS chunk_id, CAST(len(w[(i * 24 + 1):(i * 24 + 32)]) AS BIGINT) AS n_chunk_toks, array_to_string(w[(i * 24 + 1):(i * 24 + 32)], ' ') AS chunk_text FROM c ORDER BY doc_id, chunk_id""",
    // Stratified sampling: salted-hash order within each language, keep the
    // first StratCap; all rows emitted with rank + kept flag.
    "sample_stratified" ->
      s"""WITH $StratHashCtes, r AS (SELECT doc_id, lang, CAST(row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS BIGINT) AS rn FROM h) SELECT doc_id, lang, rn, CAST(CASE WHEN rn <= 50 THEN 1 ELSE 0 END AS BIGINT) AS kept FROM r ORDER BY doc_id""",
    // Scale-path twin: the same sample via the hash-threshold pre-filter —
    // the oracle mirrors the THRESHOLD algorithm (not the full window), so
    // the hash-match holds by construction, and PipelineSpec separately
    // asserts equality with the audit view's kept rows.
    "sample_stratified_capped" ->
      s"""WITH $StratHashCtes, counts AS (SELECT lang, count(*) AS n FROM h GROUP BY 1), adm AS (SELECT b.doc_id, b.lang, b.hh FROM h b JOIN counts c ON b.lang = c.lang WHERE b.hh <= least(1000000007, CAST(ceil(2.0 * 50 * 1000000007 / c.n) AS BIGINT))), r AS (SELECT doc_id, lang, CAST(row_number() OVER (PARTITION BY lang ORDER BY hh, doc_id) AS BIGINT) AS rn FROM adm) SELECT doc_id, lang, rn FROM r WHERE rn <= 50 ORDER BY doc_id""",
    // Deterministic global training shuffle: the oracle states the flat
    // rank in salted-hash order; the Spark side computes the identical
    // positions with the two-phase distributed prefix count, which is
    // exactly why the output is partition-independent.
    "data_shuffle" ->
      s"""WITH ${orderHashCtes("shuf:", "source")}, r AS (SELECT doc_id, hh, row_number() OVER (ORDER BY hh, doc_id) - 1 AS pos FROM h) SELECT doc_id, CAST(hh AS BIGINT) AS shuffle_h, CAST(pos AS BIGINT) AS pos, CAST(pos % ${Pipeline.ShuffleShards} AS BIGINT) AS shard FROM r ORDER BY doc_id""",
    // Packing in the shuffled training order: the flat window over the
    // shuffle-hash order; the Spark side computes identical offsets with
    // the two-phase distributed prefix sum over (h, doc_id) ranges.
    "data_pack_shuffled" ->
      s"""WITH $PackShuffledCtes SELECT doc_id, n_toks, "offset", CAST("offset" // ${Pipeline.SeqLen} AS BIGINT) AS seq_id FROM o ORDER BY doc_id""",
    // Token-budget trim: the SAME packed offsets over the shuffled order
    // (shared CTE constant); kept iff the whole span fits the budget.
    "data_budget_trim" ->
      s"""WITH $PackShuffledCtes SELECT doc_id, n_toks, "offset", CAST(CASE WHEN "offset" + n_toks <= ${Pipeline.TrimBudgetTokens} THEN 1 ELSE 0 END AS BIGINT) AS kept FROM o ORDER BY doc_id""",
    // Curriculum staging: the LM-score CTEs feed a flat (fluency desc,
    // doc_id) position; stage = (pos * S) div N + 1 — equal-width
    // position stages, all-integer.
    "data_curriculum" ->
      s"""WITH $LmCtes, lmc AS (SELECT d.doc_id, CAST(CASE WHEN s.n_bigrams IS NULL THEN 0 ELSE round(s.lm_score_e4 * 1.0 / s.n_bigrams) END AS BIGINT) AS lm_mean_e4 FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id), rk AS (SELECT doc_id, lm_mean_e4, CAST(row_number() OVER (ORDER BY lm_mean_e4 DESC, doc_id) - 1 AS BIGINT) AS pos FROM lmc), nn AS (SELECT count(*) AS n FROM documents) SELECT doc_id, lm_mean_e4, pos, CAST((pos * ${Pipeline.CurriculumStages}) // nn.n + 1 AS BIGINT) AS stage FROM rk CROSS JOIN nn ORDER BY doc_id""",
    // End-to-end training manifest: clean gates ∧ train split ∧ not
    // contaminated, survivors shuffled + packed — the standalone stage
    // oracles' CTEs composed into one statement (same definitions, so the
    // manifest cannot disagree with its audit views).
    "ship_manifest" ->
      s"""WITH $cleanFlagCtes, toks AS (SELECT doc_id, text, regexp_extract_all(lower(text), '$Tok') AS w FROM documents), shd AS (SELECT DISTINCT doc_id, sh FROM (SELECT doc_id, unnest(CASE WHEN len(w) >= 3 THEN list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) ELSE ['#' || text] END) AS sh FROM toks)), sps AS (SELECT doc_id, CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split FROM (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length(s2) + 1), i -> CAST(ascii(substr(s2, i, 1)) AS BIGINT))), (h, c) -> (h * 31 + c) & 4294967295) % 100 AS bucket FROM (SELECT doc_id, 'split:' || CAST(doc_id AS VARCHAR) AS s2 FROM documents))), tsh AS (SELECT DISTINCT s.sh FROM shd s JOIN sps p ON s.doc_id = p.doc_id WHERE p.split = 'test'), shr AS (SELECT s.doc_id, count(*) AS n_shared FROM shd s JOIN sps p ON s.doc_id = p.doc_id JOIN tsh t2 ON s.sh = t2.sh WHERE p.split <> 'test' GROUP BY s.doc_id), kept AS (SELECT d.doc_id FROM documents d JOIN flags f ON d.doc_id = f.doc_id LEFT JOIN surv sv ON d.doc_id = sv.doc_id JOIN sps p ON d.doc_id = p.doc_id LEFT JOIN shr r ON d.doc_id = r.doc_id WHERE sv.doc_id IS NOT NULL AND f.quality_ok = 1 AND f.lang_match = 1 AND p.split = 'train' AND COALESCE(r.n_shared, 0) = 0), ${orderHashCtes("shuf:", "source")}, kt AS (SELECT h.doc_id, h.hh, s.n_toks FROM h JOIN kept k ON h.doc_id = k.doc_id JOIN s ON h.doc_id = s.doc_id), o AS (SELECT doc_id, n_toks, CAST(sum(n_toks) OVER (ORDER BY hh, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_toks AS BIGINT) AS "offset" FROM kt) SELECT doc_id, n_toks, "offset", CAST("offset" // ${Pipeline.SeqLen} AS BIGINT) AS seq_id FROM o ORDER BY doc_id""",
  )
}
