package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.Fns._
import graft.sources.Tables

/** Approximate-nearest-neighbor / similarity search over the embeddings table.
  *
  *  - `bruteTopK` is the exact baseline: broadcast the (small) query set,
  *    stream the corpus once, per-group top-k. The corpus side never
  *    shuffles the vectors — only (qid, cid, sim) triples move.
  *  - `lshTopK` is the scale path: banded sign-projection LSH with
  *    deterministic hyperplanes buckets the corpus per band; each query
  *    only scores candidates that share a band bucket. At 100 TB bits-per-
  *    band sets bucket count (selectivity) and band count buys recall —
  *    recall is asserted against the brute-force baseline in tests.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplanes (LCG-derived, no RNG object). */
  val Dim = 64
  def plane(j: Int): Array[Double] =
    Array.tabulate(Dim) { k =>
      val x = (1103515245L * (j * Dim + k + 1) + 12345L) % 1000003L
      x.toDouble / 1000003.0 - 0.5
    }

  /** Banded sign-projection keys: `bands` rows per vector, each with an
    * `rows`-bit band key from planes [band*rows, band*rows+rows). Banding
    * trades one wide bucket for several narrow ones — a pair is a candidate
    * if ANY band agrees, which keeps recall high for near-duplicates while
    * each band's equi-join stays bounded by bucket occupancy. Input must have
    * (vec_id, v: array<double>). */
  def bandedKeys(df: DataFrame, bands: Int, rows: Int): DataFrame =
    bandedKeysCarry(df.select("vec_id", "v"), bands, rows)
      .select("vec_id", "band_idx", "band_key")

  /** [[bandedKeys]] keeping every input column — the form a streaming
    * consumer needs (the arriving vector must ride along with its keys;
    * a join-back by id would be a stream-stream join). One band-key
    * definition for both (this IS bandedKeys' implementation). */
  def bandedKeysCarry(df: DataFrame, bands: Int, rows: Int): DataFrame = {
    val bandStructs = array((0 until bands).map { b =>
      val key = (0 until rows).map { r =>
        when(dotD(col("v"), typedlit(plane(b * rows + r).toSeq)) > 0, lit(1L << r))
          .otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(b.toLong).as("band_idx"), key.as("band_key"))
    }: _*)
    df.withColumn("bb", explode(bandStructs))
      .withColumn("band_idx", col("bb.band_idx"))
      .withColumn("band_key", col("bb.band_key"))
      .drop("bb")
  }

  private def corpus(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), toDoubleArr(col("embedding")).as("v"))
      .withColumn("nrm", l2Norm(col("v")))

  /** Per-label centroid statistics — grouped VECTOR aggregation, the
    * building block of k-means updates, cluster quality reports, and
    * dataset-cartography dashboards (and the one query that exercises the
    * embeddings table's ground-truth `label` column). Components quantize
    * to 1e-6 fixed point BEFORE aggregation, so the distributed sums are
    * exact integers (order-independent) and the centroid mean is one
    * pinned double division at the end — the same determinism recipe as
    * the trained-IVF Lloyd step. Reports the first four centroid
    * components in e4 (the full vector aggregates identically; scalar
    * columns keep the oracle comparison type-exact).
    *
    * Scale shape: ONE partial-aggregated shuffle of (label, Σe6 per dim,
    * count) — per-task state is labels × dim longs, the map-side-combine
    * profile every mean/variance aggregate shares. */
  def embeddingCentroids(s: SparkSession, d: String): DataFrame =
    embeddingCentroidsDf(Tables.embeddings(s, d))

  /** Same, over any (label, embedding: array<float>) DataFrame. */
  def embeddingCentroidsDf(embeddings: DataFrame): DataFrame = {
    def e6(k: Int) =
      round(element_at(col("embedding"), k).cast("double") * 1000000).cast("long")
    def mean(k: Int) =
      round(col(s"s$k").cast("double") / col("n") / 100).cast("long").as(s"c${k}_e4")
    embeddings
      .select(col("label").cast("long").as("label"),
        e6(1).as("e1"), e6(2).as("e2"), e6(3).as("e3"), e6(4).as("e4"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum("e1").as("s1"), sum("e2").as("s2"),
        sum("e3").as("s3"), sum("e4").as("s4"))
      .select(col("label"), col("n"), mean(1), mean(2), mean(3), mean(4))
      .orderBy("label")
  }

  /** Exact cosine top-k for each query vector (queries = vec_id < nQueries).
    * Similarity is 1e-4 fixed point and ranked (sim_e4 desc, cid asc) so the
    * ranking is deterministic and oracle-reproducible (rule R3). */
  def bruteTopK(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val c = corpus(s, d)
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("qid"), col("vec_id").as("cid"),
        e4(dotD(col("v"), col("qv")) / (col("nrm") * col("qn"))).as("sim_e4"))
    val w = Window.partitionBy("qid").orderBy(desc("sim_e4"), asc("cid"))
    scored
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .orderBy("qid", "rn")
  }

  /** Reciprocal-rank-fusion constant (Cormack, Clarke & Buettcher 2009,
    * "Reciprocal Rank Fusion outperforms Condorcet and individual Rank
    * Learning Methods", SIGIR — k=60 is the paper's setting and the
    * de-facto default in hybrid search stacks). */
  val RrfK = 60
  val HybridNq = 5
  val HybridDepth = 20
  val HybridTopK = 10

  /** HYBRID RETRIEVAL via reciprocal rank fusion — the standard two-tower
    * search shape of RAG and curation stacks: a LEXICAL ranking and a
    * SEMANTIC ranking are computed independently per query and fused by
    * RRF(d) = Σ 1/(k + rank_i(d)), which needs no score calibration
    * between the towers (ranks only). Queries are the corpus documents
    * with doc_id < `nQueries` (ids are shared between `documents` and
    * `embeddings` on the common prefix — the multimodal-row contract):
    *
    *  - lexical tower: the SHARED exact n-gram Jaccard pair product
    *    ([[graft.operators.Dedup.jaccardPairsShared]]), re-oriented
    *    around the query doc and ranked by jac_e4 (desc, cid asc);
    *  - semantic tower: exact cosine against the query's embedding,
    *    self excluded, ranked the same way ([[bruteTopK]]'s shape; at
    *    scale swap in [[lshTopK]] or the served IVF-PQ index — the
    *    fusion is rank-only, so the tower is pluggable by construction).
    *
    * Each tower contributes its top `depth`; a doc missing from one
    * tower contributes 0 from that side (the conventional treatment).
    * RRF terms are e4-rounded integers (round(1e4/(k+r))) so the fused
    * score — and therefore the ranking — is integer-exact and
    * hash-matches the oracle; at depth ≤ 20 no half-way rounding case
    * exists (1e4/(60+r) = x.5 needs 20000/(60+r) to be an ODD integer;
    * the only divisor of 20000 in (60, 80] is 80, whose quotient 250 is
    * even — re-derive this bound when changing RrfK or the depth).
    *
    * Scale shape: the lexical tower is a filter of the stored pair
    * product (query-rows only); the semantic tower broadcasts the tiny
    * query set and streams the corpus once; the fusion is an equi-join
    * of two depth×nQueries-row frames and a per-query window over
    * ≤ 2·depth rows. The towers' ONLINE halves already exist as the
    * streaming BM25 scorer and the streaming ANN probe
    * ([[graft.streaming.VectorStreams.knnProbeStream]]) — fusing their
    * sink tables goes through the SAME [[rrfFuse]] core as this query
    * (VectorStreamsSpec fuses a real streamed sink against the lexical
    * tower and checks it against an independent fold). */
  def hybridRrf(s: SparkSession, d: String, nQueries: Int = HybridNq,
      depth: Int = HybridDepth, k: Int = HybridTopK): DataFrame = {
    val c = corpus(s, d)
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val wSem = Window.partitionBy("qid").orderBy(desc("sim_e4"), asc("cid"))
    val sem = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        e4(dotD(col("v"), col("qv")) / (col("nrm") * col("qn"))).as("sim_e4"))
      .withColumn("r", row_number().over(wSem).cast("long"))
      .filter(col("r") <= depth)
      .select(col("qid"), col("cid"), col("r").as("r_sem"))
    fuseRrf(s, d, sem, nQueries, depth, k)
  }

  /** [[hybridRrf]] with the semantic tower SWAPPED for the persisted
    * IVF-PQ index — the tower-pluggability the RRF design promises, made
    * code: rankings come from [[ivfPqServedTopK]] (probe + ADC + exact
    * re-rank over the stored artifacts, NO training scan), re-ranked
    * after self-exclusion so rank 1 is the best non-self neighbor, then
    * fused with the same shared-lexical tower by the same integer-exact
    * RRF. This is the RAG-stack deployment shape: both towers read
    * build-once products (the Jaccard pair table, the serving index);
    * query cost is two bounded retrievals plus a depth×nQueries fuse. */
  def hybridRrfServed(s: SparkSession, d: String, nQueries: Int = HybridNq,
      depth: Int = HybridDepth, k: Int = HybridTopK,
      indexDir: Option[String] = None): DataFrame = {
    // depth+1 from the index: the self-hit (cosine 1.0) occupies one
    // slot; after excluding it, a full `depth` of neighbors remains.
    // The exact re-rank stage can return at most PqRerank rows per
    // query, so a deeper tower than the shortlist would silently
    // truncate — refuse instead.
    require(depth + 1 <= PqRerank,
      s"tower depth ${depth + 1} exceeds the ADC re-rank shortlist $PqRerank")
    val served = ivfPqServedTopK(s, d, nQueries = nQueries, k = depth + 1,
      indexDir = indexDir)
    val wSem = Window.partitionBy("qid").orderBy(asc("rn"))
    val sem = served.filter(col("cid") =!= col("qid"))
      .withColumn("r", row_number().over(wSem).cast("long"))
      .filter(col("r") <= depth)
      .select(col("qid"), col("cid"), col("r").as("r_sem"))
    fuseRrf(s, d, sem, nQueries, depth, k)
  }

  /** The tower-agnostic half of hybrid retrieval: the SHARED lexical
    * tower (stored Jaccard pairs re-oriented around the queries) fused
    * with any (qid, cid, r_sem) semantic ranking by integer-exact RRF —
    * one definition, so every tower swap fuses identically. */
  private def fuseRrf(s: SparkSession, d: String, sem: DataFrame,
      nQueries: Int, depth: Int, k: Int): DataFrame = {
    val jac = graft.operators.Dedup.jaccardPairsShared(s, d)
    val lex0 = jac.filter(col("d1") < nQueries)
        .select(col("d1").as("qid"), col("d2").as("cid"), col("jac_e4"))
      .unionAll(jac.filter(col("d2") < nQueries)
        .select(col("d2").as("qid"), col("d1").as("cid"), col("jac_e4")))
    val wLex = Window.partitionBy("qid").orderBy(desc("jac_e4"), asc("cid"))
    val lex = lex0
      .withColumn("r", row_number().over(wLex).cast("long"))
      .filter(col("r") <= depth)
      .select(col("qid"), col("cid"), col("r").as("r_lex"))
    rrfFuse(lex, sem, k)
  }

  /** The RRF CORE, rank-only and source-agnostic: fuse a
    * (qid, cid, r_lex) and a (qid, cid, r_sem) ranking (full-outer — a
    * doc missing from one tower contributes 0 from that side) into the
    * top-k per query by the integer-exact e4 RRF score. This is the
    * whole post-step the hybrid family's ONLINE half needs: the
    * streaming towers (the BM25 scorer, the ANN probe) maintain sink
    * tables; ranking each sink per query and calling this fuses them
    * exactly as the batch queries fuse — VectorStreamsSpec does it over
    * a real streamed sink. Both rank columns must already be ≤ the
    * caller's depth (see the half-way-rounding bound at [[hybridRrf]]). */
  def rrfFuse(lex: DataFrame, sem: DataFrame, k: Int): DataFrame = {
    def term(r: org.apache.spark.sql.Column) =
      when(r.isNotNull,
        round(lit(10000.0) / (lit(RrfK) + r)).cast("long")).otherwise(lit(0L))
    val wF = Window.partitionBy("qid").orderBy(desc("rrf_e4"), asc("cid"))
    lex.join(sem, Seq("qid", "cid"), "full_outer")
      .select(col("qid"), col("cid"),
        coalesce(col("r_lex"), lit(0L)).as("r_lex"),
        coalesce(col("r_sem"), lit(0L)).as("r_sem"),
        (term(col("r_lex")) + term(col("r_sem"))).as("rrf_e4"))
      .withColumn("rn", row_number().over(wF).cast("long"))
      .filter(col("rn") <= k)
      .orderBy("qid", "rn")
  }

  // IVF parameters: nCells coarse cells, nProbe cells scanned per query.
  // At 100 TB, nCells grows with corpus size (classically ~sqrt(n)) so cell
  // occupancy — and therefore per-query scan cost — stays bounded; nProbe
  // buys recall. Real systems train centroids with k-means; this engine
  // uses a deterministic coarse quantizer (the first nCells corpus vectors)
  // so the whole operator — assignment, probing, scoring — is reproducible
  // in the DuckDB oracle. The IVF *shape* (broadcast centroids → linear
  // assignment scan → probe-cell equi-join) is exactly the production one;
  // swapping in trained centroids changes only the `cents` frame.
  val IvfCells = 16
  val IvfProbe = 4

  /** IVF (inverted-file) approximate top-k — the cell-partitioned ANN scale
    * path, complementing the hash-bucketed `lshTopK`:
    *  1. assign every corpus vector to its nearest centroid by cosine
    *     (argmax over nCells broadcast centroids; ties break on lower cell
    *     id; comparisons use e4-rounded similarity so both engines order
    *     identically);
    *  2. each query probes its nProbe nearest cells;
    *  3. only vectors in probed cells are scored exactly and ranked.
    * The corpus streams ONCE through the assignment (nCells codegen'd dot
    * products per vector, the direct analog of production IVF indexing);
    * candidate scanning is an equi-join on cell_id, so shuffle volume is
    * linear and bounded by cell occupancy × nProbe. A query's own cell is
    * always its first probe, so rank-1 self-match is guaranteed. Recall vs
    * bruteTopK is gated in SimilaritySpec. */
  def ivfTopK(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5,
      nCells: Int = IvfCells, nProbe: Int = IvfProbe): DataFrame = {
    // Corpus feeds assignment, scoring, and the query/centroid subsets.
    val c = corpus(s, d).persist(StorageLevel.MEMORY_AND_DISK)
    val cents = c.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell_id"), col("v").as("cv"), col("nrm").as("cnrm"))
    val assign = assignCells(c, cents)
    graft.functions.Caching.releaseAfterAction(
      probeAndScore(c, cents, assign, nQueries, k, nProbe), c)
  }

  /** Coarse assignment: one row per corpus vector — argmax over the
    * broadcast centroids by e4-rounded cosine, ties to the lower cell id
    * (identical ordering on both engines). The one-pass
    * broadcast-centroids scan is the production IVF indexing shape; the
    * argmax is a map-side-combining min over (−sim, cell) struct pairs,
    * not a window sort (same plan shape as the trained-PQ encode). */
  private def assignCells(c: DataFrame, cents: DataFrame): DataFrame =
    assignCellsSim(c, cents).select("vec_id", "cell_id")

  /** [[assignCells]] keeping the winning e4 cosine — the form the full
    * clustering product emits. */
  private def assignCellsSim(c: DataFrame, cents: DataFrame): DataFrame =
    c.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cell_id"),
        e4(dotD(col("v"), col("cv")) / (col("nrm") * col("cnrm"))).as("csim_e4"))
      .groupBy("vec_id")
      .agg(min(struct(negate(col("csim_e4")).as("ns"), col("cell_id").as("cell_id"))).as("mn"))
      .select(col("vec_id"), col("mn.cell_id").as("cell_id"),
        negate(col("mn.ns")).as("sim_e4"))

  /** Probe the nProbe nearest cells per query, exact-score only vectors in
    * probed cells, rank. Shared by the stub-quantizer and trained IVF. */
  private def probeAndScore(c: DataFrame, cents: DataFrame, assign: DataFrame,
      nQueries: Int, k: Int, nProbe: Int): DataFrame = {
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val wProbe = Window.partitionBy("qid").orderBy(desc("csim_e4"), asc("cell_id"))
    val probes = q.crossJoin(broadcast(cents))
      .select(col("qid"), col("cell_id"),
        e4(dotD(col("qv"), col("cv")) / (col("qn") * col("cnrm"))).as("csim_e4"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("cell_id"))
    val cand = assign.join(broadcast(probes), "cell_id")
      .select(col("qid"), col("vec_id").as("cid"))
      .distinct()
    val scored = cand
      .join(c.select(col("vec_id").as("cid"), col("v"), col("nrm")), "cid")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("cid"),
        e4(dotD(col("v"), col("qv")) / (col("nrm") * col("qn"))).as("sim_e4"))
    val w = Window.partitionBy("qid").orderBy(desc("sim_e4"), asc("cid"))
    scored
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .orderBy("qid", "rn")
  }

  // Deterministic k-means training: fixed iteration count, fixed init (the
  // e6-quantized first nCells vectors — the stub quantizer's centroids).
  val IvfKmeansIters = 2

  /** IVF with a TRAINED coarse quantizer — Lloyd's k-means made fully
    * deterministic and oracle-reproducible:
    *  - centroids live in 1e-6 fixed point: per-cell component sums are
    *    exact integer arithmetic (order-independent, so Spark's partial
    *    aggregation order cannot perturb them), and the mean is one exact
    *    double division + round-half-away — identical on both engines;
    *  - cosine is scale-invariant, so the e6-scaled integer centroid vector
    *    is used directly (no divide-back, no float drift);
    *  - assignment/probing order by e4-rounded cosine with cell-id ties.
    * Each iteration is the classic scale shape: broadcast centroids → one
    * corpus pass (assignment) → per-cell aggregate; the driver holds only
    * nCells × Dim integers (k-means‖ would swap in here for huge nCells).
    * Cells that lose every member keep their previous centroid. Recall vs
    * bruteTopK is gated in SimilaritySpec alongside the stub variant. */
  def ivfTrainedTopK(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5,
      nCells: Int = IvfCells, nProbe: Int = IvfProbe,
      iters: Int = IvfKmeansIters): DataFrame = {
    val (c, trained) = trainCoarse(s, d, nCells, iters)
    graft.functions.Caching.releaseAfterAction(
      probeAndScore(c, trained, assignCells(c, trained), nQueries, k, nProbe), c)
  }

  /** The deterministic coarse k-means loop shared by [[ivfTrainedTopK]]
    * and [[kmeansClusters]]: returns the PERSISTED normed corpus (caller
    * releases after its terminal action) and the trained centroid frame. */
  private def trainCoarse(s: SparkSession, d: String, nCells: Int,
      iters: Int): (DataFrame, DataFrame) = {
    import s.implicits._
    val c = corpus(s, d).persist(StorageLevel.MEMORY_AND_DISK)
    // e6 fixed-point corpus for the exact-integer centroid sums.
    val ce6 = c.select(col("vec_id"),
        transform(col("v"), x => round(x * lit(1000000.0)).cast("long")).as("ve6"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var cents: Seq[(Long, Seq[Double])] = ce6.filter(col("vec_id") < nCells)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).map(_.toDouble).toSeq)).toSeq
    def centsDf(cs: Seq[(Long, Seq[Double])]): DataFrame =
      cs.toDF("cell_id", "cv").withColumn("cnrm", l2Norm(col("cv")))
    for (_ <- 1 to iters) {
      val asgn = assignCells(c, centsDf(cents))
      val sums = (0 until Dim).map(kk =>
        sum(element_at(col("ve6"), kk + 1)).as(s"s$kk"))
      val rows = asgn.join(ce6, "vec_id").groupBy("cell_id")
        .agg(count(lit(1)).as("cnt"), sums: _*).collect()
      val updated = rows.map { r =>
        val cnt = r.getLong(1)
        val comps = (0 until Dim).map { kk =>
          val q = r.getLong(2 + kk).toDouble / cnt
          // round half away from zero — DuckDB round() semantics.
          Math.copySign(Math.floor(Math.abs(q) + 0.5), q)
        }
        r.getLong(0) -> comps.toSeq
      }.toMap
      cents = cents.map { case (cell, prev) => (cell, updated.getOrElse(cell, prev)) }
    }
    ce6.unpersist(false)
    (c, centsDf(cents))
  }

  /** FULL K-MEANS CLUSTERING as a product — the per-vector assignment
    * table [[ivfTrainedTopK]]'s quantizer only uses internally: every
    * vector labeled with its trained cluster, its e4 cosine to the
    * centroid (the cartography "confidence" column), and the cluster
    * size. This is the dataset-map / semantic-bucketing surface
    * (cluster-balanced sampling, per-cluster inspection, SemDeDup's
    * within-cluster stage) — train once, emit the whole assignment.
    *
    * Scale shape: the training loop is the shared [[trainCoarse]]
    * (broadcast centroids → one corpus pass → per-cell aggregate per
    * round; driver holds nCells × Dim integers); the final assignment is
    * one more broadcast-centroid pass (map-side argmax aggregate, no
    * window), sizes are a cluster-count aggregate broadcast back. */
  def kmeansClusters(s: SparkSession, d: String, nCells: Int = IvfCells,
      iters: Int = IvfKmeansIters): DataFrame =
    kmeansAssignmentsShared(s, d, nCells, iters).orderBy("vec_id")

  /** Algorithm version of the k-means assignment product — cache-key
    * component; bump whenever the training/assignment construction
    * changes. */
  private val KmAssignVersion = 1

  /** The full k-means assignment table built ONCE per (corpus, cells,
    * iters) and SHARED through the content-addressed
    * [[graft.sources.ArtifactCache]] — the Lloyd training loop plus the
    * assignment pass that `embedding_kmeans` and
    * `sample_cluster_balanced` each re-ran inside their own plans.
    * Consumers scan (vec_id, cluster_id, sim_e4, cluster_size); rows are
    * identical by construction (deterministic seeding and integer-exact
    * argmax ties). */
  def kmeansAssignmentsShared(s: SparkSession, d: String,
      nCells: Int = IvfCells, iters: Int = IvfKmeansIters): DataFrame =
    graft.sources.ArtifactCache.getOrBuild(s, "kmassign",
      s"$d/embeddings.parquet",
      Seq(nCells, iters, KmAssignVersion))(
      kmeansClustersRaw(s, d, nCells, iters))

  /** The unordered assignment computation — the build side of the product. */
  private def kmeansClustersRaw(s: SparkSession, d: String, nCells: Int,
      iters: Int): DataFrame = {
    val (c, trained) = trainCoarse(s, d, nCells, iters)
    val asgn = assignCellsSim(c, trained)
      .select(col("vec_id"), col("cell_id").as("cluster_id"), col("sim_e4"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = asgn.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    graft.functions.Caching.releaseAfterAction(
      asgn.join(broadcast(sizes), "cluster_id")
        .select(col("vec_id"), col("cluster_id"), col("sim_e4"), col("cluster_size")),
      c, asgn)
  }

  /** Per-cluster cap for the cluster-balanced sample. */
  val ClusterCap = 20L

  /** CLUSTER-BALANCED SAMPLING — the curation step the k-means product
    * exists for: cap each semantic cluster at [[ClusterCap]] members so
    * over-represented modes (boilerplate clusters, template farms) stop
    * dominating the sample — the embedding-space analog of the
    * per-language stratified sampler, with the SAME deterministic
    * salted-hash order (salt "cbal:", mix32-avalanched) and the same
    * audit contract: every vector emitted with its cluster, rank, and
    * kept flag. Consumes the SHARED assignment product
    * ([[kmeansAssignmentsShared]]) + one rank window on the cluster
    * key; the hash-threshold pre-filter scale path applies verbatim
    * when clusters outgrow the window (see `sample_stratified_capped`). */
  def clusterBalancedSample(s: SparkSession, d: String,
      cap: Long = ClusterCap, nCells: Int = IvfCells,
      iters: Int = IvfKmeansIters): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = pmod(graft.functions.Fns.mix32(graft.functions.Fns.polyHash(
      concat(lit("cbal:"), col("vec_id").cast("string")))), lit(1000000007L))
    val w = Window.partitionBy("cluster_id").orderBy(col("h"), col("vec_id"))
    // Consume the SHARED assignment product instead of re-running the
    // training loop — the sampler only needs (vec_id, cluster_id).
    kmeansAssignmentsShared(s, d, nCells, iters)
      .select(col("vec_id"), col("cluster_id"), h.as("h"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .select(col("vec_id"), col("cluster_id"), col("rn"),
        (col("rn") <= cap).cast("long").as("kept"))
      .orderBy("vec_id")
  }

  // PQ parameters: M subspaces of SubDim dims each, K centroids per
  // subspace. 8×16 → codes are 8 small ints per vector: a 16× memory
  // compression of the 64-double corpus, the property that lets
  // billion-vector indexes live in RAM.
  val PqM = 8
  val PqK = 16
  val PqSubDim: Int = Dim / PqM

  /** Product-quantization approximate top-k — the memory-compressed ANN
    * path, complementing cell-partitioned IVF and hash-bucketed LSH:
    *  1. codebook: per subspace m, K centroids (deterministic stub: the
    *     sub-slices of the first K NORMALIZED corpus vectors — same
    *     swap-in-trained-centroids contract as ivfTopK, and the k-means of
    *     ivfTrainedTopK shows exactly how a trained codebook would slot in);
    *  2. encode: every corpus vector → M argmin-L2 centroid codes
    *     (e4-rounded distances, ties to the lower centroid id — identical
    *     ordering on both engines). The codes table IS the index: M bytes
    *     per vector instead of Dim doubles;
    *  3. ADC scoring: per query, an M×K inner-product lookup table; the
    *     approximate similarity of a candidate is the SUM of its codes'
    *     table entries (asymmetric distance computation) — integer sums of
    *     e4 values, so distributed order cannot perturb ranks.
    * Scale shape: the corpus streams ONCE through encoding against the
    * broadcast codebook (M·K small dot products per vector, no shuffle);
    * scoring shuffles only (qid, cid, partial) triples — the full vectors
    * never move after encoding, which is the entire point of PQ at 100 TB.
    * Cosine equivalence: vectors are pre-normalized, so inner-product ADC
    * ranks by approximate cosine. Recall vs bruteTopK is gated in
    * SimilaritySpec. */
  def pqTopK(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5,
      m: Int = PqM, kCents: Int = PqK): DataFrame = {
    val sub = PqSubDim
    val c = corpus(s, d)
      .select(col("vec_id"), transform(col("v"), x => x / col("nrm")).as("vn"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // (vec_id, m, xm): the M sub-vectors of each normalized vector.
    def subVectors(df: DataFrame, idCol: String): DataFrame =
      df.select(col("vec_id"), posexplode(
          array((0 until m).map(i => slice(col("vn"), i * sub + 1, sub)): _*)))
        .toDF(idCol, "m", "xm")
    val subs = subVectors(c, "vec_id")
    // Codebook: 128 rows (M × K), broadcast everywhere.
    val cb = subVectors(c.filter(col("vec_id") < kCents), "j")
      .select(col("j"), col("m"), col("xm").as("cm"))
    // Encode: d²(x_m, c_mj) = ⟨x,x⟩ − 2⟨x,c⟩ + ⟨c,c⟩ in e4, argmin per
    // (vec_id, m) with centroid-id ties — one linear corpus pass whose
    // argmin partial-aggregates map-side (min over (d2, j) structs).
    val codes = subs.join(broadcast(cb), "m")
      .select(col("vec_id"), col("m"), col("j"),
        e4(dotD(col("xm"), col("xm")) - lit(2.0) * dotD(col("xm"), col("cm"))
          + dotD(col("cm"), col("cm"))).as("d2_e4"))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("d2_e4"), col("j"))).as("mn"))
      .select(col("vec_id"), col("m"), col("mn.j").as("j"))
    // ADC lookup table: e4 inner products of each query sub-vector with
    // every centroid — nQueries × M × K rows, broadcast.
    val qtab = subVectors(c.filter(col("vec_id") < nQueries), "qid")
      .select(col("qid"), col("m"), col("xm").as("qm"))
      .join(broadcast(cb), "m")
      .select(col("qid"), col("m"), col("j"),
        e4(dotD(col("qm"), col("cm"))).as("t_e4"))
    // Score = Σ_m table[m][code_m]: an equi-join on (m, code) + one sum —
    // the compressed index is all that moves.
    val scored = codes.join(broadcast(qtab), Seq("m", "j"))
      .select(col("qid"), col("vec_id").as("cid"), col("t_e4"))
      .groupBy("qid", "cid")
      .agg(sum("t_e4").as("approx_e4"))
    val w = Window.partitionBy("qid").orderBy(desc("approx_e4"), asc("cid"))
    graft.functions.Caching.releaseAfterAction(
      scored
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= k)
        .orderBy("qid", "rn"),
      c)
  }

  // ---- OPQ, dimension-allocation variant (Ge et al. 2013, "Optimized
  //      Product Quantization", CVPR). Full OPQ learns an orthonormal
  //      rotation R by alternating SVD solves, which no integer-exact
  //      oracle can reproduce; but a coordinate PERMUTATION is itself an
  //      orthonormal transform, and the paper's parametric analysis says
  //      what a good one does: balance variance across subspaces (its
  //      eigenvalue-allocation criterion). Rank dimensions by exact
  //      per-dim variance and deal them to subspaces in serpentine
  //      ("snake") order — the closed-form balanced-partition heuristic,
  //      reproducible in SQL with one window (no greedy state, no SVD). ----

  /** Per-dimension EXACT variance numerators (n·Σx² − (Σx)² over the
    * e4-quantized normalized coordinates) and the snake allocation:
    * rank dims by (variance DESC, dim ASC); rank r lands in subspace
    * r mod M on even rounds (r div M), M−1−(r mod M) on odd rounds.
    * Decimal(38,0) sums keep the moments exact past the int64 bound
    * (the events_anomaly precedent): at 10⁹ vectors n·Σx² ≤ ~10²⁶ ≪
    * 10³⁸. One corpus pass, map-side-combined to Dim groups; the
    * collected model is Dim rows. Returns (dim, varNum, subspace)
    * sorted by dim. */
  private[graft] def opqSnakeAllocation(cn: DataFrame, m: Int):
      Seq[(Int, BigInt, Int)] = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val mom = cn.select(posexplode(col("vn"))).toDF("d", "x")
      .select(col("d"), e4(col("x")).as("xe"))
      .groupBy("d")
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("xe").cast(dec)).as("sx"),
        sum((col("xe") * col("xe")).cast(dec)).as("sxx"))
      .select(col("d"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("vnum"))
      .collect()
      .map(r => (r.getInt(0), BigInt(r.getDecimal(1).toBigInteger)))
    val ranked = mom.sortBy { case (d, v) => (-v, d) }
    ranked.zipWithIndex.map { case ((d, v), r) =>
      val pos = r % m
      (d, v, if ((r / m) % 2 == 0) pos else m - 1 - pos)
    }.sortBy(_._1).toSeq
  }

  /** OPQ ALLOCATION EVAL — both PQ dimension layouts priced in one
    * hash-matched table: `natural` (the contiguous slices [[pqTopK]]
    * ships) vs `opq_snake` (the variance-balanced permutation). Per
    * layout: `var_imbalance_e4` = (max − min)·10⁴ / max over the
    * per-subspace variance-numerator sums (the quantity OPQ balances,
    * as a scale-free e4 fraction) and `total_err_e4` = Σ over
    * (vector, subspace) of the argmin encode d² against the stub
    * codebook — the downstream quantization error the balance is meant
    * to move. The decision table a deployment reads before paying for
    * a permuted index layout.
    *
    * Scale shape: the allocation is a Dim-row driver model off one
    * exact moments pass; each layout's error pass streams the corpus
    * once against a broadcast codebook — the [[pqTopK]] shape, and the
    * gathered sub-vectors are built by `element_at` projection (no
    * explode/regroup shuffle of the corpus). */
  def opqAllocationEval(s: SparkSession, d: String): DataFrame =
    opqAllocationEvalDf(corpus(s, d))

  /** Same over any (vec_id, v: array<double>) frame (planted tests). */
  def opqAllocationEvalDf(c0: DataFrame, m: Int = PqM,
      kCents: Int = PqK): DataFrame = {
    val s = c0.sparkSession
    import s.implicits._
    val cn = c0
      .withColumn("nrm", l2Norm(toDoubleArr(col("v"))))
      .select(col("vec_id"),
        transform(toDoubleArr(col("v")), x => x / col("nrm")).as("vn"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val alloc = opqSnakeAllocation(cn, m)
    val dim = alloc.size
    // When dim % m != 0 the natural layout's contiguous slices would cover
    // only m*(dim/m) dimensions while the snake assignment covers all of
    // them — the two total_err_e4 values would encode different dimension
    // subsets and the comparison would be meaningless. Guard loudly.
    require(dim % m == 0,
      s"opq allocation eval needs dim % m == 0, got dim=$dim m=$m")
    val sub = dim / m
    val natAsg = (0 until m).map(k =>
      k -> (k * sub until (k + 1) * sub).toSeq).toMap
    val snakeAsg = (0 until m).map(k =>
      k -> alloc.filter(_._3 == k).map(_._1).sorted.toSeq).toMap
    // gathered sub-vectors: subspace k = its dims ascending (the natural
    // layout's gather equals pqTopK's contiguous slice)
    def subVectorsBy(asg: Map[Int, Seq[Int]], idCol: String,
        frame: DataFrame): DataFrame =
      frame.select(col("vec_id").as(idCol), posexplode(
          array((0 until m).map(k => array(asg(k).map(dd =>
            element_at(col("vn"), dd + 1)): _*)): _*)))
        .toDF(idCol, "m", "xm")
    def errFor(layout: String, asg: Map[Int, Seq[Int]]): DataFrame = {
      val subs = subVectorsBy(asg, "vec_id", cn)
      val cb = subVectorsBy(asg, "j", cn.filter(col("vec_id") < kCents))
        .select(col("j"), col("m"), col("xm").as("cm"))
      subs.join(broadcast(cb), "m")
        .select(col("vec_id"), col("m"),
          e4(dotD(col("xm"), col("xm")) - lit(2.0) * dotD(col("xm"), col("cm"))
            + dotD(col("cm"), col("cm"))).as("d2_e4"))
        .groupBy("vec_id", "m")
        .agg(min(col("d2_e4")).as("mn"))
        .agg(sum("mn").as("total_err_e4"))
        .select(lit(layout).as("layout"), col("total_err_e4"))
    }
    // scale-free imbalance off the driver model (exact BigInt arithmetic;
    // all-constant corpora pin 0 rather than divide by zero)
    def imbalanceE4(asg: Map[Int, Seq[Int]]): Long = {
      val byV = alloc.map(t => t._1 -> t._2).toMap
      val sums = (0 until m).map(k => asg(k).map(byV).sum)
      if (sums.max <= 0) 0L
      else ((sums.max - sums.min) * 10000 / sums.max).toLong
    }
    val imbDf = Seq(("natural", imbalanceE4(natAsg)),
      ("opq_snake", imbalanceE4(snakeAsg))).toDF("layout", "var_imbalance_e4")
    graft.functions.Caching.releaseAfterAction(
      errFor("natural", natAsg).unionByName(errFor("opq_snake", snakeAsg))
        .join(broadcast(imbDf), "layout")
        .select(col("layout"), col("var_imbalance_e4"), col("total_err_e4"))
        .orderBy("layout"),
      cn)
  }

  /** IVF-PQ composed — the production billion-vector index shape (FAISS
    * IndexIVFPQ): the coarse quantizer routes each query to its nProbe
    * nearest CELLS, and within probed cells candidates are scored by the
    * compressed PQ codes (ADC) instead of their full vectors; an exact
    * re-rank of the ADC shortlist finishes the retrieval. Both stages are
    * the existing deterministic stub quantizers ([[ivfTopK]]'s cells,
    * [[pqTopK]]'s codebook — the trained twins swap in unchanged), so the
    * whole composition hash-matches the composed oracle.
    *
    * Scale shape — why this composition IS the 100 TB answer: IVF bounds
    * the candidate set to probed-cell occupancy (never the corpus), PQ
    * bounds the bytes touched per candidate to M code bytes (the full
    * vectors are only read for the nQueries × rerank shortlist), and every
    * broadcast side is codebook/query/probe-sized. The corpus streams once
    * through assignment and once through encoding; both products persist
    * in production and amortize over every query batch. */
  def ivfPqTopK(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5,
      nCells: Int = IvfCells, nProbe: Int = IvfProbe,
      m: Int = PqM, kCents: Int = PqK, rerank: Int = PqRerank): DataFrame = {
    val sub = PqSubDim
    val c = corpus(s, d).persist(StorageLevel.MEMORY_AND_DISK)
    val cents = c.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell_id"), col("v").as("cv"), col("nrm").as("cnrm"))
    val assign = assignCells(c, cents)
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val wProbe = Window.partitionBy("qid").orderBy(desc("csim_e4"), asc("cell_id"))
    val probes = q.crossJoin(broadcast(cents))
      .select(col("qid"), col("cell_id"),
        e4(dotD(col("qv"), col("cv")) / (col("qn") * col("cnrm"))).as("csim_e4"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("cell_id"))
    val cand = assign.join(broadcast(probes), "cell_id")
      .select(col("qid"), col("vec_id").as("cid")).distinct()
    val cn = c.select(col("vec_id"), transform(col("v"), x => x / col("nrm")).as("vn"))
    def subVectors(df: DataFrame, idCol: String): DataFrame =
      df.select(col("vec_id"), posexplode(
          array((0 until m).map(i => slice(col("vn"), i * sub + 1, sub)): _*)))
        .toDF(idCol, "m", "xm")
    val cb = subVectors(cn.filter(col("vec_id") < kCents), "j")
      .select(col("j"), col("m"), col("xm").as("cm"))
    val codes = subVectors(cn, "vec_id").join(broadcast(cb), "m")
      .select(col("vec_id"), col("m"), col("j"),
        e4(dotD(col("xm"), col("xm")) - lit(2.0) * dotD(col("xm"), col("cm"))
          + dotD(col("cm"), col("cm"))).as("d2_e4"))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("d2_e4"), col("j"))).as("mn"))
      .select(col("vec_id").as("cid"), col("m"), col("mn.j").as("j"))
    val qtab = subVectors(cn.filter(col("vec_id") < nQueries), "qid")
      .select(col("qid"), col("m"), col("xm").as("qm"))
      .join(broadcast(cb), "m")
      .select(col("qid"), col("m"), col("j"),
        e4(dotD(col("qm"), col("cm"))).as("t_e4"))
    val adc = cand.join(codes, "cid")
      .join(broadcast(qtab), Seq("qid", "m", "j"))
      .groupBy("qid", "cid").agg(sum("t_e4").as("approx_e4"))
    val wShort = Window.partitionBy("qid").orderBy(desc("approx_e4"), asc("cid"))
    val short = adc.withColumn("srn", row_number().over(wShort))
      .filter(col("srn") <= rerank).select("qid", "cid")
    val x = c.select(col("vec_id").as("cid"), col("v").as("xv"), col("nrm").as("xn"))
    val y = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("yv"), col("nrm").as("yn"))
    val w = Window.partitionBy("qid").orderBy(desc("sim_e4"), asc("cid"))
    graft.functions.Caching.releaseAfterAction(
      short.join(x, "cid").join(broadcast(y), "qid")
        .select(col("qid"), col("cid"),
          e4(dotD(col("xv"), col("yv")) / (col("xn") * col("yn"))).as("sim_e4"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= k)
        .orderBy("qid", "rn"),
      c)
  }

  /** IVF-PQ with BOTH stages TRAINED and per-cell RESIDUAL encoding — the
    * production billion-vector index exactly as Jégou et al. 2011 (IVFADC;
    * the FAISS IndexIVFPQ shape) deploy it, replacing [[ivfPqTopK]]'s
    * stub∘stub composition with trained∘trained:
    *  1. COARSE: Lloyd's k-means over the e4-quantized NORMALIZED corpus
    *     (the [[ivfTrainedTopK]] recipe moved into the normalized space,
    *     because residuals must live in the same space PQ encodes) —
    *     exact integer sums, round-half-away means, carry-forward empty
    *     cells, e4-cosine assignment with cell-id ties;
    *  2. RESIDUALS: r = x − c(cell) per vector — exact e4 integers (the
    *     key IVF-PQ idea: residuals have ~cell-radius magnitude, so the
    *     codebook's K centroids quantize a far tighter distribution than
    *     raw vectors);
    *  3. PQ: per-subspace anisotropic Lloyd over the residual sub-vectors
    *     ([[pqTrainedTopK]]'s loss with the parallel direction taken
    *     along the ORIGINAL vector x — the ScaNN-correct direction, since
    *     ⟨q,x̂⟩ error for queries near x is what anisotropy protects; x
    *     rides at e3 scale so (η−1)·⟨e,x⟩² + ⟨x,x⟩·⟨e,e⟩ tops out near
    *     2.1e17 ≪ 2^63 — pure 64-bit on both engines);
    *  4. ADC: inner product is linear, so ⟨q, c + r̂⟩ = ⟨q, c_cell⟩ +
    *     Σ_m⟨q_m, cm_code⟩ — ONE M×K lookup table per query (not per
    *     cell) plus a per-(query, probed-cell) offset, all exact e7/e8
    *     integers;
    *  5. exact re-rank of the [[PqRerank]] shortlist on the original
    *     vectors.
    * Scale shape: identical to [[ivfPqTopK]] (assignment and encoding
    * stream the corpus against broadcast centroids/codebook; candidates
    * bounded by probed-cell occupancy; only codes move through ADC; exact
    * reads bounded by nQueries × rerank) plus the two training loops,
    * whose driver state is nCells×Dim + M×K×SubDim integers — at
    * billion-vector scale k-means‖ slots into the init and the loops are
    * the same broadcast-assign-aggregate rounds. Every ordering decision
    * is integer-exact with id ties, so the whole trained index
    * hash-matches the unrolled DuckDB oracle. */
  def ivfPqTrainedTopK(s: SparkSession, d: String, nQueries: Int = 10,
      k: Int = 5, nCells: Int = IvfCells, nProbe: Int = IvfProbe,
      m: Int = PqM, kCents: Int = PqK, ivfIters: Int = IvfKmeansIters,
      pqIters: Int = PqKmeansIters, rerank: Int = PqRerank,
      eta: Int = PqEta): DataFrame = {
    val (cents, cb, full, nv, af, rsubs) =
      ivfPqTrainedModel(s, d, nCells, m, kCents, ivfIters, pqIters, eta)
    val codes = residualEncode(rsubs, cbDf(s, cb), eta)
    ivfPqTrainedQuery(s, cents, cb, full, nv, af, codes,
      nQueries, k, nProbe, m, rerank, Seq(full, nv, rsubs, af))
  }

  /** The trained IVF-PQ MODEL alone — both k-means loops run to
    * completion; returns the driver-sized artifacts (coarse centroids,
    * residual codebook) plus the persisted corpus frames the batch query
    * keeps using (full, e4-normalized nv, final assignment af, residual
    * sub-vectors rsubs). Callers that only want the artifacts (e.g. the
    * streaming ingest twin, which serves them broadcast) must unpersist
    * the frames. */
  private[graft] def ivfPqTrainedModel(s: SparkSession, d: String,
      nCells: Int = IvfCells, m: Int = PqM, kCents: Int = PqK,
      ivfIters: Int = IvfKmeansIters, pqIters: Int = PqKmeansIters,
      eta: Int = PqEta): (Seq[(Long, Seq[Double])],
        Seq[(Long, Long, Seq[Double])], DataFrame, DataFrame, DataFrame,
        DataFrame) = {
    import s.implicits._
    val sub = PqSubDim
    val full = corpus(s, d).persist(StorageLevel.MEMORY_AND_DISK)
    // e4-quantized normalized corpus; its own L2 norm feeds e4 cosine.
    val nv = e4Normalized(full).persist(StorageLevel.MEMORY_AND_DISK)
    // ---- stage 1: trained coarse quantizer (Lloyd, e4 integer domain).
    var cents: Seq[(Long, Seq[Double])] = nv.filter(col("vec_id") < nCells)
      .select("vec_id", "v").orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    def centsDf(cs: Seq[(Long, Seq[Double])]): DataFrame =
      cs.toDF("cell_id", "cv").withColumn("cnrm", l2Norm(col("cv")))
    for (_ <- 1 to ivfIters) {
      val asgn = assignCells(nv, centsDf(cents))
      val sums = (0 until Dim).map(kk =>
        sum(element_at(col("v"), kk + 1)).as(s"s$kk"))
      val rows = asgn.join(nv, "vec_id").groupBy("cell_id")
        .agg(count(lit(1)).as("cnt"), sums: _*).collect()
      val updated = rows.map { r =>
        val cnt = r.getLong(1)
        val comps = (0 until Dim).map { kk =>
          val q = r.getDouble(2 + kk) / cnt
          Math.copySign(Math.floor(Math.abs(q) + 0.5), q) // round half away
        }
        r.getLong(0) -> comps.toSeq
      }.toMap
      cents = cents.map { case (cell, prev) => (cell, updated.getOrElse(cell, prev)) }
    }
    val ct = centsDf(cents)
    // Final assignment feeds BOTH the residual computation (via rsubs) and
    // the candidate join in the terminal action — persist it so the
    // corpus-× -centroids argmin runs once, not twice.
    val af = assignCells(nv, ct).persist(StorageLevel.MEMORY_AND_DISK)
    // ---- stage 2: residuals + their e3 anisotropy direction sub-vectors.
    val resid = nv.join(af, "vec_id")
      .join(broadcast(ct.select("cell_id", "cv")), "cell_id")
      .select(col("vec_id"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("r"), col("v"))
    val rsubs = resid.select(col("vec_id"), posexplode(
        array((0 until m).map(i => struct(
          slice(col("r"), i * sub + 1, sub).as("rm"),
          transform(slice(col("v"), i * sub + 1, sub),
            x => round(x / lit(10.0))).as("xq"))): _*)))
      .select(col("vec_id"), col("pos").as("m"),
        col("col.rm").as("rm"), col("col.xq").as("xq"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var cb: Seq[(Long, Long, Seq[Double])] = rsubs.filter(col("vec_id") < kCents)
      .select("vec_id", "m", "rm").orderBy("vec_id", "m").collect()
      .map(r => (r.getInt(1).toLong, r.getLong(0), r.getSeq[Double](2).toSeq)).toSeq
    for (_ <- 1 to pqIters) {
      val asgn = residualEncode(rsubs, cbDf(s, cb), eta)
      val sums = (0 until sub).map(kk =>
        sum(element_at(col("rm"), kk + 1)).as(s"s$kk"))
      val rows = asgn.join(rsubs, Seq("vec_id", "m")).groupBy("m", "j")
        .agg(count(lit(1)).as("cnt"), sums: _*).collect()
      val updated = rows.map { r =>
        val cnt = r.getLong(2)
        val comps = (0 until sub).map { kk =>
          val q = r.getDouble(3 + kk) / cnt
          Math.copySign(Math.floor(Math.abs(q) + 0.5), q)
        }
        (r.getInt(0).toLong, r.getLong(1)) -> comps.toSeq
      }.toMap
      cb = cb.map { case (mm, j, prev) =>
        (mm, j, updated.getOrElse((mm, j), prev)) }
    }
    (cents, cb, full, nv, af, rsubs)
  }

  private def cbDf(s: SparkSession,
      cs: Seq[(Long, Long, Seq[Double])]): DataFrame = {
    import s.implicits._
    cs.toDF("m", "j", "cm")
  }

  /** Anisotropic residual encode — same argmin-aggregate plan shape as
    * pqTrainedScored's, with e = rm − cm measured against direction xq.
    * Input needs (vec_id, m, rm, xq); codebook (m, j, cm). */
  private def residualEncode(rsubs: DataFrame, codebook: DataFrame,
      eta: Int): DataFrame =
    rsubs.join(broadcast(codebook), "m")
      .select(col("vec_id"), col("m"), col("j"),
        (dotD(col("rm"), col("rm")) - lit(2.0) * dotD(col("rm"), col("cm"))
          + dotD(col("cm"), col("cm"))).as("d2"),
        (dotD(col("rm"), col("xq")) - dotD(col("cm"), col("xq"))).as("ex"),
        dotD(col("xq"), col("xq")).as("xx"))
      .withColumn("loss",
        lit((eta - 1).toLong) * col("ex").cast("long") * col("ex").cast("long") +
          col("xx").cast("long") * col("d2").cast("long"))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("loss"), col("j"))).as("mn"))
      .select(col("vec_id"), col("m"), col("mn.j").as("j"))

  /** The trained serving INDEX itself — one row per corpus vector with
    * its assigned coarse cell and the M residual PQ codes: exactly what a
    * production deployment WRITES OUT (bucketed by cell) for query
    * serving; [[ivfPqTrainedTopK]] is this index consumed by the
    * probe/ADC/re-rank stages, and
    * [[graft.streaming.VectorStreams.ivfPqIngestStream]] is the same
    * encode applied to vectors as they ARRIVE. Codes pivot to columns
    * c0..c{M−1} (one exact long each), so the whole index hash-matches
    * the unrolled training oracle. */
  def ivfPqTrainedCodes(s: SparkSession, d: String, nCells: Int = IvfCells,
      m: Int = PqM, kCents: Int = PqK, ivfIters: Int = IvfKmeansIters,
      pqIters: Int = PqKmeansIters, eta: Int = PqEta): DataFrame = {
    val (_, cb, full, nv, af, rsubs) =
      ivfPqTrainedModel(s, d, nCells, m, kCents, ivfIters, pqIters, eta)
    val codes = residualEncode(rsubs, cbDf(s, cb), eta)
    graft.functions.Caching.releaseAfterAction(
      trainedIndexDf(af, codes, m), full, nv, af, rsubs)
  }

  /** The serving-index CONTENT from the PERSISTED artifact — what the
    * `sim_ivfpq_index` query ships: first consumer per corpus builds and
    * publishes the index ([[ensureIvfPqIndex]], both k-means loops run
    * once); every later consumer scans the stored `index/` table, which
    * is [[ivfPqTrainedCodes]]' frame written out (bit-identical by
    * construction — SimilaritySpec asserts it), the same
    * build-once/consume-many posture as the dedup/kmeans/BPE products.
    * The self-contained retraining form stays available as
    * [[ivfPqTrainedCodes]] (the spec surface and the writer's input). */
  def ivfPqServedCodes(s: SparkSession, d: String,
      indexDir: Option[String] = None): DataFrame = {
    val dir = ensureIvfPqIndex(s, d, indexDir)
    s.read.parquet(dir + "/index").orderBy("vec_id")
  }

  /** The (vec_id, cell_id, c0..c{M−1}) serving-index frame from an
    * assignment + long-form codes — the one pivot definition shared by the
    * index query, the index WRITER, and (inverted) the served reader. */
  private def trainedIndexDf(af: DataFrame, codes: DataFrame,
      m: Int): DataFrame = {
    val pivot = codes.groupBy("vec_id").agg(
      min(when(col("m") === 0, col("j"))).as("c0"),
      (1 until m).map(i => min(when(col("m") === i, col("j"))).as(s"c$i")): _*)
    af.join(pivot, "vec_id")
      .select(col("vec_id") +: col("cell_id") +:
        (0 until m).map(i => col(s"c$i")): _*)
      .orderBy("vec_id")
  }

  /** The retrieval stage over a trained model (see [[ivfPqTrainedTopK]]
    * steps 4-5): ADC over the supplied long-form codes with the per-cell
    * offset, exact re-rank. `nv` need only contain the query rows (the
    * served path passes the pruned query slice); `cached` is whatever the
    * caller persisted for this plan — released after its terminal action
    * (empty for the served path, which reads everything from
    * parquet). */
  private def ivfPqTrainedQuery(s: SparkSession,
      cents: Seq[(Long, Seq[Double])], cb: Seq[(Long, Long, Seq[Double])],
      full: DataFrame, nv: DataFrame, af: DataFrame, codes: DataFrame,
      nQueries: Int, k: Int, nProbe: Int, m: Int, rerank: Int,
      cached: Seq[DataFrame]): DataFrame = {
    import s.implicits._
    val sub = PqSubDim
    val ct = cents.toDF("cell_id", "cv").withColumn("cnrm", l2Norm(col("cv")))
    val qsubs = nv.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), posexplode(
        array((0 until m).map(i => slice(col("v"), i * sub + 1, sub)): _*)))
      .toDF("qid", "m", "qm")
    val qtab = qsubs.join(broadcast(cbDf(s, cb)), "m")
      .select(col("qid"), col("m"), col("j"), dotD(col("qm"), col("cm")).as("t"))
    val wProbe = Window.partitionBy("qid").orderBy(desc("csim_e4"), asc("cell_id"))
    val probes = nv.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
      .crossJoin(broadcast(ct))
      .select(col("qid"), col("cell_id"),
        e4(dotD(col("qv"), col("cv")) / (col("qn") * col("cnrm"))).as("csim_e4"),
        dotD(col("qv"), col("cv")).as("pdot"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select(col("qid"), col("cell_id"), col("pdot"))
    val cand = af.join(broadcast(probes), "cell_id")
      .select(col("qid"), col("vec_id").as("cid"), col("pdot"))
    val adc = cand.join(codes.withColumnRenamed("vec_id", "cid"), "cid")
      .join(broadcast(qtab), Seq("qid", "m", "j"))
      .groupBy("qid", "cid", "pdot")
      .agg(sum("t").as("st"))
      .select(col("qid"), col("cid"), (col("pdot") + col("st")).as("approx"))
    val wShort = Window.partitionBy("qid").orderBy(desc("approx"), asc("cid"))
    val short = adc.withColumn("srn", row_number().over(wShort))
      .filter(col("srn") <= rerank).select("qid", "cid")
    val q = full.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("qid").orderBy(desc("sim_e4"), asc("cid"))
    val ranked =
      short.join(full.select(col("vec_id").as("cid"), col("v"), col("nrm")), "cid")
        .join(broadcast(q), "qid")
        .select(col("qid"), col("cid"),
          e4(dotD(col("v"), col("qv")) / (col("nrm") * col("qn"))).as("sim_e4"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= k)
        .orderBy("qid", "rn")
    if (cached.isEmpty) ranked
    else graft.functions.Caching.releaseAfterAction(ranked, cached: _*)
  }

  /** Resolve (and build on miss) the persisted index for corpus `d`:
    * returns the index directory, content-addressed unless the caller
    * passes an explicit one. Shared by the batch served query and the
    * served streaming ingest. The miss path builds FIRST-WINS
    * (`replace = false`): two consumers cold-starting concurrently both
    * train, the first publish sticks, the loser discards its complete
    * copy — a just-published live index is never deleted under the
    * winner's readers.
    *
    * Every HIT validates the index manifest against the corpus identity
    * and training parameters THIS caller requested and fails loudly on
    * mismatch — the content-addressed default can't go stale by
    * construction, but the explicit-`indexDir` production mode could
    * otherwise silently serve neighbors from an index built against a
    * different corpus, different knobs, or an older layout. A
    * swap-managed base directory (one carrying a `CURRENT` pointer —
    * [[ivfPqSwapIndex]]) resolves to its live version first. */
  private[graft] def ensureIvfPqIndex(s: SparkSession, d: String,
      indexDir: Option[String], nCells: Int = IvfCells, m: Int = PqM,
      kCents: Int = PqK, ivfIters: Int = IvfKmeansIters,
      pqIters: Int = PqKmeansIters, eta: Int = PqEta): String = {
    val dir = ivfPqResolveDir(indexDir.getOrElse(
      ivfPqIndexDir(d, nCells, m, kCents, ivfIters, pqIters, eta)))
    if (!graft.sources.ArtifactCache.exists(s"$dir/index")) {
      val t0 = System.nanoTime()
      ivfPqWriteIndex(s, d, dir, nCells, m, kCents, ivfIters, pqIters, eta,
        replace = false)
      graft.sources.ArtifactCache.recordBuild(
        graft.sources.ArtifactCache.baseName(dir),
        (System.nanoTime() - t0) / 1e9)
    }
    graft.sources.ArtifactCache.validateManifest(dir,
      ivfPqManifestKey(d, nCells, m, kCents, ivfIters, pqIters, eta))
    dir
  }

  /** The live index under a version-pointer BASE directory: if
    * `dir/CURRENT` exists (a swap-managed deployment —
    * [[ivfPqSwapIndex]]), the index is `dir/<contents-of-CURRENT>`;
    * otherwise `dir` itself is the index. Readers resolve ONCE per query,
    * so a swap mid-query cannot tear one plan across two versions. */
  private[graft] def ivfPqResolveDir(dir: String): String = {
    import graft.sources.ArtifactCache
    val cur = s"$dir/CURRENT"
    if (!ArtifactCache.isFile(cur)) dir
    else new org.apache.hadoop.fs.Path(dir,
      ArtifactCache.readSmall(cur).trim).toString
  }

  /** The full (unhashed) identity a persisted index must prove at read
    * time: corpus file identity, every training knob, layout version —
    * written by [[ivfPqWriteIndex]], demanded by [[ensureIvfPqIndex]]. */
  private def ivfPqManifestKey(d: String, nCells: Int, m: Int, kCents: Int,
      ivfIters: Int, pqIters: Int, eta: Int): String =
    graft.sources.ArtifactCache.keyString("ivfpq",
      s"$d/embeddings.parquet",
      Seq(nCells, m, kCents, ivfIters, pqIters, eta, IvfPqIndexVersion))

  /** REBUILD-UNDER-READERS: build a fresh index VERSION under `baseDir`
    * and atomically flip the `CURRENT` pointer to it — the index swap the
    * drift monitor's "rebuild trigger" needs. Readers resolve `CURRENT`
    * once per query ([[ivfPqResolveDir]]), so queries in flight finish on
    * the version they resolved while new queries pick up the fresh one;
    * nothing is ever rebuilt in place under a reader. The version
    * PREVIOUS to the new one is retained (in-flight readers), anything
    * older is retired — one rebuild cycle is the staleness bound, the
    * standard assumption (rebuild period ≫ query latency). Returns the
    * new version's directory. */
  def ivfPqSwapIndex(s: SparkSession, d: String, baseDir: String,
      nCells: Int = IvfCells, m: Int = PqM, kCents: Int = PqK,
      ivfIters: Int = IvfKmeansIters, pqIters: Int = PqKmeansIters,
      eta: Int = PqEta): String = {
    import graft.sources.ArtifactCache
    ArtifactCache.mkdirs(baseDir)
    def pointer(): Option[String] = {
      val cur = s"$baseDir/CURRENT"
      if (ArtifactCache.isFile(cur)) Some(ArtifactCache.readSmall(cur).trim)
      else None
    }
    val prev = pointer()
    val version = "v-" + java.lang.ProcessHandle.current().pid() + "-" +
      java.util.UUID.randomUUID().toString.take(8)
    val vdir = new org.apache.hadoop.fs.Path(baseDir, version).toString
    ivfPqWriteIndex(s, d, vdir, nCells, m, kCents, ivfIters, pqIters, eta)
    // Flip the pointer atomically: write-then-move, never a partial read.
    ArtifactCache.writeFileAtomic(baseDir, "CURRENT", version)
    // Retire old versions. Concurrent swaps are last-writer-wins on the
    // POINTER (schedule swaps non-overlapping for deterministic
    // ownership), but the retire loop must be safe regardless: re-read
    // CURRENT after the flip and never delete (a) whatever it points at
    // now — a racing swap may have flipped it after us, (b) the version
    // we replaced (in-flight readers), (c) our own build, (d) any
    // `.tmp-*` sibling — that is a racer's build still being written,
    // (e) any version YOUNGER than the retire grace
    // (`spark.graft.index.retireGraceMs`, default 1 h) — that is a
    // racing swap's just-published build whose CALLER still holds the
    // returned path (it flipped the pointer before us and lost, but its
    // IndexBuild invocation may be about to read the dir it was handed);
    // age, not pointer state, is what makes a loser's version safe to
    // collect, on the standard assumption rebuild period ≫ grace.
    val graceMs = s.conf.getOption("spark.graft.index.retireGraceMs")
      .flatMap(_.toLongOption).getOrElse(3600000L)
    val now = System.currentTimeMillis()
    val live = pointer()
    ArtifactCache.listSubdirNames(baseDir)
      .filter(n => n.startsWith("v-") && !n.contains(".tmp-") &&
        n != version && !live.contains(n) && !prev.contains(n))
      .filter(n => now - ArtifactCache.modTimeMs(
        new org.apache.hadoop.fs.Path(baseDir, n).toString) >= graceMs)
      .foreach(n => ArtifactCache.rmTree(
        new org.apache.hadoop.fs.Path(baseDir, n).toString))
    vdir
  }

  /** The REFRESH CRON shape: rebuild-and-swap ONLY when the live version
    * under `baseDir` no longer matches the corpus identity and training
    * knobs — i.e. the corpus file changed since the last build (the
    * manifest is the staleness detector, the same one read-time
    * validation uses). Returns the new version's directory when a swap
    * happened, None when the index is already fresh. A scheduler calls
    * this as often as it likes; training is paid only on a real corpus
    * change — the missing half between the drift monitor ("something
    * changed") and [[ivfPqSwapIndex]] ("replace the index safely"). */
  def ivfPqSwapIfStale(s: SparkSession, d: String, baseDir: String,
      nCells: Int = IvfCells, m: Int = PqM, kCents: Int = PqK,
      ivfIters: Int = IvfKmeansIters, pqIters: Int = PqKmeansIters,
      eta: Int = PqEta): Option[String] = {
    import graft.sources.ArtifactCache
    val resolved = ivfPqResolveDir(baseDir)
    // IDEMPOTENT conversion cleanup: once CURRENT exists (resolved is a
    // v-* version), any in-place artifacts still sitting next to it are
    // leftovers of a conversion that crashed between the pointer flip
    // and its cleanup — unreachable (CURRENT wins resolution) yet
    // permanent, because the fresh version makes every later call return
    // None before the hadInPlace branch below. Finish the cleanup on
    // EVERY call, not only on the converting rebuild — but gate it on
    // the SAME retire grace that protects retired v-* versions: a reader
    // that resolved baseDir just before the crashed conversion's flip
    // may still be mid-scan on the in-place artifacts, and age is what
    // makes them safe to collect (rebuild period ≫ grace, as with the
    // version retire loop). The manifest goes only once all three
    // artifact dirs are gone, keeping the sweep idempotent across calls.
    if (resolved != baseDir) {
      val graceMs = s.conf.getOption("spark.graft.index.retireGraceMs")
        .flatMap(_.toLongOption).getOrElse(3600000L)
      val now = System.currentTimeMillis()
      val inPlace = Seq("index", "centroids", "codebook")
        .map(sub => new org.apache.hadoop.fs.Path(baseDir, sub).toString)
      inPlace.filter(ArtifactCache.exists)
        .filter(p => now - ArtifactCache.modTimeMs(p) >= graceMs)
        .foreach(ArtifactCache.rmTree)
      if (!inPlace.exists(ArtifactCache.exists))
        ArtifactCache.removeManifest(baseDir)
    }
    val expected = ivfPqManifestKey(d, nCells, m, kCents, ivfIters,
      pqIters, eta)
    // Freshness is the MANIFEST check alone: a valid IN-PLACE index
    // (ivfPqWriteIndex straight at baseDir, resolved == baseDir) is just
    // as fresh as a swap-managed version — the first cron call over a
    // pre-swap deployment must not pay a full retrain for a layout
    // difference.
    if (ArtifactCache.readManifest(resolved).contains(expected)) None
    else {
      val hadInPlace = resolved == baseDir &&
        ArtifactCache.readManifest(baseDir).isDefined
      val vdir = ivfPqSwapIndex(s, d, baseDir, nCells, m, kCents, ivfIters,
        pqIters, eta)
      // Converting a pre-existing in-place layout to swap management:
      // its artifacts sit NEXT to the v-* dirs, invisible to the retire
      // loop — without this they orphan forever (and a stale in-place
      // manifest could re-validate if CURRENT were ever lost). Readers
      // mid-scan on the old in-place index are a conversion-time
      // deployment concern, same as any replace=true rebuild.
      if (hadInPlace) {
        Seq("index", "centroids", "codebook").foreach(sub =>
          ArtifactCache.rmTree(
            new org.apache.hadoop.fs.Path(baseDir, sub).toString))
        ArtifactCache.removeManifest(baseDir)
      }
      Some(vdir)
    }
  }

  /** Load the driver-sized model artifacts (coarse centroids, residual
    * codebook) back from a persisted index directory — the serving-side
    * inverse of [[ivfPqWriteIndex]]'s small tables. */
  private[graft] def loadIvfPqArtifacts(s: SparkSession, dir: String):
      (Seq[(Long, Seq[Double])], Seq[(Long, Long, Seq[Double])]) = {
    val cents = s.read.parquet(s"$dir/centroids")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
      .sortBy(_._1).toSeq
    val cb = s.read.parquet(s"$dir/codebook")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toSeq))
      .sortBy(t => (t._1, t._2)).toSeq
    (cents, cb)
  }

  /** On-disk layout version of the persisted IVF-PQ index — bump whenever
    * the trained encode or the table shapes change, so a stale index can
    * never be served against newer retrieval code. */
  private val IvfPqIndexVersion = 1

  /** Default location for the persisted index of corpus `d`: keyed by the
    * corpus file's identity (path, size, mtime) AND every training
    * parameter AND [[IvfPqIndexVersion]], so a changed corpus, changed
    * knobs, or changed code can never silently serve a stale index — the
    * standard content-addressed cache rule. Lives under the JVM temp dir
    * (a scratch artifact, like Spark's own local dirs); production
    * deployments pass an explicit warehouse path instead. */
  def ivfPqIndexDir(d: String, nCells: Int = IvfCells, m: Int = PqM,
      kCents: Int = PqK, ivfIters: Int = IvfKmeansIters,
      pqIters: Int = PqKmeansIters, eta: Int = PqEta): String =
    graft.sources.ArtifactCache.path("ivfpq",
      s"$d/embeddings.parquet",
      Seq(nCells, m, kCents, ivfIters, pqIters, eta, IvfPqIndexVersion))

  /** BUILD-AND-PERSIST the trained IVF-PQ index — the production split's
    * offline half (what [[ivfPqTrainedCodes]] computes, written out): runs
    * both k-means loops once and stores three parquet tables under `dir`:
    *
    *  - `index/`      (vec_id, cell_id, c0..c{M−1}) — the serving index,
    *                  exactly [[ivfPqTrainedCodes]]' output;
    *  - `centroids/`  (cell_id, cv) — nCells rows;
    *  - `codebook/`   (m, j, cm) — M×K rows.
    *
    * The write is crash-safe: tables land under `dir.tmp` and an atomic
    * rename publishes them, so a killed build never leaves a half-index a
    * reader could mistake for complete. On a cluster, `index/` would be
    * written bucketed by cell_id (the probe join's key); local mode keeps
    * the plain layout. */
  def ivfPqWriteIndex(s: SparkSession, d: String, dir: String,
      nCells: Int = IvfCells, m: Int = PqM, kCents: Int = PqK,
      ivfIters: Int = IvfKmeansIters, pqIters: Int = PqKmeansIters,
      eta: Int = PqEta, replace: Boolean = true): Unit = {
    import s.implicits._
    val (cents, cb, full, nv, af, rsubs) =
      ivfPqTrainedModel(s, d, nCells, m, kCents, ivfIters, pqIters, eta)
    try {
      val codes = residualEncode(rsubs, cbDf(s, cb), eta)
      // Private tmp dir: concurrent builders never touch each other's
      // in-flight part files (ArtifactCache.newTmpDir). A failed write
      // cleans its own tmp tree (unique names are not self-healing).
      val tmp = graft.sources.ArtifactCache.newTmpDir(dir)
      try {
        trainedIndexDf(af, codes, m)
          .write.mode("overwrite").parquet(s"$tmp/index")
        cents.toDF("cell_id", "cv")
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/centroids")
        cbDf(s, cb)
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/codebook")
        // The read-time proof this directory serves THIS corpus at THESE
        // knobs (ensureIvfPqIndex demands it — the explicit-dir
        // production mode must fail loudly on a stale/mismatched index).
        graft.sources.ArtifactCache.writeManifest(tmp,
          ivfPqManifestKey(d, nCells, m, kCents, ivfIters, pqIters, eta))
      } catch { case e: Throwable =>
        graft.sources.ArtifactCache.rmTree(tmp); throw e
      }
      // Replace semantics (the default): this API REBUILDS an index in
      // place — coordinating against live readers is the caller's
      // deployment concern, as with any index swap. The build-on-miss
      // path (ensureIvfPqIndex) passes replace = false instead: losing a
      // concurrent cold-start race discards this copy and keeps the
      // winner's, so a just-published live index is never deleted.
      if (replace) graft.sources.ArtifactCache.rmTree(dir)
      graft.sources.ArtifactCache.publish(tmp, dir)
    } finally
      // Release the model-sized corpus frames even when a write fails —
      // the library must not rely on the caller's clearCache hygiene.
      Seq(full, nv, af, rsubs).foreach(f =>
        try f.unpersist(false) catch { case _: Throwable => () })
  }

  /** SERVE top-k from the PERSISTED trained index — the production split's
    * online half, and the amortization [[ivfPqTrainedTopK]]'s
    * self-contained pricing lacks: retrieval reads the stored assignment +
    * codes instead of re-running either k-means loop, so a query batch
    * costs probe + ADC + re-rank only (the driver-side artifacts —
    * centroids and codebook, nCells×Dim + M×K×SubDim numbers — load once
    * per call). Results are IDENTICAL to [[ivfPqTrainedTopK]] because the
    * stored index is the same deterministic encode (the query hash-matches
    * the same oracle). Builds the index on first use when `indexDir` is
    * absent (content-addressed via [[ivfPqIndexDir]] — corpus or parameter
    * changes invalidate it); production calls [[ivfPqWriteIndex]] on its
    * own schedule and passes the path.
    *
    * Scale shape: no training pass, no model collects — the index scan
    * is M+2 small ints per vector, the query sides prune to
    * vec_id < nQueries at the parquet scan, and everything broadcast is
    * model/query/probe-sized. The exact RE-RANK join-back is one
    * projection-pruned columnar scan of the corpus hash-joined against
    * the nQueries×rerank shortlist (the same shape as every
    * retrieval tier here); a production deployment that needs
    * sub-scan serve latency stores the vectors bucketed/indexed by
    * vec_id so the shortlist read becomes a bounded lookup — the plan
    * is unchanged, only the source layout. */
  def ivfPqServedTopK(s: SparkSession, d: String, nQueries: Int = 10,
      k: Int = 5, nProbe: Int = IvfProbe, nCells: Int = IvfCells,
      m: Int = PqM, kCents: Int = PqK, ivfIters: Int = IvfKmeansIters,
      pqIters: Int = PqKmeansIters, rerank: Int = PqRerank,
      eta: Int = PqEta, indexDir: Option[String] = None): DataFrame = {
    val dir = ensureIvfPqIndex(s, d, indexDir, nCells, m, kCents,
      ivfIters, pqIters, eta)
    val (cents, cb) = loadIvfPqArtifacts(s, dir)
    val idx = s.read.parquet(s"$dir/index")
    val af = idx.select("vec_id", "cell_id")
    // Long-form codes from the stored pivot — posexplode, the pivot's
    // exact inverse.
    val codes = idx.select(col("vec_id"), posexplode(
        array((0 until m).map(i => col(s"c$i")): _*)))
      .toDF("vec_id", "m", "j")
    val full = corpus(s, d)
    // The query slice of the e4-normalized corpus: the vec_id predicate
    // pushes into the parquet scan, so the probe/ADC stages never
    // normalize the full corpus.
    val qnv = e4Normalized(full.filter(col("vec_id") < nQueries))
    ivfPqTrainedQuery(s, cents, cb, full, qnv, af, codes,
      nQueries, k, nProbe, m, rerank, Seq.empty)
  }

  /** The e4-quantized normalized view of a (vec_id, v, nrm) frame — ONE
    * definition shared by the trained model build and the served query
    * slice, so serve-time quantization can never drift from the encode
    * that built the index it serves. */
  private def e4Normalized(c: DataFrame): DataFrame =
    c.select(col("vec_id"),
        transform(col("v"), x => round(x / col("nrm") * lit(10000.0))).as("v"))
      .withColumn("nrm", l2Norm(col("v")))

  // Deterministic per-subspace k-means for the trained PQ codebook: fixed
  // iteration count, stub-codebook init (the first K normalized vectors'
  // sub-slices, e4-quantized). PqRerank is the ADC shortlist size that the
  // exact re-rank stage consumes.
  val PqKmeansIters = 2
  val PqRerank = 25
  /** Anisotropic assignment weight η (ScaNN, Guo et al. 2020): the parallel
    * residual component is weighted η× the orthogonal one in the encoding
    * loss. η = 1 is plain MSE; the shipped value is picked by the measured
    * raw-ADC recall sweep in Scratch (documented at [[pqTrainedTopK]]). */
  val PqEta = 2

  /** PQ with a TRAINED codebook and an exact re-rank stage — the full
    * production PQ retrieval shape. Training is per-subspace Lloyd's
    * k-means, the deterministic fixed-point recipe of [[ivfTrainedTopK]]
    * applied to each of the M sub-spaces independently, at 1e-4 scale:
    *  - sub-vectors quantize to 1e-4 fixed point ONCE; every distance,
    *    assignment, update and ADC score after that is exact integer
    *    arithmetic carried in doubles (components ≤ 1e4 ⇒ an 8-dim inner
    *    product ≤ 8e8 ≪ 2^53 — no rounding anywhere, so distributed
    *    order cannot perturb a single comparison and the whole trained
    *    index hash-matches the DuckDB oracle's unrolled iterations);
    *  - assignment: argmin L2² (⟨x,x⟩−2⟨x,c⟩+⟨c,c⟩), ties to lower code;
    *  - update: per-(subspace, code) integer component sums / count,
    *    round-half-away; empty codes keep their previous centroid.
    * Driver state is the M×K×SubDim codebook — 1 K integers here, and
    * still only M·K·SubDim at billion-vector scale (k-means‖ swaps in for
    * the init if K grows). Each iteration is one corpus pass against the
    * broadcast codebook + one M·K-row aggregate — identical profile to
    * production PQ training (OPQ/IVF-PQ add rotations, same loop).
    *
    * The assignment loss is ANISOTROPIC (ScaNN — Guo et al. 2020,
    * arXiv:1908.10396): plain MSE training is not inner-product-rank
    * optimal, and measured here it actively hurt (raw trained-ADC recall@5
    * 0.34 vs the sampled stub codebook's 0.42 at sf0.001 — more Lloyd
    * iterations made it worse, 0.38 → 0.32). Weighting the residual
    * component PARALLEL to x (the part that shifts ⟨q,x⟩ for the queries
    * that rank x highly) η = [[PqEta]] times the orthogonal part recovers
    * it: the η sweep measured raw-ADC recall 0.42 (= stub) at sf0.001 and
    * 0.46 vs MSE's 0.42 at sf0.01 at the shipped η = 2, iters = 2 —
    * training no longer degrades its own init (re-measured unchanged at
    * the e4 scale). The update step stays the plain per-cluster mean
    * (assignment-only anisotropy; the full ScaNN update solves a
    * per-cluster linear system). The 1e-4 scale is what keeps the loss
    * 64-bit: (η−1)·⟨e,x⟩² + ⟨x,x⟩·⟨e,e⟩ tops out near 5.2e18 < 2^63
    * (ex ≤ 1.6e9, xx ≤ 8e8, d2 ≤ 3.2e9), so both engines compare exact
    * BIGINTs — no 128-bit decimals in the hot encode path (at e6 the
    * squares passed 2^53 and needed Decimal(38,0), which dominated the
    * encode cost).
    *
    * Retrieval is two-stage, as deployed PQ systems run it: the compressed
    * codes produce a [[PqRerank]]-deep ADC shortlist per query (only codes
    * move — the PQ memory win), then ONLY the shortlist vectors are read
    * for exact cosine and the top-k is ranked on true similarity —
    * lifting recall@5 to 0.66, above anything raw ADC achieves. Exact-read
    * cost is nQueries × R vectors, independent of corpus size.
    * SimilaritySpec gates the full operator's recall ≥ the plain-ADC
    * stub's AND the raw trained ADC ≥ the stub (the trained index must
    * not need the re-rank to break even). */
  def pqTrainedTopK(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5,
      m: Int = PqM, kCents: Int = PqK, iters: Int = PqKmeansIters,
      rerank: Int = PqRerank, eta: Int = PqEta): DataFrame = {
    val (scored, subs) = pqTrainedScored(s, d, nQueries, m, kCents, iters, eta)
    val wShort = Window.partitionBy("qid").orderBy(desc("approx"), asc("cid"))
    val shortlist = scored
      .withColumn("srn", row_number().over(wShort))
      .filter(col("srn") <= rerank)
      .select("qid", "cid")
    // Exact re-rank: only nQueries × rerank vectors are ever read back.
    val full = corpus(s, d)
    val q = full.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val exact = shortlist
      .join(full.select(col("vec_id").as("cid"), col("v"), col("nrm")), "cid")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("cid"),
        e4(dotD(col("v"), col("qv")) / (col("nrm") * col("qn"))).as("sim_e4"))
    val w = Window.partitionBy("qid").orderBy(desc("sim_e4"), asc("cid"))
    graft.functions.Caching.releaseAfterAction(
      exact
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= k)
        .orderBy("qid", "rn"),
      subs)
  }

  /** Raw trained-ADC ranking (no re-rank) — the measurement surface
    * SimilaritySpec and the eta sweep use to compare codebook quality
    * directly. Same training + encoding as [[pqTrainedTopK]]. */
  private[graft] def pqTrainedAdcTopK(s: SparkSession, d: String,
      nQueries: Int = 10, k: Int = 5, m: Int = PqM, kCents: Int = PqK,
      iters: Int = PqKmeansIters, eta: Int = PqEta): DataFrame = {
    val (scored, subs) = pqTrainedScored(s, d, nQueries, m, kCents, iters, eta)
    val w = Window.partitionBy("qid").orderBy(desc("approx"), asc("cid"))
    graft.functions.Caching.releaseAfterAction(
      scored
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= k)
        .orderBy("qid", "rn"),
      subs)
  }

  /** Training + encoding + ADC scoring core shared by the re-ranked and
    * raw retrievers: returns (scored = qid/cid/approx, the persisted
    * sub-vector frame for the caller to release after its action). */
  private def pqTrainedScored(s: SparkSession, d: String, nQueries: Int,
      m: Int, kCents: Int, iters: Int, eta: Int): (DataFrame, DataFrame) = {
    import s.implicits._
    val sub = PqSubDim
    val c = corpus(s, d)
      .select(col("vec_id"), transform(col("v"), x => x / col("nrm")).as("vn"))
    // (vec_id, m, xm): e4-quantized sub-vectors, integral doubles.
    val subs = c.select(col("vec_id"), posexplode(
        array((0 until m).map(i => transform(
          slice(col("vn"), i * sub + 1, sub),
          x => round(x * lit(10000.0)).cast("double"))): _*)))
      .toDF("vec_id", "m", "xm")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var cb: Seq[(Long, Long, Seq[Double])] = subs.filter(col("vec_id") < kCents)
      .orderBy("vec_id", "m").collect()
      .map(r => (r.getInt(1).toLong, r.getLong(0), r.getSeq[Double](2).toSeq)).toSeq
    def cbDf(cs: Seq[(Long, Long, Seq[Double])]): DataFrame =
      cs.toDF("m", "j", "cm")
    // Anisotropic (score-aware) assignment, exact in 64-bit integers:
    // residual e = x − c splits into a component along x (which shifts
    // every inner product ⟨q, ·⟩ for queries near x — the MIPS-relevant
    // error) and an orthogonal one; the ScaNN loss up-weights the first.
    // Scaled by ‖x‖² to stay integral:
    //   L = (η−1)·⟨e,x⟩² + ⟨x,x⟩·⟨e,e⟩
    // with ⟨e,x⟩ = ⟨x,x⟩−⟨x,c⟩. At the e4 scale every term and the full
    // loss stay under 2^63 (see the class doc), so the comparison runs in
    // plain LONG arithmetic — the DuckDB oracle mirrors with
    // overflow-checked BIGINT. η = 1 degenerates to MSE·‖x‖², whose
    // argmin matches plain MSE (‖x‖² is constant within a (vec_id, m)
    // group).
    // The argmin is a partial-aggregatable min over (loss, j) struct pairs
    // (field-wise ordering = loss first, centroid-id tie-break) — a
    // map-side-combining HashAggregate, NOT a row_number window: the
    // window formulation shuffle-SORTED all n·M·K scored rows per encode
    // pass, which dominated the trained-PQ cost.
    def encode(codebook: DataFrame): DataFrame =
      subs.join(broadcast(codebook), "m")
        .select(col("vec_id"), col("m"), col("j"),
          (dotD(col("xm"), col("xm")) - lit(2.0) * dotD(col("xm"), col("cm"))
            + dotD(col("cm"), col("cm"))).as("d2"),
          (dotD(col("xm"), col("xm")) - dotD(col("xm"), col("cm"))).as("ex"),
          dotD(col("xm"), col("xm")).as("xx"))
        .withColumn("loss",
          lit((eta - 1).toLong) * col("ex").cast("long") * col("ex").cast("long") +
            col("xx").cast("long") * col("d2").cast("long"))
        .groupBy("vec_id", "m")
        .agg(min(struct(col("loss"), col("j"))).as("mn"))
        .select(col("vec_id"), col("m"), col("mn.j").as("j"))
    for (_ <- 1 to iters) {
      val asgn = encode(cbDf(cb))
      val sums = (0 until sub).map(kk =>
        sum(element_at(col("xm"), kk + 1)).as(s"s$kk"))
      val rows = asgn.join(subs, Seq("vec_id", "m")).groupBy("m", "j")
        .agg(count(lit(1)).as("cnt"), sums: _*).collect()
      val updated = rows.map { r =>
        val cnt = r.getLong(2)
        val comps = (0 until sub).map { kk =>
          val q = r.getDouble(3 + kk) / cnt
          Math.copySign(Math.floor(Math.abs(q) + 0.5), q) // round half away
        }
        (r.getInt(0).toLong, r.getLong(1)) -> comps.toSeq
      }.toMap
      cb = cb.map { case (mm, j, prev) =>
        (mm, j, updated.getOrElse((mm, j), prev)) }
    }
    val trained = cbDf(cb)
    val codes = encode(trained)
    // ADC in the e4 integer domain: table entries and scores are exact
    // e8-unit integers — sums, not rounds, so ranks are engine-exact.
    val qtab = subs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("m"), col("xm").as("qm"))
      .join(broadcast(trained), "m")
      .select(col("qid"), col("m"), col("j"),
        dotD(col("qm"), col("cm")).as("t"))
    val scored = codes.join(broadcast(qtab), Seq("m", "j"))
      .select(col("qid"), col("vec_id").as("cid"), col("t"))
      .groupBy("qid", "cid")
      .agg(sum("t").as("approx"))
    (scored, subs)
  }

  /** LSH-banded approximate top-k: a corpus vector is a candidate for a query
    * if ANY of the `bands` band keys (each `rows` sign-projection bits) agree
    * — the OR-of-ANDs construction that keeps recall high while each band's
    * equi-join stays bounded by bucket occupancy. The query's own vector
    * shares every band, so each query always returns ≥ 1 row (rank-1 self).
    *
    * 100 TB knobs: `rows` sets the bucket count per band (selectivity);
    * `bands` buys recall back. Only (band, key) pairs and candidate id pairs
    * shuffle — vectors are read once and joined back by id. Recall vs
    * bruteTopK is gated in SimilaritySpec. */
  /** RETRIEVAL EVALUATION as a first-class query — per-query recall@k of
    * the LSH index against the exact baseline, the number SimilaritySpec
    * gates in tests promoted to a production monitoring query (run it
    * after every index rebuild; alert on the aggregate). Composes the
    * two existing operators and counts overlap per query. Cost: the brute
    * stage scores the corpus once against the broadcast query set
    * (corpus × nQueries similarity triples — the monitoring-grade linear
    * pass, never n²) plus the index probe. The recall denominator is the
    * PER-QUERY brute row count, not k, so a corpus smaller than k still
    * reports recall in [0, 1]. One pinned division for the e4 recall.
    * Only the default (nQueries, k) is oracle-checked — the DuckDB twin
    * pins both inside its shared CTEs; other values are spec-covered via
    * the recall gates. */
  def retrievalRecall(s: SparkSession, d: String, nQueries: Int = 10,
      k: Int = 5): DataFrame = {
    val brute = bruteTopK(s, d, nQueries, k).select(col("qid"), col("cid"))
    val lsh = lshTopK(s, d, nQueries, k)
      .select(col("qid").as("lq"), col("cid").as("lc"))
    brute
      .join(lsh, col("qid") === col("lq") && col("cid") === col("lc"), "left")
      .groupBy("qid")
      .agg(sum(when(col("lc").isNotNull, 1L).otherwise(0L)).as("hits"),
        count(lit(1)).as("n_brute"))
      .select(col("qid"), col("hits"),
        round(col("hits") * lit(10000.0) / col("n_brute")).cast("long")
          .as("recall_e4"))
      .orderBy("qid")
  }

  /** SERVING-QUALITY MONITOR — per-query recall@k of the PERSISTED
    * IVF-PQ index against the exact baseline: [[retrievalRecall]]'s
    * composition with the served index as the candidate side. This is
    * the number an operator watches after every index rebuild (run it
    * against the fresh version [[ivfPqSwapIndex]] published; alert on
    * the aggregate before traffic shifts) — approximate retrieval is
    * only deployable next to a continuously-measured recall. Cost: one
    * linear brute pass over the corpus against the broadcast query set
    * plus the served probe — monitoring-grade, never n². Denominator is
    * the per-query brute row count, matching [[retrievalRecall]]. */
  def servedRecall(s: SparkSession, d: String, nQueries: Int = 10,
      k: Int = 5, indexDir: Option[String] = None): DataFrame = {
    val brute = bruteTopK(s, d, nQueries, k).select(col("qid"), col("cid"))
    val served = ivfPqServedTopK(s, d, nQueries, k, indexDir = indexDir)
      .select(col("qid").as("sq"), col("cid").as("sc"))
    brute
      .join(served, col("qid") === col("sq") && col("cid") === col("sc"), "left")
      .groupBy("qid")
      .agg(sum(when(col("sc").isNotNull, 1L).otherwise(0L)).as("hits"),
        count(lit(1)).as("n_brute"))
      .select(col("qid"), col("hits"),
        round(col("hits") * lit(10000.0) / col("n_brute")).cast("long")
          .as("recall_e4"))
      .orderBy("qid")
  }

  /** Neighbors per node in the k-NN graph build. */
  val KnnK = 4

  /** Celebrity-bucket occupancy cap for [[knnGraph]]'s candidate
    * self-join: a (band, key) bucket holding f vectors contributes O(f²)
    * candidate pairs, so a dense embedding MODE (boilerplate pages, a
    * template farm, near-constant vectors) makes the join quadratic on
    * skew — the exact failure the Jaccard family's [[Dedup.MaxShingleDf]]
    * cap fences. Buckets with occupancy > cap are excluded from the
    * PAIRING join entirely (drop-the-bucket, the df-cap rule): a bucket
    * at many times its expected occupancy carries little discriminative
    * signal, and genuinely-similar pairs inside a dropped bucket can
    * still meet through their other bands. 400 is a no-op on the test
    * corpus (max occupancy at sf0.1 is 329 over 16-key bands) and a hard
    * Σ bucket² ceiling at 100 TB; recall is gated on the un-skewed mass
    * (SimilaritySpec's planted hot-bucket test). */
  val KnnBucketCap = 400L

  /** Target expected bucket occupancy of the banded candidate chain —
    * the contract ceiling's observed value (sf0.1: 2000 vectors /
    * 2⁴ keys = 125 per band bucket). The band-geometry rule holds
    * occupancy AT this level as the corpus grows. */
  val KnnTargetOcc = 125.0

  /** THE BAND-GEOMETRY RULE — the build-side companion of the
    * log-layer walk rule: with FIXED rows-per-band the expected bucket
    * occupancy is n/2^rows, so at 64 K vectors every 4-bit bucket
    * holds ~4,000 vectors — far past [[KnnBucketCap]], every bucket is
    * df-cap-DROPPED, and the banded kNN build silently degenerates to
    * an empty graph. Growing key bits with log n holds occupancy at
    * [[KnnTargetOcc]] instead: rows(n) = max(4, ceil(log2(n /
    * KnnTargetOcc))) — 4 at every contract corpus (n ≤ 2000, so the
    * products, oracles, and specs are byte-identical), 6 at 4 K, 10 at
    * 64 K (`graft.VectorFixture`), 23 at 10⁹. Candidate volume stays
    * Σ occ² ≈ bands · 2^rows · occ² = O(n · occ) — linear in n at
    * fixed target occupancy, the whole point of banding. Resolved at
    * plan time from the corpus count like [[layeredRoundsFor]]; the
    * sign planes are procedurally generated ([[plane]]), so wider
    * bands need no new constants. [[KnnBucketCap]] stays as the SKEW
    * fence above the target (a celebrity mode still drops its bucket).
    * The ENTRY-side twin [[entryBandRowsFor]] applies the same rule to
    * the coarse layer a layered query buckets against. */
  def bandRowsFor(n: Long): Int = {
    // Integer form of max(4, ceil(log2(n / KnnTargetOcc))): the
    // smallest r ≥ 4 with 2^r · 125 ≥ n. Both contract corpora sit
    // EXACTLY on power boundaries (500/125 = 4, 2000/125 = 16), where
    // the float form is one libm ulp away from resolving a different
    // key width — and with it different products and oracles. Shifted
    // 125L is exact to r = 56 (125·2^56 < 2^63), far past any Long
    // corpus count's need (r = 53 covers 2^63 rows).
    var r = 4
    var cap = 125L << 4
    while (cap < n && r < 56) { r += 1; cap <<= 1 }
    r
  }

  /** [[bandRowsFor]] over the COARSE layer (n/[[CoarseMod]] nodes) —
    * the banded-entry paths' geometry: with fixed 4-bit keys the
    * per-query entry candidate set is coarse/16 — linear in n; under
    * the rule it stays [[KnnTargetOcc]]-bounded, keeping the "no
    * corpus-proportional term in the serving path" claim true at any
    * n. Equal to 4 at every contract corpus (coarse ≤ 63). */
  def entryBandRowsFor(nCoarse: Long): Int = bandRowsFor(nCoarse)

  /** K-NN GRAPH BUILD — every vector's top-[[KnnK]] neighbors, the
    * all-pairs sibling of [[lshTopK]] and the precursor structure of
    * graph-based ANN serving (HNSW-style), embedding clustering, and
    * SemDeDup-style curation: one build, many consumers. Candidates come
    * from the banded sign-projection buckets (a pair is considered iff
    * ANY band agrees), exact-cosine-verified and ranked per source with
    * (sim_e4 desc, dst) determinism, so the whole approximate build
    * hash-matches the oracle.
    *
    * Scale shape: the candidate set is the band-bucket SELF-join — shuffle
    * on (band, key), cost Σ bucket² per band, never n² (bucket occupancy
    * is the `rows` knob, and [[KnnBucketCap]] drops celebrity buckets so
    * a dense mode cannot make any single bucket quadratic). Each
    * undirected candidate is computed once (a < b) and mirrored, the two
    * vector join-backs are id-equi-joins, and the per-src top-k window is
    * bounded by candidate fan-out, not corpus size. */
  def knnGraph(s: SparkSession, d: String, k: Int = KnnK,
      bands: Int = 8, rows: Int = 0,
      bucketCap: Long = KnnBucketCap): DataFrame =
    knnGraphDf(Tables.embeddings(s, d), k, bands, rows, bucketCap)

  /** Query-contract wrapper over the shared product: the stored ranked
    * edges with the contract's terminal sort. */
  def knnGraphQuery(s: SparkSession, d: String): DataFrame =
    knnGraphShared(s, d).orderBy("src", "rn")

  /** On-disk layout version of the persisted kNN-graph product — bump
    * whenever the build (banding, cap rule, ranking) changes. */
  private val KnnGraphVersion = 1

  /** The kNN graph as a BUILD-ONCE PRODUCT — the graph-ANN serving split:
    * the banded all-vectors build (the expensive side, measured 5.8 MB /
    * 792 K shuffled records at sf0.1) publishes once per corpus through
    * the content-addressed cache, and every search/monitor/sweep query
    * SCANS the stored edges instead of re-banding the corpus. Same rows
    * as [[knnGraph]] by construction, so consumers' oracles are
    * unchanged. `rows` = 0 (the default) resolves the band-geometry
    * rule from the corpus count; the RESOLVED value is in the product
    * key (4 at every contract corpus — keys unchanged). */
  def knnGraphShared(s: SparkSession, d: String, k: Int = KnnK,
      bands: Int = 8, rows: Int = 0,
      bucketCap: Long = KnnBucketCap): DataFrame = {
    val r = if (rows > 0) rows
      else bandRowsFor(Tables.embeddings(s, d).count())
    graft.sources.ArtifactCache.getOrBuild(s, "knngraph",
      s"$d/embeddings.parquet",
      Seq(k, bands, r, bucketCap, KnnGraphVersion))(
      knnGraphDf(Tables.embeddings(s, d), k, bands, r, bucketCap))
  }

  /** Same, over any (vec_id, embedding: array<float|double>) DataFrame
    * (planted tests). `rows` = 0 resolves [[bandRowsFor]] on the
    * frame's count. */
  def knnGraphDf(embeddings: DataFrame, k: Int = KnnK,
      bands: Int = 8, rows: Int = 0,
      bucketCap: Long = KnnBucketCap): DataFrame = {
    val c = embeddings
      .select(col("vec_id"), toDoubleArr(col("embedding")).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rowsN = if (rows > 0) rows else bandRowsFor(c.count())
    val keys = bandedKeys(c.select("vec_id", "v"), bands, rowsN)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // The bucket registry is bands × 2^rows rows — small enough that
    // Catalyst auto-broadcasts the eligibility side at these knobs, and a
    // size-based shuffle join takes over if `rows` ever grows past the
    // broadcast threshold (no forced broadcast() here, deliberately).
    val eligible = keys.groupBy("band_idx", "band_key")
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") <= bucketCap)
      .select("band_idx", "band_key")
    val capped = keys.join(eligible, Seq("band_idx", "band_key"))
    val half = capped.as("a")
      .join(capped.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"))
      .distinct()
    val cand = half.unionAll(half.select(col("dst").as("src"), col("src").as("dst")))
    val scored = cand
      .join(c.select(col("vec_id").as("src"), col("v").as("sv"), col("nrm").as("sn")), "src")
      .join(c.select(col("vec_id").as("dst"), col("v").as("dv"), col("nrm").as("dn")), "dst")
      .select(col("src"), col("dst"),
        e4(dotD(col("sv"), col("dv")) / (col("sn") * col("dn"))).as("sim_e4"))
    val w = Window.partitionBy("src").orderBy(desc("sim_e4"), asc("dst"))
    graft.functions.Caching.releaseAfterAction(
      scored
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= k)
        .orderBy("src", "rn"),
      c, keys)
  }

  def lshTopK(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5,
      bands: Int = 8, rows: Int = 4): DataFrame = {
    val (scored, caches) = lshScored(s, d, nQueries, bands, rows)
    val w = Window.partitionBy("qid").orderBy(desc("sim_e4"), asc("cid"))
    graft.functions.Caching.releaseAfterAction(
      scored
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= k)
        .orderBy("qid", "rn"),
      caches: _*)
  }

  /** The LSH probe shared by [[lshTopK]] (rank tail) and [[rangeSearch]]
    * (threshold tail): band-key candidates for the broadcast query set,
    * exact-cosine-verified. Returns the scored (qid, cid, sim_e4) frame
    * plus the persisted intermediates the caller releases after its
    * terminal action. */
  private def lshScored(s: SparkSession, d: String, nQueries: Int,
      bands: Int, rows: Int): (DataFrame, Seq[DataFrame]) = {
    // The normed corpus feeds the key computation, the candidate join-back,
    // and the query-vector projection; the banded keys (bands×rows sign
    // projections per vector) feed both sides of the candidate join. Persist
    // both so the projection work runs once — unpersisted this plan redid
    // 3-4× the dot products and was slower than the brute-force baseline.
    // Released after the caller's terminal action.
    val c = corpus(s, d).persist(StorageLevel.MEMORY_AND_DISK)
    val keys = bandedKeys(c.select("vec_id", "v"), bands, rows)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val qKeys = keys.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("band_idx"), col("band_key"))
    val cand = keys.join(broadcast(qKeys), Seq("band_idx", "band_key"))
      .select(col("qid"), col("vec_id").as("cid"))
      .distinct()
    val q = c.select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
      .filter(col("qid") < nQueries)
    val scored = cand
      .join(c.select(col("vec_id").as("cid"), col("v"), col("nrm")), "cid")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("cid"),
        e4(dotD(col("v"), col("qv")) / (col("nrm") * col("qn"))).as("sim_e4"))
    (scored, Seq(c, keys))
  }

  /** Default radius for [[rangeSearch]]: cosine ≥ 0.30. On the synthetic
    * corpus this admits the planted-neighbor mass (self at 1.0, true
    * near-dups ≥ 0.5, background pairs ~0) without flooding the result
    * with noise rows. */
  val RangeThrE4 = 3000L

  /** RANGE (radius) SEARCH — every corpus vector within a similarity
    * RADIUS of each query, the other half of the ANN API surface: top-k
    * answers "the best k whatever their quality", range answers "all
    * neighbors at least this similar, however many there are" — the
    * form dedup gating, recommendation fan-out caps, and
    * near-duplicate audits actually consume. Approximate by the same
    * contract as [[lshTopK]]: candidates come from the banded
    * sign-projection buckets (a miss in every band is a miss here —
    * recall is the bands/rows knob), each candidate exact-cosine
    * verified, then THRESHOLDED instead of ranked. The oracle computes
    * the same LSH candidates, so the result hash-matches end to end.
    *
    * Scale shape: identical to [[lshTopK]] minus the window — the
    * threshold tail is a pure filter, so the result needs no per-query
    * sort at all until the final presentation ORDER BY. Result size is
    * data-dependent (that is the point of range queries); a pathological
    * radius (θ ≈ 0) degrades to the candidate set, which the band
    * structure itself bounds. */
  def rangeSearch(s: SparkSession, d: String, nQueries: Int = 10,
      thrE4: Long = RangeThrE4, bands: Int = 8, rows: Int = 4): DataFrame = {
    val (scored, caches) = lshScored(s, d, nQueries, bands, rows)
    graft.functions.Caching.releaseAfterAction(
      scored.filter(col("sim_e4") >= thrE4)
        .orderBy(asc("qid"), desc("sim_e4"), asc("cid")),
      caches: _*)
  }

  /** Quantization levels per dimension for the SQ8 index: codes live in
    * [0, 255] — one byte per dimension, a 4× memory cut vs float32 (8×
    * vs the double math the exact path runs in). */
  val SqLevels = 255L

  /** Per-dimension (min, step) scalar-quantization model for a corpus
    * dir — the trained artifact the streaming encode twin broadcasts
    * (literals, like the IVF-PQ codebook). */
  private[graft] def sqModelFor(s: SparkSession, d: String): (Seq[Double], Seq[Double]) =
    sqModel(Tables.embeddings(s, d)
      .select(col("vec_id"), toDoubleArr(col("embedding")).as("v")))

  /** The SQ8 code column — ONE definition shared by the batch index
    * ([[sqTopKDf]]) and the streaming ingest twin
    * ([[graft.streaming.VectorStreams.sqEncodeStream]]), so online
    * encode can never drift from the offline build. code_i =
    * round((x_i − mn_i)/step_i), exact 0..255 integers. */
  private[graft] def sqCodesCol(v: Column, mns: Seq[Double],
      steps: Seq[Double]): Column = {
    val mnsL = typedlit(mns); val stepsL = typedlit(steps)
    transform(v, (x, i) =>
      when(element_at(stepsL, i + 1) > 0d,
        round((x - element_at(mnsL, i + 1)) / element_at(stepsL, i + 1))
          .cast("long"))
        .otherwise(lit(0L)))
  }

  /** The SQ8 decode column (decode_i = mn_i + code_i·step_i) — the
    * asymmetric-search database side, shared for the same reason. */
  private[graft] def sqDecodeCol(q: Column, mns: Seq[Double],
      steps: Seq[Double]): Column = {
    val mnsL = typedlit(mns); val stepsL = typedlit(steps)
    transform(q, (qc, i) =>
      element_at(mnsL, i + 1) +
        qc.cast("double") * element_at(stepsL, i + 1))
  }

  /** Per-dimension (min, step) scalar-quantization model: one tiny
    * aggregate over the corpus (64 result rows — the trained-operator
    * collect shape), step = (max − min) / 255 with constant dimensions
    * pinned to step 0 (code 0, decode = min). */
  private def sqModel(c: DataFrame): (Seq[Double], Seq[Double]) = {
    val stats = c.select(posexplode(col("v")).as(Seq("k", "x")))
      .groupBy("k").agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("k").collect()
    val mns = stats.map(_.getAs[Double]("mn")).toSeq
    val steps = stats.map { r =>
      val mn = r.getAs[Double]("mn"); val mx = r.getAs[Double]("mx")
      if (mx > mn) (mx - mn) / SqLevels.toDouble else 0.0
    }.toSeq
    (mns, steps)
  }

  /** SCALAR-QUANTIZED (SQ8) TOP-K — the memory-reduction path FAISS
    * calls ScalarQuantizer: each corpus vector compresses to one byte
    * per dimension (code = round((x − min_d)/step_d), step_d =
    * (max_d − min_d)/255 from a per-dimension min/max pass), and search
    * runs ASYMMETRIC — the query stays full-precision, the database side
    * is decoded from its codes (decode = min_d + code·step_d). Unlike PQ
    * there is no codebook training: the model is 2×64 doubles, so
    * index build is one scan + one tiny aggregate — the right first
    * stop when embeddings don't fit memory but recall must stay near 1.
    *
    * Determinism: codes are exact integers on both engines (one
    * correctly-rounded double divide each), decode is the same two IEEE
    * ops in the same order, so the ranking hash-matches the oracle.
    *
    * Scale shape: the min/max model is a 64-row collect (broadcast back
    * as literals); the scored scan is the same broadcast-queries linear
    * pass as [[bruteTopK]] but over the 4×-smaller code table — and at
    * 100 TB the codes column feeds the SAME banded-LSH or IVF candidate
    * machinery ([[lshTopK]], [[ivfTopK]]) with this decode as its verify
    * arm; the brute tail here is the test-scale verifier, fenced exactly
    * like [[bruteTopK]]. */
  def sqTopK(s: SparkSession, d: String, nQueries: Int = 10,
      k: Int = 5): DataFrame =
    sqTopKDf(Tables.embeddings(s, d), nQueries, k)

  /** Same, over any (vec_id, embedding: array<float|double>) DataFrame
    * (planted tests). */
  def sqTopKDf(embeddings: DataFrame, nQueries: Int = 10,
      k: Int = 5): DataFrame = {
    val c = embeddings
      .select(col("vec_id"), toDoubleArr(col("embedding")).as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (mns, steps) = sqModel(c)
    // code_i = round((x_i − mn_i)/step_i) — exact 0..255 integers; the
    // codes frame IS the index (1 byte/dim at rest; long here because
    // Spark SQL has no unsigned byte and the arithmetic domain is what
    // the oracle checks).
    val codes = c.select(col("vec_id"),
      sqCodesCol(col("v"), mns, steps).as("q"))
    // Asymmetric distance: decode the database side only.
    val dec = codes.select(col("vec_id").as("cid"),
        sqDecodeCol(col("q"), mns, steps).as("dv"))
      .withColumn("dnrm", l2Norm(col("dv")))
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), l2Norm(col("v")).as("qn"))
    val scored = dec.crossJoin(broadcast(q))
      .select(col("qid"), col("cid"),
        e4(dotD(col("dv"), col("qv")) / (col("dnrm") * col("qn"))).as("sim_e4"))
    val w = Window.partitionBy("qid").orderBy(desc("sim_e4"), asc("cid"))
    graft.functions.Caching.releaseAfterAction(
      scored
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= k)
        .orderBy("qid", "rn"),
      c)
  }

  /** MMR candidate depth and result size: re-rank the top 20 by pure
    * relevance down to 5 diversified picks for 5 queries — presentation-
    * layer sizes by design (see the scale note on [[mmrTopK]]). */
  val MmrNq = 5
  val MmrDepth = 20
  val MmrK = 5

  /** MAXIMAL MARGINAL RELEVANCE re-rank (Carbonell & Goldstein 1998,
    * SIGIR) at λ = 1/2 — the standard diversification pass between
    * retrieval and presentation in RAG and search stacks: a relevance
    * tower hands over its top `depth` candidates, and picks are made
    * GREEDILY, each round taking the candidate maximizing
    * λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s) over the already-selected
    * set S (round 1 has S = ∅, so it is the pure-relevance argmax —
    * max over the empty set reads as 0, the conventional treatment).
    * Near-duplicate candidates stop crowding the answer: the second
    * copy's penalty is its similarity to the first, which for a
    * paraphrase is ~its own relevance.
    *
    * Determinism: at λ = 1/2 the argmax is invariant under doubling, so
    * the emitted score is mmr2x = sim_qd_e4 − max_ds_e4 — exact integer
    * arithmetic end to end, ties to the smaller cid; the greedy chain
    * hash-matches the oracle's unrolled per-round CTEs.
    *
    * Scale shape: the relevance tower is the PLUGGABLE part (exact
    * cosine here, self excluded — swap in [[lshTopK]] or the served
    * IVF-PQ index at 100 TB; the re-rank only sees (qid, cid, sim)
    * triples). Everything after the tower is presentation-sized by
    * construction: candidates are nQueries×depth rows, the pair-
    * similarity table depth² per query, and each greedy round is one
    * bounded join + one per-query argmax over ≤ depth rows — k unrolled
    * declarative rounds, the [[graft.operators.Graph]] fixed-rounds
    * shape, nothing corpus-scale past the first scan. */
  def mmrTopK(s: SparkSession, d: String, nQueries: Int = MmrNq,
      depth: Int = MmrDepth, k: Int = MmrK): DataFrame =
    mmrTopKDf(Tables.embeddings(s, d), nQueries, depth, k)

  /** Same, over any (vec_id, embedding: array<float|double>) DataFrame
    * (planted tests). */
  def mmrTopKDf(embeddings: DataFrame, nQueries: Int = MmrNq,
      depth: Int = MmrDepth, k: Int = MmrK): DataFrame = {
    val (selected, _, caches) = mmrCore(embeddings, nQueries, depth, k)
    graft.functions.Caching.releaseAfterAction(
      selected.orderBy("qid", "pick"), caches: _*)
  }

  /** The MMR build shared by the query and its diversity evaluation:
    * returns the selected picks, the candidate-pair similarity table
    * (the ILS evidence), and the persisted inputs the caller releases
    * after its terminal action. */
  private def mmrCore(embeddings: DataFrame, nQueries: Int,
      depth: Int, k: Int): (DataFrame, (DataFrame, DataFrame), Seq[DataFrame]) = {
    val c = embeddings
      .select(col("vec_id"), toDoubleArr(col("embedding")).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("qid").orderBy(desc("sim_e4"), asc("cid"))
    val cands = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        e4(dotD(col("v"), col("qv")) / (col("nrm") * col("qn"))).as("sim_e4"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= depth)
      .drop("rn")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Pairwise candidate similarities (depth² per query, both directions —
    // the greedy penalty lookup). Selected ⊆ candidates, so every
    // remaining candidate meets every selected one here.
    // The pair frame is presentation-sized (nQueries × depth² rows) at
    // any corpus size; each vector join-back broadcasts IT and streams
    // the corpus, so the corpus never shuffles on a pair key (guide
    // §3.1). Both join-backs carry their own hint — a hint on the
    // innermost frame would not survive through the first join's output.
    val pairKeys = cands.select(col("qid"), col("cid").as("pd"))
      .join(cands.select(col("qid"), col("cid").as("ps")), Seq("qid"))
      .filter(col("pd") =!= col("ps"))
    val pairsD = broadcast(pairKeys)
      .join(c.select(col("vec_id").as("pd"), col("v").as("dv"), col("nrm").as("dn")), "pd")
    val pairs = broadcast(pairsD)
      .join(c.select(col("vec_id").as("ps"), col("v").as("sv"), col("nrm").as("sn")), "ps")
      .select(col("qid"), col("pd"), col("ps"),
        e4(dotD(col("dv"), col("sv")) / (col("dn") * col("sn"))).as("ds_e4"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Round 1: pure relevance (empty-set penalty 0 ⇒ mmr2x = sim).
    // Each round's accumulator is an EAGER localCheckpoint: round i+1
    // consumes `selected` twice (penalty join + remaining anti-join), so
    // a lineage chain re-expands its whole prefix per reference — the
    // 2^k plan blowup vocabTrainDf documents (measured: 224 s at
    // sf0.001 chained vs ~2 s truncated). The checkpointed state is
    // nQueries×round rows — presentation-sized, the loop's whole point.
    var selected = cands
      .withColumn("r", row_number().over(w))
      .filter(col("r") === 1).drop("r")
      .select(col("qid"), col("cid"), col("sim_e4"),
        col("sim_e4").as("mmr2x_e4"), lit(1L).as("pick"))
      .localCheckpoint(true)
    val rounds = scala.collection.mutable.ArrayBuffer(selected)
    for (i <- 2 to k) {
      // The selected set is ≤ nQueries × k rows at any corpus size, and
      // its checkpoint carries no size estimate — broadcast it into both
      // per-round joins explicitly (guide §3.1).
      val remaining = cands
        .join(broadcast(selected.select("qid", "cid")), Seq("qid", "cid"),
          "left_anti")
      val pen = pairs
        .join(broadcast(selected.select(col("qid"), col("cid").as("ps"))),
          Seq("qid", "ps"))
        .groupBy(col("qid"), col("pd").as("cid"))
        .agg(max("ds_e4").as("pen"))
      val wi = Window.partitionBy("qid").orderBy(desc("mmr2x_e4"), asc("cid"))
      val pick = remaining.join(broadcast(pen), Seq("qid", "cid"))
        .select(col("qid"), col("cid"), col("sim_e4"),
          (col("sim_e4") - col("pen")).as("mmr2x_e4"))
        .withColumn("r", row_number().over(wi))
        .filter(col("r") === 1).drop("r")
        .withColumn("pick", lit(i.toLong))
      selected = selected.unionByName(pick).localCheckpoint(true)
      rounds += selected
    }
    // The final checkpoint IS the result's data; the intermediate round
    // states are dead the moment the next round materialized — free
    // their blocks now, release the shared inputs after the action.
    rounds.dropRight(1).foreach(org.apache.spark.sql.graft.Checkpoints.release)
    (selected, (cands, pairs), Seq(c, cands, pairs))
  }

  /** DIVERSIFICATION EVALUATION (`eval_mmr_diversity`) — the table read
    * before turning [[mmrTopK]] on: per query, the mean relevance and
    * the INTRA-LIST SIMILARITY (mean pairwise cosine among the returned
    * k — the standard redundancy metric) of the plain relevance top-k
    * vs the MMR picks, plus the ILS drop MMR bought. The trade is
    * explicit: `rel_sim ≥ mmr_sim` by construction (MMR never beats
    * pure relevance on relevance), and a positive `ils_drop_e4` is the
    * diversity actually purchased — per query, so a corpus whose
    * candidates are already diverse shows drop ≈ 0 and MMR can be left
    * off. Means are pinned one-divide e4 integers; both lists draw
    * their pairwise similarities from the SAME candidate-pair table the
    * greedy loop used, so the whole report hash-matches the oracle. */
  def mmrDiversityEval(s: SparkSession, d: String, nQueries: Int = MmrNq,
      depth: Int = MmrDepth, k: Int = MmrK): DataFrame =
    mmrDiversityEvalDf(Tables.embeddings(s, d), nQueries, depth, k)

  /** Same, over any (vec_id, embedding: array<float|double>) DataFrame
    * (planted tests). */
  def mmrDiversityEvalDf(embeddings: DataFrame, nQueries: Int = MmrNq,
      depth: Int = MmrDepth, k: Int = MmrK): DataFrame = {
    val (selected, (cands, pairs), caches) =
      mmrCore(embeddings, nQueries, depth, k)
    val w = Window.partitionBy("qid").orderBy(desc("sim_e4"), asc("cid"))
    val rel = cands.withColumn("r", row_number().over(w))
      .filter(col("r") <= k).drop("r")
    def meanE4(list: DataFrame, out: String): DataFrame =
      list.groupBy("qid")
        .agg(round(sum("sim_e4") * lit(1.0) / count(lit(1))).cast("long").as(out))
    def ilsE4(list: DataFrame, out: String): DataFrame =
      list.select(col("qid"), col("cid").as("pd"))
        .join(list.select(col("qid"), col("cid").as("ps")), Seq("qid"))
        .filter(col("pd") =!= col("ps"))
        .join(pairs, Seq("qid", "pd", "ps"))
        .groupBy("qid")
        .agg(round(sum("ds_e4") * lit(1.0) / count(lit(1))).cast("long").as(out))
    graft.functions.Caching.releaseAfterAction(
      meanE4(rel, "rel_sim_e4")
        .join(meanE4(selected, "mmr_sim_e4"), "qid")
        .join(ilsE4(rel, "rel_ils_e4"), "qid")
        .join(ilsE4(selected, "mmr_ils_e4"), "qid")
        .withColumn("ils_drop_e4", col("rel_ils_e4") - col("mmr_ils_e4"))
        .orderBy("qid"),
      caches: _*)
  }

  /** COMPRESSION-QUALITY MONITOR — per-query recall@k of the SQ8 index
    * against the exact baseline, [[retrievalRecall]]'s composition with
    * the quantized scan as the candidate side: the number that says
    * whether one byte per dimension is losslessly rankable on THIS
    * corpus (SQ8's pitch vs PQ is recall ≈ 1 at 4× memory — this query
    * is where that pitch gets checked instead of assumed). Denominator
    * is the per-query brute row count, matching the other recall
    * monitors. */
  def sqRecall(s: SparkSession, d: String, nQueries: Int = 10,
      k: Int = 5): DataFrame = {
    val brute = bruteTopK(s, d, nQueries, k).select(col("qid"), col("cid"))
    val sq = sqTopK(s, d, nQueries, k)
      .select(col("qid").as("sq"), col("cid").as("sc"))
    brute
      .join(sq, col("qid") === col("sq") && col("cid") === col("sc"), "left")
      .groupBy("qid")
      .agg(sum(when(col("sc").isNotNull, 1L).otherwise(0L)).as("hits"),
        count(lit(1)).as("n_brute"))
      .select(col("qid"), col("hits"),
        round(col("hits") * lit(10000.0) / col("n_brute")).cast("long")
          .as("recall_e4"))
      .orderBy("qid")
  }

  /** Highway out-degree: each coarse-layer node keeps edges to its
    * [[NavHighwayK]] nearest OTHER coarse nodes — the long-range links
    * the round-13 measurement showed the banded kNN build lacks. */
  val NavHighwayK = 8

  /** Down-link cap: each coarse node keeps edges to at most this many of
    * its assigned members (the best by similarity, id ties) — bounds any
    * coarse node's out-degree regardless of assignment skew, so a hot
    * region cannot make one beam expansion step quadratic. */
  val NavDownCap = 16

  /** Mirror cap: each node keeps at most this many REVERSE kNN edges
    * (the strongest by similarity, id ties). The mirror is what gives
    * the beam in-edges into true neighbors, but uncapped it equals the
    * node's kNN in-degree — O(n) for a hub vector that appears in
    * everyone's top-k — so a celebrity embedding would make one beam
    * expansion step corpus-sized. Same argument as [[KnnBucketCap]] and
    * the down-link cap: every out-degree class is constant-bounded. */
  val NavMirrorCap = 16

  /** On-disk layout version of the navigable-graph product. v4: the
    * up-link assignment and the coarse highway are BANDED (the
    * knnGraphShared candidate machinery one level up) instead of brute —
    * the round-14 verdict's #1: the old build ran n × n/32 exact dots
    * against a corpus-proportional broadcast, the repo's last quadratic
    * term. */
  private val NavGraphVersion = 4

  /** THE NAVIGABLE GRAPH — the round-13 verdict's #1 item: the banded
    * [[knnGraph]] plants only short-range links, so the beam walk paid
    * the graph diameter from any entry (measured: recall 0.64–0.70@6
    * rounds, entry quality bought recall but never rounds). This build
    * adds the links HNSW's construction plants (Malkov & Yashunin 2018
    * §4, flattened to two explicit layers), as a set union the oracle
    * expresses exactly:
    *   1. the banded kNN edges ([[knnGraphShared]] as-is) plus their
    *     MIRRORS capped at [[NavMirrorCap]] per node (undirected local
    *     links — the in-edges that let the beam reach a true neighbor
    *     whose own top-k points back into the beam's region; measured
    *     +0.18 recall over the one-way edges);
    *   2. UP-links: every vector → its nearest coarse-layer node
    *     (vec_id ≡ 0 mod [[CoarseMod]], argmax e4-cosine, id ties)
    *     AMONG ITS BAND-BUCKET MATES — the same sign-projection
    *     candidate chain [[knnGraphDf]] uses, one level up: candidates
    *     are the (vector, coarse) pairs sharing any eligible band
    *     bucket, so the assignment is Σ occ·occ_coarse ≤ cap·n/32
    *     pairs, never n × n/32. Vectors whose every band misses the
    *     coarse layer (or whose buckets are all capped) fall back to
    *     the fixed entry's cell, deterministically — still one up-link
    *     per vector, scored by its true cosine to the entry (a 1-row
    *     broadcast);
    *   3. DOWN-links: each coarse node → its [[NavDownCap]] best assigned
    *     members (the capped mirror of 2 — entry INTO a region);
    *   4. the HIGHWAY: each coarse node → its [[NavHighwayK]] nearest
    *     other coarse nodes among its band-bucket mates — the SAME
    *     banded construction restricted to the layer ((n/32)-linear,
    *     "the same construction one level up", now code rather than a
    *     docstring promise).
    * Self-loops dropped, duplicates merged (the walk treats edges as a
    * set). EVERY out-degree class is constant-bounded — ≤ [[KnnK]] +
    * [[NavMirrorCap]] + 1 for regular nodes, + [[NavDownCap]] +
    * [[NavHighwayK]] for coarse ones — so no hub, hot region, or
    * celebrity embedding can make a beam expansion step corpus-sized.
    * Published as its own content-addressed product CONSUMING the
    * knngraph product (sim_knn_graph keeps its raw-kNN semantics). */
  def navGraphShared(s: SparkSession, d: String): DataFrame =
    graft.sources.ArtifactCache.getOrBuild(s, "navgraph",
      s"$d/embeddings.parquet",
      // KnnBucketCap joined the key in v4: the banded up/highway stages
      // consume it DIRECTLY (eligibility rule), so a cap change must
      // rebuild this product too, not just the knngraph it consumes —
      // the same silent-staleness class the NavMirrorCap omission was
      // (r14, commit 697318f).
      Seq(KnnK, CoarseMod, NavHighwayK, NavDownCap, NavMirrorCap,
        KnnBucketCap, KnnGraphVersion, NavGraphVersion))(navGraphBuild(s, d))

  // private[graft] so PlanSpec can pin the BUILD's plan shape (no
  // broadcast of a non-constant-bounded frame) without a product write.
  private[graft] def navGraphBuild(s: SparkSession, d: String): DataFrame = {
    val c = corpus(s, d).persist(StorageLevel.MEMORY_AND_DISK)
    val knnRanked = knnGraphShared(s, d)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val knn = knnRanked.select("src", "dst")
    val wMir = Window.partitionBy("dst").orderBy(desc("sim_e4"), asc("src"))
    val mirror = knnRanked
      .withColumn("mrn", row_number().over(wMir))
      .filter(col("mrn") <= NavMirrorCap)
      .select(col("dst").as("src"), col("src").as("dst"))
    // Banded candidate chain for the up/highway stages — the identical
    // keys + celebrity-cap rule as [[knnGraphDf]] (8 bands × rule rows,
    // [[KnnBucketCap]] over FULL-corpus occupancy), re-derived here
    // because the knngraph product stores edges, not keys. Candidate
    // volume: Σ_buckets occ_all · occ_coarse ≤ cap · |coarse| per band —
    // edge-/band-bounded, no corpus-proportional broadcast anywhere.
    // Geometry resolves the SAME bandRowsFor(n) as the knngraph build
    // this product consumes (the rule input — the corpus count — is
    // pinned by the source-file identity already in the product key).
    val keys = bandedKeys(c.select("vec_id", "v"), 8, bandRowsFor(c.count()))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val eligible = keys.groupBy("band_idx", "band_key")
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") <= KnnBucketCap)
      .select("band_idx", "band_key")
    val ck = keys.join(eligible, Seq("band_idx", "band_key"))
    val ckCoarse = ck.filter(col("vec_id") % CoarseMod === 0)
    // Up-links: argmax over the BUCKET-MATE coarse candidates
    // (assignCells aggregate shape, no window); `cs` is carried so the
    // down-link cap can rank members.
    val upBest = ck.as("a")
      .join(ckCoarse.as("b").select(col("vec_id").as("cc"),
          col("band_idx"), col("band_key")),
        Seq("band_idx", "band_key"))
      .filter(col("vec_id") =!= col("cc"))
      .select("vec_id", "cc").distinct()
      .join(c.select(col("vec_id"), col("v").as("xv"), col("nrm").as("xn")),
        "vec_id")
      .join(c.select(col("vec_id").as("cc"), col("v").as("cv"),
        col("nrm").as("cn")), "cc")
      .select(col("vec_id"), col("cc"),
        e4(dotD(col("xv"), col("cv")) / (col("xn") * col("cn"))).as("cs"))
      .groupBy("vec_id")
      .agg(min(struct(negate(col("cs")).as("ns"), col("cc").as("cc"))).as("m"))
      .select(col("vec_id").as("src"), col("m.cc").as("dst"),
        negate(col("m.ns")).as("cs"))
    // Bucket-miss fallback: a vector no eligible band connects to any
    // coarse node still gets exactly one up-link — to the fixed entry's
    // cell, scored by its true cosine to the entry (a 1-row broadcast:
    // the only explicit broadcast in the build, constant-bounded).
    val entryVec = c.filter(col("vec_id") === GraphEntry)
      .select(col("v").as("ev"), col("nrm").as("en"))
    val upMiss = c
      .join(upBest.select(col("src").as("vec_id")), Seq("vec_id"),
        "left_anti")
      .filter(col("vec_id") =!= GraphEntry)
      .crossJoin(broadcast(entryVec))
      .select(col("vec_id").as("src"), lit(GraphEntry).as("dst"),
        e4(dotD(col("v"), col("ev")) / (col("nrm") * col("en"))).as("cs"))
    val up = upBest.unionAll(upMiss).persist(StorageLevel.MEMORY_AND_DISK)
    val wDown = Window.partitionBy("dst").orderBy(desc("cs"), asc("src"))
    val down = up
      .withColumn("rn", row_number().over(wDown))
      .filter(col("rn") <= NavDownCap)
      .select(col("dst").as("src"), col("src").as("dst"))
    // Highway: the same banded chain restricted to the coarse layer —
    // per-node top-NavHighwayK among coarse bucket-mates, (n/32)-linear.
    val wHw = Window.partitionBy("a").orderBy(desc("hs"), asc("b"))
    val hw = ckCoarse.select(col("vec_id").as("a"), col("band_idx"),
        col("band_key"))
      .join(ckCoarse.select(col("vec_id").as("b"), col("band_idx"),
        col("band_key")), Seq("band_idx", "band_key"))
      .filter(col("a") =!= col("b"))
      .select("a", "b").distinct()
      .join(c.select(col("vec_id").as("a"), col("v").as("av"),
        col("nrm").as("an")), "a")
      .join(c.select(col("vec_id").as("b"), col("v").as("bv"),
        col("nrm").as("bn")), "b")
      .select(col("a"), col("b"),
        e4(dotD(col("av"), col("bv")) / (col("an") * col("bn"))).as("hs"))
      .withColumn("rn", row_number().over(wHw))
      .filter(col("rn") <= NavHighwayK)
      .select(col("a").as("src"), col("b").as("dst"))
    graft.functions.Caching.releaseAfterAction(
      knn.unionAll(mirror)
        .unionAll(up.select("src", "dst")).unionAll(down).unionAll(hw)
        .filter(col("src") =!= col("dst"))
        .distinct(),
      c, keys, up, knnRanked)
  }

  /** Query-contract wrapper over the navigable graph (`sim_nav_graph`):
    * the stored edge set with the contract's terminal sort — the audit
    * view of what the walks actually traverse (edge counts per class are
    * one groupBy away; the declared query pins the exact set). */
  def navGraphQuery(s: SparkSession, d: String): DataFrame =
    navGraphShared(s, d).orderBy("src", "dst")

  /** Arrival-batch size for [[navInsert]]: the last 50 vec_ids play the
    * role of newly-ingested vectors. */
  val NavInsertBatch = 50L

  /** On-disk layout version of the insert-delta product. */
  private val NavInsertVersion = 1

  /** INCREMENTAL GRAPH-INDEX INSERT (`sim_nav_insert`) — the index-
    * MAINTENANCE operator every graph-ANN deployment needs between
    * rebuilds (HNSW §4 INSERT, Malkov & Yashunin 2018, batch form): for
    * an arriving batch (the last [[NavInsertBatch]] vec_ids stand in
    * for new ingest) emit the DELTA edge set that attaches them to the
    * navigable graph so they are immediately searchable AND reachable:
    *
    *   - `knn`: each arrival → its top-[[KnnK]] banded bucket-mates
    *     (base corpus AND fellow arrivals — the rebuilt graph's own
    *     candidate rule);
    *   - `mirror`: per destination, the best [[NavMirrorCap]] arrival
    *     in-edges reversed — the bidirectional-connect step that makes
    *     an arrival REACHABLE, not just searching;
    *   - `up`: each arrival → its nearest coarse bucket-mate (entry-
    *     cell fallback for bucket misses, as in the build);
    *   - `down`: each coarse node → its best [[NavDownCap]] NEW
    *     assignees (additive: the stored down list is untouched);
    *   - `hw`: an arrival that lands ON the coarse stride joins the
    *     highway with its [[NavHighwayK]] nearest coarse bucket-mates.
    *
    * Additive deltas can leave a node's TOTAL out-degree above the
    * rebuild's cap until the next product rebuild compacts them — the
    * standard delta-then-compact maintenance contract (the IndexBuild
    * swap is the compaction); every DELTA class is itself capped, so
    * degree grows by at most a constant per batch.
    *
    * Scale shape: candidate volume is the arrivals' band buckets only —
    * Σ occ_batch·occ ≤ cap · |batch| · bands pairs, INDEPENDENT of
    * corpus size. The banded key registry is re-derived here because
    * the products store edges, not keys (one linear key scan, the same
    * class as any query's corpus scan); a live deployment maintains the
    * key registry incrementally and pays only the batch side.
    *
    * Served as a BUILD-ONCE PRODUCT (`navdelta`) — the same
    * amortization as every other index artifact: the banded delta
    * computation runs once per (corpus, batch) and both consumers
    * (`sim_nav_insert` and [[evalNavInsert]]'s post-insert walk) scan
    * the stored edges. Identical rows to [[navInsertDf]] by
    * construction. */
  def navInsert(s: SparkSession, d: String,
      batch: Long = NavInsertBatch): DataFrame =
    graft.sources.ArtifactCache.getOrBuild(s, "navdelta",
      s"$d/embeddings.parquet",
      Seq(KnnK, CoarseMod, NavHighwayK, NavDownCap, NavMirrorCap,
        KnnBucketCap, batch, NavInsertVersion))(
      navInsertDf(Tables.embeddings(s, d), batch))

  /** Same, over any (vec_id, embedding) frame (planted tests). */
  def navInsertDf(embeddings: DataFrame,
      batch: Long = NavInsertBatch): DataFrame = {
    val c = embeddings
      .select(col("vec_id"), toDoubleArr(col("embedding")).as("v"))
      .withColumn("nrm", l2Norm(col("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cut = c.agg(max("vec_id")).head().getLong(0) - batch + 1L
    // Same band-geometry rule as the build: the visible corpus (this
    // frame) sets the rows-per-band, so an insert's candidate chain
    // matches the graph it attaches to at any n.
    val keys = bandedKeys(c.select("vec_id", "v"), 8, bandRowsFor(c.count()))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (delta, caches) = navInsertDeltaOver(c, keys, cut, Long.MaxValue)
    graft.functions.Caching.releaseAfterAction(delta,
      (Seq(c, keys) ++ caches): _*)
  }

  /** The insert-delta edge rules over a PRE-BUILT visible-corpus frame
    * `c` and its banded `keys` (both restricted to the visible prefix —
    * `keys` by the caller, `c` via `pEnd` where arrivals are selected).
    * Shared by [[navInsertDf]] (which builds both for one standalone
    * batch) and [[evalNavInsertSeq]] (which shares ONE corpus persist
    * and ONE keys frame across its sequential prefixes instead of
    * re-scanning and re-projecting per batch — r16 guide §1.2 step 1 /
    * §5: the 16-plane projection pass and the corpus normalization ran
    * once per delta, now once per eval). `cut` is the first arrival id;
    * `pEnd` the exclusive end of the visible prefix (Long.MaxValue =
    * the whole frame). Returns the delta frame plus the intermediates
    * it persisted — the CALLER releases them after its terminal
    * action. */
  private def navInsertDeltaOver(c: DataFrame, keys: DataFrame,
      cut: Long, pEnd: Long): (DataFrame, Seq[DataFrame]) = {
    val eligible = keys.groupBy("band_idx", "band_key")
      .agg(count(lit(1)).as("occ"))
      .filter(col("occ") <= KnnBucketCap)
      .select("band_idx", "band_key")
    val ck = keys.join(eligible, Seq("band_idx", "band_key"))
    val ckNew = ck.filter(col("vec_id") >= cut)
    def scored(cand: DataFrame): DataFrame = cand
      .join(c.select(col("vec_id").as("src"), col("v").as("sv"),
        col("nrm").as("sn")), "src")
      .join(c.select(col("vec_id").as("dst"), col("v").as("dv"),
        col("nrm").as("dn")), "dst")
      .select(col("src"), col("dst"),
        e4(dotD(col("sv"), col("dv")) / (col("sn") * col("dn"))).as("sim_e4"))
    // knn: arrivals against every bucket-mate (base and batch alike).
    val knnCand = ckNew.select(col("vec_id").as("src"), col("band_idx"),
        col("band_key"))
      .join(ck.select(col("vec_id").as("dst"), col("band_idx"),
        col("band_key")), Seq("band_idx", "band_key"))
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
    val wSrc = Window.partitionBy("src").orderBy(desc("sim_e4"), asc("dst"))
    val knnNew = scored(knnCand)
      .withColumn("rn", row_number().over(wSrc))
      .filter(col("rn") <= KnnK)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wMir = Window.partitionBy("dst").orderBy(desc("sim_e4"), asc("src"))
    val mirror = knnNew
      .withColumn("mrn", row_number().over(wMir))
      .filter(col("mrn") <= NavMirrorCap)
      .select(col("dst").as("src"), col("src").as("dst"),
        lit("mirror").as("edge_class"))
    // up: nearest coarse bucket-mate, entry-cell fallback (the build's
    // rule, restricted to the arrivals).
    val upCand = ckNew.select(col("vec_id").as("src"), col("band_idx"),
        col("band_key"))
      .join(ck.filter(col("vec_id") % CoarseMod === 0)
          .select(col("vec_id").as("dst"), col("band_idx"), col("band_key")),
        Seq("band_idx", "band_key"))
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
    val upBest = scored(upCand)
      .groupBy("src")
      .agg(min(struct(negate(col("sim_e4")).as("ns"), col("dst").as("dst")))
        .as("m"))
      .select(col("src"), col("m.dst").as("dst"),
        negate(col("m.ns")).as("cs"))
    val entryVec = c.filter(col("vec_id") === GraphEntry &&
        col("vec_id") < pEnd)
      .select(col("v").as("ev"), col("nrm").as("en"))
    val upMiss = c.filter(col("vec_id") >= cut && col("vec_id") < pEnd)
      .join(upBest.select(col("src").as("vec_id")), Seq("vec_id"),
        "left_anti")
      .filter(col("vec_id") =!= GraphEntry)
      .crossJoin(broadcast(entryVec))
      .select(col("vec_id").as("src"), lit(GraphEntry).as("dst"),
        e4(dotD(col("v"), col("ev")) / (col("nrm") * col("en"))).as("cs"))
    val up = upBest.unionAll(upMiss).persist(StorageLevel.MEMORY_AND_DISK)
    val wDown = Window.partitionBy("dst").orderBy(desc("cs"), asc("src"))
    val down = up
      .withColumn("rn", row_number().over(wDown))
      .filter(col("rn") <= NavDownCap)
      .select(col("dst").as("src"), col("src").as("dst"),
        lit("down").as("edge_class"))
    // hw: arrivals on the coarse stride join the highway.
    val hwCand = ckNew.filter(col("vec_id") % CoarseMod === 0)
      .select(col("vec_id").as("src"), col("band_idx"), col("band_key"))
      .join(ck.filter(col("vec_id") % CoarseMod === 0)
          .select(col("vec_id").as("dst"), col("band_idx"), col("band_key")),
        Seq("band_idx", "band_key"))
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
    val hw = scored(hwCand)
      .withColumn("rn", row_number().over(wSrc))
      .filter(col("rn") <= NavHighwayK)
      .select(col("src"), col("dst"), lit("hw").as("edge_class"))
    (knnNew.select(col("src"), col("dst"), lit("knn").as("edge_class"))
        .unionAll(mirror)
        .unionAll(up.select(col("src"), col("dst"),
          lit("up").as("edge_class")))
        .unionAll(down).unionAll(hw)
        .filter(col("src") =!= col("dst"))
        .distinct()
        .orderBy("src", "dst", "edge_class"),
      Seq(knnNew, up))
  }

  /** INSERT-QUALITY DECISION TABLE (`eval_nav_insert`) — the number
    * that proves the [[navInsert]] delta WORKS: the standard 10-query
    * beam search run over (a) the BASE graph — the stored navigable
    * edges with every arrival-touching edge removed, an APPROXIMATION
    * of the pre-batch index (band eligibility, mirror/down ranks and
    * the coarse stride were all computed with the arrivals present, so
    * a bucket capped only because of arrivals contributes no base edges
    * and mirror slots consumed by removed arrival edges are not
    * backfilled — an exactly-attributed base would need a second build
    * over the pre-cut corpus, a cost this monitor deliberately does not
    * pay) — and (b) base ∪ delta, each scored against the
    * exact brute top-k over the FULL corpus (arrivals included as
    * candidates). On the base graph the arrivals are invisible — a
    * brute hit that IS an arrival cannot be found, capping recall; on
    * the post-insert graph the delta's knn + mirror edges make them
    * searchable and reachable, and recall returns to the full-build
    * level. One row per graph state: (graph_state, hits, n_brute,
    * recall_e4, n_edges). Same walk (shared [[graphWalk]] loop, fixed
    * entry, [[GraphRounds]] rounds, beam [[GraphBeam]]) — the ONLY
    * difference between the rows is the edge set, so the recall delta
    * is attributable to the insert alone. */
  def evalNavInsert(s: SparkSession, d: String,
      batch: Long = NavInsertBatch, nQueries: Int = 10,
      k: Int = 5): DataFrame = {
    import s.implicits._
    val c = corpus(s, d).persist(StorageLevel.MEMORY_AND_DISK)
    val cut = c.agg(max("vec_id")).head().getLong(0) - batch + 1L
    val stored = navGraphShared(s, d).select("src", "dst")
    val base = stored.filter(col("src") < cut && col("dst") < cut)
    // The delta comes from the navdelta product, so the post edge set is
    // two stored-table scans + a distinct — no banded recompute in-plan.
    val post = base.unionAll(navInsert(s, d, batch).select("src", "dst"))
      .distinct()
    // ONE walk over BOTH graphs: the beam state is keyed by
    // (graph_state, qid), so the two graphs' walks share every round's
    // scheduling and checkpoint instead of paying 2 × GraphRounds
    // sequential jobs (measured: halves the eval's wall clock). Each
    // keyed slice is EXACTLY the per-graph walk — partitioned windows
    // and the gs-keyed edge join cannot leak candidates across graphs.
    val edges = base.withColumn("gs", lit("base"))
      .unionAll(post.withColumn("gs", lit("post_insert")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val gsLabels = Seq("base", "post_insert").toDF("gs")
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    // NO beam-side broadcast hints here, unlike [[graphWalk]]: measured
    // A/B (r16, bench protocol, 2×2 interleave) put the hinted form at
    // 5.0-5.9 s vs 3.5-3.7 s unhinted — the gs-keyed walk runs TWO graph
    // states through every round, and forcing a driver-collected
    // broadcast build per round serializes work AQE otherwise overlaps.
    // The per-round join keys stay bounded either way (beam × |gs|).
    def score(cand: DataFrame): DataFrame = cand
      .join(c.select(col("vec_id").as("cid"), col("v"), col("nrm")), "cid")
      .join(broadcast(q), "qid")
      .select(col("gs"), col("qid"), col("cid"),
        e4(dotD(col("v"), col("qv")) / (col("nrm") * col("qn"))).as("sim_e4"))
    val w = Window.partitionBy("gs", "qid").orderBy(desc("sim_e4"), asc("cid"))
    var beam = score(q.select(col("qid")).crossJoin(broadcast(gsLabels))
        .withColumn("cid", lit(GraphEntry)))
      .localCheckpoint(true)
    val states = scala.collection.mutable.ArrayBuffer(beam)
    for (_ <- 1 to GraphRounds) {
      val nbrs = beam.select(col("gs"), col("qid"), col("cid").as("src"))
        .join(edges, Seq("gs", "src"))
        .select(col("gs"), col("qid"), col("dst").as("cid"))
      val cand = beam.select("gs", "qid", "cid").unionAll(nbrs).distinct()
      beam = score(cand)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= GraphBeam)
        .select("gs", "qid", "cid", "sim_e4")
        .localCheckpoint(true)
      states += beam
    }
    val sel = beam
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("gs"), col("qid"), col("cid"), lit(1L).as("hit"))
    val brute = bruteTopK(s, d, nQueries, k).select(col("qid"), col("cid"))
    val hits = brute.crossJoin(broadcast(gsLabels))
      .join(sel, Seq("gs", "qid", "cid"), "left")
      .groupBy("gs")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"),
        count(lit(1)).as("n_brute"))
    val edgeCounts = edges.groupBy("gs").agg(count(lit(1)).as("n_edges"))
    states.dropRight(1).foreach(org.apache.spark.sql.graft.Checkpoints.release)
    graft.functions.Caching.releaseAfterAction(
      hits.join(edgeCounts, "gs")
        .select(col("gs").as("graph_state"), col("hits"), col("n_brute"),
          round(col("hits") * lit(10000.0) / col("n_brute")).cast("long")
            .as("recall_e4"),
          col("n_edges"))
        .orderBy("graph_state"),
      c, edges, states.last)
  }

  /** Batch count of the SEQUENTIAL insert eval. */
  val NavSeqBatches = 3

  /** MULTI-BATCH INSERT EVAL (`eval_nav_insert_seq`) — the compaction-
    * cadence table the additive-delta contract owes: [[evalNavInsert]]
    * proves ONE batch attaches well; this runs [[NavSeqBatches]]
    * SEQUENTIAL batches (each of [[NavInsertBatch]] arrivals, batch b
    * computed over the corpus PREFIX visible at its arrival time — the
    * live-deployment replay) and reports, per cumulative graph state
    * b ∈ 0..B: edge count, the standard fixed-entry walk's recall
    * against full-corpus brute, and the max/mean out-degree — the
    * numbers an operator reads to decide how often to compact.
    *
    * The additive-delta contract's degree claim is made checkable: an
    * EXISTING node gains at most [[NavMirrorCap]] mirror + [[NavDownCap]]
    * down edges per batch (each delta class is window-capped inside the
    * batch), so max_out_deg(b) ≤ max_out_deg(b−1) + 32 — pinned in
    * NavInsertSeqSpec, with recall non-degrading as batches land.
    *
    * One (graph_state, qid)-keyed walk serves every row (the
    * [[evalNavInsert]] recipe at B+1 states); each delta is an EAGER
    * localCheckpoint so the cumulative unions scan materialized edges
    * instead of re-running the banded delta once per containing state.
    * The FINAL batch's prefix is the full corpus, which makes its delta
    * row-identical to the `navdelta` PRODUCT — scanned, not recomputed;
    * the earlier batches' prefix deltas are not any product's key and
    * are computed in-plan — an offline eval by design, like the
    * training-cost twin `sim_ivfpq_trained`. */
  def evalNavInsertSeq(s: SparkSession, d: String,
      batches: Int = NavSeqBatches, size: Long = NavInsertBatch,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    import s.implicits._
    val c = corpus(s, d).persist(StorageLevel.MEMORY_AND_DISK)
    val cut0 = c.agg(max("vec_id")).head().getLong(0) - batches * size + 1L
    val stored = navGraphShared(s, d).select("src", "dst")
    val base = stored.filter(col("src") < cut0 && col("dst") < cut0)
    // The in-plan prefix deltas (b < batches; the final batch IS the
    // navdelta product — scanned, not recomputed) share ONE corpus
    // persist and ONE banded-keys frame per distinct band geometry,
    // instead of each re-scanning, re-normalizing and re-projecting its
    // prefix through [[navInsertDf]] (r16: three corpus scans + two
    // 16-plane projection passes + four driver actions → one of each;
    // guide §1.2 step 1, §5). Every per-prefix quantity keeps
    // navInsertDf's exact semantics: prefix count and max come from one
    // conditional aggregate over the shared frame, the band-geometry
    // rule is applied to each prefix's own count, and the keys frame is
    // prefix-filtered (band keys are per-vector, so filtering the full
    // frame equals computing keys over the prefix).
    val prefixEnds = (1 until batches).map(b => cut0 + b * size)
    val pre = if (prefixEnds.isEmpty) null
      else {
        val exprs = prefixEnds.zipWithIndex.flatMap { case (p, i) =>
          Seq(count(when(col("vec_id") < p, 1L)).as(s"cnt$i"),
            max(when(col("vec_id") < p, col("vec_id"))).as(s"mx$i"))
        }
        c.agg(exprs.head, exprs.tail: _*).head()
      }
    val geos = prefixEnds.indices.map(i => bandRowsFor(pre.getLong(2 * i)))
    val keysByR = geos.distinct.map { r =>
      r -> bandedKeys(c.select("vec_id", "v"), 8, r)
        .persist(StorageLevel.MEMORY_AND_DISK)
    }.toMap
    // Each in-plan delta is MATERIALIZED eagerly (and its internal
    // persists released at once): one delta = one internally-parallel
    // job reusing the shared keys frame, instead of all delta subtrees
    // nested inside the walk's first-round plan (measured 5 s slower as
    // one mega-plan).
    val deltas: Seq[DataFrame] = (1 to batches).map { b =>
      if (b == batches) navInsert(s, d, size).select("src", "dst")
      else {
        val p = prefixEnds(b - 1)
        val cutB = pre.getLong(2 * (b - 1) + 1) - size + 1L
        val (df, caches) = navInsertDeltaOver(c,
          keysByR(geos(b - 1)).filter(col("vec_id") < p), cutB, p)
        graft.functions.Caching.materialize(
          df.select("src", "dst"), caches: _*)
      }
    }
    // The keys frames serve only the delta builds above — release now.
    keysByR.values.foreach(_.unpersist(false))
    // ONE distinct over (edge → first batch containing it) replaces the
    // per-state cumulative union + distinct (state b's edge set is
    // exactly {fb <= b}), so the base graph is scanned once, not once
    // per state, and the walk probes a frame 1/(B+1) the size
    // (guide §2.3, §2.4).
    val edges = (base.withColumn("fb", lit(0L)) +:
        deltas.zipWithIndex.map { case (df, i) =>
          df.withColumn("fb", lit((i + 1).toLong)) })
      .reduce(_ unionAll _)
      .groupBy("src", "dst").agg(min("fb").as("fb"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val gsLabels = (0L to batches.toLong).toDF("gs")
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    // NO beam-side broadcast hints in the multi-state walk — same
    // measured A/B as [[evalNavInsert]]: per-round broadcast builds over
    // |gs| graph states serialize work AQE otherwise overlaps.
    def score(cand: DataFrame): DataFrame = cand
      .join(c.select(col("vec_id").as("cid"), col("v"), col("nrm")), "cid")
      .join(broadcast(q), "qid")
      .select(col("gs"), col("qid"), col("cid"),
        e4(dotD(col("v"), col("qv")) / (col("nrm") * col("qn"))).as("sim_e4"))
    val w = Window.partitionBy("gs", "qid").orderBy(desc("sim_e4"), asc("cid"))
    var beam = score(q.select(col("qid")).crossJoin(broadcast(gsLabels))
        .withColumn("cid", lit(GraphEntry)))
      .localCheckpoint(true)
    val walkStates = scala.collection.mutable.ArrayBuffer(beam)
    for (_ <- 1 to GraphRounds) {
      val nbrs = beam.select(col("gs"), col("qid"), col("cid").as("src"))
        .join(edges, Seq("src"))
        .filter(col("fb") <= col("gs"))
        .select(col("gs"), col("qid"), col("dst").as("cid"))
      val cand = beam.select("gs", "qid", "cid").unionAll(nbrs).distinct()
      beam = score(cand)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= GraphBeam)
        .select("gs", "qid", "cid", "sim_e4")
        .localCheckpoint(true)
      walkStates += beam
    }
    val sel = beam
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("gs"), col("qid"), col("cid"), lit(1L).as("hit"))
    val brute = bruteTopK(s, d, nQueries, k).select(col("qid"), col("cid"))
    val hits = brute.crossJoin(broadcast(gsLabels))
      .join(sel, Seq("gs", "qid", "cid"), "left")
      .groupBy("gs")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"),
        count(lit(1)).as("n_brute"))
    // Per-state degree stats from the tagged frame: state gs's edge set
    // is {fb <= gs}, so one small cross join against the B+1 labels
    // reproduces the old per-state-copy aggregate exactly.
    val degs = edges.crossJoin(broadcast(gsLabels))
      .filter(col("fb") <= col("gs"))
      .groupBy("gs", "src").agg(count(lit(1)).as("c"))
      .groupBy("gs")
      .agg(count(lit(1)).as("n_src"), max("c").as("max_out_deg"),
        sum("c").as("n_edges"))
      .select(col("gs"), col("n_edges"), col("max_out_deg"),
        round(col("n_edges") * lit(10000.0) / col("n_src")).cast("long")
          .as("mean_deg_e4"))
    walkStates.dropRight(1)
      .foreach(org.apache.spark.sql.graft.Checkpoints.release)
    graft.functions.Caching.releaseAfterAction(
      hits.join(degs, "gs")
        .select(col("gs").as("batch"), col("n_edges"), col("hits"),
          col("n_brute"),
          round(col("hits") * lit(10000.0) / col("n_brute")).cast("long")
            .as("recall_e4"),
          col("max_out_deg"), col("mean_deg_e4"))
        .orderBy("batch"),
      (Seq(c, edges, walkStates.last) ++ deltas.dropRight(1)): _*)
  }

  /** NAVIGABILITY AUDIT (`eval_graph_connectivity`) — the structural
    * number behind the recall jump: how much of the corpus is reachable
    * from the fixed entry within each hop budget. On the raw banded kNN
    * graph this is what capped recall (the walk paid the diameter); on
    * the navigable build the up/down/highway links make the fraction
    * approach 1 within the walk's round budget. One row per hop
    * 1..[[GraphRounds]]: reachable-node count and e4 fraction of the
    * corpus. Frontier expansion is one edge equi-join per hop with
    * per-hop checkpoints (the iterative-engine recipe); reachable sets
    * only grow, and the audit is entry-anchored, so hop h is exactly the
    * node set the beam COULD have scored by round h with an unbounded
    * beam — the upper envelope of [[graphBeamEval]]'s scanned column. */
  def graphConnectivityEval(s: SparkSession, d: String,
      maxHops: Int = GraphRounds): DataFrame = {
    import s.implicits._
    // The frontier grows to corpus size, so it cannot broadcast like a
    // beam; instead the edge list persists PRE-PARTITIONED on the join
    // key, so each hop's equi-join reuses the cached partitioning and
    // shuffles only the (node-sized) reachable set, never the edges
    // (guide §2.4: two operations keyed the same way share one exchange).
    val edges = navGraphShared(s, d).select(col("src"), col("dst"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val total = corpus(s, d).agg(count(lit(1)).as("n_nodes"))
    var reach = Seq(GraphEntry).toDF("node").localCheckpoint(true)
    val states = scala.collection.mutable.ArrayBuffer(reach)
    val rows = (1 to maxHops).map { h =>
      reach = reach.unionAll(
          reach.join(edges, reach("node") === edges("src"))
            .select(col("dst").as("node")))
        .distinct().localCheckpoint(true)
      states += reach
      reach.agg(count(lit(1)).as("n_reachable")).crossJoin(total)
        .select(lit(h.toLong).as("hops"), col("n_reachable"),
          round(col("n_reachable") * lit(10000.0) / col("n_nodes"))
            .cast("long").as("frac_e4"))
    }
    graft.functions.Caching.releaseAfterAction(
      rows.reduce(_ unionAll _).orderBy("hops"),
      (edges +: states.toSeq): _*)
  }

  // Graph-ANN beam-search knobs: fixed entry point, beam width, and
  // round count — FIXED on both engines (best-first search has no
  // fixpoint; the walk IS its schedule). Rounds dominate recall (the
  // walk must cross the graph's diameter from ONE fixed entry — exactly
  // what HNSW's upper layers shortcut; the navigable build plants those
  // links, see [[navGraphShared]]). Beam is the efSearch-style knob: on
  // the round-14 EXACT build 16 sufficed, but the v4 BANDED build's
  // approximate up/down/highway links carry less signal per edge, so
  // the walk needs more parallel exploration to keep recall as the
  // corpus grows — measured (DuckDB sweep over the oracle chain, all
  // three corpora): beam 24 holds fixed-entry recall at 0.94 / 0.92 /
  // 0.88 for sf0.001 / 0.01 / 0.1 where beam 16 fell to 0.74 at sf0.1.
  // Per-query work stays rounds × beam × out-degree — corpus-size-
  // independent; the +50 % walk cost is priced in the beam-sweep eval's
  // scored_rows column.
  val GraphEntry = 0L
  val GraphBeam = 24
  val GraphRounds = 6

  /** GRAPH-BASED ANN SEARCH — the fourth index paradigm next to the
    * hash-bucketed (LSH), cell-partitioned (IVF), and compressed (PQ/SQ)
    * paths: a deterministic best-first BEAM SEARCH over the NAVIGABLE
    * graph ([[navGraphShared]] — the banded kNN links plus the
    * HNSW-style up/down/highway links, Malkov & Yashunin 2018). Every
    * query starts at the fixed entry vector; each round expands the
    * beam's out-neighbors along the graph's kept edges, exact-scores the
    * union, and keeps the top-[[GraphBeam]] by (sim desc, cid); after
    * [[GraphRounds]] rounds the beam's top-k is the answer. Per-query
    * work is rounds × beam × out-degree scored candidates (out-degree is
    * constant-bounded by the build) — INDEPENDENT of corpus size once
    * the graph exists, which is the paradigm's pitch. Measured recall
    * vs brute at sf0.01: 0.70 on the raw kNN graph (round 13) → 0.88 on
    * the navigable build at the same 6-round budget, with scored rows
    * within ~2× — gated in SimilaritySpec, not assumed. Fully
    * deterministic: fixed entry, fixed rounds, e4 scores with cid ties —
    * hash-matches the unrolled-round oracle over the SAME graph CTEs as
    * sim_knn_graph plus the shared navigable-edge CTEs. */
  def graphTopK(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5,
      beam: Int = GraphBeam, rounds: Int = GraphRounds): DataFrame =
    graphSearchFrom(s, d, nQueries, k, beam, rounds) { (q, _) =>
      q.select(col("qid")).withColumn("cid", lit(GraphEntry))
    }

  /** Deterministic tombstone set for the index-deletion path: vec_ids
    * ≡ [[NavDeleteRes]] (mod [[NavDeleteMod]]) play deleted/withdrawn
    * documents (takedowns, opt-outs — the maintenance event every
    * 100 TB pipeline handles between rebuilds, the mirror of
    * [[NavInsertBatch]]'s arrivals). ~n/40 ids, never the fixed entry
    * (0 mod 40 ≠ 7). */
  val NavDeleteMod = 40L
  val NavDeleteRes = 7L

  /** TOMBSTONE-FILTERED GRAPH SERVING (`sim_nav_delete`) — the DELETE
    * half of the index-maintenance story ([[navInsert]] is the other):
    * a deleted vector must never be RETURNED, immediately, without
    * waiting for a rebuild. The standard graph-ANN recipe (hnswlib's
    * mark-deleted, FAISS's IDSelector): the node STAYS IN THE GRAPH
    * and the walk still traverses it — removing it from the beam would
    * disconnect the regions it routes to and silently cost survivor
    * recall — but the FINAL selection ranks only survivors: the walk's
    * last beam state is filtered by the tombstone predicate BEFORE the
    * top-k window, so the freed slots go to the next-best survivors
    * (neighbors re-rank, pinned in the spec). Same fixed-entry walk as
    * [[graphTopK]] ([[graphWalk]] — shared loop, not a copy);
    * tombstoned ids are dropped whether they are true neighbors or
    * not. Compaction: the tombstone set is a serving-layer overlay —
    * at the next product rebuild the corpus table no longer carries
    * the deleted rows, so the rebuilt graph contains no trace of them
    * (NavDeleteSpec proves it by rebuilding over the survivor corpus).
    *
    * Scale shape: the filter is one predicate on a beam-sized frame
    * (rounds × beam rows per query) — zero additional shuffle; the
    * streaming probes apply the identical predicate to their RAM
    * replica's final beam. A production deployment swaps the modular
    * predicate for an anti-join against a broadcast tombstone id set —
    * same plan shape, id-set-sized broadcast. */
  def navDeleteTopK(s: SparkSession, d: String, nQueries: Int = 10,
      k: Int = 5, beam: Int = GraphBeam,
      rounds: Int = GraphRounds): DataFrame = {
    val walk = graphWalk(s, d, nQueries, beam, rounds) { (q, _) =>
      q.select(col("qid")).withColumn("cid", lit(GraphEntry))
    }
    walk.states.dropRight(1)
      .foreach(org.apache.spark.sql.graft.Checkpoints.release)
    graft.functions.Caching.releaseAfterAction(
      walk.states.last
        .filter(col("cid") % NavDeleteMod =!= NavDeleteRes)
        .withColumn("rn", row_number().over(walk.w).cast("long"))
        .filter(col("rn") <= k)
        .orderBy("qid", "rn"),
      walk.caches: _*)
  }

  /** Coarse-layer stride: every CoarseMod-th vector forms the upper
    * layer the layered search picks its entry from (n/CoarseMod coarse
    * scans per query — the 2-layer slice of HNSW's log-layer hierarchy;
    * more layers repeat the same construction on the coarse set). */
  val CoarseMod = 32
  val LayeredRounds = 4

  /** THE LOG-LAYER RULE — the round-15 measured gap closed: a FIXED
    * two-layer hierarchy plus a FIXED round budget cannot hold recall
    * as the corpus grows (layered@4 fell 0.92 → 0.70-0.78 from sf0.01
    * to sf0.1, `bench/scaling_r15.json`). HNSW keeps rounds constant
    * by growing LAYERS ∝ log n (Malkov & Yashunin 2018 §4.1: level
    * assignment ~ floor(−ln(unif)·mL), mL = 1/ln M); this engine's
    * two-layer build keeps the GRAPH fixed and grows the WALK's budget
    * with the same quantity instead: the number of log-layers the
    * corpus WOULD need, `ceil(log n / log CoarseMod)` — each "missing"
    * layer costs the walk a constant number of extra rounds to cross
    * the coarse layer's grown diameter. Resolved at plan time from the
    * corpus count (a parquet metadata count — no data scan); every
    * layered default (batch walks, the decision table, the streaming
    * probe replica) derives from these two functions, so the serving
    * configs cannot drift apart. At the contract corpora (n = 500) the
    * rule reproduces the r15 constants exactly — rounds 4, beam 24 —
    * so every declared-query oracle is unchanged; at sf0.1 (n = 2000)
    * it gives rounds 5 / beam 36, measured ≥ 0.90 layered recall where
    * the fixed budget fell to 0.70-0.80 (`bench/scaling_r16.json`). */
  def logLayers(n: Long): Int = {
    // Integer form of ceil(log n / log CoarseMod): the smallest L ≥ 1
    // with CoarseMod^L ≥ n. Plan-time knobs must not depend on libm
    // ulps — the float form sits on exact-power boundaries at plausible
    // corpus sizes (n = 32^L), where a 1-ulp difference between
    // platforms (or vs the DuckDB oracle's ln) would flip the ceil and
    // change every layered default. Shift arithmetic is exact and
    // engine-independent (CoarseMod = 32 = 2^5).
    val target = math.max(n, CoarseMod)
    var l = 1
    var p = CoarseMod.toLong
    while (p < target && l < 12) { p <<= 5; l += 1 }
    l
  }

  /** rounds(n): [[logLayers]] + 2 — one round per would-be layer to
    * cross the coarse diameter, plus the two-round descent margin the
    * sf0.001/0.01 sweep measured as sufficient (layered@4 ≥ 0.90 at
    * logLayers = 2). Never below the r15 [[LayeredRounds]] floor. */
  def layeredRoundsFor(n: Long): Int =
    math.max(LayeredRounds, logLayers(n) + 2)

  /** beam(n): the efSearch-style budget ALSO grows ~log n — the r15
    * finding that per-edge signal thins as the banded graph grows
    * (beam 16 → 24 bought sf0.1 fixed-entry recall back) generalizes:
    * the banded ENTRY path saturated at 0.82 at sf0.1 under beam 24
    * regardless of rounds, and beam 32+ lifted it to 0.94 (measured,
    * r16 sweep). (GraphBeam/2) · logLayers = 24 at the contract
    * corpora (unchanged oracles), 36 at sf0.1, 48 at the 64 K corpus
    * the rule anticipates. Per-query walk work stays rounds × beam ×
    * out-degree ~ O(log² n) — corpus-size-independent per row. */
  def graphBeamFor(n: Long): Int =
    math.max(GraphBeam, (GraphBeam / 2) * logLayers(n))

  /** The rule's plan-time input: the corpus row count, from parquet
    * footers (COUNT pushes to metadata — no column scan). */
  private def corpusCount(s: SparkSession, d: String): Long =
    Tables.embeddings(s, d).count()

  /** SCALE-RULE TABLE (`eval_scale_rules`) — the plan-time knob
    * resolutions surfaced as a query: one row per rule with the input
    * count it read and the value it resolved. The ops companion of the
    * graph tier's decision tables: every other eval prices a knob's
    * OPTIONS; this one states what the engine will actually USE at the
    * current corpus, so a deployment can monitor its serving config the
    * same way it monitors recall (a corpus-growth step that moves a row
    * here is exactly the registry-rebuild / product-rebuild trigger the
    * maintenance cadence watches for). Cost: two metadata COUNTs plus a
    * 5-row literal frame — no scan, no shuffle, at any corpus size. The
    * rules are integer arithmetic end to end, so the DuckDB oracle can
    * reproduce them exactly (shift-based, no libm ceil at the
    * power-of-two boundaries both contract corpora sit on). */
  def scaleRulesEval(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val n = corpusCount(s, d)
    val nCoarse = Tables.embeddings(s, d)
      .filter(col("vec_id") % CoarseMod === 0).count()
    Seq(
      ("band_rows", n, bandRowsFor(n).toLong),
      ("entry_band_rows", nCoarse, entryBandRowsFor(nCoarse).toLong),
      ("graph_beam", n, graphBeamFor(n).toLong),
      ("layered_rounds", n, layeredRoundsFor(n).toLong),
      ("log_layers", n, logLayers(n).toLong)
    ).toDF("rule", "input_n", "resolved")
      .orderBy("rule")
  }

  /** Entry count of the layered search: the beam starts from the best
    * THREE coarse nodes, not one — HNSW's ef > 1 while descending. With
    * the v4 BANDED build the up/down links are approximate (a member
    * near a cell boundary may be assigned to its second-best cell), so
    * a single entry cell can miss the query's true neighborhood; the
    * extra entries cover exactly that boundary case for two more
    * entry-scan rows per query. Measured (DuckDB knob sweep over the
    * oracle chain): lifts layered@4 to 0.92 / 0.92 at sf0.001 / 0.01
    * where the single-entry walk on the banded graph trailed the
    * 6-round fixed walk by 2-3 brute hits; saturates past 3. */
  val LayeredEntryK = 3

  /** LAYERED graph search — [[graphTopK]] with HNSW's actual insight:
    * the entry point is not fixed but chosen PER QUERY as the best
    * [[LayeredEntryK]] of a deterministic coarse layer (vec_id ≡ 0 mod
    * [[CoarseMod]], e4-cosine rank with id ties — a query-partitioned
    * window over queries × n/CoarseMod rows). Round-13 measurement on
    * the raw banded graph: the better
    * entry bought recall at equal rounds (0.64 → 0.70@6) but never cut
    * rounds — the build lacked long-range links. Round 14's
    * [[navGraphShared]] build closes that finding: on the navigable
    * graph the layered walk CONVERGES AT [[LayeredRounds]] = 4 rounds
    * (0.90 recall at sf0.01, flat through round 6 — measured in
    * SimilaritySpec and the per-round DuckDB sweep), i.e. the hierarchy
    * now converts entry quality into fewer rounds, exactly the HNSW
    * claim. Coarse scan: n/CoarseMod broadcast dot products per
    * query.
    *
    * `beam`/`rounds` default 0 = the log-layer rule
    * ([[layeredRoundsFor]]/[[graphBeamFor]], resolved from the corpus
    * count at plan time) — the r16 fix for the fixed-budget recall
    * cliff; explicit values override (sweeps, evals). */
  def graphLayeredTopK(s: SparkSession, d: String, nQueries: Int = 10,
      k: Int = 5, beam: Int = 0, rounds: Int = 0): DataFrame = {
    val n = if (beam > 0 && rounds > 0) 0L else corpusCount(s, d)
    graphSearchFrom(s, d, nQueries, k,
      if (beam > 0) beam else graphBeamFor(n),
      if (rounds > 0) rounds else layeredRoundsFor(n)) { (q, c) =>
      val coarse = c.filter(col("vec_id") % CoarseMod === 0)
        .select(col("vec_id").as("cc"), col("v").as("cv"), col("nrm").as("cn"))
      val wEnt = Window.partitionBy("qid").orderBy(desc("cs"), asc("cc"))
      q.crossJoin(broadcast(coarse))
        .select(col("qid"), col("cc"),
          e4(dotD(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cs"))
        .withColumn("rn", row_number().over(wEnt))
        .filter(col("rn") <= LayeredEntryK)
        .select(col("qid"), col("cc").as("cid"))
    }
  }

  /** LAYERED search with a BANDED entry (`sim_graph_layered_banded`) —
    * the 100 TB serving form of [[graphLayeredTopK]]: that operator's
    * entry selection exact-scans the coarse layer per query (n /
    * [[CoarseMod]] dots — corpus-proportional serving work, the
    * documented 2-layer trade), while here the query's entry candidates
    * are its banded BUCKET-MATES among the coarse nodes (the same
    * sign-projection chain as the v4 build's up-links, at query time),
    * scored exactly and kept to the best [[LayeredEntryK]]; a query
    * whose every band misses the coarse layer falls back to the fixed
    * [[GraphEntry]], deterministically. Per-query entry work is then
    * bucket-bounded — INDEPENDENT of corpus size, like the walk itself —
    * so the whole serving path runs at 100 TB without a linear scan per
    * query. At test scale the banded entry occasionally picks a
    * second-best cell (the assignment-agreement trade measured on the
    * build); the walk's rounds absorb it — recall gated in the spec.
    * In production the coarse key registry is a maintained artifact;
    * here it derives from the corpus scan like every build input.
    *
    * `beam`/`rounds` default 0 = the log-layer rule, as in
    * [[graphLayeredTopK]] — this path is the production serving config,
    * so it is exactly the one that must survive corpus growth. */
  def graphLayeredBandedTopK(s: SparkSession, d: String,
      nQueries: Int = 10, k: Int = 5, beam: Int = 0,
      rounds: Int = 0): DataFrame = {
    val n = if (beam > 0 && rounds > 0) 0L else corpusCount(s, d)
    graphSearchFrom(s, d, nQueries, k,
      if (beam > 0) beam else graphBeamFor(n),
      if (rounds > 0) rounds else layeredRoundsFor(n)) { (q, c) =>
      val coarse = c.filter(col("vec_id") % CoarseMod === 0)
      // Entry geometry: the band rule over the COARSE layer, so the
      // per-query entry candidate set stays occupancy-bounded at any n
      // (4 at every contract corpus — oracles unchanged).
      val eRows = entryBandRowsFor(coarse.count())
      val ck = bandedKeys(coarse.select("vec_id", "v"), 8, eRows)
        .select(col("vec_id").as("cc"), col("band_idx"), col("band_key"))
      val qk = bandedKeys(
        q.select(col("qid").as("vec_id"), col("qv").as("v")), 8, eRows)
        .select(col("vec_id").as("qid"), col("band_idx"), col("band_key"))
      val cand = ck.join(broadcast(qk), Seq("band_idx", "band_key"))
        .filter(col("qid") =!= col("cc"))
        .select("qid", "cc").distinct()
      val wEnt = Window.partitionBy("qid").orderBy(desc("cs"), asc("cc"))
      val banded = cand
        .join(coarse.select(col("vec_id").as("cc"), col("v").as("cv"),
          col("nrm").as("cn")), "cc")
        .join(broadcast(q), "qid")
        .select(col("qid"), col("cc"),
          e4(dotD(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cs"))
        .withColumn("rn", row_number().over(wEnt))
        .filter(col("rn") <= LayeredEntryK)
        .select(col("qid"), col("cc").as("cid"))
      val fallback = q.select(col("qid"))
        .join(banded.select(col("qid")).distinct(), Seq("qid"), "left_anti")
        .withColumn("cid", lit(GraphEntry))
      banded.unionAll(fallback)
    }
  }

  /** Third-layer stride: every [[CoarseMod]]²-th vector forms L2 — the
    * next level of the log-layer pyramid (always non-empty: vec_id 0 —
    * the fixed [[GraphEntry]] — is on every layer, HNSW's top-level
    * entry invariant). 1 node at the contract corpora, 2 at sf0.1, 64
    * at the 64 K fixture — the corpus where L2 first becomes
    * measurable (the r14 #8 honest skip, now closable). */
  val L2Mod: Long = CoarseMod.toLong * CoarseMod

  /** Beam width of the coarse-layer descent — HNSW's ef-while-
    * descending, wider than the [[LayeredEntryK]] handoff so a
    * second-best region stays in play through the mini-walk. */
  val HierCoarseBeam = 6

  /** Rounds of the coarse-layer descent: the log-layer rule one level
    * up (the coarse layer is a corpus of nCoarse nodes whose "coarse
    * layer" is L2), floored at the 2 the contract corpora need.
    * 2 at nCoarse ≤ 32², 3 at the 64 K fixture (nCoarse = 2048). */
  def hierCoarseRoundsFor(nCoarse: Long): Int =
    math.max(3, logLayers(nCoarse))

  /** THREE-LAYER HIERARCHICAL SEARCH (`sim_graph_hier`) — the REAL
    * log-layer descent (Malkov & Yashunin 2018 §4: enter at the top
    * layer, greedy-walk each layer, descend), completing what
    * [[graphLayeredTopK]] flattens: that walk exact-scans the ENTIRE
    * coarse layer per query (n/[[CoarseMod]] dots — the documented
    * corpus-proportional 2-layer trade), while here the exact scan
    * moves up to L2 (n/[[L2Mod]] dots — 32× smaller, and each further
    * layer of the pyramid pushes it down another 32×) and the coarse
    * layer is WALKED, not scanned: a [[hierCoarseRoundsFor]]-round,
    * [[HierCoarseBeam]]-wide beam walk over the NAV GRAPH RESTRICTED
    * TO COARSE NODES — the highway edges the v4 build already plants
    * (plus any coarse-coarse local links), so the third layer needs NO
    * new product: L2 is a serving-time view, exactly as HNSW's upper
    * layers are sparser views of the same neighborhood structure. The
    * descent hands its best [[LayeredEntryK]] coarse nodes to the
    * standard L0 walk at the log-layer rule's budget.
    *
    * Per-query cost: n/1024 exact dots + rounds_c × [[HierCoarseBeam]]
    * × highway-degree (constant-bounded) + the L0 walk — the
    * exact-entry path's linear term reduced 32×. At the contract
    * corpora L2 = {0}, so the descent degenerates to a coarse walk
    * from the fixed entry — deterministic, oracle-expressible, and a
    * planted degenerate case in the spec.
    *
    * THE MEASURED SCALE FINDING (64 K fixture, r16): recall holds
    * 0.92/0.90/0.92 at the contract corpora but falls to 0.40 at 64 K
    * — and the failure is STRUCTURAL, not a knob: the id-stride L2 (64
    * nodes) cannot cover the corpus's 256 near-orthogonal clusters,
    * and greedy cosine descent has NO cross-cluster gradient (every
    * wrong-cluster candidate scores ~0, so more rounds/beam/entries
    * cannot steer — the r13 "short-range links" finding one level up,
    * now with the reason). The banded entry
    * ([[graphLayeredBandedTopK]], 0.86 at 64 K) does not navigate INTO
    * the right region, it HASHES into it — content-addressed entry is
    * the scale path on clustered embedding corpora, and this query
    * stays declared as the measured baseline that proves it
    * (`bench/scaling_r16.json` fixture_64k). */
  def graphHierTopK(s: SparkSession, d: String, nQueries: Int = 10,
      k: Int = 5, beam: Int = 0, rounds: Int = 0): DataFrame = {
    val n = if (beam > 0 && rounds > 0) 0L else corpusCount(s, d)
    graphSearchFrom(s, d, nQueries, k,
      if (beam > 0) beam else graphBeamFor(n),
      if (rounds > 0) rounds else layeredRoundsFor(n)) { (q, c) =>
      val coarse = c.filter(col("vec_id") % CoarseMod === 0)
      val rc = hierCoarseRoundsFor(coarse.count())
      // L2 entry: exact argmax over the n/L2Mod top-layer nodes — the
      // QUERY side is broadcast and the layer side scans distributed
      // (the reverse of the 2-layer exact entry's orientation: the
      // scanned side grows with n/1024, the broadcast side never does).
      val l2 = c.filter(col("vec_id") % L2Mod === 0)
        .select(col("vec_id").as("cid"), col("v").as("cv"),
          col("nrm").as("cn"))
      val wC = Window.partitionBy("qid").orderBy(desc("cs"), asc("cid"))
      // Bounded-side broadcasts: the descent beam is nQueries ×
      // HierCoarseBeam rows; the coarse layer grows with n/CoarseMod
      // and must not shuffle per round (guide §3.1, §2.4).
      def scoreCoarse(cand: DataFrame): DataFrame = cand
        .join(coarse.select(col("vec_id").as("cid"), col("v").as("cv"),
          col("nrm").as("cn")), "cid")
        .join(broadcast(q), "qid")
        .select(col("qid"), col("cid"),
          e4(dotD(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cs"))
      var cb = l2.crossJoin(broadcast(q))
        .select(col("qid"), col("cid"),
          e4(dotD(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cs"))
        .withColumn("rn", row_number().over(wC))
        .filter(col("rn") === 1)
        .select("qid", "cid", "cs")
      // Coarse-layer descent: beam walk over the coarse-restricted nav
      // subgraph (highway + coarse-coarse locals). rc ≤ 3 at any
      // conceivable corpus, so the unrolled plan stays shallow — no
      // checkpoints needed, unlike the L0 loop.
      val ce = navGraphShared(s, d).select(col("src"), col("dst"))
        .filter(col("src") % CoarseMod === 0 && col("dst") % CoarseMod === 0)
      // NO broadcast hints in this loop: it is UNROLLED (no per-round
      // checkpoints), so the beam subtree doubles per round — a forced
      // broadcast exchange materializes each copy as its own sequential
      // driver-side build job (measured +2.0 s on the full-bench chunk,
      // 4.1 -> 6.2 s). The hinted form is right only where rounds are
      // checkpoint-truncated, as in [[graphWalk]].
      for (_ <- 1 to rc) {
        val nbrs = cb.select(col("qid"), col("cid").as("src"))
          .join(ce, "src")
          .select(col("qid"), col("dst").as("cid"))
        val cand = cb.select("qid", "cid").unionAll(nbrs).distinct()
        cb = scoreCoarse(cand)
          .withColumn("rn", row_number().over(wC))
          .filter(col("rn") <= HierCoarseBeam)
          .select("qid", "cid", "cs")
      }
      cb.withColumn("rn", row_number().over(wC))
        .filter(col("rn") <= LayeredEntryK)
        .select("qid", "cid")
    }
  }

  /** ENTRY-STRATEGY DECISION TABLE (`eval_graph_entry`) — the graph
    * tier's serving-config table, next to the round-budget sweep
    * ([[graphBeamEval]]) and the other families' knob tables (IVF's
    * nprobe, LSH's plane geometry): the three entry strategies the
    * engine ships, each at ITS OWN production round budget, scored
    * against exact brute top-k —
    *
    *   - `fixed` @ [[GraphRounds]] × [[GraphBeam]]: the constant
    *     [[GraphEntry]], zero entry cost, the walk pays the distance;
    *   - `layered_exact` @ the log-layer rule's rounds × beam
    *     ([[layeredRoundsFor]]/[[graphBeamFor]]): best-[[LayeredEntryK]]
    *     of an exact coarse scan (n/[[CoarseMod]] dots per query);
    *   - `layered_banded` @ the same rule: best-[[LayeredEntryK]]
    *     among the query's coarse bucket-mates (bucket-bounded,
    *     corpus-size-independent — the 100 TB serving row).
    *
    * Each strategy walks at ITS OWN production config — the table
    * prices exactly what the engine would serve (at the contract
    * corpora the rule reproduces the fixed constants, so all three
    * share rounds-4/6 × beam-24 and the oracle is unchanged).
    *
    * ONE walk serves all three rows: the beam state is keyed by
    * (strategy, qid) — the [[evalNavInsert]] trick sideways — run to
    * the MAX budget with a PER-STRATEGY beam width (a literal
    * when/otherwise on the strategy column — resolved at plan time),
    * and each strategy's row reads the walk's state at its own round
    * prefix, so the table costs one keyed walk, not three.
    * Per-strategy rows report (strategy, rounds, hits, n_brute,
    * recall_e4). `beam` default 0 = per-strategy rule; an explicit
    * value pins every strategy (sweeps). */
  def evalGraphEntry(s: SparkSession, d: String, nQueries: Int = 10,
      k: Int = 5, beam: Int = 0): DataFrame = {
    val nCorpus = if (beam > 0) 0L else corpusCount(s, d)
    val fixedBeam = if (beam > 0) beam else GraphBeam
    val layeredBeam = if (beam > 0) beam else graphBeamFor(nCorpus)
    val layeredRounds =
      if (beam > 0) LayeredRounds else layeredRoundsFor(nCorpus)
    val c = corpus(s, d).persist(StorageLevel.MEMORY_AND_DISK)
    val edges = navGraphShared(s, d).select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val coarse = c.filter(col("vec_id") % CoarseMod === 0)
      .select(col("vec_id").as("cc"), col("v").as("cv"), col("nrm").as("cn"))
    val wEnt = Window.partitionBy("qid").orderBy(desc("cs"), asc("cc"))
    // fixed: the constant entry.
    val fixedEnt = q.select(col("qid"))
      .withColumn("cid", lit(GraphEntry))
      .withColumn("st", lit("fixed"))
    // layered_exact: graphLayeredTopK's entry rule.
    val exactEnt = q.crossJoin(broadcast(coarse))
      .select(col("qid"), col("cc"),
        e4(dotD(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cs"))
      .withColumn("rn", row_number().over(wEnt))
      .filter(col("rn") <= LayeredEntryK)
      .select(col("qid"), col("cc").as("cid"))
      .withColumn("st", lit("layered_exact"))
    // layered_banded: graphLayeredBandedTopK's entry rule (same coarse
    // band geometry).
    val eRows = entryBandRowsFor(coarse.count())
    val ck = bandedKeys(coarse.select(col("cc").as("vec_id"), col("cv").as("v")),
        8, eRows)
      .select(col("vec_id").as("cc"), col("band_idx"), col("band_key"))
    val qk = bandedKeys(q.select(col("qid").as("vec_id"), col("qv").as("v")),
        8, eRows)
      .select(col("vec_id").as("qid"), col("band_idx"), col("band_key"))
    val bandedBest = ck.join(broadcast(qk), Seq("band_idx", "band_key"))
      .filter(col("qid") =!= col("cc"))
      .select("qid", "cc").distinct()
      .join(coarse, "cc")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("cc"),
        e4(dotD(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cs"))
      .withColumn("rn", row_number().over(wEnt))
      .filter(col("rn") <= LayeredEntryK)
      .select(col("qid"), col("cc").as("cid"))
    val bandedEnt = bandedBest
      .unionAll(q.select(col("qid"))
        .join(bandedBest.select(col("qid")).distinct(), Seq("qid"),
          "left_anti")
        .withColumn("cid", lit(GraphEntry)))
      .withColumn("st", lit("layered_banded"))
    // ONE keyed walk to the max budget; each strategy reads its prefix.
    // Bounded-side broadcasts, as in [[graphWalk]] (guide §3.1, §2.4).
    def score(cand: DataFrame): DataFrame = broadcast(cand)
      .join(c.select(col("vec_id").as("cid"), col("v"), col("nrm")), "cid")
      .join(broadcast(q), "qid")
      .select(col("st"), col("qid"), col("cid"),
        e4(dotD(col("v"), col("qv")) / (col("nrm") * col("qn"))).as("sim_e4"))
    val w = Window.partitionBy("st", "qid").orderBy(desc("sim_e4"), asc("cid"))
    val budgets = Map("fixed" -> GraphRounds,
      "layered_exact" -> layeredRounds, "layered_banded" -> layeredRounds)
    // Per-strategy beam width, a plan-time literal on the strategy key —
    // one keyed walk still serves all three rows.
    val beamOf = when(col("st") === "fixed", lit(fixedBeam))
      .otherwise(lit(layeredBeam))
    var beamDf = score(fixedEnt.unionAll(exactEnt).unionAll(bandedEnt)
      .select("st", "qid", "cid")).localCheckpoint(true)
    val states = scala.collection.mutable.ArrayBuffer(beamDf)
    for (_ <- 1 to budgets.values.max) {
      val nbrs = broadcast(beamDf.select(col("st"), col("qid"), col("cid").as("src")))
        .join(edges, "src")
        .select(col("st"), col("qid"), col("dst").as("cid"))
      val cand = beamDf.select("st", "qid", "cid").unionAll(nbrs).distinct()
      beamDf = score(cand)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= beamOf)
        .select("st", "qid", "cid", "sim_e4")
        .localCheckpoint(true)
      states += beamDf
    }
    val brute = bruteTopK(s, d, nQueries, k).select(col("qid"), col("cid"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rows = budgets.toSeq.sortBy(_._1).map { case (st, r) =>
      val sel = states(r).filter(col("st") === st)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select(col("qid"), col("cid"), lit(1L).as("hit"))
      brute.join(broadcast(sel), Seq("qid", "cid"), "left")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"),
          count(lit(1)).as("n_brute"))
        .select(lit(st).as("strategy"), lit(r.toLong).as("rounds"),
          col("hits"), col("n_brute"),
          round(col("hits") * lit(10000.0) / col("n_brute")).cast("long")
            .as("recall_e4"))
    }
    // Release only the rounds NO strategy reads as its prefix — the
    // budget states stay alive until the consumer's terminal action.
    val needed = budgets.values.toSet
    states.zipWithIndex.collect { case (st, i) if !needed.contains(i) => st }
      .foreach(org.apache.spark.sql.graft.Checkpoints.release)
    graft.functions.Caching.releaseAfterAction(
      rows.reduce(_ unionAll _).orderBy("strategy"),
      (Seq(c, edges, brute) ++ needed.toSeq.sorted.map(states(_))): _*)
  }

  /** The walk's full trace: per-round beam states (index 0 = the scored
    * entries), the per-round candidate frames (what each round scored),
    * the ranking window, and the persisted frames the consumer releases
    * after its terminal action. ONE loop produces every graph-tier
    * result — the search tail, the layered variant, and the budget
    * sweep all read this trace, so "a budget row is a prefix of the
    * same walk" is true by construction, not by keeping copies in sync. */
  private case class GraphWalkTrace(
      states: IndexedSeq[DataFrame],
      cands: IndexedSeq[DataFrame],
      w: org.apache.spark.sql.expressions.WindowSpec,
      caches: Seq[DataFrame])

  /** The shared beam loop: entries(q, corpus) → fixed-round best-first
    * walk over the navigable-graph product ([[navGraphShared]]). Each
    * round reads the previous beam TWICE (expansion + union), so the
    * beam is checkpointed per round — without it the declarative plan
    * doubles per round (measured: rounds ≥ 8 ran minutes instead of
    * seconds). Same O(1)-plan recipe as the k-core/LPA loops. Every
    * per-round state is returned ALIVE; callers release what they keep. */
  private def graphWalk(s: SparkSession, d: String, nQueries: Int,
      beam: Int, rounds: Int)(
      entries: (DataFrame, DataFrame) => DataFrame): GraphWalkTrace = {
    val c = corpus(s, d).persist(StorageLevel.MEMORY_AND_DISK)
    val edges = navGraphShared(s, d).select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    // The beam/candidate side of every per-round join is BOUNDED
    // (nQueries × beam × out-degree rows — corpus-size-independent),
    // while edges and the corpus scale with n. The explicit broadcast
    // pins the build side: the checkpointed beam's LogicalRDD carries no
    // usable size estimate, so without the hint the planner shuffles the
    // corpus-sized side every round (guide §3.1, §2.4).
    def scoreOf(cands: DataFrame): DataFrame = broadcast(cands)
      .join(c.select(col("vec_id").as("cid"), col("v"), col("nrm")), "cid")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("cid"),
        e4(dotD(col("v"), col("qv")) / (col("nrm") * col("qn"))).as("sim_e4"))
    val w = Window.partitionBy("qid").orderBy(desc("sim_e4"), asc("cid"))
    var beamDf = scoreOf(entries(q, c).select("qid", "cid"))
      .localCheckpoint(true)
    val states = scala.collection.mutable.ArrayBuffer(beamDf)
    val cands = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (_ <- 1 to rounds) {
      val nbrs = broadcast(beamDf.select(col("qid"), col("cid").as("src")))
        .join(edges, "src")
        .select(col("qid"), col("dst").as("cid"))
      val cand = beamDf.select("qid", "cid").unionAll(nbrs).distinct()
      cands += cand
      beamDf = scoreOf(cand)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= beam)
        .select("qid", "cid", "sim_e4")
        .localCheckpoint(true)
      states += beamDf
    }
    GraphWalkTrace(states.toIndexedSeq, cands.toIndexedSeq, w, Seq(c, edges))
  }

  /** Search tail over [[graphWalk]]: release every non-final state
    * eagerly, rank the final beam, top-k. */
  private def graphSearchFrom(s: SparkSession, d: String, nQueries: Int,
      k: Int, beam: Int, rounds: Int)(
      entries: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val walk = graphWalk(s, d, nQueries, beam, rounds)(entries)
    walk.states.dropRight(1).foreach(org.apache.spark.sql.graft.Checkpoints.release)
    graft.functions.Caching.releaseAfterAction(
      walk.states.last
        .withColumn("rn", row_number().over(walk.w).cast("long"))
        .filter(col("rn") <= k)
        .orderBy("qid", "rn"),
      walk.caches: _*)
  }

  /** The round budgets the beam sweep prices (ascending; max sets the
    * walk length — every shorter budget is a prefix of the same walk). */
  val BeamSweep: Seq[Int] = Seq(2, 4, 6)

  /** GRAPH-SEARCH BUDGET DECISION TABLE — recall@k AND cumulative scored
    * candidates at every round budget in [[BeamSweep]], the graph path's
    * knob table next to [[ivfNprobeEval]] (nprobe), `minhashBandsPr`
    * (band geometry), and [[lshPlanesEval]] (plane geometry): rounds are
    * the efSearch-like budget a graph deployment tunes, recall is what
    * the budget buys, and scored_rows is what it costs. ONE walk runs to
    * the sweep's maximum; each budget's row reads the walk's state at
    * that prefix (a shorter budget IS a prefix of the same deterministic
    * walk), so the table costs one search, not |sweep|. */
  def graphBeamEval(s: SparkSession, d: String, nQueries: Int = 10,
      k: Int = 5, beam: Int = GraphBeam,
      sweep: Seq[Int] = BeamSweep): DataFrame = {
    require(sweep.nonEmpty && sweep == sweep.sorted && sweep.head >= 1,
      "sweep must ascend over round budgets >= 1")
    // ONE walk — literally [[graphTopK]]'s loop via [[graphWalk]], so a
    // budget row is a prefix of the same deterministic walk by shared
    // code, not by a hand-copied loop kept in sync (the round-13 advice).
    val walk = graphWalk(s, d, nQueries, beam, sweep.max) { (q, _) =>
      q.select(col("qid")).withColumn("cid", lit(GraphEntry))
    }
    val brute = bruteTopK(s, d, nQueries, k).select(col("qid"), col("cid"))
    val rowFrames = sweep.map { r =>
      val sel = walk.states(r)
        .withColumn("rn", row_number().over(walk.w))
        .filter(col("rn") <= k)
        .select(col("qid"), col("cid"), lit(1L).as("hit"))
      val hits = brute.join(broadcast(sel), Seq("qid", "cid"), "left")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"),
          count(lit(1)).as("n_brute"))
      val scanned = walk.cands.take(r).reduce(_ unionAll _)
        .select("qid", "cid").distinct()
        .agg(count(lit(1)).as("scored_rows"))
      hits.crossJoin(scanned)
        .select(lit(r.toLong).as("rounds"), col("hits"),
          round(col("hits") * lit(10000.0) / col("n_brute")).cast("long")
            .as("recall_e4"),
          col("scored_rows"))
    }
    graft.functions.Caching.releaseAfterAction(
      rowFrames.reduce(_ unionAll _).orderBy("rounds"),
      (walk.caches ++ walk.states): _*)
  }

  /** Recall monitor for the graph index — [[sqRecall]]'s shape over the
    * beam search: per-query recall@k of [[graphTopK]] against the exact
    * baseline. Every index family ships one (LSH:
    * eval_retrieval_recall; IVF: the nprobe sweep; IVF-PQ:
    * eval_ann_recall_served; SQ8: eval_sq_recall) — this is the number
    * to re-run after a graph rebuild or an entry/beam/round change. */
  def graphRecall(s: SparkSession, d: String, nQueries: Int = 10,
      k: Int = 5): DataFrame = {
    val brute = bruteTopK(s, d, nQueries, k).select(col("qid"), col("cid"))
    val g = graphTopK(s, d, nQueries, k)
      .select(col("qid").as("gq"), col("cid").as("gc"))
    brute
      .join(broadcast(g), col("qid") === col("gq") && col("cid") === col("gc"), "left")
      .groupBy("qid")
      .agg(sum(when(col("gc").isNotNull, 1L).otherwise(0L)).as("hits"),
        count(lit(1)).as("n_brute"))
      .select(col("qid"), col("hits"),
        round(col("hits") * lit(10000.0) / col("n_brute")).cast("long")
          .as("recall_e4"))
      .orderBy("qid")
  }

  /** The nprobe values the serving sweep prices (ascending; max bounds the
    * one probe-rank window the sweep computes). */
  val NprobeSweep: Seq[Long] = Seq(1L, 2L, 4L, 8L)

  /** SERVING-CONFIG DECISION TABLE — recall@k AND candidate-scan cost of
    * the IVF index at every nprobe in [[NprobeSweep]], in one pass. This
    * is THE knob an IVF deployment tunes (FAISS's `nprobe`): more probed
    * cells buy recall linearly in scan cost, and the right setting is a
    * measured trade, not a guess. One row per nprobe:
    *   - `hits` / `recall_e4` — top-k overlap with the exact baseline,
    *     summed over queries (denominator = total brute rows, matching
    *     the other recall monitors);
    *   - `cand_rows` / `scan_e4` — exact-scored candidates and their
    *     fraction of (queries × corpus), the per-query scan cost the
    *     probe setting purchases.
    * Cost shape: the corpus is assigned ONCE, each candidate is scored
    * ONCE (at its minimal probe depth — a vector lives in one cell, so
    * its entry depth is the cell's probe rank), and only then fanned out
    * to the |sweep| per-nprobe rankings — the sweep costs one extra
    * column, not |sweep| index scans. At 100 TB this runs as a sampled
    * offline job on the served index; the per-(nprobe, qid) rank windows
    * are bounded by cell occupancy × nprobe like the IVF query itself. */
  def ivfNprobeEval(s: SparkSession, d: String, nQueries: Int = 10,
      k: Int = 5, nCells: Int = IvfCells,
      sweep: Seq[Long] = NprobeSweep): DataFrame = {
    val maxP = sweep.max.toInt
    val c = corpus(s, d).persist(StorageLevel.MEMORY_AND_DISK)
    val cents = c.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell_id"), col("v").as("cv"),
        col("nrm").as("cnrm"))
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    // Probe ranking once, to the sweep's maximum depth.
    val wProbe = Window.partitionBy("qid").orderBy(desc("csim_e4"), asc("cell_id"))
    val probeRanks = q.crossJoin(broadcast(cents))
      .select(col("qid"), col("cell_id"),
        e4(dotD(col("qv"), col("cv")) / (col("qn") * col("cnrm"))).as("csim_e4"))
      .withColumn("pr", row_number().over(wProbe).cast("long"))
      .filter(col("pr") <= maxP)
      .select("qid", "cell_id", "pr")
    // Each candidate carries the probe depth at which it first appears
    // (one row per (qid, cid): a vector is assigned to exactly one cell).
    val cand = assignCells(c, cents).join(broadcast(probeRanks), "cell_id")
      .select(col("qid"), col("vec_id").as("cid"), col("pr"))
    // cand is occupancy × nprobe × nQueries rows at any corpus size —
    // broadcast it so the vector join-back streams the corpus instead of
    // shuffling it on cid (guide §3.1).
    val scored = broadcast(cand)
      .join(c.select(col("vec_id").as("cid"), col("v"), col("nrm")), "cid")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("cid"), col("pr"),
        e4(dotD(col("v"), col("qv")) / (col("nrm") * col("qn"))).as("sim_e4"))
    // Fan the scored candidates out to every sweep setting that reaches
    // their entry depth, then rank per (nprobe, qid).
    val expanded = scored
      .withColumn("nprobe", explode(typedlit(sweep)))
      .filter(col("pr") <= col("nprobe"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wSel = Window.partitionBy("nprobe", "qid").orderBy(desc("sim_e4"), asc("cid"))
    val sel = expanded
      .withColumn("rn", row_number().over(wSel))
      .filter(col("rn") <= k)
      .select(col("nprobe"), col("qid"), col("cid"), lit(1L).as("hit"))
    val bruteNp = bruteTopK(s, d, nQueries, k).select(col("qid"), col("cid"))
      .withColumn("nprobe", explode(typedlit(sweep)))
    val hits = bruteNp.join(broadcast(sel), Seq("nprobe", "qid", "cid"), "left")
      .groupBy("nprobe")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"),
        count(lit(1)).as("n_brute"))
    val candCounts = expanded.groupBy("nprobe").agg(count(lit(1)).as("cand_rows"))
    val denom = c.agg(count(lit(1)).as("n_corpus"))
      .crossJoin(q.agg(count(lit(1)).as("n_q")))
    graft.functions.Caching.releaseAfterAction(
      hits.join(candCounts, Seq("nprobe"))
        .crossJoin(broadcast(denom))
        .select(col("nprobe"), col("hits"),
          round(col("hits") * lit(10000.0) / col("n_brute")).cast("long")
            .as("recall_e4"),
          col("cand_rows"),
          round(col("cand_rows") * lit(10000.0) / (col("n_q") * col("n_corpus")))
            .cast("long").as("scan_e4"))
        .orderBy("nprobe"),
      c, expanded)
  }

  /** The (bands × bitsPerBand) geometries the LSH sweep prices — all
    * re-groupings of the SAME 32 sign projections ([[plane]]), so the
    * sweep measures banding geometry, not projection luck. */
  val LshPlaneSweep: Seq[(Int, Int)] = Seq((4, 8), (8, 4), (16, 2))

  /** LSH-GEOMETRY DECISION TABLE — recall@k AND candidate-scan cost of
    * the sign-projection index at every (bands × bits) split of the same
    * 32 hyperplanes, the vector-side completion of the tuning-table trio
    * (IVF: [[ivfNprobeEval]]'s nprobe; MinHash: `Dedup.minhashBandsPr`'s
    * band geometry). More bands of fewer bits widen buckets AND multiply
    * agreement chances — recall rises, candidate volume rises; the
    * production (8 × 4) setting should sit on the knee. One row per
    * geometry: hits/recall vs the brute baseline (denominator = total
    * brute rows) and cand_rows/scan_e4 (fraction of queries × corpus
    * exact-scored). Each distinct (qid, cid) pair is exact-scored ONCE
    * across geometries; membership fans out by config. */
  def lshPlanesEval(s: SparkSession, d: String, nQueries: Int = 10,
      k: Int = 5, sweep: Seq[(Int, Int)] = LshPlaneSweep): DataFrame = {
    val c = corpus(s, d).persist(StorageLevel.MEMORY_AND_DISK)
    val keysAll = sweep.map { case (b, r) =>
      bandedKeys(c.select("vec_id", "v"), b, r)
        .select(lit(b.toLong).as("bands"), lit(r.toLong).as("bits_per_band"),
          col("vec_id"), col("band_idx"), col("band_key"))
    }.reduce(_ unionAll _)
    val qk = keysAll.filter(col("vec_id") < nQueries)
      .select(col("bands"), col("bits_per_band"),
        col("vec_id").as("qid"), col("band_idx"), col("band_key"))
    // The query-side key set is |sweep| × bands × nQueries rows at any
    // corpus size — broadcast it so the corpus-sized key frame never
    // shuffles on the band key (guide §3.1).
    val cand = keysAll
      .join(broadcast(qk), Seq("bands", "bits_per_band", "band_idx", "band_key"))
      .select(col("bands"), col("bits_per_band"), col("qid"),
        col("vec_id").as("cid"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Exact-score each DISTINCT pair once, whatever geometries found it.
    // The candidate-pair side is occupancy-bounded — broadcast it and
    // stream the corpus for the vector join-back.
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qn"))
    val scores = broadcast(cand.select("qid", "cid").distinct())
      .join(c.select(col("vec_id").as("cid"), col("v"), col("nrm")), "cid")
      .join(broadcast(q), "qid")
      .select(col("qid"), col("cid"),
        e4(dotD(col("v"), col("qv")) / (col("nrm") * col("qn"))).as("sim_e4"))
    val wSel = Window.partitionBy("bands", "bits_per_band", "qid")
      .orderBy(desc("sim_e4"), asc("cid"))
    // scores and sel are COMPUTED join/window subtrees — no broadcast
    // hints on those (the round's rule: a hint on a computed subtree
    // forces a sequential driver-side build of the whole subtree;
    // measured +0.5-0.9 s here across two full-bench runs). Only the
    // simple bounded frames (qk, the distinct pair keys, q) stay hinted.
    val sel = cand.join(scores, Seq("qid", "cid"))
      .withColumn("rn", row_number().over(wSel))
      .filter(col("rn") <= k)
      .select(col("bands"), col("bits_per_band"), col("qid"), col("cid"),
        lit(1L).as("hit"))
    val cfg = s.range(1)
      .select(explode(typedlit(sweep.map { case (b, r) =>
        (b.toLong, r.toLong) })).as("cc"))
      .select(col("cc._1").as("bands"), col("cc._2").as("bits_per_band"))
    val bruteCfg = bruteTopK(s, d, nQueries, k).select(col("qid"), col("cid"))
      .crossJoin(broadcast(cfg))
    val hits = bruteCfg
      .join(sel, Seq("bands", "bits_per_band", "qid", "cid"), "left")
      .groupBy("bands", "bits_per_band")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"),
        count(lit(1)).as("n_brute"))
    val candCounts = cand.groupBy("bands", "bits_per_band")
      .agg(count(lit(1)).as("cand_rows"))
    val denom = c.agg(count(lit(1)).as("n_corpus"))
      .crossJoin(q.agg(count(lit(1)).as("n_q")))
    graft.functions.Caching.releaseAfterAction(
      hits.join(candCounts, Seq("bands", "bits_per_band"))
        .crossJoin(broadcast(denom))
        .select(col("bands"), col("bits_per_band"), col("hits"),
          round(col("hits") * lit(10000.0) / col("n_brute")).cast("long")
            .as("recall_e4"),
          col("cand_rows"),
          round(col("cand_rows") * lit(10000.0) / (col("n_q") * col("n_corpus")))
            .cast("long").as("scan_e4"))
        .orderBy("bands"),
      c, cand)
  }

  /** PRE-INDEX CORPUS DIAGNOSTIC — the health numbers an ANN deployment
    * reads BEFORE picking its compression and centering settings, one
    * summary row:
    *   - `norm_min/max/mean_e4` — the L2-norm spread. A wide spread says
    *     cosine and dot-product rankings will disagree and SQ8's global
    *     per-dimension [min, max] grid wastes resolution on outliers.
    *   - `aniso_e4` — mean cosine of every vector to the corpus mean
    *     direction (Ethayarajh 2019's anisotropy measure, "How Contextual
    *     are Contextualized Word Representations?", EMNLP). Near 1 means
    *     embeddings share a dominant direction and mean-centering before
    *     PQ/OPQ buys real quantization error back.
    *   - `center_ratio_e4` — ‖mean vector‖ / mean ‖v‖, the companion
    *     magnitude form (0 for a centered corpus, →1 for a collapsed one).
    *   - `dead_dims` — dimensions with zero spread (min = max over the
    *     corpus): pure codebook waste for PQ sub-spaces, and the first
    *     thing the OPQ allocation eval would route around.
    * Determinism: components quantize to e6 integers before the per-dim
    * sums (exact, order-independent — the trained-IVF recipe), the mean
    * DIRECTION is the integer sum vector itself (cosine is scale-
    * invariant, so no divide-back), and all reported moments are integer
    * sums with one pinned division. Scale shape: one corpus pass for the
    * 64 per-dim sums (bounded collect: Dim rows), one broadcast-literal
    * pass for the per-vector cosines — no shuffle wider than 64 groups. */
  /** The batch-trained health baseline: the corpus' e6-integer per-dim
    * SUM vector (the mean direction — cosine is scale-invariant, so the
    * un-divided sums serve directly) and its dead-dim count. One corpus
    * pass, Dim-row bounded collect. Shared by [[embeddingHealth]] and the
    * streaming intake monitor, so the baseline cannot drift between them. */
  def meanDirection(df: DataFrame): (Seq[Double], Long) = {
    val sums = df
      .select(posexplode(col("v")).as(Seq("d", "x")))
      .select(col("d"), round(col("x") * lit(1000000)).cast("long").as("x6"))
      .groupBy("d")
      .agg(sum("x6").as("sx"), min("x6").as("mn"), max("x6").as("mx"))
      .orderBy("d")
      .collect()
    (sums.map(_.getAs[Long]("sx").toDouble).toSeq,
      sums.count(r => r.getAs[Long]("mn") == r.getAs[Long]("mx")).toLong)
  }

  /** [[meanDirection]] over a corpus directory — the form the streaming
    * twin trains its baseline from. */
  def meanDirection(s: SparkSession, d: String): (Seq[Double], Long) =
    meanDirection(corpus(s, d))

  /** Per-vector health scores against a mean direction: e4 norm and e4
    * cosine to the (sum-vector) baseline — the SAME two expressions on a
    * static frame and on the intake stream. */
  def healthScoreCols(df: DataFrame, meanDir: Seq[Double]): DataFrame = {
    val mv = typedlit(meanDir)
    df.select(col("vec_id"),
      e4(col("nrm")).as("nrm_e4"),
      e4(dotD(col("v"), mv) / (col("nrm") * l2Norm(mv))).as("cos_e4"))
  }

  def embeddingHealth(s: SparkSession, d: String): DataFrame = {
    val c = corpus(s, d).persist(StorageLevel.MEMORY_AND_DISK)
    val (meanDir, deadDims) = meanDirection(c)
    val mv = typedlit(meanDir)
    val perVec = healthScoreCols(c, meanDir)
    graft.functions.Caching.releaseAfterAction(
      perVec.agg(
          count(lit(1)).as("n_vectors"),
          min("nrm_e4").as("norm_min_e4"),
          max("nrm_e4").as("norm_max_e4"),
          round(sum("nrm_e4") * lit(1.0) / count(lit(1))).cast("long")
            .as("norm_mean_e4"),
          round(sum("cos_e4") * lit(1.0) / count(lit(1))).cast("long")
            .as("aniso_e4"),
          // ‖Σv‖/(1e6·n) over (Σ‖v‖_e4)/(1e4·n) — the n and scale factors
          // cancel to the 100 below; numerator reuses the e6 sum vector.
          round(l2Norm(mv) * lit(100.0) / sum("nrm_e4")).cast("long")
            .as("center_ratio_e4"))
        .select(col("n_vectors"), lit(Dim.toLong).as("dim"),
          col("norm_min_e4"), col("norm_max_e4"), col("norm_mean_e4"),
          col("aniso_e4"), col("center_ratio_e4"),
          lit(deadDims.toLong).as("dead_dims")),
      c)
  }
}
