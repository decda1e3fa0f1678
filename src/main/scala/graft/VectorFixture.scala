package graft

/** Deterministic CLUSTERED vector fixture — the corpus the graph tier's
  * scale rules are measured on beyond the driver testdata (the
  * [[TextFixture]] precedent: seeded, public recipe, no RNG state).
  * n vectors in `nCenters` clusters: center c is a pseudo-random
  * [-0.5, 0.5)^Dim point (the same LCG shape as
  * [[graft.operators.Similarity.plane]] — public arithmetic, not a
  * library RNG), member i joins cluster knuthHash(i) % nCenters and
  * sits at center + noise · unit(i). The HASH assignment is
  * load-bearing: a modular assignment (i % nCenters) aliases with the
  * engine's id-stride coarse layer (vec_id % CoarseMod), leaving most
  * clusters without a coarse node — a fixture pathology, not an engine
  * property (measured: recall pinned at 0.30 before the fix). At the
  * default noise 0.25 the intra-cluster cosine is ~0.94 against ~0
  * across clusters, so brute top-k is cluster-mates — an ANN-meaningful
  * geometry at any n — while a cluster's band keys still vary enough
  * that bucket collisions cross clusters. Schema matches the driver's
  * embeddings table (vec_id BIGINT, embedding ARRAY<FLOAT>, label INT
  * = the cluster).
  *
  * Usage: `graft.VectorFixture <outDir> [n] [nCenters] [noise]` — writes
  * `<outDir>/embeddings.parquet` (8 files for scan parallelism). At
  * the default 65,536 × 256 the band-geometry rule resolves 10
  * rows/band (a pure-cluster bucket holds ~256 < the 400 cap), every
  * cluster holds ~8 coarse-stride nodes, and the log-layer rule
  * resolves rounds 6 / beam 48 — the 32× scaling step the contract
  * corpora cannot measure. */
object VectorFixture {
  val Dim = 64

  /** Knuth multiplicative hash — decorrelates cluster from id stride. */
  private def clusterOf(i: Int, nCenters: Int): Int =
    (((i.toLong * 2654435761L) >>> 7) % nCenters).toInt

  /** One pseudo-random coordinate in [-0.5, 0.5). NOT the single-step
    * plane() LCG: that map is LINEAR in its seed, so center coordinates
    * drawn from it form an arithmetic progression mod p — the 256
    * centers came out nearly collinear (~40 distinct sign patterns per
    * band instead of ~256, 97 % of rows in dropped celebrity buckets;
    * measured before the fix). The splitmix64 finalizer (Steele,
    * Lea & Flood 2014 — public-domain arithmetic) mixes all bits. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def unit(seed: Long, k: Int): Double =
    (mix(seed * Dim + k + 1) >>> 11).toDouble / (1L << 53).toDouble - 0.5

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val n = if (args.length > 1) args(1).toInt else 65536
    val nCenters = if (args.length > 2) args(2).toInt else 256
    val noise = if (args.length > 3) args(3).toDouble else 0.25
    val spark = graft.sources.Sessions.local(
      math.min(32, Runtime.getRuntime.availableProcessors).toString,
      logLevel = "ERROR")
    import spark.implicits._
    // Center seeds and member-noise seeds live in disjoint ranges so no
    // coordinate stream is reused (centers: 1..nCenters; members:
    // 10^7 + i).
    val rows: Seq[(Long, Array[Float], Int)] = (0 until n).map { i =>
      val c = clusterOf(i, nCenters)
      val v = Array.tabulate(Dim) { k =>
        (unit(c + 1L, k) + noise * unit(10000000L + i, k)).toFloat
      }
      (i.toLong, v, c)
    }
    rows.toDF("vec_id", "embedding", "label")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    println(s"[fixture] wrote $n vectors, $nCenters clusters, dim $Dim " +
      s"-> $outDir/embeddings.parquet")
    spark.stop()
  }
}
