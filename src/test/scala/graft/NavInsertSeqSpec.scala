package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** The multi-batch insert contract (`eval_nav_insert_seq`): recall
  * non-degrading as sequential batches attach, and out-degree growth
  * bounded by the additive-delta constants — the compaction-cadence
  * numbers, pinned. */
class NavInsertSeqSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // (batch, n_edges, hits, n_brute, recall_e4, max_out_deg, mean_deg_e4)
  private lazy val rows = Similarity.evalNavInsertSeq(spark, TestSpark.sf)
    .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    .sortBy(_._1)

  test("one row per cumulative state, edges strictly grow as batches land") {
    assert(rows.map(_._1).toSeq === (0L to Similarity.NavSeqBatches.toLong))
    assert(rows.sliding(2).forall { case Array(a, b) => b._2 > a._2 },
      "a batch added no edges")
    assert(rows.forall(r => r._7 > 0L))
  }

  test("recall is restored as the arrivals attach — never below the arrival-blind base") {
    // On the base graph every arrival is invisible: a brute hit that IS
    // an arrival cannot be found, capping recall. Each delta makes its
    // batch searchable; by the final state recall must be back at the
    // full-build level, and no intermediate state may fall below base.
    val base = rows.head._5
    assert(rows.tail.forall(_._5 >= base),
      s"a post-insert state fell below the arrival-blind base: ${rows.toSeq}")
    assert(rows.last._5 >= 8500L,
      s"final recall ${rows.last._5} below 0.85 after all batches attached")
  }

  test("degree growth is bounded by the additive-delta constants") {
    // The rebuild's own cap bounds the base state (edge-filtering can
    // only lower it); per batch an existing node gains at most the
    // mirror + down window caps, an arrival starts below the rebuild
    // cap — so max deg grows by at most (NavMirrorCap + NavDownCap)
    // per batch. THE compaction-cadence number: batches-until-rebuild
    // = (degree budget - build cap) / 32.
    val buildCap = Similarity.KnnK + Similarity.NavMirrorCap + 1 +
      Similarity.NavDownCap + Similarity.NavHighwayK
    assert(rows.head._6 <= buildCap,
      s"base max out-degree ${rows.head._6} exceeds the rebuild cap $buildCap")
    val perBatch = Similarity.NavMirrorCap + Similarity.NavDownCap
    for (Array(a, b) <- rows.sliding(2))
      assert(b._6 <= a._6 + perBatch,
        s"batch ${b._1}: max out-degree ${b._6} grew past " +
          s"${a._6} + $perBatch — an uncapped delta class leaked")
  }
}
