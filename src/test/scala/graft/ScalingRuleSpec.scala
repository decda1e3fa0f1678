package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** The graph tier's two plan-time scale rules, pinned as pure functions
  * and as contract-corpus identities:
  *
  *  - the LOG-LAYER WALK rule (`layeredRoundsFor` / `graphBeamFor`):
  *    rounds and beam grow with ceil(log n / log CoarseMod), the layer
  *    count HNSW would add (r16, closes the r15 0.92 → 0.70 recall gap);
  *  - the BAND-GEOMETRY BUILD rule (`bandRowsFor` / `entryBandRowsFor`):
  *    rows-per-band grow with log2(n / KnnTargetOcc) so expected bucket
  *    occupancy stays constant — with FIXED 4-bit keys every bucket at
  *    64 K vectors exceeds KnnBucketCap and the banded kNN build
  *    silently empties (measured on `graft.VectorFixture`:
  *    0 edges fixed vs 260 K under the rule, `bench/scaling_r16.json`).
  *
  * Both rules MUST reproduce the r15 constants at every contract corpus
  * (n ≤ 2000, coarse ≤ 63) — that identity is what keeps all declared
  * graph-tier oracles byte-stable — and the build-rule identity is
  * asserted on real edges, not just the resolved knob. */
class ScalingRuleSpec extends AnyFunSuite {
  import TestSpark.spark

  test("log-layer walk rule: contract corpora reproduce the r15 constants; budgets grow ~log n") {
    // logLayers = ceil(log n / log 32)
    assert(Similarity.logLayers(500L) === 2)
    assert(Similarity.logLayers(2000L) === 3)
    assert(Similarity.logLayers(65536L) === 4)
    assert(Similarity.logLayers(1000000000L) === 6)
    // rounds(n) = max(LayeredRounds, logLayers + 2)
    assert(Similarity.layeredRoundsFor(500L) === Similarity.LayeredRounds)
    assert(Similarity.layeredRoundsFor(2000L) === 5)
    assert(Similarity.layeredRoundsFor(65536L) === 6)
    assert(Similarity.layeredRoundsFor(1000000000L) === 8)
    // beam(n) = max(GraphBeam, GraphBeam/2 * logLayers)
    assert(Similarity.graphBeamFor(500L) === Similarity.GraphBeam)
    assert(Similarity.graphBeamFor(2000L) === 36)
    assert(Similarity.graphBeamFor(65536L) === 48)
    assert(Similarity.graphBeamFor(1000000000L) === 72)
    // Degenerate corpora never resolve below the floors.
    assert(Similarity.layeredRoundsFor(0L) === Similarity.LayeredRounds)
    assert(Similarity.graphBeamFor(1L) === Similarity.GraphBeam)
  }

  test("band-geometry rule: 4 bits at every contract corpus, log2-grown beyond") {
    assert(Similarity.bandRowsFor(500L) === 4)
    assert(Similarity.bandRowsFor(2000L) === 4)   // exactly 16 × target occ
    assert(Similarity.bandRowsFor(4096L) === 6)
    assert(Similarity.bandRowsFor(65536L) === 10) // the VectorFixture corpus
    assert(Similarity.bandRowsFor(1000000000L) === 23)
    assert(Similarity.bandRowsFor(0L) === 4)      // floor, never below r15
    // The rule's invariant: expected occupancy n / 2^rows never exceeds
    // the target, at any corpus size — the property that keeps every
    // bucket under the celebrity cap in expectation.
    (0 to 40).foreach { p =>
      val n = 1L << p
      val rows = Similarity.bandRowsFor(n)
      assert(rows >= 4 && rows <= 63, s"rows out of range at n=$n")
      assert(n.toDouble / math.pow(2.0, rows) <= Similarity.KnnTargetOcc + 1e-9,
        s"expected occupancy exceeds target at n=$n (rows=$rows)")
    }
    // The entry-side twin is the same rule over the coarse count.
    assert(Similarity.entryBandRowsFor(63L) === 4)
    assert(Similarity.entryBandRowsFor(65536L / 32) === Similarity.bandRowsFor(2048L))
  }

  test("eval_scale_rules states exactly the resolutions the engine will use") {
    import spark.implicits._
    val t = Similarity.scaleRulesEval(spark, TestSpark.sf)
      .as[(String, Long, Long)].collect()
    assert(t.map(_._1).toSeq === Seq("band_rows", "entry_band_rows",
      "graph_beam", "layered_rounds", "log_layers"), "row set/order")
    val m = t.map(r => r._1 -> r).toMap
    val n = m("band_rows")._2
    val nc = m("entry_band_rows")._2
    assert(n > 0 && nc === (0L until n).count(_ % Similarity.CoarseMod == 0),
      "input counts: corpus and its coarse stride")
    assert(m("band_rows")._3 === Similarity.bandRowsFor(n))
    assert(m("entry_band_rows")._3 === Similarity.entryBandRowsFor(nc))
    assert(m("graph_beam")._3 === Similarity.graphBeamFor(n))
    assert(m("layered_rounds")._3 === Similarity.layeredRoundsFor(n))
    assert(m("log_layers")._3 === Similarity.logLayers(n))
  }

  test("contract identity: the rule-resolved kNN build equals the explicit r15 4-bit build") {
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    assert(Similarity.bandRowsFor(emb.count()) === 4,
      "precondition: the contract corpus resolves the r15 geometry")
    val key = Seq("src", "dst", "sim_e4", "rn")
    val ruled = Similarity.knnGraphDf(emb).select(key.head, key.tail: _*)
      .collect().map(_.toSeq).sortBy(_.mkString(","))
    val fixed = Similarity.knnGraphDf(emb, rows = 4).select(key.head, key.tail: _*)
      .collect().map(_.toSeq).sortBy(_.mkString(","))
    assert(ruled.nonEmpty, "empty contract kNN graph")
    assert(ruled === fixed, "rule-resolved build diverges from the r15 constants")
  }
}
