package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.streaming.{EventStreams, VectorStreams}

/** The index-DELETION contract (`sim_nav_delete`): a tombstoned vector
  * is never returned, survivors re-rank into the freed slots, the
  * streaming probes filter live, and a rebuild over the survivor corpus
  * carries no trace of the deleted ids — serve-time tombstones now,
  * compaction at the next product rebuild. */
class NavDeleteSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def isTomb(id: Long): Boolean =
    id % Similarity.NavDeleteMod == Similarity.NavDeleteRes

  private lazy val del = Similarity.navDeleteTopK(spark, TestSpark.sf)
    .select("qid", "cid", "sim_e4", "rn")
    .as[(Long, Long, Long, Long)].collect()

  test("no tombstoned id is ever returned; every query keeps k ranked rows") {
    assert(del.length === 10 * 5)
    assert(del.forall(r => !isTomb(r._2)), "a tombstoned cid was served")
    assert(del.groupBy(_._1).forall { case (_, rows) =>
      rows.map(_._4).sorted.toSeq == (1L to 5L)
    }, "survivor ranks are not dense 1..k")
  }

  test("result equals the unfiltered walk's beam with tombstones removed — survivors re-rank") {
    // The full ranked final beam of the SAME walk (k = beam), filtered
    // by the tombstone rule and re-ranked, must reproduce sim_nav_delete
    // exactly — the filter is at SELECTION time, traversal unchanged.
    val full = Similarity.graphTopK(spark, TestSpark.sf, k = Similarity.GraphBeam)
      .select("qid", "cid", "sim_e4", "rn")
      .as[(Long, Long, Long, Long)].collect()
    val expected = full.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      rows.sortBy(_._4).filterNot(r => isTomb(r._2)).take(5).zipWithIndex
        .map { case (r, i) => (qid, r._2, r._3, i + 1L) }
    }.sortBy(r => (r._1, r._4))
    assert(del.sortBy(r => (r._1, r._4)).toSeq === expected,
      "sim_nav_delete is not the tombstone-filtered re-ranking of the walk")
    // Query 7 IS tombstoned (7 % 40 = 7): the unfiltered walk returns
    // its own vector at rank 1 (cosine 1.0); the filtered query must
    // not — a guaranteed planted re-rank, not a statistical one.
    val q7full = full.filter(r => r._1 == 7L && r._4 == 1L)
    assert(q7full.nonEmpty && q7full.head._2 == 7L,
      "precondition: the unfiltered walk finds query 7's own vector first")
    val q7del = del.filter(_._1 == 7L)
    assert(q7del.forall(_._2 != 7L), "query 7's deleted self was served")
    assert(q7del.count(_._4 == 1L) == 1, "query 7 lost its rank-1 slot")
  }

  test("survivor recall holds after the filter") {
    // Survivor ground truth: brute top-10 per query minus tombstones,
    // first 5 — valid while < 6 of any query's brute top-10 are
    // tombstoned (rate 1/40; asserted, not assumed).
    val b10 = Similarity.bruteTopK(spark, TestSpark.sf, 10, 10)
      .select("qid", "cid", "rn").as[(Long, Long, Long)].collect()
    assert(b10.groupBy(_._1).forall(_._2.count(r => isTomb(r._2)) < 6),
      "precondition: too many tombstones in a brute top-10")
    val truth = b10.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      rows.sortBy(_._3).filterNot(r => isTomb(r._2)).take(5)
        .map(r => (qid, r._2))
    }.toSet
    val got = del.map(r => (r._1, r._2)).toSet
    val recall = truth.count(got.contains).toDouble / truth.size
    assert(recall >= 0.8,
      f"survivor recall $recall%.2f fell below 0.8 after tombstone filtering")
  }

  test("streaming graph probe filters tombstones live, bit-equal to the batch query") {
    val dir = Paths.get("target", "test-scratch", "vecstream_navdelete")
    Files.createDirectories(dir)
    Files.copy(Paths.get(TestSpark.sf, "embeddings.parquet"),
      dir.resolve("embeddings.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val tombs = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .select(col("vec_id")).as[Long].collect().filter(isTomb).toSet
    assert(tombs.nonEmpty)
    val streamed = EventStreams.runToCompletion(
        spark,
        VectorStreams.graphProbeStream(spark, dir.toString, TestSpark.sf,
          tombstones = tombs),
        "t_navdelprobe", mode = "append")
      .as[(Long, Long, Long, Long)].collect()
    assert(streamed.forall(r => !tombs.contains(r._2)),
      "the online probe served a tombstoned id")
    val streamedQ = streamed.filter(_._1 < 10).sortBy(r => (r._1, r._4))
    assert(streamedQ.toSeq === del.sortBy(r => (r._1, r._4)).toSeq,
      "online tombstone-filtered walk diverged from sim_nav_delete")
  }

  test("compaction: a rebuild over the survivor corpus carries no trace of the deleted ids") {
    // The tombstone set is a serving-layer overlay; at the next product
    // rebuild the corpus table no longer contains the deleted rows.
    // Rebuild the navigable graph from a survivor-only corpus dir and
    // pin the contract: no tombstoned endpoint anywhere, every survivor
    // still attached (out-degree >= 1 — the up-link guarantees it), and
    // the fixed entry still present to serve walks.
    val dir = Paths.get("target", "test-scratch", "navdelete_compact")
    Files.createDirectories(dir)
    spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .filter(col("vec_id") % Similarity.NavDeleteMod =!= Similarity.NavDeleteRes)
      .coalesce(1)
      .write.mode("overwrite").parquet(dir.resolve("embeddings.parquet").toString)
    val rebuilt = Similarity.navGraphShared(spark, dir.toString)
      .select("src", "dst").as[(Long, Long)].collect()
    spark.catalog.clearCache()
    assert(rebuilt.nonEmpty)
    assert(rebuilt.forall(e => !isTomb(e._1) && !isTomb(e._2)),
      "a rebuilt edge touches a deleted id")
    val survivors = spark.read
      .parquet(dir.resolve("embeddings.parquet").toString)
      .select(col("vec_id")).as[Long].collect().toSet
    val withOut = rebuilt.map(_._1).toSet
    assert((survivors - Similarity.GraphEntry).subsetOf(withOut),
      "a survivor lost all out-edges in the compacted rebuild")
    assert(withOut.contains(Similarity.GraphEntry),
      "the fixed entry vanished from the compacted graph")
  }
}
