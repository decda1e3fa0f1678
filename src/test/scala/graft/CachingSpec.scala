package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.storage.StorageLevel
import graft.functions.Caching

/** Release discipline: operators that persist shared intermediates hand
  * them to [[Caching.releaseAfterAction]], which unpersists them after the
  * caller's terminal action — so a long-lived session does not accumulate
  * every query's cached blocks (the round-7 advisory). The listener fires
  * on the async listener bus, so assertions poll for the level change. */
class CachingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Cross-suite isolation for the GLOBAL zero-persistent-RDD
    * assertions below: a prior suite in the same JVM may have
    * CONSTRUCTED (without acting on) operators whose internal persists
    * or checkpoint blocks `clearCache` cannot see — those are that
    * suite's artifacts, not this suite's leaks. Drain everything
    * already persisted before asserting, so these tests pass under any
    * `testOnly` suite combination, not just the full-run order. */
  private def drainForeignPersists(): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(r =>
      try r.unpersist(blocking = true) catch { case _: Throwable => () })
  }

  private def awaitReleased(df: org.apache.spark.sql.DataFrame): Boolean = {
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (df.storageLevel != StorageLevel.NONE && System.nanoTime() < deadline)
      Thread.sleep(50)
    df.storageLevel == StorageLevel.NONE
  }

  test("releaseAfterAction: cached frame is unpersisted after the result's action") {
    val cached = Seq(1L, 2L, 3L).toDF("x").persist(StorageLevel.MEMORY_AND_DISK)
    cached.count() // materialize
    assert(cached.storageLevel != StorageLevel.NONE)
    val result = Caching.releaseAfterAction(
      cached.groupBy().sum("x").withColumnRenamed("sum(x)", "s"), cached)
    assert(result.collect().map(_.getLong(0)).toSeq === Seq(6L))
    assert(awaitReleased(cached), "intermediate stayed cached after the action")
  }

  test("checkpoint-backed results survive unrelated actions, release on their own") {
    // The round-9 advisory fix: a localCheckpoint'd input has TRUNCATED
    // lineage, so releasing it on just any session action would strand
    // the result. Release must wait for an action whose plan actually
    // reads the checkpoint RDD.
    val ckpt = Seq(1L, 2L, 3L, 4L).toDF("x").localCheckpoint(true)
    val ckptRdds = ckpt.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    assert(ckptRdds.nonEmpty && ckptRdds.forall(_.getStorageLevel != StorageLevel.NONE))
    val result = Caching.releaseAfterAction(
      ckpt.groupBy().sum("x").withColumnRenamed("sum(x)", "s"), ckpt)
    // unrelated actions must NOT release the checkpoint blocks
    Seq(9L).toDF("y").count()
    Seq(9L).toDF("y").collect()
    Thread.sleep(500) // give the listener bus time to (wrongly) fire
    assert(ckptRdds.forall(_.getStorageLevel != StorageLevel.NONE),
      "an unrelated action released the checkpoint the result still needs")
    // ...and the result still computes correctly
    assert(result.collect().map(_.getLong(0)).toSeq === Seq(10L))
    // after the result's OWN action, the checkpoint blocks are freed
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    def live = ckptRdds.count(_.getStorageLevel != StorageLevel.NONE)
    while (live > 0 && System.nanoTime() < deadline) Thread.sleep(50)
    assert(live === 0, "checkpoint blocks survived the result's own action")
  }

  test("contract sweep: every caching operator self-releases after its action") {
    drainForeignPersists()
    // One query per operator family that persists an internal intermediate
    // (the round-8 sweep extended the discipline repo-wide). Each runs its
    // terminal action; no cached RDD may survive the listener.
    val wired = Seq("dedup_minhash_pairs", "dedup_simhash_pairs",
      "dedup_ngram_jaccard", "dedup_embedding_lsh", "sim_ivf_topk",
      "sim_lsh_topk", "sim_pq_topk", "events_funnel", "events_retention",
      "decontaminate", "decontaminate_bloom", "decontaminate_semantic",
      "pack_sequences_global", "tokenize_wordpiece", "wordcount_cms",
      "vocab_coverage", "text_langid_ngram", "text_lm_score",
      "text_ccnet_bucket", "text_tfidf_linear", "vocab_train", "tokenize_bpe",
      "tokenize_wordpiece_learned", "dedup_clusters", "dedup_clusters_best")
    for (name <- wired) {
      spark.catalog.clearCache()
      SparkEntry.queries(name)(spark, TestSpark.sf).collect()
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      def live = spark.sparkContext.getPersistentRDDs.size
      while (live > 0 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(live === 0, s"$name: $live persistent RDDs survived its action")
    }
  }

  test("materialize: pagerankConvergedDf survives TWO terminal actions") {
    drainForeignPersists()
    // The round-9 verdict's missing contract: checkpoint-backed results are
    // single-use by default — a library consumer that needs several actions
    // opts into `materialize`, which re-checkpoints the result into its own
    // blocks and releases the loop's internal checkpoints immediately.
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L), (2L, 3L, 1L), (3L, 2L, 1L))
      .toDF("src", "dst", "cnt")
    val ranks = operators.Graph.pagerankConvergedDf(
      edges, epsE12 = 1000000L, maxRounds = 50, materialize = true)
    val first = ranks.orderBy("node_id").collect()
    val second = ranks.orderBy("node_id").collect() // would throw on released blocks
    assert(first.toSeq === second.toSeq)
    assert(first.length === 3)
    assert(ranks.count() === 3L) // and a third, differently-shaped action
    org.apache.spark.sql.graft.Checkpoints.release(ranks) // caller-owned release
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    def live = spark.sparkContext.getPersistentRDDs.size
    while (live > 0 && System.nanoTime() < deadline) Thread.sleep(50)
    assert(live === 0, s"$live persistent RDDs survived the caller's release")
  }

  test("operator-level: substringDup's window cache self-releases after its action") {
    drainForeignPersists()
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta")).toDF("doc_id", "text")
    spark.catalog.clearCache()
    val out = operators.Dedup.substringDupDf(docs)
    out.collect()
    // The operator's internal persist is anonymous; observe the session-wide
    // effect instead: no cached RDD blocks survive the action + listener.
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    def live = spark.sparkContext.getPersistentRDDs.size
    while (live > 0 && System.nanoTime() < deadline) Thread.sleep(50)
    assert(live === 0, s"$live persistent RDDs survived the terminal action")
  }
}
