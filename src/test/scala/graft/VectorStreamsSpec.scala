package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{EventStreams, VectorStreams}
import graft.operators.Similarity

/** The streaming IVF-PQ index ingest must produce bit-identical rows to
  * the batch index build — the train-offline/serve-online contract. */
class VectorStreamsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("streaming ivfpq ingest equals the batch index build row for row") {
    val dir = Paths.get("target", "test-scratch", "vecstream")
    Files.createDirectories(dir)
    Files.copy(Paths.get(TestSpark.sf, "embeddings.parquet"),
      dir.resolve("embeddings.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val streamed = EventStreams.runToCompletion(
        spark,
        VectorStreams.ivfPqIngestStream(spark, dir.toString, TestSpark.sf),
        "t_vecingest", mode = "append")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    val batch = Similarity.ivfPqTrainedCodes(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq,
      "streamed index rows diverge from the batch build")
    // sanity: the index is not degenerate — multiple cells and codes occur
    assert(streamed.map(_._2).distinct.length > 1)
    assert(streamed.map(_._3).distinct.length > 1)
  }

  test("the per-row encoder matches the batch argmin on a static frame too") {
    // Same encoder, batch frame in, no streaming machinery — pins that the
    // literal-array expressions are the load-bearing equality, not the
    // stream harness.
    val (cents, cb, full, nv, af, rsubs) =
      Similarity.ivfPqTrainedModel(spark, TestSpark.sf)
    Seq(full, nv, af, rsubs).foreach(_.unpersist(false))
    val viaColumns = VectorStreams.ivfPqEncodeColumns(
        graft.sources.Tables.embeddings(spark, TestSpark.sf), cents, cb)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    val batch = Similarity.ivfPqTrainedCodes(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(viaColumns.toSeq === batch.toSeq)
  }
}
