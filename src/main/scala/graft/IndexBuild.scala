package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Similarity

/** Offline ANN index build as a job — the vector-corpus sibling of
  * [[Ship]]'s corpus-shipping surface: embeddings in, the persisted
  * trained IVF-PQ index out (`index/` bucketable by cell, `centroids/`,
  * `codebook/` — see [[Similarity.ivfPqWriteIndex]]). Run it on the
  * rebuild schedule; [[Similarity.ivfPqServedTopK]] and
  * [[graft.streaming.VectorStreams.ivfPqIngestStreamServed]] then serve
  * batch queries and online ingest from the SAME versioned artifacts.
  */
object IndexBuild {

  def main(args: Array[String]): Unit = {
    val in = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else Similarity.ivfPqIndexDir(in)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.sources.Sessions.local(cpus)
    val t0 = System.nanoTime()
    Similarity.ivfPqWriteIndex(spark, in, out)
    val idx = spark.read.parquet(s"$out/index")
    val nVecs = idx.count()
    val nCells = idx.select("cell_id").distinct().count()
    println(s"Index built at $out: $nVecs vectors across $nCells cells " +
      s"(${Similarity.PqM} codes/vector)")
    println(f"Elapsed: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
