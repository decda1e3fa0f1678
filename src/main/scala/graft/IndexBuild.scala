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
  *
  *   runMain graft.IndexBuild [corpusDir] [indexDir]         # build in place
  *   runMain graft.IndexBuild --swap <corpusDir> <baseDir>   # rebuild + flip
  *
  * `--swap` is the REBUILD-UNDER-READERS mode (the drift monitor's
  * rebuild trigger): it builds a fresh version under `baseDir` and
  * atomically flips `baseDir/CURRENT` to it
  * ([[Similarity.ivfPqSwapIndex]]); readers that pass `baseDir` as their
  * `indexDir` resolve the pointer once per query, so in-flight queries
  * finish on the old version while new ones pick up the fresh index.
  */
object IndexBuild {

  def main(args: Array[String]): Unit = {
    val swap = args.headOption.contains("--swap")
    val rest = if (swap) args.drop(1) else args
    val in = if (rest.nonEmpty) rest(0) else "/root/testdata/sf0.001"
    val out = if (rest.length > 1) rest(1) else Similarity.ivfPqIndexDir(in)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.sources.Sessions.local(cpus)
    val t0 = System.nanoTime()
    val servedDir =
      if (swap) {
        val vdir = Similarity.ivfPqSwapIndex(spark, in, out)
        println(s"CURRENT at $out now points to $vdir")
        vdir
      } else { Similarity.ivfPqWriteIndex(spark, in, out); out }
    val idx = spark.read.parquet(s"$servedDir/index")
    val nVecs = idx.count()
    val nCells = idx.select("cell_id").distinct().count()
    println(s"Index built at $servedDir: $nVecs vectors across $nCells cells " +
      s"(${Similarity.PqM} codes/vector)")
    println(f"Elapsed: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
