package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Streaming-twin MICRO-BENCH — the round-13 verdict's missing number:
  * every twin is spec-proven EQUAL to its batch form, but parity says
  * nothing about rate, and at 100 TB intake the number that matters is
  * sustained rows/sec against bounded state. This main replays the
  * corpus through the stateful twins that sit on the intake path and
  * prints ONE JSON line with, per twin:
  *
  *   - `rows` — input rows processed (whole corpus, replayed as a
  *     multi-trigger file stream);
  *   - `wall_sec` / `rows_per_sec` — end-to-end wall clock of the
  *     AvailableNow run and the sustained rate it implies;
  *   - `triggers`, `trig_mean_ms` / `trig_max_ms` — micro-batch count
  *     and per-trigger latency over the data-carrying triggers (the
  *     latency a Trigger.ProcessingTime deployment would observe);
  *   - `state_rows` / `state_bytes` — the final state-store footprint
  *     (0 for the stateless encode twins: their whole pitch is that
  *     artifacts ride as literals, not state).
  *
  * METHODOLOGY. The corpus is staged once, repartitioned into
  * [[StageFiles]] parquet files, and each twin streams it with
  * `maxFilesPerTrigger` = [[FilesPerTrigger]] under Trigger.AvailableNow
  * into a noop sink — so a run exercises the real multi-trigger
  * state-update path (not one giant batch) without sink-side
  * accumulation contaminating the timing. Rates include the first
  * trigger's plan/codegen cost; per-trigger numbers let a reader
  * separate that startup from the steady state. This is a single-node
  * local[N] measurement — the artifact's value is ROUND-OVER-ROUND
  * comparability and twin-vs-twin ranking, not absolute cluster rates.
  */
object StreamBench {

  val StageFiles = 16
  val FilesPerTrigger = 2

  private def deleteTree(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteTree)
    f.delete(): Unit
  }

  private case class Run(rows: Long, wallSec: Double, triggers: Int,
      trigMeanMs: Double, trigMaxMs: Long, stateRows: Long, stateBytes: Long)

  private def measure(spark: SparkSession, name: String, df: DataFrame,
      mode: String): Run = {
    val ckpt = Files.createTempDirectory(s"graft-sb-$name").toString
    val t0 = System.nanoTime()
    val q = df.writeStream
      .format("noop")
      .outputMode(mode)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    val prog = q.recentProgress.filter(_.numInputRows > 0)
    val trig = prog.map(_.durationMs.get("triggerExecution").longValue())
    val lastState = q.recentProgress.lastOption.map(_.stateOperators)
    q.stop()
    deleteTree(new java.io.File(ckpt))
    Run(
      rows = prog.map(_.numInputRows).sum,
      wallSec = wall,
      triggers = prog.length,
      trigMeanMs = if (trig.isEmpty) 0.0 else trig.sum.toDouble / trig.length,
      trigMaxMs = if (trig.isEmpty) 0L else trig.max,
      stateRows = lastState.map(_.map(_.numRowsTotal).sum).getOrElse(0L),
      stateBytes = lastState.map(_.map(_.memoryUsedBytes).sum).getOrElse(0L))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.sources.Sessions.localFromEnv()
    import graft.streaming.{TextStreams, VectorStreams}

    // Stage each table once as a multi-file stream directory so
    // AvailableNow yields StageFiles / FilesPerTrigger micro-batches.
    val stage = Files.createTempDirectory("graft-streambench").toString
    val docDir = s"$stage/documents"
    val vecDir = s"$stage/embeddings"
    spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(StageFiles).write.parquet(docDir)
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .repartition(StageFiles).write.parquet(vecDir)
    // Budget share: half the corpus's mean per-source token mass, so the
    // admission twin exercises BOTH outcomes (admits then rejects).
    val share = {
      val r = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(org.apache.spark.sql.functions.size(
          graft.functions.Fns.tokens(org.apache.spark.sql.functions.col("text")))
          .cast("long").as("n"),
          org.apache.spark.sql.functions.col("source"))
        .groupBy("source").agg(org.apache.spark.sql.functions.sum("n").as("t"))
        .agg(org.apache.spark.sql.functions.avg("t")).head().getDouble(0)
      math.max(1L, (r / 2).toLong)
    }

    val fpt = FilesPerTrigger
    val twins: Seq[(String, String, () => DataFrame)] = Seq(
      ("dedup", "append",
        () => TextStreams.dedupStream(spark, docDir, maxFilesPerTrigger = fpt)),
      ("neardup", "append",
        () => TextStreams.nearDupStream(spark, docDir,
          maxFilesPerTrigger = fpt).toDF()),
      ("pack_offsets", "update",
        () => TextStreams.packOffsetsStream(spark, docDir,
          maxFilesPerTrigger = fpt).toDF()),
      ("budget_admission", "update",
        () => TextStreams.budgetAdmissionStream(spark, docDir, share,
          maxFilesPerTrigger = fpt).toDF()),
      ("clean", "append",
        () => TextStreams.cleanStream(spark, docDir, maxFilesPerTrigger = fpt)),
      ("ivfpq_ingest_served", "append",
        () => VectorStreams.ivfPqIngestStreamServed(spark, vecDir, sfDir,
          maxFilesPerTrigger = fpt)),
      // The graph-ANN SERVING twin: rows/sec here is queries-per-second
      // answered against the RAM-resident navigable-graph replica.
      ("graph_probe", "append",
        () => VectorStreams.graphProbeStream(spark, vecDir, sfDir,
          maxFilesPerTrigger = fpt)))

    val results = twins.map { case (name, mode, mk) =>
      val r = measure(spark, name, mk(), mode)
      System.err.println(s"[streambench] $name: ${r.rows} rows in " +
        f"${r.wallSec}%.1f s (${r.rows / r.wallSec}%.0f rows/s), " +
        s"state ${r.stateRows} rows / ${r.stateBytes} B")
      name -> r
    }

    val per = results.map { case (n, r) =>
      f""""$n":{"rows":${r.rows},"wall_sec":${r.wallSec}%.3f,""" +
        f""""rows_per_sec":${r.rows / math.max(r.wallSec, 1e-9)}%.1f,""" +
        s""""triggers":${r.triggers},"trig_mean_ms":${math.round(r.trigMeanMs)},""" +
        s""""trig_max_ms":${r.trigMaxMs},"state_rows":${r.stateRows},""" +
        s""""state_bytes":${r.stateBytes}}"""
    }.mkString(",")
    println(s"""{"metric":"stream_twins","unit":"rows_per_sec",""" +
      s""""sf":"$sfDir","stage_files":$StageFiles,""" +
      s""""files_per_trigger":$FilesPerTrigger,"twins":{$per}}""")
    deleteTree(new java.io.File(stage))
    spark.stop()
  }
}
