package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** The streaming twins must agree with their oracle-checked batch forms. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Planted event rows carry ts as ns-since-epoch Longs (the fixture
    * tuples' historical shape); convert to the TIMESTAMP_NTZ(µs) column the
    * current data drop ships so planted files read like real ones. Exact
    * under the session's pinned UTC timezone. */
  private def eventsDf(rows: Seq[(Long, Long, Long, String, Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))

  test("streaming tumbling counts equal the batch tumbling counts (AvailableNow)") {
    // the file-stream source lists a directory; stage the single-file batch
    // table as one
    val dir = Paths.get("target", "test-scratch", "events_sf")
    Files.createDirectories(dir)
    Files.copy(Paths.get(TestSpark.sf, "events.parquet"), dir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val stream = EventStreams.eventStream(spark, dir.toString)
    val out = EventStreams.runToCompletion(
        spark, EventStreams.tumblingCounts(stream), "t_tumbling")
      .as[(Long, String, Long)].collect().toSet
    val batch = operators.Events.tumblingCounts(spark, TestSpark.sf)
      .as[(Long, String, Long)].collect().toSet
    assert(out === batch)
  }

  test("streaming sliding counts equal the batch sliding counts (AvailableNow)") {
    val dir = Paths.get("target", "test-scratch", "events_sf")
    Files.createDirectories(dir)
    Files.copy(Paths.get(TestSpark.sf, "events.parquet"), dir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val stream = EventStreams.eventStream(spark, dir.toString)
    val out = EventStreams.runToCompletion(
        spark, EventStreams.slidingCounts(stream), "t_sliding")
      .as[(Long, Long, String, Long)].collect().toSet
    val batch = operators.Events.slidingCounts(spark, TestSpark.sf)
      .as[(Long, Long, String, Long)].collect().toSet
    assert(out === batch)
    // overlap sanity: sliding totals are WindowSlides× the event count
    assert(out.toSeq.map(_._4).sum ===
      operators.Events.WindowSlides * sources.Tables.events(spark, TestSpark.sf).count())
  }

  test("streaming anomaly monitor equals the batch anomaly on a replayed corpus") {
    val dir = Paths.get("target", "test-scratch", "events_sf")
    Files.createDirectories(dir)
    Files.copy(Paths.get(TestSpark.sf, "events.parquet"), dir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // Baseline trained batch-side on the same events the stream replays —
    // every completed window must then score exactly the batch rows.
    val staticEvents = sources.Tables.events(spark, TestSpark.sf)
    val out = EventStreams.runToCompletion(spark,
        EventStreams.anomalyStream(spark, dir.toString, staticEvents), "t_anomaly")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    val batch = operators.Events.anomaly(spark, TestSpark.sf)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(out === batch)
    assert(out.exists(_._5 == 1L) || out.forall(_._5 == 0L)) // flags well-formed
  }

  test("anomaly monitor surfaces event types absent from the trained baseline") {
    val us = 1000000L
    val t0 = 1700000000L * us
    val dir = Paths.get("target", "test-scratch", "events_novel")
    if (Files.exists(dir)) {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    // Stream carries a trained type and a NOVEL one the baseline never saw.
    eventsDf(Seq(
      (1L, t0 * 1000L, 1L, "known", 1.0, "{}"),
      (2L, (t0 + us) * 1000L, 1L, "novel", 1.0, "{}")))
      .coalesce(1).write.parquet(dir.toString)
    // Baseline trained on "known" only.
    val staticEvents = Seq(("known", t0), ("known", t0 + 3600L * us))
      .toDF("event_type", "ts_us")
    val rows = EventStreams.runToCompletion(spark,
        EventStreams.anomalyStream(spark, dir.toString, staticEvents), "t_novel")
      .as[(String, Long, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._4, r._5))).toMap
    // The novel type is EMITTED (not silently dropped), with no z (no
    // model) and the flag pinned on.
    assert(rows.contains("novel"), "novel event type vanished from the monitor")
    assert(rows("novel") === ((None, Some(1L))))
    // The trained type still scores through the shared zFlagged tail.
    assert(rows.contains("known") && rows("known")._1.isDefined)
  }

  test("mapGroupsWithState running user counts equal the batch group-by") {
    val dir = Paths.get("target", "test-scratch", "events_sf")
    Files.createDirectories(dir)
    Files.copy(Paths.get(TestSpark.sf, "events.parquet"), dir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val stream = EventStreams.eventStream(spark, dir.toString)
    val out = EventStreams.runToCompletion(
        spark, EventStreams.runningUserCounts(stream).toDF(), "t_running", mode = "update")
      .as[(Long, Long, Long)].collect().toSet
    val batch = sources.Tables.events(spark, TestSpark.sf)
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_events"),
        org.apache.spark.sql.functions.max("ts_us").as("last_us"))
      .as[(Long, Long, Long)].collect().toSet
    assert(out === batch)
  }

  test("watermark drops events later than the horizon; open windows stay unemitted in append mode") {
    val us = 1000000L
    val hour = 3600L * us
    val t0 = 1700000000L * us // µs; hour floor = 1699999200s → hour_idx 472222
    val dir = Paths.get("target", "test-scratch", "events_late")
    val ckpt = Paths.get("target", "test-scratch", "ckpt_late")
    val outDir = Paths.get("target", "test-scratch", "out_late")
    for (d <- Seq(dir, ckpt, outDir) if Files.exists(d)) {
      Files.walk(d).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    Files.createDirectories(dir)
    def writeBatch(name: String,
        rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
      val tmp = Paths.get("target", "test-scratch", s"tmp_$name")
      eventsDf(rows)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, dir.resolve(s"$name.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    // Append-mode file sink: supports checkpoint recovery (the memory sink
    // does not), and the output dir accumulates every finalized-window
    // emission across runs — exactly what the assertion needs.
    def run(): Unit = {
      val q = EventStreams
        .tumblingCounts(EventStreams.eventStream(spark, dir.toString))
        .writeStream
        .format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // Run 1: one event in hour 0, one in hour 3. After it commits the
    // checkpointed watermark is max event time - 1h = t0 + 2h10m.
    writeBatch("a_first", Seq(
      (1L, (t0 + 10L * 60L * us) * 1000L, 1L, "a", 1.0, "{}"),
      (2L, (t0 + 3L * hour + 10L * 60L * us) * 1000L, 1L, "a", 1.0, "{}")))
    run()
    // Run 2 resumes from the checkpoint (watermark restored): a LATE event
    // back in hour 0 (t0+20m < watermark → dropped before aggregation) plus
    // an on-time event in hour 3.
    writeBatch("b_second", Seq(
      (3L, (t0 + 20L * 60L * us) * 1000L, 1L, "a", 1.0, "{}"),
      (4L, (t0 + 3L * hour + 20L * 60L * us) * 1000L, 1L, "a", 1.0, "{}")))
    run()

    // Exactly ONE hour-0 emission across both runs, counting only the
    // on-time event — a non-dropped late row would either bump the count to
    // 2 or re-create evicted state and emit a duplicate hour-0 row. The
    // hour-3 window's end is past the final watermark, so append mode never
    // emits it — bounded state, no premature results.
    val hour0Idx = t0 / hour // floor of µs/3600e6 = epoch hours
    val all = spark.read.parquet(outDir.toString)
      .as[(Long, String, Long)].collect().toSeq
    assert(all === Seq((hour0Idx, "a", 1L)),
      s"expected one finalized hour-0 window without the late row, got $all")
  }

  test("stream-stream self-join pairs follow-up events within the gap; batch twin agrees") {
    val us = 1000L * 1000L
    val t0 = 1700000000L * 1000000L // µs
    // user 1: events at t0, +10m, +50m → within 30m only (1→2); (2→3) is 40m
    // apart and (1→3) 50m. user 2: a single event, no pair. Cross-user never.
    val rows = Seq(
      (1L, (t0) * 1000L, 1L, "a", 1.0, "{}"),
      (2L, (t0 + 10L * 60L * us) * 1000L, 1L, "a", 1.0, "{}"),
      (3L, (t0 + 50L * 60L * us) * 1000L, 1L, "a", 1.0, "{}"),
      (9L, (t0) * 1000L, 2L, "b", 1.0, "{}"))
    val dir = Paths.get("target", "test-scratch", "events_pairs")
    if (Files.exists(dir)) {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    eventsDf(rows)
      .coalesce(1).write.parquet(dir.toString)

    val expected = Set((1L, 1L, 2L, 10L * 60L * us))
    val streamed = EventStreams.runToCompletion(
        spark,
        EventStreams.pairedEvents(EventStreams.eventStream(spark, dir.toString)),
        "t_pairs", mode = "append")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed === expected)
    // batch twin: identical code over the batch read
    val batchEvents = spark.read.parquet(dir.toString)
      .withColumn("ts_us", org.apache.spark.sql.functions.expr(
        "unix_micros(cast(ts as timestamp))"))
      .withColumn("ts_ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.col("ts_us")))
    val batch = EventStreams.pairedEvents(batchEvents)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batch === expected)
  }

  test("streaming sessionize replay equals the batch lag+cumsum sessionizer on the corpus") {
    val dir = Paths.get("target", "test-scratch", "events_sf")
    Files.createDirectories(dir)
    Files.copy(Paths.get(TestSpark.sf, "events.parquet"), dir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val stream = EventStreams.eventStream(spark, dir.toString)
    val sessions = EventStreams.runToCompletion(
        spark, EventStreams.sessionize(stream), "t_sessions_corpus")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = operators.Events.sessionize(spark, TestSpark.sf)
      .select("user_id", "n_events", "start_us", "end_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(sessions === batch)
  }

  test("streaming funnel replay equals the batch funnel on the corpus") {
    val dir = Paths.get("target", "test-scratch", "events_sf")
    Files.createDirectories(dir)
    Files.copy(Paths.get(TestSpark.sf, "events.parquet"), dir.resolve("events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val stream = EventStreams.eventStream(spark, dir.toString)
    val updates = EventStreams.runToCompletion(spark,
        EventStreams.funnelStream(stream).toDF(), "t_funnel", mode = "update")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // update mode emits one row per user per touching micro-batch; the
    // latest (max n_seen) row per user is the final funnel state.
    val fin = updates.groupBy(_._1).map { case (_, rows) => rows.maxBy(_._2) }
      .map(r => (r._1, r._3, r._4, r._5, r._6)).toSet
    val batch = operators.Events.funnel(spark, TestSpark.sf)
      .select("user_id", "view_us", "click_us", "purchase_us", "stage")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(fin === batch)
  }

  test("streaming funnel: cross-batch arrival with an earlier late view re-resolves stages") {
    // Batch 1: click@t0+20m, purchase@t0+30m, view@t0+40m → after batch 1
    // the click/purchase precede the earliest view: stage 1. Batch 2 (a
    // second file): view@t0 arrives LATE → t1 drops to t0, the pruned
    // click@+20m becomes valid, then the purchase → stage 3. Exercises the
    // monotone-threshold pruning argument end to end across micro-batches.
    val us = 1000L * 1000L
    val t0 = 1700000000L * 1000000L
    val dir = Paths.get("target", "test-scratch", "events_funnel_late")
    if (Files.exists(dir)) {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    Files.createDirectories(dir)
    val ck = Paths.get("target", "test-scratch", "events_funnel_late_ck")
    if (Files.exists(ck)) {
      Files.walk(ck).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    // Stage each micro-batch as one flat parquet FILE in the watched dir
    // (the file source lists files, not nested write directories).
    def write(name: String, rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
      val tmp = Paths.get("target", "test-scratch", s"events_funnel_late_tmp_$name")
      eventsDf(rows)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(p =>
        p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, dir.resolve(s"$name.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    write("b1", Seq(
      (1L, (t0 + 20L * 60L * us) * 1000L, 7L, "click", 1.0, "{}"),
      (2L, (t0 + 30L * 60L * us) * 1000L, 7L, "purchase", 1.0, "{}"),
      (3L, (t0 + 40L * 60L * us) * 1000L, 7L, "view", 1.0, "{}")))
    // foreachBatch: the one sink that supports BOTH update mode (required
    // by mapGroupsWithState) and checkpoint recovery (required to resume
    // the funnel state across runs). Executes on the driver in local mode,
    // so the buffer capture is safe.
    def latest(): (Long, Long, Long, Long, Long, Long) = {
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long, Long, Long)]
      val q = EventStreams.funnelStream(
          EventStreams.eventStream(spark, dir.toString)).toDF()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          buf ++= df.as[(Long, Long, Long, Long, Long, Long)].collect()
          ()
        }
        .option("checkpointLocation", ck.toString)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      buf.maxBy(_._2)
    }
    val r1 = latest()
    assert(r1 === (7L, 3L, t0 + 40L * 60L * us, -1L, -1L, 1L), s"got $r1")
    write("b2", Seq((4L, t0 * 1000L, 7L, "view", 1.0, "{}")))
    val r2 = latest()
    assert(r2 === (7L, 4L, t0, t0 + 20L * 60L * us, t0 + 30L * 60L * us, 3L), s"got $r2")
  }

  test("streaming session windows split planted gaps exactly like the batch sessionizer") {
    // user 1: events at t0, t0+10min, t0+50min → sessions of 2 and 1 events
    // user 2: single event → one session of 1
    val us = 1000L * 1000L
    val t0 = 1700000000L * 1000000L // µs
    val rows = Seq(
      (10L, (t0) * 1000L, 1L, "a", 1.0, "{}"),
      (11L, (t0 + 10L * 60L * us) * 1000L, 1L, "a", 1.0, "{}"),
      (12L, (t0 + 50L * 60L * us) * 1000L, 1L, "a", 1.0, "{}"),
      (20L, (t0) * 1000L, 2L, "b", 1.0, "{}"))
    val dir = Paths.get("target", "test-scratch", "events_stream")
    if (Files.exists(dir)) {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
    eventsDf(rows)
      .coalesce(1).write.parquet(dir.toString)

    val stream = EventStreams.eventStream(spark, dir.toString)
    val sessions = EventStreams.runToCompletion(
        spark, EventStreams.sessionize(stream), "t_sessions")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (u, n, s, e) => (u, n, s, e) }.toSet
    assert(sessions === Set(
      (1L, 2L, t0, t0 + 10L * 60L * us),
      (1L, 1L, t0 + 50L * 60L * us, t0 + 50L * 60L * us),
      (2L, 1L, t0, t0)))

    // and the batch sessionizer agrees on the same planted data
    val planted = eventsDf(rows)
      .withColumn("ts_us", org.apache.spark.sql.functions.expr(
        "unix_micros(cast(ts as timestamp))"))
    val batchSessions = operators.Events.sessionizeDf(planted)
      .select("user_id", "n_events", "start_us", "end_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batchSessions === sessions)
  }
}
