package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** The streaming twins must agree with their oracle-checked batch forms. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

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
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
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
    val planted = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts_us", org.apache.spark.sql.functions.expr("ts div 1000"))
    val batchSessions = operators.Events.sessionizeDf(planted)
      .select("user_id", "n_events", "start_us", "end_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batchSessions === sessions)
  }
}
