package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Events

/** Planted ordering checks for the conversion funnel: the ORDER of events
  * decides conversion, not their mere presence. */
class EventsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("funnel: stage timestamps respect strict event order per user") {
    val events = Seq(
      // user 1: full ordered funnel; second view/click later are ignored
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      (1L, "view", 150L), (1L, "click", 250L),
      // user 2: purchase BEFORE the click — does not convert to stage 3
      (2L, "view", 100L), (2L, "purchase", 150L), (2L, "click", 200L),
      // user 3: click before any view — stuck at stage 1
      (3L, "click", 50L), (3L, "view", 100L),
      // user 4: no view at all — stage 0
      (4L, "click", 100L), (4L, "purchase", 200L),
      // user 5: click at the SAME instant as the view is not strictly after
      (5L, "view", 100L), (5L, "click", 100L)
    ).toDF("user_id", "event_type", "ts_us")
    val got = Events.funnelDf(events)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 100L, 200L, 300L, 3L),
      (2L, 100L, 200L, -1L, 2L),
      (3L, 100L, -1L, -1L, 1L),
      (4L, -1L, -1L, -1L, 0L),
      (5L, 100L, -1L, -1L, 1L)))
  }
}
