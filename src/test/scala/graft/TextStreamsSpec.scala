package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{EventStreams, TextStreams}

/** The streaming word count must agree with the batch/oracle pipeline. */
class TextStreamsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("streaming word count over a text dir equals the batch word count") {
    val dir = Paths.get("target", "test-scratch", "textstream")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("a.txt"), "The quick brown fox\njumps over the lazy dog\n")
    Files.writeString(dir.resolve("b.txt"), "the quick brown fox jumps again\n")
    val streamed = EventStreams.runToCompletion(
        spark, TextStreams.wordCountStream(spark, dir.toString), "t_wordcount")
      .as[(String, Long)].collect().toMap
    val batch = Report.wordcountTextDir(spark, dir.toString)
      .as[(String, Long)].collect().toMap
    assert(streamed === batch)
    assert(streamed("the") === 3L)
  }
}
