package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ArtifactCache

/** Trust tests for the measurement/caching plumbing itself: the isolated
  * bench's child-JSON round trip (a silent parse gap would drop queries
  * from the merged artifact) and the ArtifactCache publish protocol (a
  * race mishandled here corrupts every build-once consumer at once). */
class BenchHarnessSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("child JSON round trip: every value shape the child can print parses back") {
    // Negative times mark failed queries; tiny values print in scientific
    // notation with negative exponents; both must survive the round trip.
    val line = """{"metric":"total","value":3.5,"unit":"sec","queries":{""" +
      """"q_ok":1.25,"q_failed":-0.75,"q_tiny":1.4E-5,"q_big":1.0E2},""" +
      """"failed":["q_failed"],"sf":"/x"}"""
    val parsed = Bench.parseChildJson(line)
    assert(parsed.isDefined, "parser rejected a well-formed child line")
    val byName = parsed.get.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byName("q_ok") === ((1.25, true)))
    assert(byName("q_failed") === ((-0.75, false)))
    assert(byName("q_tiny")._1 === 1.4e-5)
    assert(byName("q_big")._1 === 100.0)
    // garbage and empty-queries lines must return None, not a partial parse
    assert(Bench.parseChildJson("""{"metric":"total","queries":{},"failed":[]}""").isEmpty)
    assert(Bench.parseChildJson("not json at all").isEmpty)
  }

  test("ArtifactCache: builds once, rereads without rebuilding, key includes params") {
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft-ac-spec")
    val dir = tmpRoot.resolve("product").toString
    var builds = 0
    def build() = { builds += 1; Seq((1L, 2L), (3L, 4L)).toDF("a", "b") }
    val first = ArtifactCache.getOrBuild(spark, dir)(build()).count()
    val second = ArtifactCache.getOrBuild(spark, dir)(build()).count()
    assert(first === 2L && second === 2L)
    assert(builds === 1, "second consumer rebuilt a published product")
    // params and the key-file identity both move the content address
    val f = java.nio.file.Files.createTempFile("graft-ac-key", ".parquet").toFile
    val p1 = ArtifactCache.path("t", f, Seq(1))
    val p2 = ArtifactCache.path("t", f, Seq(2))
    assert(p1 != p2, "param change did not move the cache key")
    assert(ArtifactCache.path("t", f, Seq(1)) === p1, "path is not a pure function")
  }

  test("ArtifactCache: losing the publish race discards quietly, keeps the winner") {
    val tmpRoot = java.nio.file.Files.createTempDirectory("graft-ac-race")
    val dir = new java.io.File(tmpRoot.toFile, "product")
    // winner publishes first
    val w = ArtifactCache.newTmpDir(dir.toString)
    Seq((1L, 10L)).toDF("a", "b").write.parquet(w.getAbsolutePath)
    ArtifactCache.publish(w, dir)
    // loser built a complete private copy concurrently, publishes second
    val l = ArtifactCache.newTmpDir(dir.toString)
    assert(l.getAbsolutePath != w.getAbsolutePath, "tmp dirs must be private")
    Seq((2L, 20L)).toDF("a", "b").write.parquet(l.getAbsolutePath)
    ArtifactCache.publish(l, dir) // must not throw, must not delete the winner
    assert(!l.exists(), "loser's tmp copy was not cleaned up")
    val rows = spark.read.parquet(dir.getAbsolutePath)
      .as[(Long, Long)].collect().toSeq
    assert(rows === Seq((1L, 10L)), "the winner's published product was disturbed")
  }

  test("ArtifactCache: registry lists published products, evict forces a rebuild") {
    val f = java.nio.file.Files.createTempFile("graft-reg-key", ".parquet").toFile
    val dir = ArtifactCache.path("regtest", f, Seq(1))
    var builds = 0
    def build() = { builds += 1; Seq((1L, 2L), (3L, 4L)).toDF("a", "b") }
    assert(ArtifactCache.getOrBuild(spark, dir)(build()).count() === 2L)
    val row = ArtifactCache.registry(spark).collect()
      .find(_.getString(0) == "regtest")
    assert(row.isDefined, "published product missing from the registry")
    assert(row.get.getString(2) === dir, "registry dir drifted from the key path")
    assert(row.get.getLong(3) > 0L && row.get.getLong(4) > 0L,
      "registry must report real bytes and file counts")
    // in-flight tmp builds never appear
    val tmp = ArtifactCache.newTmpDir(dir)
    java.nio.file.Files.createDirectories(tmp.toPath)
    assert(!ArtifactCache.registry(spark).collect()
      .exists(_.getString(2).contains(".tmp-")), "in-flight build leaked into the registry")
    ArtifactCache.rmTree(tmp)
    // evict removes every key of the product; the next consumer rebuilds
    assert(ArtifactCache.evict("regtest") >= 1)
    assert(!ArtifactCache.registry(spark).collect().exists(_.getString(0) == "regtest"))
    assert(ArtifactCache.getOrBuild(spark, dir)(build()).count() === 2L)
    assert(builds === 2, "eviction must force exactly one rebuild")
    ArtifactCache.evict("regtest"): Unit
  }
}
