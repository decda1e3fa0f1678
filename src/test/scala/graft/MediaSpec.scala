package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Media

/** Golden/determinism tests for the multimodal feature-extraction plumbing:
  * the mapPartitions batch shape, schema, and null/empty handling are real
  * even though the codec is a declared stub. */
class MediaSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("decodeStub golden: known bytes → known features, empty bytes defined") {
    // h starts at k+1 and folds (h*31 + byte) & 0xffffffff; "ab" = [97, 98]:
    // k=0: h=1 → 31+97=128 → 128*31+98=4066 → f0 = (4066 % 20001 - 10000)/1e4
    val f = Media.decodeStub("ab".getBytes("UTF-8"), 2)
    assert(f(0) === ((4066L % 20001L - 10000L).toFloat / 10000.0f))
    val empty = Media.decodeStub(Array.emptyByteArray, 3)
    assert(empty.toSeq === Seq(
      (1L % 20001L - 10000L).toFloat / 10000.0f,
      (2L % 20001L - 10000L).toFloat / 10000.0f,
      (3L % 20001L - 10000L).toFloat / 10000.0f))
  }

  test("sampleBytes: every stride-th byte from offset") {
    val b = Array[Byte](0, 1, 2, 3, 4, 5, 6, 7, 8, 9)
    assert(Media.sampleBytes(b, 3).toSeq === Seq[Byte](0, 3, 6, 9))
    assert(Media.sampleBytes(b, 4, 1).toSeq === Seq[Byte](1, 5, 9))
  }

  test("frame sampling: planted payload yields exact frames; binary bytes unsigned") {
    // 300 bytes with values crossing 127 (the signed-byte trap): frames at
    // offsets 0 (64 bytes) and 256 (44-byte tail).
    val bytes = Array.tabulate(300)(i => ((i * 7) % 256).toByte)
    val media = Seq((7L, bytes), (8L, Array.emptyByteArray))
      .toDF("doc_id", "media")
    val got = Media.frameSampleDf(media)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    def stats(off: Int, len: Int): (Long, Long) = {
      var e = 0L; var h = 0L
      for (i <- off until off + len) {
        val b = (bytes(i) & 0xff).toLong; e += b; h = (h * 31L + b) & 0xffffffffL
      }
      (e, h)
    }
    val (e0, h0) = stats(0, 64)
    val (e1, h1) = stats(256, 44)
    assert(got === Seq(
      (7L, 0L, 0L, 64L, e0, h0),
      (7L, 1L, 256L, 44L, e1, h1)))
    // empty payload: zero frames — doc 8 absent entirely
    assert(!got.exists(_._1 == 8L))
    // unsigned-read sanity: a payload of 0xFF bytes has energy 255·len
    val ff = Seq((9L, Array.fill(10)(0xff.toByte))).toDF("doc_id", "media")
    val g2 = Media.frameSampleDf(ff)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(g2.map(r => (r._4, r._5)) === Seq((10L, 2550L)))
  }

  test("resizeStub: nearest-neighbor grid downsample, short payload zero-padded") {
    // 4×2 grid [0..7] → 2×1: rows sampled at y=0, cols at x∈{0,2} → [0, 2]
    val b = Array[Byte](0, 1, 2, 3, 4, 5, 6, 7)
    assert(Media.resizeStub(b, 4, 2, 2, 1).toSeq === Seq[Byte](0, 2))
    // identity resize returns the grid unchanged
    assert(Media.resizeStub(b, 4, 2, 4, 2).toSeq === b.toSeq)
    // payload shorter than w·h is zero-padded like a raster decoder guarantees
    assert(Media.resizeStub(Array[Byte](9), 2, 2, 2, 2).toSeq === Seq[Byte](9, 0, 0, 0))
    // deterministic
    assert(Media.resizeStub(b, 4, 2, 3, 2).toSeq === Media.resizeStub(b, 4, 2, 3, 2).toSeq)
  }

  test("decodePpm: golden parse, header variants, malformed inputs throw") {
    // 2×1 image: pixels (1,2,3) and (250,251,252)
    val px = Array[Byte](1, 2, 3, -6, -5, -4) // -6 & 0xff = 250 …
    val img = "P6\n2 1\n255\n".getBytes("UTF-8") ++ px
    assert(Media.decodePpm(img) === ((2, 1, 251L, 253L, 255L)))
    // whitespace-flexible header (netpbm allows any whitespace runs)
    val img2 = "P6\n2\t 1 255\n".getBytes("UTF-8") ++ px
    assert(Media.decodePpm(img2) === ((2, 1, 251L, 253L, 255L)))
    // trailing extra bytes are ignored (raster length is header-driven)
    assert(Media.decodePpm(img ++ Array[Byte](9)) === ((2, 1, 251L, 253L, 255L)))
    intercept[IllegalArgumentException](Media.decodePpm("P5\n1 1\n255\n ".getBytes))
    intercept[IllegalArgumentException](Media.decodePpm("P6\n2 1\n255\n".getBytes ++ px.take(3)))
    intercept[IllegalArgumentException](Media.decodePpm("P6\n2 1\n65535\n".getBytes ++ px))
    // '#' comments between header tokens are spec-valid (GIMP/ImageMagick
    // emit them) and must parse
    val img4 = "P6\n# made by a tool\n2 1\n# dims above\n255\n".getBytes("UTF-8") ++ px
    assert(Media.decodePpm(img4) === ((2, 1, 251L, 253L, 255L)))
    // header dims whose raster overflows Int must throw "truncated", not
    // wrap negative and return zero sums
    val huge = intercept[IllegalArgumentException](
      Media.decodePpm("P6\n46341 46341\n255\n".getBytes("UTF-8") ++ px))
    assert(huge.getMessage.contains("truncated"))
  }

  test("thumbnail: valid P6 out, exact block means, golden checksum, uniform stays uniform") {
    // 4×2 image with two distinct 2×2-ish halves under an 8-grid → since
    // w,h < grid the thumb keeps the source size (every block = 1 pixel:
    // the resize is the identity and the checksum folds the raw raster).
    val px = (1 to 24).map(_.toByte).toArray
    val img = "P6\n4 2\n255\n".getBytes("UTF-8") ++ px
    val (w, h, tw, th, thumb, chk) = Media.thumbnailPpm(img)
    assert((w, h, tw, th) === ((4, 2, 4, 2)))
    // The thumb is a VALID P6 the real decoder accepts, with the identity
    // raster (blocks of one pixel reproduce their pixel exactly).
    val (dw, dh, rs, gs, bs) = Media.decodePpm(thumb)
    assert((dw, dh) === ((4, 2)))
    assert((rs, gs, bs) === ((1L + 4 + 7 + 10 + 13 + 16 + 19 + 22),
      (2L + 5 + 8 + 11 + 14 + 17 + 20 + 23), (3L + 6 + 9 + 12 + 15 + 18 + 21 + 24)))
    var expChk = 0L
    px.foreach(b => expChk = (expChk * 31 + (b & 0xff)) & 0xffffffffL)
    assert(chk === expChk)
    // A 16×16 uniform image box-filters to an 8×8 uniform thumb whose
    // every byte is the source value (means of a constant are exact).
    val uni = "P6\n16 16\n255\n".getBytes("UTF-8") ++
      Array.fill[Byte](16 * 16 * 3)(100)
    val (_, _, utw, uth, uthumb, _) = Media.thumbnailPpm(uni)
    assert((utw, uth) === ((8, 8)))
    val (udw, udh, urs, ugs, ubs) = Media.decodePpm(uthumb)
    assert((udw, udh) === ((8, 8)))
    assert(urs === 64L * 100 && ugs === 64L * 100 && ubs === 64L * 100)
    // Downsampled means are floor averages: a 2×1 → 1×1 (grid 1) thumb of
    // pixels (10,20,30) and (13,21,31) is exactly ((11),(20),(30)).
    val two = "P6\n2 1\n255\n".getBytes("UTF-8") ++
      Array[Byte](10, 20, 30, 13, 21, 31)
    val (_, _, _, _, t1, _) = Media.thumbnailPpm(two, grid = 1)
    assert(Media.decodePpm(t1) === ((1, 1, 11L, 20L, 30L)))
  }

  test("ppm features: real decode round-trips the construction, oracle-shaped") {
    // The query's sums must equal an independent in-JVM reconstruction
    // from the raw text (byte i of the raster = text byte i mod len).
    val texts = sources.Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val out = Media.ppmFeaturesQuery(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length === texts.size)
    for ((id, w, h, rs, gs, bs) <- out.take(25)) {
      val t = texts(id).getBytes("UTF-8")
      assert(w === t.length % 64 + 1)
      assert(h === t.length % 48 + 1)
      val sums = Array(0L, 0L, 0L)
      for (i <- 0 until (w * h * 3).toInt)
        sums(i % 3) += t(i % t.length) & 0xff
      assert((rs, gs, bs) === ((sums(0), sums(1), sums(2))),
        s"doc $id channel sums diverge from the reconstruction")
    }
  }

  test("featuresQuery end-to-end: schema, dim, meta passthrough, determinism") {
    val out1 = Media.featuresQuery(spark, TestSpark.sf)
    assert(out1.columns.toSeq === Seq("doc_id", "dim", "f1_e4", "width", "height"))
    val rows1 = out1.as[(Long, Long, Long, Long, Long)].collect()
    assert(rows1.length === 500)
    assert(rows1.forall(_._2 === Media.featureDim.toLong), "every doc must get a fixed-dim vector")
    // meta struct flows through the mapPartitions batch untouched
    val meta = sources.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), (col("n_chars") % 64 + 1).cast("long").as("w"))
      .as[(Long, Long)].collect().toMap
    assert(rows1.forall(r => r._4 === meta(r._1)), "width must match n_chars-derived metadata")
    // determinism: second run bit-identical
    val rows2 = Media.featuresQuery(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows1.toSeq === rows2.toSeq)
  }

  test("feature values equal the stub applied to the raw payload bytes") {
    val texts = sources.Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    val feats = Media.featuresQuery(spark, TestSpark.sf)
      .select("doc_id", "f1_e4").as[(Long, Long)].collect()
    for ((id, f1) <- feats.take(20)) {
      val expect = math.round(
        Media.decodeStub(texts(id).getBytes("UTF-8"), Media.featureDim)(0).toDouble * 10000)
      assert(f1 === expect, s"doc $id stub feature mismatch")
    }
  }

  test("payloads whose windows ALL miss the sample still pair via the fallback shingle") {
    import org.apache.spark.sql.functions.{col, encode}
    // Replicate the operator's window hashing + mod-4 sampling in-JVM and
    // search for a >=16-byte payload with zero sampled windows — the case
    // that silently vanished from the pair search before the fallback.
    def winHashes(s: String): Seq[Long] =
      (0 to s.length - 16).map { i =>
        s.substring(i, i + 16).foldLeft(0L)((h, c) => (h * 31 + c) & 4294967295L)
      }
    def isSampled(h: Long): Boolean = ((h ^ (h >> 16)) % 4) == 0
    val unlucky = (1 to 200000).iterator
      .map(i => f"payload$i%06d-tail") // 19 bytes => 4 windows
      .find(s => !winHashes(s).exists(isSampled))
      .get
    val docs = Seq((1L, unlucky), (2L, unlucky), (3L, "something else entirely"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
    val pairs = Media.mediaNearDupDf(docs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs === Seq((1L, 2L, 10000L)),
      s"identical unlucky payloads must pair through the fallback: $pairs")
  }

  test("byte-level near-dup pairs planted near-identical payloads, not distinct ones") {
    import org.apache.spark.sql.functions.{col, encode}
    // Long aperiodic payload so its 16-byte windows are (mostly) distinct:
    // a one-byte edit then breaks only ~16 windows, and the pair stays
    // well above 0.8 even over the operator's 1-in-SampleMod
    // content-defined window sample (~900 chars ⇒ ~220 sampled windows,
    // ~4 of them edit-broken).
    val words = ("alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango " +
      "uniform victor whiskey xray yankee zulu").split(" ")
    val base = (words ++ words.reverse ++ words.sortBy(_.length) ++
      words.sortBy(_.reverse) ++
      words.zip(words.reverse).map { case (a, b) => a + b }).mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base.dropRight(1) + "x"), // 1-byte edit at the end
      (3L, "0123456789 " * 18)       // zero 16-byte window overlap
    ).toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
    val pairs = Media.mediaNearDupDf(docs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) === Seq((1L, 2L)),
      s"expected exactly the planted near-dup pair, got $pairs")
    assert(pairs.head._3 >= 8000L)
  }

  test("phashPpm: hand-checked bits on a planted gradient, uniform image is 0") {
    // 8×8 image, left half black (gray 0), right half white (gray 765):
    // each aHash block is exactly one pixel; the 32 right-half blocks beat
    // the global mean, the left half never does.
    def ppm(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
      val head = s"P6\n$w $h\n255\n".getBytes("UTF-8")
      val raster = Array.tabulate(w * h * 3) { i =>
        val p = i / 3; px(p % w, p / w).toByte }
      head ++ raster
    }
    val (w1, h1, hash1) = Media.phashPpm(ppm(8, 8, (x, _) => if (x < 4) 0 else 255))
    assert((w1, h1) === (8, 8))
    val expected = (0 until 64).filter(i => i % 8 >= 4)
      .foldLeft(0L)((acc, i) => acc | (1L << i))
    assert(hash1 === expected, f"gradient hash 0x$hash1%016x != 0x$expected%016x")
    // uniform image: no block beats the mean (strict >) → 0
    assert(Media.phashPpm(ppm(8, 8, (_, _) => 128))._3 === 0L)
    // 1×1 image: single block, equal to its own mean → 0; empty grid cells
    // contribute 0 bits rather than throwing
    assert(Media.phashPpm(ppm(1, 1, (_, _) => 200))._3 === 0L)
    // bit 63 reachable: only the bottom-right pixel bright
    val (_, _, corner) = Media.phashPpm(ppm(8, 8, (x, y) => if (x == 7 && y == 7) 255 else 0))
    assert(corner === Long.MinValue, "bottom-right block must set bit 63")
  }

  test("phash pairs: identical and lightly-edited images pair, distinct ones do not") {
    import org.apache.spark.sql.functions.{col, length}
    // doc 2 = exact copy of doc 1 (same bytes → hamming 0); doc 3 = one
    // same-length substitution (same dims, a few cyclic pixels move → small
    // hamming); doc 4 = unrelated text (no pair expected at ≤ 3).
    val base = ("the quick brown fox jumps over the lazy dog while zephyrs " +
      "vex a daft jim and sphinxes of black quartz judge my vow repeatedly " +
      "until every pangram wears out its welcome in the corpus") * 2
    val edited = base.updated(10, 'Q')
    val other = base.reverse.map(c => if (c.isLetter) ('z' - (c - 'a')).toChar else c)
    val docs = Seq((1L, base), (2L, base), (3L, edited), (4L, other))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val pairs = Media.phashPairsDf(Media.ppmTableDf(docs))
      .as[(Long, Long, Long)].collect().toSeq
    val asMap = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(asMap.get((1L, 2L)) === Some(0L), s"exact copy must be hamming 0: $pairs")
    assert(asMap.contains((1L, 3L)) && asMap((1L, 3L)) <= 3L,
      s"light edit must stay inside the hamming ball: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated image paired: $pairs")
  }
}
