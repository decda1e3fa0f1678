package graft

/** Deterministic enwik8-class TEXT FIXTURE generator — the corpus the
  * reference-scale word-count anchor runs on. The reference's published
  * numbers are for enwik8/enwik9 (10⁸/10⁹ bytes of raw text,
  * `README.md:160-162`); this container has zero egress, so the anchor
  * corpus is synthesized: Zipf-distributed words (s = 1.0 over a 65 536
  * word vocabulary seeded with real English stopwords so the top-20
  * report looks like the reference's), fixed seed, ~12 words per line,
  * split across N files like a downloaded dump would be. Deterministic:
  * same args → byte-identical corpus, so the MB/s number is
  * reproducible run to run.
  *
  *   runMain graft.TextFixture <outDir> <totalBytes> [nFiles]
  */
object TextFixture {
  /** Head of the vocabulary: frequent English words, so the Zipf head —
    * and therefore the report's top-20 block — reads like natural text
    * (the reference's sample block is `the of and ...`). */
  private val Common = Seq(
    "the", "of", "and", "a", "in", "to", "is", "was", "it", "for",
    "that", "as", "on", "with", "by", "at", "from", "are", "this", "be",
    "an", "or", "his", "which", "one", "were", "but", "not", "he", "had")

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val totalBytes = args(1).toLong
    val nFiles = if (args.length > 2) args(2).toInt else 8
    val vocabSize = 65536
    // Tail words must be PURELY alphabetic — the reference tokenizer is
    // \b[a-z]+\b, so a digit-bearing word would be invisible to the
    // word count (caught when unique came back 30).
    def base26(k0: Int): String = {
      var k = k0; val sb = new StringBuilder
      while (k > 0 || sb.isEmpty) { sb.append(('a' + k % 26).toChar); k /= 26 }
      sb.result()
    }
    val vocab = Common.toArray ++
      (Common.size until vocabSize).map(k => "x" + base26(k))
    // Zipf s=1: cumulative 1/r weights, sampled by binary search.
    val cum = new Array[Double](vocabSize)
    var acc = 0.0
    for (r <- 0 until vocabSize) { acc += 1.0 / (r + 1); cum(r) = acc }
    val dir = new java.io.File(outDir)
    dir.mkdirs(): Unit
    val perFile = totalBytes / nFiles
    var written = 0L
    for (f <- 0 until nFiles) {
      val rnd = new java.util.Random(42L + f) // per-file seed: files are
      // independent, so regenerating with a different nFiles split is
      // still deterministic per (seed, file) pair
      val out = new java.io.BufferedWriter(new java.io.FileWriter(
        new java.io.File(dir, f"part-$f%04d.txt")), 1 << 20)
      var bytes = 0L
      val line = new StringBuilder(128)
      while (bytes < perFile) {
        line.setLength(0)
        var i = 0
        while (i < 12) {
          if (i > 0) line.append(' ')
          val u = rnd.nextDouble() * acc
          // binary search for the first cum(r) >= u
          var lo = 0; var hi = vocabSize - 1
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (cum(mid) < u) lo = mid + 1 else hi = mid
          }
          line.append(vocab(lo))
          i += 1
        }
        line.append('\n')
        out.write(line.toString)
        bytes += line.length
      }
      out.close()
      written += bytes
    }
    println(s"wrote $written bytes across $nFiles files under $outDir")
  }
}
