package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Content-addressed local cache for derived BUILD PRODUCTS — the
  * build-once/consume-many split expensive derivations need (the trained
  * IVF-PQ serving index, the thresholded co-supply edge product): several
  * queries consume the same product, and rebuilding it inside each
  * consumer's plan repeats the dominant cost.
  *
  * The cache key is the identity of the SOURCE file the product derives
  * from (absolute path, byte size, mtime) plus every build parameter plus
  * a layout version — so a changed corpus, changed knobs, or changed code
  * can never silently serve a stale product; invalidation is structural,
  * not scheduled. Products live under the JVM temp dir (scratch, like
  * Spark's own local dirs); production deployments write to a warehouse
  * path on their own schedule instead and hand consumers the location.
  *
  * Publication is crash-safe: the build lands in `<dir>.tmp` and an atomic
  * rename publishes it, so a killed build never leaves a half-product a
  * reader could mistake for complete.
  */
object ArtifactCache {

  /** Bump to invalidate every cached product at once (layout changes). */
  private val CacheVersion = 1

  /** Content-addressed directory for product `name` derived from
    * `keyFile` under `params`. Pure function — does not touch the
    * filesystem beyond reading the key file's metadata. */
  def path(name: String, keyFile: File, params: Seq[Any]): String = {
    val key = (Seq(keyFile.getAbsolutePath, keyFile.length,
      keyFile.lastModified) ++ params :+ CacheVersion).mkString("|")
    val h = java.security.MessageDigest.getInstance("SHA-256")
      .digest(key.getBytes("UTF-8")).take(8)
      .map(b => f"$b%02x").mkString
    new File(sys.props("java.io.tmpdir"), s"graft-$name-$h").getAbsolutePath
  }

  def rmTree(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(rmTree)
    f.delete(): Unit
  }

  /** A build directory PRIVATE to this builder: the unique suffix means
    * concurrent builders of the same key never write into each other's
    * in-flight part files (they each build a complete product and race
    * only on the atomic publish, where losing is harmless). */
  def newTmpDir(dir: String): File =
    new File(dir + ".tmp-" + java.lang.ProcessHandle.current().pid() +
      "-" + java.util.UUID.randomUUID().toString.take(8))

  /** Atomically publish `tmp` as `dir`. If another builder won the race
    * (`dir` appeared first), this builder's copy is discarded — the
    * published product is complete either way, and a live `dir` is NEVER
    * deleted out from under a concurrent reader. A GENUINE rename failure
    * with no winner present (cross-mount path, permissions) keeps the
    * built tmp copy on disk and names it in the error, so a
    * minutes-long build is recoverable rather than destroyed. */
  def publish(tmp: File, dir: File): Unit = {
    if (!dir.exists() && tmp.renameTo(dir)) return
    if (dir.exists()) rmTree(tmp) // lost the race: keep the winner's copy
    else throw new java.io.IOException(
      s"could not publish artifact at $dir (completed build kept at $tmp)")
  }

  /** Read the single-table product at `dir`, building and publishing it
    * first if absent. Concurrent builders each build into a PRIVATE tmp
    * dir and race only on the atomic publish — first wins, losers discard
    * their complete copy, every reader sees one complete product. A build
    * that THROWS cleans its own tmp dir (unique names are not
    * self-healing the way a fixed name was). */
  def getOrBuild(s: SparkSession, dir: String)(build: => DataFrame): DataFrame = {
    val fin = new File(dir)
    if (!fin.exists()) {
      val tmp = newTmpDir(dir)
      try build.write.mode("overwrite").parquet(tmp.getAbsolutePath)
      catch { case e: Throwable => rmTree(tmp); throw e }
      publish(tmp, fin)
    }
    s.read.parquet(dir)
  }

  private def treeStats(f: File): (Long, Long) =
    if (f.isFile) (f.length(), 1L)
    else f.listFiles() match {
      case null => (0L, 0L)
      case kids => kids.foldLeft((0L, 0L)) { case ((b, n), k) =>
        val (kb, kn) = treeStats(k); (b + kb, n + kn)
      }
    }

  /** The PRODUCT REGISTRY — what the build-once/consume-many layer has
    * materialized: one row per published product directory (name, key
    * hash, bytes, file count, publish mtime), in-flight `.tmp-*` builds
    * excluded. The ops view a production deployment watches (which
    * indexes exist, how big, how stale) and the input to an eviction
    * policy. Driver-side listing bounded by product COUNT, never data
    * size. */
  def registry(s: SparkSession): DataFrame = {
    import s.implicits._
    val root = new File(sys.props("java.io.tmpdir"))
    val rows = Option(root.listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isDirectory && f.getName.startsWith("graft-") &&
        !f.getName.contains(".tmp-"))
      .map { f =>
        // graft-<name>-<16-hex-key>
        val parts = f.getName.stripPrefix("graft-").split("-")
        val (name, key) =
          if (parts.length >= 2) (parts.dropRight(1).mkString("-"), parts.last)
          else (parts.mkString("-"), "")
        val (bytes, files) = treeStats(f)
        (name, key, f.getAbsolutePath, bytes, files, f.lastModified())
      }.toSeq.sortBy(r => (r._1, r._2))
    rows.toDF("product", "key", "dir", "bytes", "files", "modified_ms")
  }

  /** Evict every published product whose name matches `product` (all
    * keys — a corpus change leaves stale keys behind; this is the
    * cleanup). In-flight `.tmp-*` builds are never touched (their owner
    * cleans or publishes them), and the next consumer simply rebuilds:
    * eviction can never break correctness, only re-pay a build. Returns
    * the number of directories removed. */
  def evict(product: String): Int = {
    val root = new File(sys.props("java.io.tmpdir"))
    val victims = Option(root.listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isDirectory && !f.getName.contains(".tmp-") &&
        (f.getName == s"graft-$product" ||
         f.getName.startsWith(s"graft-$product-")))
    victims.foreach(rmTree)
    victims.length
  }
}
