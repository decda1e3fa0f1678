package graft.sources

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Content-addressed cache for derived BUILD PRODUCTS — the
  * build-once/consume-many split expensive derivations need (the trained
  * IVF-PQ serving index, the thresholded co-supply edge product): several
  * queries consume the same product, and rebuilding it inside each
  * consumer's plan repeats the dominant cost.
  *
  * The cache key is the identity of the SOURCE file the product derives
  * from (absolute path, byte size, mtime) plus every build parameter plus
  * a layout version — so a changed corpus, changed knobs, or changed code
  * can never silently serve a stale product; invalidation is structural,
  * not scheduled. Each published product carries a MANIFEST recording its
  * full (unhashed) key; consumers validate it at read time and fail
  * loudly on mismatch, so a hash collision, a mislabeled directory, or a
  * foreign dir planted at the expected path can never be served as query
  * results.
  *
  * LOCATION: products live under a single dedicated root, resolved (in
  * order) from the session conf `spark.graft.products.dir`, the env var
  * `SPARK_GRAFT_PRODUCTS_DIR` — the cluster deployment story: point it
  * at a warehouse/DFS path all executors can reach — and falling back to
  * a PER-USER 0700 directory under the JVM temp dir (scratch, like
  * Spark's own local dirs). The per-user name plus the ownership check
  * in [[root]] means another local user on a shared host can neither
  * pre-create nor read this user's cache. Listing and eviction only ever
  * touch entries under this root, never sibling temp dirs.
  *
  * Publication is crash-safe: the build lands in a PRIVATE `<dir>.tmp-*`
  * and an atomic rename publishes it, so a killed build never leaves a
  * half-product a reader could mistake for complete.
  */
object ArtifactCache {

  /** Bump to invalidate every cached product at once (layout changes).
    * 2: dedicated per-user root + per-product manifests (round 11). */
  private val CacheVersion = 2

  /** The products root (see class doc for the resolution order). Created
    * on first use with owner-only permissions; if it already exists its
    * OWNER must be this user — a root planted by someone else is refused,
    * not trusted (shared-host hardening). */
  def root: File = {
    // System property included so a session-less caller (the isolated
    // bench PARENT evicting before any SparkSession exists) resolves the
    // same root a -Dspark.graft.products.dir-configured child will.
    val configured = SparkSession.getActiveSession
      .flatMap(s => s.conf.getOption("spark.graft.products.dir"))
      .orElse(sys.props.get("spark.graft.products.dir"))
      .orElse(sys.env.get("SPARK_GRAFT_PRODUCTS_DIR"))
    val dir = configured.map(new File(_)).getOrElse(
      new File(sys.props("java.io.tmpdir"),
        s"graft-cache-${sys.props.getOrElse("user.name", "anon")}"))
    if (!dir.exists()) {
      Files.createDirectories(dir.toPath)
      try {
        import java.nio.file.attribute.PosixFilePermissions
        Files.setPosixFilePermissions(dir.toPath,
          PosixFilePermissions.fromString("rwx------")): Unit
      } catch { case _: UnsupportedOperationException => () } // non-POSIX FS
    }
    try {
      val owner = Files.getOwner(dir.toPath).getName
      val me = sys.props.getOrElse("user.name", owner)
      if (owner != me) throw new java.io.IOException(
        s"products root $dir is owned by '$owner', not '$me' — refusing " +
          "to serve a cache this user does not own")
    } catch { case _: UnsupportedOperationException => () }
    dir
  }

  /** Full, UNHASHED content key for product `name` — what the manifest
    * records and read-time validation compares. */
  def keyString(name: String, keyFile: File, params: Seq[Any]): String =
    (Seq(name, keyFile.getAbsolutePath, keyFile.length,
      keyFile.lastModified) ++ params :+ CacheVersion).mkString("|")

  private def sha8(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString

  /** Content-addressed directory for product `name` derived from
    * `keyFile` under `params`: `<root>/<name>-<16-hex-key>`. Touches the
    * filesystem only to read the key file's metadata and ensure the
    * root. */
  def path(name: String, keyFile: File, params: Seq[Any]): String =
    new File(root, s"$name-${sha8(keyString(name, keyFile, params))}")
      .getAbsolutePath

  // ---- manifest: the read-time proof a directory IS the product ----

  private val ManifestName = "_GRAFT_MANIFEST"

  /** Record `key` as the manifest of the (still-private) build dir —
    * called by builders after the tables land, before publish. */
  def writeManifest(buildDir: File, key: String): Unit = {
    Files.createDirectories(buildDir.toPath)
    Files.write(new File(buildDir, ManifestName).toPath,
      key.getBytes("UTF-8")): Unit
  }

  /** The published manifest of `dir`, if one exists. */
  def readManifest(dir: File): Option[String] = {
    val f = new File(dir, ManifestName)
    if (f.isFile) Some(new String(Files.readAllBytes(f.toPath), "UTF-8"))
    else None
  }

  /** Fail-loudly validation: `dir` must carry a manifest exactly equal to
    * `key`. A missing manifest (pre-manifest layout, foreign dir) or a
    * mismatched one (hash collision, mislabeled/planted dir, stale
    * explicit location) refuses to serve — the caller's error, surfaced
    * at the first read instead of as silently wrong query results. */
  def validateManifest(dir: File, key: String): Unit =
    readManifest(dir) match {
      case Some(k) if k == key => ()
      case Some(k) => throw new java.io.IOException(
        s"product at $dir does not match the requested key\n  expected: " +
          s"$key\n  found:    $k\n(stale or mismatched product — evict or " +
          "rebuild it)")
      case None => throw new java.io.IOException(
        s"product at $dir carries no manifest — refusing to serve an " +
          "unverified directory (evict it to rebuild)")
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

  /** Build seconds recorded by [[getOrBuild]] misses (and by the IVF-PQ
    * index builder), keyed by the product directory's basename — the
    * bench drains this after its cold pass so one-time build costs are
    * PRICED in the artifact instead of hidden by min-of-2 over a
    * persistent cache (the round-10 measurement gap). */
  private val buildSecs =
    scala.collection.concurrent.TrieMap.empty[String, Double]

  def recordBuild(dirName: String, sec: Double): Unit =
    buildSecs.put(dirName, sec): Unit

  /** Drain (return and clear) the recorded build timings. */
  def drainBuildTimes(): Map[String, Double] = {
    val snap = buildSecs.readOnlySnapshot().toMap
    snap.keys.foreach(buildSecs.remove)
    snap
  }

  /** Read the single-table product `name` keyed by (`keyFile`, `params`),
    * building and publishing it first if absent. Concurrent builders each
    * build into a PRIVATE tmp dir and race only on the atomic publish —
    * first wins, losers discard their complete copy, every reader sees
    * one complete product. A build that THROWS cleans its own tmp dir.
    * Every hit validates the manifest (see [[validateManifest]]). */
  def getOrBuild(s: SparkSession, name: String, keyFile: File,
      params: Seq[Any])(build: => DataFrame): DataFrame = {
    val key = keyString(name, keyFile, params)
    val dir = path(name, keyFile, params)
    val fin = new File(dir)
    if (!fin.exists()) {
      val t0 = System.nanoTime()
      val tmp = newTmpDir(dir)
      try {
        build.write.mode("overwrite").parquet(tmp.getAbsolutePath)
        writeManifest(tmp, key)
      } catch { case e: Throwable => rmTree(tmp); throw e }
      publish(tmp, fin)
      recordBuild(fin.getName, (System.nanoTime() - t0) / 1e9)
    }
    validateManifest(fin, key)
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

  /** Published product dirs under [[root]] (in-flight `.tmp-*` excluded),
    * oldest-first — the raw listing [[registry]] and [[gc]] share. */
  private def published(): Seq[File] =
    Option(root.listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isDirectory && !f.getName.contains(".tmp-"))
      .sortBy(f => (f.lastModified(), f.getName)).toSeq

  /** The PRODUCT REGISTRY — what the build-once/consume-many layer has
    * materialized: one row per published product directory (name, key
    * hash, bytes, file count, publish mtime), in-flight `.tmp-*` builds
    * excluded. The ops view a production deployment watches (which
    * indexes exist, how big, how stale) and the input to [[gc]].
    * Driver-side listing bounded by product COUNT, never data size.
    * Listing is confined to [[root]], so it can never see (and [[evict]]/
    * [[gc]] can never delete) unrelated temp directories. */
  def registry(s: SparkSession): DataFrame = {
    import s.implicits._
    val rows = published().map { f =>
      // <name>-<16-hex-key>: split at the LAST hyphen, so a product name
      // that itself contains hyphens parses whole.
      val base = f.getName
      val cut = base.lastIndexOf('-')
      val (name, key) =
        if (cut > 0) (base.substring(0, cut), base.substring(cut + 1))
        else (base, "")
      val (bytes, files) = treeStats(f)
      (name, key, f.getAbsolutePath, bytes, files, f.lastModified())
    }.sortBy(r => (r._1, r._2))
    rows.toDF("product", "key", "dir", "bytes", "files", "modified_ms")
  }

  /** Evict every published product whose name is EXACTLY `product` (all
    * keys — a corpus change leaves stale keys behind; this is the
    * cleanup). The name is parsed off the `<name>-<key>` directory the
    * same way [[registry]] parses it (split at the LAST hyphen), so a
    * product whose name is a hyphen-prefix of another ("two" vs
    * "two-part") can never suffer collateral eviction. In-flight
    * `.tmp-*` builds are never touched (their owner cleans or publishes
    * them), and the next consumer simply rebuilds: eviction can never
    * break correctness, only re-pay a build. Returns the number of
    * directories removed. */
  def evict(product: String): Int = {
    val victims = published().filter { f =>
      val cut = f.getName.lastIndexOf('-')
      f.getName == product ||
        (cut > 0 && f.getName.substring(0, cut) == product)
    }
    victims.foreach(rmTree)
    victims.length
  }

  /** Evict EVERY published product (the bench's cold-pass reset). */
  def evictAll(): Int = {
    val victims = published()
    victims.foreach(rmTree)
    victims.length
  }

  /** The eviction POLICY over the registry — what a daily-corpus loop
    * runs so stale keys (every corpus drop mints new ones) cannot grow
    * the cache unboundedly:
    *
    *  - every product older than `maxAgeMs` is evicted;
    *  - then, oldest-first, products are evicted until the remainder
    *    fits `maxBytes`.
    *
    * In-flight `.tmp-*` builds are never touched. Returns the evicted
    * directories (for the CLI report). Safe by the same argument as
    * [[evict]]: a consumer whose product vanished rebuilds. */
  def gc(maxBytes: Option[Long] = None, maxAgeMs: Option[Long] = None,
      now: Long = System.currentTimeMillis()): Seq[String] = {
    val all = published().map(f => (f, treeStats(f)._1))
    val (tooOld, fresh) = all.partition { case (f, _) =>
      maxAgeMs.exists(a => now - f.lastModified() > a)
    }
    val overBudget = maxBytes match {
      case None => Seq.empty
      case Some(budget) =>
        // fresh is oldest-first; keep the newest products that fit.
        var excess = fresh.map(_._2).sum - budget
        fresh.takeWhile { case (_, b) =>
          val victim = excess > 0; if (victim) excess -= b; victim
        }
    }
    val victims = tooOld ++ overBudget
    victims.foreach { case (f, _) => rmTree(f) }
    victims.map(_._1.getAbsolutePath)
  }
}
