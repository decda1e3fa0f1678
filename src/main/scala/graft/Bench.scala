package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: runs every declared query at SPARK_GRAFT_SF_DIR and prints
  * one JSON line. Failures are recorded per query (negative time + a "failed"
  * list) — a broken query must not masquerade as a fast one.
  *
  * Methodology (every BENCH number quoted in SCALE.md comes from this):
  *  - Each query executes through a noop-sink WRITE, not `count()` — a count
  *    lets Catalyst's EliminateSorts drop the mandatory final ORDER BY, so
  *    sort-heavy queries would be under-timed.
  *  - Warmup phase runs every query once against a tiny scale factor
  *    (SPARK_GRAFT_WARM_DIR, default sf0.001) before any timing. A fresh JVM
  *    otherwise charges the first execution of each query with Janino
  *    compilation of its generated code plus JIT of the hot loops — measured
  *    at 3-6× the steady-state time, and plan-independent noise at any data
  *    scale. The codegen cache is keyed by generated source (identical
  *    across data dirs), so the warmup compiles exactly the code the timed
  *    run executes while touching ~1% of the data.
  *  - The cache is cleared after every query: operators that persist shared
  *    intermediates (LSH keys, shingle tables) release them, and no query
  *    can reuse another's cached data. The clear is INSIDE the timed region
  *    — freeing its own intermediates is part of a query's cost.
  *  - The timed phase runs TWICE and each query reports the minimum of its
  *    two runs. The box is a shared VM with bursty CPU steal — identical
  *    code measured 101 s and 422 s total back to back, with 20-90 s stall
  *    blocks landing on whichever queries were running during a burst.
  *    Min-of-2 keeps one clean sample per query; a query lands in "failed"
  *    only if every run of it failed.
  */
object Bench {
  private def execute(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Dev-loop subsetting only (SPARK_GRAFT_ONLY=q1,q2); the driver never
    // sets it, so official BENCH artifacts always cover the full contract.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    def selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Parquet footers + shuffle machinery for the TARGET dir.
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings"))
      try graft.sources.Tables.table(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    // Codegen/JIT warmup at the tiny SF (falls back to the target dir if the
    // warm dir is absent — then the warmup is a full untimed pass).
    val warm = if (new java.io.File(warmDir).exists()) warmDir else sfDir
    for ((name, fn) <- selected) {
      try execute(fn(spark, warm))
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    def timedPass(): Seq[(String, Double, Boolean)] =
      selected.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { execute(fn(spark, sfDir)); spark.catalog.clearCache(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            try spark.catalog.clearCache() catch { case _: Throwable => () }
            false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        (name, if (ok) sec else -sec, ok)
      }
    val (passA, passB) = (timedPass(), timedPass())
    val results = passA.zip(passB).map { case ((name, a, okA), (_, b, okB)) =>
      val okTimes = Seq((a, okA), (b, okB)).collect { case (t, true) => t }
      if (okTimes.nonEmpty) (name, okTimes.min, true)
      else (name, math.min(a, b), false)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
