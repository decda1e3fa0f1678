package graft.sources

import org.apache.spark.sql.SparkSession

/** The one local SparkSession recipe every CLI main shares (Bench,
  * Verify, Ship, IndexBuild, Report, Audit, Scratch). Centralized so a
  * config change — a new legacy-parquet flag, a timezone fix — lands in
  * every entry point at once; a drifted copy would make (say) a
  * CLI-built index subtly differ from the bench-built one.
  *
  * The settings are the repo-wide session contract (TESTDATA.md +
  * SURVEY §1.3): UTC session time (events `ts_us` is only exact under
  * UTC), `nanosAsLong` (inert on µs data, required if a data drop
  * reverts to TIMESTAMP(NANOS)), shuffle partitions = cores (local mode:
  * 200 reducers over 32 threads just adds scheduling overhead), UI off.
  */
object Sessions {

  def local(cpus: String, logLevel: String = "WARN"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel(logLevel)
    s
  }

  /** [[local]] with the `SPARK_GRAFT_CPUS` env default the CLI mains use. */
  def localFromEnv(logLevel: String = "WARN"): SparkSession =
    local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), logLevel)
}
