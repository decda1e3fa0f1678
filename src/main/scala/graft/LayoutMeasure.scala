package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MEASURED layout comparison on REAL written files — the end-to-end
  * companion to the modeled bucket audits (`layout_zorder` /
  * `layout_hilbert` / `eval_layout_*`): writes the events table under
  * four physical layouts (time-linear, 2-D z-order, 3-D z-order with
  * the event-type code as the third dimension, 2-D Hilbert), reads each
  * directory back, derives per-FILE min/max from `input_file_name()`, and prices
  * both query shapes (user-point, time-range) plus a type-point probe
  * against the ACTUAL files — file sizing, row-group boundaries and the
  * range partitioner's sampling included. The bucket audits model the
  * curve; this measures the artifact, which is what a pruner sees.
  *
  *   runMain graft.LayoutMeasure <sfDir> <outDir> [nFiles]
  *
  * Prints one JSON line: per layout, the file count and the measured
  * e4 scan fractions per probe shape. Not a declared contract query —
  * the range partitioner SAMPLES boundaries, so file-level numbers are
  * honest measurements rather than hash-stable values (the spec
  * `EventsSpec."file-level audit"` pins the invariants; this main
  * produces the quoted SCALE.md numbers).
  */
object LayoutMeasure {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val nFiles = if (args.length > 2) args(2).toInt else 32
    val nProbes = graft.operators.Events.ZorderSkipProbes
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.sources.Sessions.local(cpus, logLevel = "ERROR")

    // One source frame for all three writers: events plus the dense
    // event-type code (so type-point pruning is measurable under every
    // layout, clustered on it or not).
    val e0 = graft.sources.Tables.events(spark, sfDir)
    val events = e0
      .join(broadcast(graft.operators.Events.eventTypeCodes(e0)), "event_type")
      .select(col("event_id"), col("user_id"), col("ts_us"), col("c"))
      .persist()
    events.count(): Unit

    // Hadoop FS, not java.io.File: the out dir may live on a DFS — the
    // same posture as the product layer (local paths resolve identically).
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .mkdirs(outPath): Unit
    def write(sub: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$sub")
    write("linear",
      events.repartitionByRange(nFiles, col("ts_us"))
        .sortWithinPartitions("ts_us"))
    write("zorder2",
      graft.operators.Events.zorderClusteredN(
        events, Seq("user_id", "ts_us"), nFiles))
    write("zorder3",
      graft.operators.Events.zorderClusteredN(
        events, Seq("user_id", "ts_us", "c"), nFiles))
    // The Hilbert writer clusters the same 2-D (user, time) pair on the
    // stronger curve — its claimed edge (key-adjacency → tighter per-file
    // time spans for range scans) is exactly what the measured time-range
    // probe tests, so it gets a measured row, not just the modeled audit.
    write("hilbert",
      graft.operators.Events.hilbertClustered(events, nFiles))

    // Probe sets: the skip eval's deterministic shapes.
    val userProbes = events.select(col("user_id").as("pv"))
      .distinct().orderBy("pv").limit(nProbes)
    val typeProbes = events.select(col("c").as("pv")).distinct()
    val nb = 1L << graft.operators.Events.ZorderBucketsLog2
    val timeProbes = events
      .agg(min("ts_us").as("mint"), max("ts_us").as("maxt"))
      .select(explode(sequence(lit(0), lit(nProbes - 1))).as("k"),
        col("mint"), col("maxt"))
      .select(
        expr(s"mint + k * ((maxt - mint) div $nProbes)").as("ps"),
        expr(s"mint + k * ((maxt - mint) div $nProbes) + " +
          s"((maxt - mint) div $nb)").as("pe"))
      .distinct()

    def fracs(sub: String): (Long, Long, Long, Long) = {
      val audit = graft.operators.Events.fileLayoutAuditDf(
        spark.read.parquet(s"$outDir/$sub"),
        Seq("user_id", "ts_us", "c")).persist()
      val files = audit.count()
      def e4(df: DataFrame) = df.collect().head.getAs[Long]("scan_e4")
      val up = e4(graft.operators.Events
        .fileSkipFractionDf(audit, userProbes, "user_id"))
      val tp = e4(graft.operators.Events
        .fileSkipFractionDf(audit, typeProbes, "c"))
      val tr = e4(graft.operators.Events
        .fileRangeScanFractionDf(audit, timeProbes, "ts_us"))
      audit.unpersist(): Unit
      (files, up, tr, tp)
    }
    val out = Seq("linear", "zorder2", "zorder3", "hilbert").map { sub =>
      val (files, up, tr, tp) = fracs(sub)
      s""""$sub":{"files":$files,"user_point_e4":$up,"time_range_e4":$tr,"type_point_e4":$tp}"""
    }
    println(s"""{"metric":"layout_measured","sf":"$sfDir","n_files":$nFiles,${out.mkString(",")}}""")
    spark.stop()
  }
}
