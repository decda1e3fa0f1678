package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Events

/** Planted ordering checks for the conversion funnel: the ORDER of events
  * decides conversion, not their mere presence. */
class EventsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("zorder layout: full-resolution audit is the exact bit-interleave") {
    // 4×4 grid of (user, time): both ranges are 3, so q = 1 and the
    // stretch step maps v → v*65535 div 3 (0, 21845, 43690, 65535 —
    // small domains must reach the TOP key bits, the property the
    // sf-scale degeneration proved necessary); bucketsLog2 = 32 makes
    // the bucket the raw Morton key — every row lands alone in the
    // bucket the hand-computed interleave of the codes names.
    val rows = for (u <- 0L to 3L; t <- 0L to 3L) yield (4 * u + t, u, t)
    val events = rows.toDF("event_id", "user_id", "ts_us")
    def code(v: Long): Long = v * 65535L / 3L
    def morton(u: Long, t: Long): Long =
      (0 until 16).map(i =>
        (((u >> i) & 1L) << (2 * i)) | (((t >> i) & 1L) << (2 * i + 1))).sum
    val got = graft.operators.Events.zorderLayoutDf(events, bucketsLog2 = 32)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    val zExpected = rows.map { case (_, u, t) =>
      ("zorder", morton(code(u), code(t)), 1L, u, u, 0L, t, t, 0L)
    }.sortBy(_._2)
    // linear layout: (maxt - mint) = 3 < 2^32 buckets → bucket = t,
    // each holding every user (the full-span files zorder fixes).
    val lExpected = (0L to 3L).map(t =>
      ("linear", t, 4L, 0L, 3L, 3L, t, t, 0L))
    assert(got === (lExpected ++ zExpected))
  }

  test("hilbert layout: full-resolution audit matches the reference xy2d") {
    // Same 4×4 grid; 15-bit codes v*32767 div 3; bucketsLog2 = 30 →
    // shift 0, so the hilbert bucket IS the xy2d index and the zorder
    // bucket the raw 15-bit interleave — both checked against plain
    // Scala references.
    val rows = for (u <- 0L to 3L; t <- 0L to 3L) yield (4 * u + t, u, t)
    val events = rows.toDF("event_id", "user_id", "ts_us")
    def code(v: Long): Long = v * 32767L / 3L
    def xy2d(x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var s = 16384L
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = 32767L - x; y = 32767L - y }
          val tmp = x; x = y; y = tmp
        }
        s /= 2
      }
      d
    }
    def morton(u: Long, t: Long): Long =
      (0 until 15).map(i =>
        (((u >> i) & 1L) << (2 * i)) | (((t >> i) & 1L) << (2 * i + 1))).sum
    val got = graft.operators.Events.hilbertLayoutDf(events, bucketsLog2 = 30)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    val hExpected = rows.map { case (_, u, t) =>
      ("hilbert", xy2d(code(u), code(t)), 1L, u, u, 0L, t, t, 0L)
    }.sortBy(_._2)
    val lExpected = (0L to 3L).map(t =>
      ("linear", t, 4L, 0L, 3L, 3L, t, t, 0L))
    val zExpected = rows.map { case (_, u, t) =>
      ("zorder", morton(code(u), code(t)), 1L, u, u, 0L, t, t, 0L)
    }.sortBy(_._2)
    assert(got === (hExpected ++ lExpected ++ zExpected))
  }

  test("zorder skip eval: point queries scan 1/4 of zorder buckets, all linear ones") {
    // Same 4×4 grid at full key resolution: each zorder bucket holds
    // exactly one (u, t) point, so a probe u hits the 4 buckets with
    // min_u = max_u = u → 16/(16 buckets × 4 probes) = 2500 e4; every
    // linear bucket spans all users → 10000 e4.
    val rows = for (u <- 0L to 3L; t <- 0L to 3L) yield (4 * u + t, u, t)
    val events = rows.toDF("event_id", "user_id", "ts_us")
    val got = graft.operators.Events.zorderSkipEvalDf(events, bucketsLog2 = 32)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("linear", 4L, 4L, 16L, 10000L),
      ("zorder", 16L, 4L, 16L, 2500L)))
  }

  test("layout tradeoff eval: both probe shapes priced under all three layouts") {
    // Same 4×4 grid at full resolution. user_point: curves scan 1/4,
    // linear all. time_range: range is 3 so all ten windows collapse
    // (dedup → ONE probe at [mint, mint]) — buckets holding t = 0 are
    // scanned: 4/16 under each curve, 1/4 under linear → 2500 e4
    // everywhere, with the probe dedup keeping scanned/n_probes
    // consistent on the degenerate range.
    val rows = for (u <- 0L to 3L; t <- 0L to 3L) yield (4 * u + t, u, t)
    val events = rows.toDF("event_id", "user_id", "ts_us")
    val got = graft.operators.Events
      .layoutTradeoffEvalDf(events, bucketsLog2 = 30)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("hilbert", "time_range", 16L, 1L, 4L, 2500L),
      ("hilbert", "user_point", 16L, 4L, 16L, 2500L),
      ("linear", "time_range", 4L, 1L, 1L, 2500L),
      ("linear", "user_point", 4L, 4L, 16L, 10000L),
      ("zorder", "time_range", 16L, 1L, 4L, 2500L),
      ("zorder", "user_point", 16L, 4L, 16L, 2500L)))
  }

  test("zorder clustered write: partition key ranges are disjoint and sorted") {
    val rows = for (u <- 0L until 10L; t <- 0L until 10L)
      yield (10 * u + t, u, t * 1000000L)
    val events = rows.toDF("event_id", "user_id", "ts_us")
    val clustered = graft.operators.Events.zorderClustered(events, 4)
    val perPart = clustered
      .select(org.apache.spark.sql.functions.spark_partition_id().as("pid"),
        $"zkey")
      .groupBy("pid")
      .agg(org.apache.spark.sql.functions.min("zkey").as("lo"),
        org.apache.spark.sql.functions.max("zkey").as("hi"),
        org.apache.spark.sql.functions.count("*").as("n"))
      .orderBy("pid")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(perPart.map(_._4).sum === 100L)
    assert(perPart.forall { case (_, lo, hi, _) =>
      lo >= 0L && hi < (1L << 32) && lo <= hi })
    // range partitioning: every partition's span sits strictly below
    // the next one's — each output file owns one contiguous key range
    for (Seq(a, b) <- perPart.sliding(2).toSeq if perPart.size > 1)
      assert(a._3 <= b._2, s"overlapping key ranges: $a vs $b")
    // rows inside a partition arrive key-sorted (tight footer stats)
    val sortedWithin = clustered.select($"zkey")
      .mapPartitions { it =>
        val ks = it.map(_.getLong(0)).toSeq
        Iterator.single(ks == ks.sorted)
      }.collect()
    assert(sortedWithin.forall(identity))
  }

  test("hilbert clustered write: disjoint sorted key ranges, keys in [0, 2^30)") {
    val rows = for (u <- 0L until 10L; t <- 0L until 10L)
      yield (10 * u + t, u, t * 1000000L)
    val events = rows.toDF("event_id", "user_id", "ts_us")
    val clustered = graft.operators.Events.hilbertClustered(events, 4)
    val perPart = clustered
      .select(org.apache.spark.sql.functions.spark_partition_id().as("pid"),
        $"hkey")
      .groupBy("pid")
      .agg(org.apache.spark.sql.functions.min("hkey").as("lo"),
        org.apache.spark.sql.functions.max("hkey").as("hi"),
        org.apache.spark.sql.functions.count("*").as("n"))
      .orderBy("pid")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(perPart.map(_._4).sum === 100L)
    assert(perPart.forall { case (_, lo, hi, _) =>
      lo >= 0L && hi < (1L << 30) && lo <= hi })
    for (Seq(a, b) <- perPart.sliding(2).toSeq if perPart.size > 1)
      assert(a._3 <= b._2, s"overlapping key ranges: $a vs $b")
    // the writer's key agrees with the audit's curve: at full resolution
    // the audit buckets ARE hilbert keys, and every written key must be
    // one of them
    val auditKeys = graft.operators.Events
      .hilbertLayoutDf(events, bucketsLog2 = 30)
      .where($"layout" === "hilbert")
      .select($"bucket").as[Long].collect().toSet
    val written = clustered.select($"hkey").as[Long].collect().toSet
    assert(written.subsetOf(auditKeys),
      "writer keys diverge from the audited hilbert curve")
  }

  test("3-D zorder audit: corner cells interleave to bucket = u + 2t + 4c") {
    // Binary dims {0,1}³ normalize to codes {0, 1023} (all ten bits set),
    // so at bucketsLog2 = 3 the bucket is the key's top three bits — the
    // i = 9 interleave slot: bit 29 = c, 28 = t, 27 = u. Every corner
    // lands alone in bucket u + 2t + 4c with zero spans; the hand-check
    // that the N-D fold interleaves dimensions in declaration order.
    val rows = for (u <- 0L to 1L; t <- 0L to 1L; c <- 0L to 1L)
      yield (u, t, c)
    val got = graft.operators.Events
      .zorderLayoutNDf(rows.toDF("u", "t", "c"), Seq("u", "t", "c"),
        bucketsLog2 = 3)
      .where($"layout" === "zorder")
      .select($"bucket", $"n", $"min_u", $"min_t", $"min_c",
        $"span_u", $"span_t", $"span_c")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) === (0L to 7L))
    for ((bucket, n, u, t, c, su, st, sc) <- got) {
      assert(n === 1L)
      assert(bucket === u + 2 * t + 4 * c, s"corner ($u,$t,$c) in bucket $bucket")
      assert(su === 0L && st === 0L && sc === 0L)
    }
  }

  test("N-D zorder: >30 dimensions fail loudly, never a silent null bucket") {
    // bits = 30/n; at n > 30 that is 0 → maxCode = 0 and the SQL
    // normalization's `div 0` would NULL every code — one null bucket
    // instead of a layout. Both the audit and the writer must refuse.
    val dims = (0 until 31).map(i => s"d$i")
    val row = spark.range(1).selectExpr(dims.map(d => s"id as $d"): _*)
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.Events.zorderLayoutNDf(row, dims)
    }
    assert(e1.getMessage.contains("1..30"))
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Events.zorderClusteredN(row, dims, 4)
    }
    assert(e2.getMessage.contains("1..30"))
    intercept[IllegalArgumentException] {
      graft.operators.Events.zorderClusteredN(row, Nil, 4)
    }: Unit
  }

  test("3-D clustered write: disjoint key ranges, third dimension prunes") {
    val rows = for (u <- 0L until 8L; t <- 0L until 8L; c <- 0L until 4L)
      yield (u * 100 + t * 10 + c, u, t * 1000000L, c)
    val events = rows.toDF("event_id", "user_id", "ts_us", "c")
    val clustered = graft.operators.Events
      .zorderClusteredN(events, Seq("user_id", "ts_us", "c"), 8)
    val perPart = clustered
      .select(org.apache.spark.sql.functions.spark_partition_id().as("pid"), $"zkey")
      .groupBy("pid")
      .agg(org.apache.spark.sql.functions.min("zkey").as("lo"),
        org.apache.spark.sql.functions.max("zkey").as("hi"),
        org.apache.spark.sql.functions.count("*").as("n"))
      .orderBy("pid")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(perPart.map(_._4).sum === 256L)
    assert(perPart.forall { case (_, lo, hi, _) =>
      lo >= 0L && hi < (1L << 30) && lo <= hi })
    for (Seq(a, b) <- perPart.sliding(2).toSeq if perPart.size > 1)
      assert(a._3 <= b._2, s"overlapping key ranges: $a vs $b")
  }

  test("file-level audit: measured per-file stats — clustering beats linear on the probe dim") {
    // The model→measurement closure: WRITE both layouts, read the actual
    // files back, and compare measured min/max pruning — file sizing and
    // the range partitioner's sampling included.
    val rows = for (u <- 0L until 32L; t <- 0L until 32L)
      yield (32 * u + t, u, t * 1000000L)
    val events = rows.toDF("event_id", "user_id", "ts_us")
    val scratch = java.nio.file.Files.createTempDirectory("graft-filelayout")
    try {
      graft.operators.Events.zorderClusteredN(events, Seq("user_id", "ts_us"), 8)
        .write.mode("overwrite").parquet(scratch.resolve("z").toString)
      graft.operators.Events.hilbertClustered(events, 8)
        .write.mode("overwrite").parquet(scratch.resolve("h").toString)
      events.repartitionByRange(8, $"ts_us").sortWithinPartitions("ts_us")
        .write.mode("overwrite").parquet(scratch.resolve("lin").toString)
      def audit(sub: String) = graft.operators.Events.fileLayoutAuditDf(
        spark.read.parquet(scratch.resolve(sub).toString), Seq("user_id", "ts_us"))
      val zAudit = audit("z").collect()
      val lAudit = audit("lin").collect()
      // every row lands in exactly one file under both layouts
      assert(zAudit.map(_.getAs[Long]("n")).sum === 1024L)
      assert(lAudit.map(_.getAs[Long]("n")).sum === 1024L)
      val probes = (0L until 8L).toDF("pv")
      def frac(a: org.apache.spark.sql.DataFrame) = graft.operators.Events
        .fileSkipFractionDf(a, probes, "user_id")
        .collect().head.getAs[Long]("scan_e4")
      val hAudit = audit("h").collect()
      assert(hAudit.map(_.getAs[Long]("n")).sum === 1024L)
      val (zf, lf, hf) = (frac(audit("z")), frac(audit("lin")), frac(audit("h")))
      // time-linear files each span the FULL user domain (scan everything);
      // the clustered files bound user spans, so measured pruning is real
      assert(lf === 10000L, s"linear layout should measure no user pruning, got $lf")
      assert(zf < 7500L, s"clustered layout measured no real file pruning: $zf e4")
      // the hilbert writer is the z-order writer's twin on the stronger
      // curve: its files must bound user spans too, measured on the
      // ACTUAL parquet artifact, not just the modeled buckets
      assert(hf < 7500L, s"hilbert layout measured no real file pruning: $hf e4")
    } finally graft.sources.ArtifactCache.rmTree(scratch.toString)
  }

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

  test("paths: transitions follow per-user time order, cross-user pairs never count") {
    val events = Seq(
      // u1: view -> click -> view  (out-of-order insert checks the sort)
      (1L, 10L, 100L, "view"), (1L, 12L, 300L, "view"), (1L, 11L, 200L, "click"),
      // u2: view -> click
      (2L, 20L, 100L, "view"), (2L, 21L, 150L, "click"),
      // u3: single event — no transition
      (3L, 30L, 100L, "purchase")
    ).toDF("user_id", "event_id", "ts_us", "event_type")
    val got = Events.pathsDf(events)
      .as[(String, String, Long)].collect().toSeq
    assert(got === Seq(("view", "click", 2L), ("click", "view", 1L)))
  }

  test("retention: cohort = first active day, cells count active cohort users") {
    val day = Events.DayUs
    val events = Seq(
      // u1 cohort day0, active days 0,1,3 (two events on day 1 count once)
      (1L, 0L), (1L, day + 5L), (1L, day + 6L), (1L, 3 * day + 1L),
      // u2 cohort day0, active days 0,1
      (2L, 10L), (2L, day + 99L),
      // u3 cohort day1 only
      (3L, day + 42L)
    ).toDF("user_id", "ts_us")
    val got = Events.retentionDf(events)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (0L, 0L, 2L, 2L, 10000L),
      (0L, 1L, 2L, 2L, 10000L),
      (0L, 3L, 1L, 2L, 5000L),
      (1L, 0L, 1L, 1L, 10000L)))
  }

  test("anomaly: zero-variance series flags nothing; a 3-sigma spike flags") {
    val hour = Events.HourUs
    val flat = (0 to 3).flatMap(h => Seq(("a", h * hour + 1L), ("a", h * hour + 2L)))
    // type b: nine hours of 1 event + one hour of 11 events
    // n=10, S=20, Q=130 -> mean 2, sd 3, spike z = (11-2)/3 = exactly 3.0
    val spiky = (0 to 8).map(h => ("b", h * hour + 1L)) ++
      (1 to 11).map(i => ("b", 9 * hour + i.toLong))
    val got = Events.anomalyDf((flat ++ spiky).toDF("event_type", "ts_us"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val aRows = got.filter(_._1 == "a")
    assert(aRows.forall(r => r._4 == 0L && r._5 == 0L), s"flat series must not flag: $aRows")
    val spike = got.find(r => r._1 == "b" && r._2 == 9L).get
    assert(spike._3 === 11L && spike._4 === 30000L && spike._5 === 1L)
    val normal = got.find(r => r._1 == "b" && r._2 == 0L).get
    assert(normal._4 === -3333L && normal._5 === 0L)
  }

  test("anomaly dense: a silent hour in a steady series flags; the sparse view cannot see it") {
    val hour = Events.HourUs
    // Type "a": 9 events in each of hours 0..10 EXCEPT hour 5 (an outage).
    // Dense stats: n=11, S=90, Q=810 -> mean 8.1818, sd 2.5873,
    // z(0) = -3.1623 -> flags at the 3-sigma bar.
    val events = (0 to 10).filter(_ != 5)
      .flatMap(h => (1 to 9).map(i => ("a", h * hour + i.toLong)))
      .toDF("event_type", "ts_us")
    val dense = Events.anomalyDenseDf(events)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(dense.length === 11, "dense view must materialize every hour in range")
    val silent = dense.find(_._2 == 5L).get
    def zE4(c: Long, n: Int, s: BigInt, q: BigInt): Long = {
      val z = (c - s.toDouble / n) /
        math.sqrt((BigInt(n) * q - s * s).toDouble / (n.toLong * n))
      BigDecimal(z * 10000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    assert(silent._3 === 0L)
    assert(silent._4 === zE4(0, 11, 90, 810))
    assert(silent._5 === 1L, "the outage hour must flag")
    // The sparse sibling has no row for hour 5 at all — and with the
    // zero-hour absent from its own baseline, nothing flags.
    val sparse = Events.anomalyDf(events)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(sparse.length === 10)
    assert(!sparse.exists(_._2 == 5L))
    assert(sparse.forall(_._5 === 0L))
  }

  test("anomaly: moments stay exact past the 64-bit bound (Decimal(38,0) sums)") {
    // cnt = 4e9 squares to 1.6e19 > Long.MaxValue — the old 64-bit moment
    // sum wrapped silently here; the Decimal(38,0) upgrade must match the
    // exact 128-bit arithmetic. Expected values mirror the operator: BigInt
    // moments, then the same double ops in the same order, HALF_UP e4 round.
    val counts = Seq(4000000000L, 4000000000L, 4000000000L, 7000000000L)
    val hourly = counts.zipWithIndex
      .map { case (c, h) => ("x", h.toLong, c) }
      .toDF("event_type", "hour_idx", "cnt")
    val n = counts.size
    val s = counts.map(BigInt(_)).sum
    val q = counts.map(c => BigInt(c) * BigInt(c)).sum
    def zE4(c: Long): Long = {
      val z = (c - s.toDouble / n) /
        math.sqrt((BigInt(n) * q - s * s).toDouble / (n.toLong * n))
      BigDecimal(z * 10000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val got = Events.anomalyHourlyDf(hourly)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._4) === counts.map(zE4))
    assert(got.forall(_._4 != 0L), "planted series has real variance; a zero z_e4 means the moments overflowed")
  }

  test("attribution: last touch wins, same-instant touch attributes, none bucket") {
    // user 1: view@10 → click@20 → purchase@30 (5.00) → last touch = click.
    //         then purchase@40 (1.00) with no newer touch → still click.
    // user 2: purchase@5 (2.00) with no preceding touch → none.
    // user 3: touch and purchase at the SAME µs → attributes (ASOF >=).
    val events = Seq(
      (1L, 1L, "view", 10L, 0.0), (2L, 1L, "click", 20L, 0.0),
      (3L, 1L, "purchase", 30L, 5.0), (4L, 1L, "purchase", 40L, 1.0),
      (5L, 2L, "purchase", 5L, 2.0),
      (6L, 3L, "view", 7L, 0.0), (7L, 3L, "purchase", 7L, 3.0))
      .toDF("event_id", "user_id", "event_type", "ts_us", "value")
    val got = Events.attributionDf(events)
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("click", 2L, 600L),
      ("none", 1L, 200L),
      ("view", 1L, 300L)))
  }

  test("experiment: deterministic arms, conversion counted once per user") {
    import graft.functions.Fns.polyHash
    import org.apache.spark.sql.functions.{col, concat, lit, pmod}
    val events = Seq(
      (1L, "view"), (1L, "purchase"), (1L, "purchase"), // converts once
      (2L, "view"), (2L, "click"),                      // does not convert
      (3L, "purchase"),                                 // converts
      (4L, "view")                                      // does not convert
    ).toDF("user_id", "event_type")
    val got = Events.experimentDf(events)
      .as[(String, Long, Long, Long)].collect().toSeq
    // recompute arms with the same hash to stay robust to the split
    val arms = Seq(1L, 2L, 3L, 4L).toDF("user_id")
      .select(col("user_id"),
        pmod(polyHash(concat(lit("exp:"), col("user_id").cast("string"))), lit(2L))
          .as("arm"))
      .as[(Long, Long)].collect().toMap
    val conv = Map(1L -> 1L, 2L -> 0L, 3L -> 1L, 4L -> 0L)
    def expect(arm: Long, name: String) = {
      val us = arms.filter(_._2 == arm).keys.toSeq
      if (us.isEmpty) None
      else Some((name, us.size.toLong, us.map(conv).sum,
        math.round(us.map(conv).sum * 10000.0 / us.size)))
    }
    assert(got === Seq(expect(0L, "control"), expect(1L, "treatment")).flatten)
    // totals: 4 users, 2 conversions across both arms
    assert(got.map(_._2).sum === 4L && got.map(_._3).sum === 2L)
  }

  test("tolerance as-of: kept within bound, clipped beyond, sentinel without") {
    val tol = 1000L
    val events = Seq(
      // user 1: view at 100, purchase at 500 → within bound, matched
      (1L, 10L, "view", 100L), (1L, 11L, "purchase", 500L),
      // user 1: second purchase at 2000 → last view 100 is stale (>1000)
      (1L, 12L, "purchase", 2000L),
      // user 2: purchase with no view at all → sentinel
      (2L, 20L, "purchase", 300L),
      // user 3: two views at the same µs — max event_id wins the tie
      (3L, 30L, "view", 50L), (3L, 31L, "view", 50L), (3L, 32L, "purchase", 60L),
      // user 4: a legitimate PRE-EPOCH view (negative µs) inside the
      // bound still matches — the no-match test is the null carry, not
      // the sign (the `vu >= 0` form sentineled this case wrongly)
      (4L, 40L, "view", -500L), (4L, 41L, "purchase", 100L)
    ).toDF("user_id", "event_id", "event_type", "ts_us")
    val got = Events.asofViewToleranceDf(events, tol)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (11L, 1L, 500L, 10L, 100L),
      (12L, 1L, 2000L, -1L, -1L),
      (20L, 2L, 300L, -1L, -1L),
      (32L, 3L, 60L, 31L, 50L),
      (41L, 4L, 100L, 40L, -500L)))
  }

  test("sliding counts: each event lands in exactly its 4 covering windows") {
    val q = Events.SlideUs // one slide quarter
    val events = Seq(
      // event in quarter 10 → windows 7..10
      (1L, "view", 10 * q + 1),
      // event in quarter 11 → windows 8..11: overlap with the first on 8,9,10
      (2L, "view", 11 * q + 5),
      // event in quarter 1 → windows 0,1 survive; -2,-1 clipped at epoch
      (3L, "click", 1 * q),
      // PRE-epoch event: floor division puts it in quarter -1 → windows
      // -4..-1, ALL clipped — `div` truncation would have smuggled it
      // into window 0, which does not contain it (and the streaming
      // engine's floor-based windows would disagree)
      (4L, "click", -500L)
    ).toDF("event_id", "event_type", "ts_us")
    val got = Events.slidingCountsDf(events)
      .as[(Long, Long, String, Long)].collect().toSeq
    val expected = Seq(
      (0L, "click", 1L), (1L, "click", 1L),
      (7L, "view", 1L), (8L, "view", 2L), (9L, "view", 2L),
      (10L, "view", 2L), (11L, "view", 1L)
    ).map { case (w, t, c) => (w, w * q, t, c) }
    assert(got === expected)
  }

  test("native session_window: planted sessions exact, inclusive at the gap boundary") {
    val gap = 1800000000L // 30 min in µs
    val events = Seq(
      // user 1: exactly-gap pair MERGES (inclusive overlap — pinned here;
      // an exceeding gap splits), so all three land in one session
      (1L, 0L), (1L, gap), (1L, gap + 5L),
      // user 1: beyond the gap from the previous event — a new session
      (1L, gap + 5L + gap + 1L),
      // user 2: one merged session (all gaps < 30 min)
      (2L, 100L), (2L, 100L + gap - 1L)
    ).toDF("user_id", "ts_us")
    val got = Events.sessionizeNativeDf(events)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 0L, gap + 5L + gap, 3L),
      (1L, gap + 5L + gap + 1L, gap + 5L + gap + 1L + gap, 1L),
      (2L, 100L, 100L + gap - 1L + gap, 2L)))
    // Corpus-level consistency with the lag+cumsum form: the inclusive
    // merge equals the lag form's strict-> split, so the partitions are
    // identical — assert event conservation and per-user session counts.
    val native = Events.sessionizeNative(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long)].collect()
    val lagged = Events.sessionize(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(native.map(_._4).sum === lagged.map(_._3).sum,
      "the two sessionizers disagree on total event count")
    val nCounts = native.groupBy(_._1).view.mapValues(_.length).toMap
    val lCounts = lagged.groupBy(_._1).view.mapValues(_.length).toMap
    assert(nCounts === lCounts,
      "per-user session counts diverge between the two sessionizers")
    // start_us of native sessions = min event times; windows don't overlap
    for ((u, rows) <- native.groupBy(_._1)) {
      val sorted = rows.sortBy(_._2)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 <= b._2
        case _ => true
      }, s"user $u native session windows overlap")
    }
  }

  test("interval overlap: planted sessions match exactly the hours they span") {
    val hr = 3600000000L
    // Busiest hours by construction: hour 0 (4 events) and hour 2
    // (3 events); hour 5 has 1. K = 5 admits all three occupied hours.
    val events = Seq(
      // user 1: one session inside hour 0 only
      (1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L),
      // user 2: a session spanning hour 0 into hour 2? no — gap > 30 min
      // splits; give user 2 one session fully inside hour 2
      (2L, 4L, 2 * hr + 5L), (2L, 5L, 2 * hr + 10L), (2L, 6L, 2 * hr + 15L),
      // user 3: a LONG session touching hours 0 and... events 25 min apart
      // chained from hour 0 end into hour 1 start — overlaps hours 0 and 1,
      // but hour 1 has fewer events than the cap admits anyway (K = 5).
      (3L, 7L, hr - 100L), (3L, 8L, hr + 100L),
      // filler to make hour 0 busiest
      (4L, 9L, 500L),
      // a lone event in hour 5
      (5L, 10L, 5 * hr + 1L)
    ).toDF("user_id", "event_id", "ts_us")
    val got = Events.intervalOverlapDf(events)
      .select("user_id", "session_id", "hour_us")
      .as[(Long, Long, Long)].collect().toSet
    // All 5 occupied-hour windows are admitted (≤ K distinct hours), so
    // the expected pairs are exactly each session × the hours it spans.
    assert(got === Set(
      (1L, 0L, 0L),
      (2L, 0L, 2 * hr),
      (3L, 0L, 0L), (3L, 0L, hr), // the cross-boundary session hits both
      (4L, 0L, 0L),
      (5L, 0L, 5 * hr)))
    // Corpus smoke: every emitted pair satisfies the overlap predicate.
    val corpus = Events.intervalOverlap(spark, TestSpark.sf)
      .select("start_us", "end_us", "hour_us")
      .as[(Long, Long, Long)].collect()
    assert(corpus.nonEmpty)
    assert(corpus.forall { case (s, e, h) => s < h + hr && e >= h },
      "an emitted pair violates the overlap predicate")
  }

  test("interval all-pairs: boundary-straddling pair emitted once, bin-mates need real overlap") {
    val hr = 3600000000L
    val events = Seq(
      // user 1: a session straddling the hour-0/hour-1 boundary
      // [hr-200, hr+200] (two events 400 µs apart across the boundary)
      (1L, 1L, hr - 200L), (1L, 2L, hr + 200L),
      // user 2: overlaps user 1 across the SAME boundary [hr-100, hr+100]
      // — the pair shares BOTH bins 0 and 1 and must come out ONCE
      (2L, 3L, hr - 100L), (2L, 4L, hr + 100L),
      // user 3: inside hour 0 but BEFORE user 1 starts — shares bin 0
      // with users 1 and 2 yet overlaps NEITHER (bin-mates, no overlap)
      (3L, 5L, 10L), (3L, 6L, 20L),
      // user 4: inside hour 1, strictly after both end — same: no pair
      (4L, 7L, hr + 1000L), (4L, 8L, hr + 2000L)
    ).toDF("user_id", "event_id", "ts_us")
    val got = Events.intervalAllPairsDf(events)
      .select("user_a", "session_a", "user_b", "session_b", "ov_start_us",
        "ov_end_us", "overlap_us")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // Exactly ONE pair: (1,0)×(2,0), overlap [hr-100, hr+100], despite
    // hitting in two shared hour bins.
    assert(got === Seq((1L, 0L, 2L, 0L, hr - 100L, hr + 100L, 200L)),
      s"expected the single straddling pair once, got $got")
    // Corpus smoke: canonical ordering and a non-negative overlap on
    // every emitted pair.
    val corpus = Events.intervalAllPairs(spark, TestSpark.sf)
      .select("user_a", "session_a", "user_b", "session_b", "overlap_us")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(corpus.nonEmpty)
    assert(corpus.forall { case (ua, sa, ub, sb, ov) =>
      (ua < ub || (ua == ub && sa < sb)) && ov >= 0 })
    // No duplicate pairs survived the bin explosion.
    val keys = corpus.map(r => (r._1, r._2, r._3, r._4))
    assert(keys.distinct.length == keys.length, "duplicate pair emitted")
  }

  test("interval all-pairs: per-bin cap drops the planted hot hour's C^2 fan-out, straddlers survive via cold bins") {
    val hr = 3600000000L
    // HOT hour 0: users 1..6 each run one session inside it (occupancy
    // 6 in bin 0 — uncapped, that bin alone owes C(C-1)/2 = 15 pairs).
    val hot = (1L to 6L).flatMap(u =>
      Seq((u, 2 * u, 1000L + u), (u, 2 * u + 1, 2000L + u)))
    // Users 7 and 8 straddle the hour-0/1 boundary and overlap each
    // other on BOTH sides: their pair shares hot bin 0 AND cold bin 1.
    val straddle = Seq(
      (7L, 100L, hr - 200L), (7L, 101L, hr + 200L),
      (8L, 102L, hr - 100L), (8L, 103L, hr + 100L))
    val events = (hot ++ straddle).toDF("user_id", "event_id", "ts_us")
    // Uncapped (the declared query's exact semantics): the hot hour's
    // 15 pairs, 6x2=12 hot-vs-straddler pairs... compute instead by
    // predicate: count pairs exactly.
    val exact = Events.intervalAllPairsDf(events)
      .select("user_a", "user_b").as[(Long, Long)].collect().toSet
    // Hot sessions [1000+u, 2000+u] pairwise overlap (15 pairs); they
    // do NOT overlap the straddlers (which start at hr-200); straddlers
    // overlap each other.
    assert(exact.size === 16, s"exact semantics: 15 hot + 1 straddler, got $exact")
    assert(exact.contains((7L, 8L)))
    // Capped at 8: bin 0 has occupancy 8 (6 hot + 2 straddlers) > cap?
    // No — equal to 8 survives; cap at 7 drops bin 0 whole. The
    // straddler pair must STILL emerge via cold bin 1; every hot-only
    // pair is lost — the explicit completeness trade.
    val capped = Events.intervalAllPairsDf(events, perBinCap = 7L)
      .select("user_a", "user_b").as[(Long, Long)].collect().toSet
    assert(capped === Set((7L, 8L)),
      s"cap must drop the hot bin whole and keep the cold-bin pair, got $capped")
    // Cap above occupancy = exact semantics unchanged.
    val loose = Events.intervalAllPairsDf(events, perBinCap = 100L)
      .select("user_a", "user_b").as[(Long, Long)].collect().toSet
    assert(loose === exact, "a non-binding cap must not change the result")
  }

  test("value histogram: bins cover, counts conserve, widths equal and aligned") {
    val rows = Events.valueHistogram(spark, TestSpark.sf)
      .as[(String, Long, Long, Long, Long)].collect()
    val total = graft.sources.Tables.events(spark, TestSpark.sf).count()
    assert(rows.map(_._5).sum === total, "histogram loses or double-counts rows")
    for ((t, group) <- rows.groupBy(_._1)) {
      val w = group.head._4 - group.head._3
      assert(group.forall(r => r._4 - r._3 === w), s"$t: unequal bin widths")
      assert(group.forall(r => r._2 >= 0 && r._2 < Events.HistBins),
        s"$t: bin index out of range")
      assert(group.forall(r => r._3 === group.map(_._3).min + r._2 * w),
        s"$t: bin bounds not aligned to the grid")
    }
    // Planted: constant values collapse to one bin of width 1.
    val const = Seq(("x", 2.0), ("x", 2.0), ("x", 2.0)).toDF("event_type", "value")
    val g = Events.valueHistogramDf(const)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(g === Seq(("x", 0L, 200L, 201L, 3L)))
  }

  test("nearest as-of is the row-wise best of the two directional joins") {
    val back = Events.asofJoinOrders(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._4, r._5))).toMap
    val fwd = Events.asofJoinOrdersFwd(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._4, r._5))).toMap
    val got = Events.asofJoinOrdersNearest(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty && got.length === back.size)
    for ((eid, _, ts, nk, nu) <- got) {
      val (pk, pu) = back(eid)
      val (fk, fu) = fwd(eid)
      // the independent decision rule: backward wins ties and missing
      // sides lose; sentinel only when both directions are sentinels
      val expected =
        if (pu >= 0 && (fu < 0 || ts - pu <= fu - ts)) (pk, pu)
        else if (fu >= 0) (fk, fu)
        else (-1L, -1L)
      assert((nk, nu) === expected, s"event $eid nearest mismatch")
      // nearest is at least as close as either direction
      if (nu >= 0 && pu >= 0) assert(math.abs(ts - nu) <= ts - pu)
      if (nu >= 0 && fu >= 0) assert(math.abs(ts - nu) <= fu - ts)
    }
  }
}
