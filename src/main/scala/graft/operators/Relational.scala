package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns._
import graft.sources.Tables._

/** Relational operator suite over the TPC-H-ish corpus.
  *
  * None of these exist in the reference (SURVEY §2.B — it has no joins,
  * windows, or scalar-function library); they are the declared query contract
  * that makes the rebuild a complete engine. All plans are pure DataFrame
  * declarations: Catalyst handles predicate pushdown into the Parquet scan,
  * column pruning, join selection (broadcast for the ≤25-row dims), partial
  * aggregation, and AQE handles runtime coalescing/skew at scale.
  *
  * Determinism rules (SURVEY §2.D): every query ends in a total ORDER BY;
  * money is integer cents; ranks tie-break on a unique key.
  */
object Relational {

  /** Filter + arithmetic projection; the predicate reaches the Parquet scan
    * (PushedFilters) so at 100 TB only the matching row groups are read. */
  def scanFilterProject(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp_ntz"))
      .select(
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_cents"))
      .orderBy("l_orderkey", "l_linenumber")

  /** TPC-H Q1 shape: group by flag/status with count + integer-cent sums.
    * Partial agg runs map-side; shuffle carries ≤ (#flags × #statuses) rows
    * per task regardless of input size. */
  def aggPricingSummary(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("cnt"),
        sum(cents(col("l_quantity"))).as("sum_qty_c"),
        sum(cents(col("l_extendedprice"))).as("sum_price_c"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_c"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Global top-20 orders by price — TakeOrderedAndProject, the distributed
    * twin of the reference's heap-based most_common(20) (coordinator.py:126). */
  def topkOrders(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("total_c"))
      .orderBy(desc("total_c"), asc("o_orderkey"))
      .limit(20)

  /** UNION / INTERSECT / EXCEPT (distinct semantics) of two filtered key sets,
    * tagged and stacked so one result exercises all three set ops. */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val a = c.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
    val b = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val tagged =
      a.intersect(b).select(lit("both").as("op"), col("c_custkey"))
        .unionAll(a.except(b).select(lit("high_bal_only").as("op"), col("c_custkey")))
        .unionAll(a.union(b).distinct().select(lit("either").as("op"), col("c_custkey")))
    tagged.orderBy("op", "c_custkey")
  }

  /** Broadcast dim⋈dim join: region (5 rows) is broadcast, no shuffle. */
  def joinBroadcast(s: SparkSession, d: String): DataFrame =
    nation(s, d)
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"), col("r_name"))
      .orderBy("n_nationkey")

  /** TPC-H Q5 shape: revenue per nation for one region. Fact⋈fact
    * (orders⋈lineitem) shuffles on the join key; the dims (customer at test
    * scale, nation, region) broadcast. At 100 TB AQE picks shuffled-hash /
    * skew-split for the fact join; the dim broadcasts are size-driven. */
  def joinMultiway(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"))
      .join(lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_c"))
      .orderBy(desc("revenue_c"), asc("n_name"))

  /** Supplier-side revenue (TPC-H Q5-adjacent through the supplier
    * dimension): fact⋈dim joins on suppkey/nationkey — supplier and nation
    * broadcast at test scale, AQE re-plans when a dim outgrows the
    * threshold — then top-20 suppliers by integer-cent revenue with a
    * deterministic tie-break. Completes "every corpus table exercised". */
  def supplierRevenue(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy("s_suppkey", "s_name", "n_name")
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_c"))
      .orderBy(desc("revenue_c"), asc("s_suppkey"))
      .limit(20)

  /** Customers WITH orders (EXISTS) — left-semi hash join. */
  def joinSemi(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** Customers WITHOUT orders in 2001 (NOT EXISTS) — left-anti hash join.
    * (Restricted to a year so the result is non-empty on this corpus: every
    * customer has at least one order overall.) */
  def joinAnti(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(orders(s, d).filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp_ntz")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  /** ROLLUP(n_name, o_orderpriority) counts with explicit grouping flags to
    * disambiguate subtotal NULLs, explicit NULLS FIRST ordering (rule R1).
    * Expressed through the SQL front-end: the Dataset-API
    * rollup().agg(grouping(...)) trips Spark 4's DetectAmbiguousSelfJoin
    * false-positively (Expand duplicates the grouping attrs); the SQL path
    * resolves to the identical Aggregate-over-Expand plan without the
    * dataset-id metadata that confuses the check. The BROADCAST hint pins the
    * 25-row nation dim. */
  def aggRollup(s: SparkSession, d: String): DataFrame =
    s.sql(
      s"""SELECT /*+ BROADCAST(n) */
         |  CAST(grouping(n_name) AS BIGINT) AS g_n,
         |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_p,
         |  n_name, o_orderpriority, count(*) AS cnt
         |FROM parquet.`$d/orders.parquet` o
         |JOIN parquet.`$d/customer.parquet` c ON o_custkey = c_custkey
         |JOIN parquet.`$d/nation.parquet` n ON c_nationkey = n_nationkey
         |GROUP BY ROLLUP (n_name, o_orderpriority)
         |ORDER BY g_n, g_p, n_name ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
         |""".stripMargin)

  /** CUBE(o_orderstatus, o_orderpriority) — all four grouping combinations
    * with grouping flags and integer-cent sums (single table, no join, so
    * the Dataset API cube works directly; contrast aggRollup). */
  def aggCube(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d).select(
      col("o_orderstatus"), col("o_orderpriority"),
      cents(col("o_totalprice")).as("total_c"))
    base
      .cube(base("o_orderstatus"), base("o_orderpriority"))
      .agg(
        grouping(base("o_orderstatus")).cast("long").as("g_s"),
        grouping(base("o_orderpriority")).cast("long").as("g_p"),
        count(lit(1)).as("cnt"),
        sum(col("total_c")).as("sum_c"))
      .select(col("g_s"), col("g_p"), col("o_orderstatus"), col("o_orderpriority"),
        col("cnt"), col("sum_c"))
      .orderBy(col("g_s"), col("g_p"),
        col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  /** Exact discrete quantiles (p50/p90/p99 of integer-cent order totals per
    * priority) via the SQL-standard `percentile_disc` — a sort-based
    * aggregate, grouped on a tiny key. percentile_disc RETURNS AN ELEMENT
    * (smallest value whose cume_dist ≥ p), so on integer cents the result is
    * an exact integer on every engine — unlike percentile_cont's
    * interpolated float, which rule R2 would bar from the oracle. At scale
    * prefer approx_percentile for one-pass sketching; this is the exact
    * contract it approximates. */
  def aggQuantiles(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderpriority"), cents(col("o_totalprice")).as("total_c"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("cnt"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY total_c)").cast("long").as("p50_c"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY total_c)").cast("long").as("p90_c"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY total_c)").cast("long").as("p99_c"))
      .orderBy("o_orderpriority")

  /** Sketch twin of [[aggQuantiles]]: Greenwald-Khanna approx_percentile.
    * At 100 TB the exact per-group percentile materializes and sorts every
    * group's values; the sketch keeps a fixed-size summary per group and
    * merges map-side — the same scale argument as the HLL distinct-count
    * twin. rows-only in the gate (summary merge order is engine-specific);
    * RelationalSpec gates each estimate against the exact twin's rank
    * tolerance, mirroring the distinct_words_approx pattern. */
  def aggQuantilesApprox(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderpriority"), cents(col("o_totalprice")).as("total_c"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("cnt"),
        expr("approx_percentile(total_c, 0.5, 1000)").cast("long").as("p50_c"),
        expr("approx_percentile(total_c, 0.9, 1000)").cast("long").as("p90_c"),
        expr("approx_percentile(total_c, 0.99, 1000)").cast("long").as("p99_c"))
      .orderBy("o_orderpriority")

  /** Window-function suite in one pass: rank / dense_rank / lag / lead over
    * the same (custkey; totalprice desc, orderkey) frame — one shuffle + one
    * sort feeds all four. */
  def windowSuite(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("total_c"), asc("o_orderkey"))
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), cents(col("o_totalprice")).as("total_c"))
      .select(
        col("o_custkey"), col("o_orderkey"), col("total_c"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        lag("total_c", 1).over(w).as("prev_c"),
        lead("total_c", 1).over(w).as("next_c"))
      .orderBy("o_custkey", "rnk", "o_orderkey")
  }

  /** DISTRIBUTION window functions (`window_distribution`) — the family's
    * remaining built-ins: percent_rank ((rank−1)/(n−1), 0 on singleton
    * partitions — verified identical on both engines), cume_dist
    * (rows ≤ current / n), and the value-positional first/nth over the
    * same per-customer total order as [[windowSuite]]. Both fractions are
    * one double division in the same op order, e4-rounded (rule R2's
    * pinned-float treatment); nth_value(2) under the default
    * running frame is NULL until the second row on both engines (the
    * unique orderkey tiebreak makes RANGE ≡ ROWS — no tie ambiguity).
    * Same scale shape as every ranking window here: one shuffle + sort
    * on the high-cardinality customer key. */
  def windowDistribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("total_c"), asc("o_orderkey"))
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        cents(col("o_totalprice")).as("total_c"))
      .select(
        col("o_custkey"), col("o_orderkey"), col("total_c"),
        round(percent_rank().over(w) * 10000).cast("long").as("pr_e4"),
        round(cume_dist().over(w) * 10000).cast("long").as("cd_e4"),
        first("total_c").over(w).as("best_c"),
        nth_value(col("total_c"), 2).over(w).as("second_c"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Top-3 orders per customer: row_number with deterministic tie-break. */
  def windowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** Running integer-cent sum per user over event time (frame: unbounded
    * preceding → current row), ordered on truncated-µs + event_id so both
    * engines see identical ordering (rule R4). */
  def windowRunning(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(
      col("user_id"), col("event_id"), col("ts_us"), cents(col("value")).as("v_c"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.select(col("user_id"), col("event_id"), col("ts_us"), sum(col("v_c")).over(w).as("run_c"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  /** Explicit GROUPING SETS — two independent groupings in one pass over the
    * fact table (neither ROLLUP's prefix lattice nor CUBE's full lattice):
    * per-status totals and per-priority totals, distinguished by grouping
    * flags. One Expand + one aggregate; at 100 TB this halves the scans a
    * naive two-query report would pay. SQL-expressed like aggRollup
    * (the Dataset rollup/grouping API trips DetectAmbiguousSelfJoin). */
  def aggGroupingSets(s: SparkSession, d: String): DataFrame =
    s.sql(
      s"""SELECT
         |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_s,
         |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_p,
         |  o_orderstatus, o_orderpriority, count(*) AS cnt,
         |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_c
         |FROM parquet.`$d/orders.parquet`
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
         |ORDER BY g_s, g_p, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
         |""".stripMargin)

  /** Left outer join with an aggregate right side: every customer, with 0
    * for the order-less ones (the missing-rows semantics `join_anti` only
    * witnesses). The aggregate runs BEFORE the join, so the join carries one
    * row per customer on each side — never the raw fact table. */
  def joinOuter(s: SparkSession, d: String): DataFrame = {
    val counts = orders(s, d).groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("spend_c"))
    customer(s, d).select(col("c_custkey"), col("c_name"))
      .join(counts.withColumnRenamed("o_custkey", "c_custkey"), Seq("c_custkey"), "left")
      .select(col("c_custkey"), col("c_name"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("spend_c"), lit(0L)).as("spend_c"))
      .orderBy("c_custkey")
  }

  // Pivot output columns — fixed and declared so the pivot never needs the
  // extra distinct-values scan Spark runs for an unspecified value list (at
  // 100 TB that implicit first pass is a full extra job).
  val OrderStatuses: Seq[String] = Seq("F", "O", "P")

  /** Pivot: order counts per priority × status, statuses as columns. The
    * declared value list keeps it one aggregation; absent combinations
    * surface as 0, matching the oracle's conditional-sum formulation. */
  def pivotStatus(s: SparkSession, d: String): DataFrame = {
    val p = orders(s, d)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", OrderStatuses)
      .agg(count(lit(1)))
    p.select(col("o_orderpriority") +:
        OrderStatuses.map(v => coalesce(col(v), lit(0L)).as(v)): _*)
      .orderBy("o_orderpriority")
  }

  /** UNPIVOT (melt): the wide [[pivotStatus]] table back to long form —
    * the reshape every metrics pipeline needs between storage layouts.
    * Deliberately NOT a plain groupBy twin: the pivot zero-FILLS missing
    * (priority, status) cells, so the melted table carries a row for
    * every combination including the empty ones — the semantic unpivot
    * preserves and a direct aggregate loses. Runs on Spark's native
    * `Dataset.unpivot` (the Expand operator — one pass, no join, no
    * shuffle beyond the upstream pivot's). */
  def unpivotStatus(s: SparkSession, d: String): DataFrame =
    pivotStatus(s, d)
      .unpivot(Array(col("o_orderpriority")),
        OrderStatuses.map(col).toArray, "o_orderstatus", "n")
      .orderBy("o_orderpriority", "o_orderstatus")

  /** RANGE-frame window: per customer, each order's spend plus all spend in
    * the preceding 30 days (frame bounds by VALUE distance on an integer
    * day column, not row offsets — peers with the same day aggregate
    * identically, which keeps ties deterministic without a tiebreak). */
  def windowRangeFrame(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      datediff(to_date(col("o_orderdate")), to_date(lit("1990-01-01")))
        .cast("long").as("day"),
      cents(col("o_totalprice")).as("total_c"))
    val w = Window.partitionBy("o_custkey").orderBy("day").rangeBetween(-30, 0)
    o.select(col("o_custkey"), col("o_orderkey"), col("day"),
        sum(col("total_c")).over(w).as("window_c"))
      .orderBy("o_custkey", "day", "o_orderkey")
  }

  /** Salted equi-join — the skew mitigation recipe from SCALE.md as code.
    * The skewed (probe) side gets a deterministic salt from a hash of its
    * row (uniform spread of a hot key across `salts` sub-keys); the build
    * side is replicated `salts` ways via explode. Joining on (key, salt)
    * yields exactly the plain-join result — each probe row meets exactly one
    * replica — while a hot key's rows fan across `salts` shuffle partitions
    * instead of one. AQE's skew-join splitting handles moderate skew on its
    * own; this is the explicit recipe for the pathological single-key case.
    * RelationalSpec asserts equality with the unsalted join. */
  def saltedJoin(skewed: DataFrame, build: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    val sl = skewed.withColumn("__salt",
      pmod(hash(skewed.columns.map(col): _*), lit(salts)))
    val sr = build.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    sl.join(sr, Seq(key, "__salt")).drop("__salt")
  }

  /** The salted join as a CONTRACT query (not just a recipe): lineitem ⋈
    * orders on the order key through [[saltedJoin]], aggregated to
    * per-priority revenue — the result is identical to the plain join (the
    * salt only re-routes rows between reducers), so the oracle is the
    * unsalted SQL join. RelationalSpec separately proves the placement
    * mechanics (one straggler bucket unsalted vs bounded buckets salted);
    * this query keeps the technique itself under the hash-match gate.
    * Scale note: AQE's skew split covers moderate skew automatically;
    * explicit salting is for the pathological single-key case where one
    * key alone exceeds a task, at the price of `salts`× the build side. */
  def joinSalted(s: SparkSession, d: String): DataFrame =
    saltedJoin(
      lineitem(s, d).select(col("l_orderkey").as("okey"),
        cents(col("l_extendedprice")).as("price_c")),
      orders(s, d).select(col("o_orderkey").as("okey"), col("o_orderpriority")),
      "okey")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"), sum("price_c").as("revenue_c"))
      .orderBy("o_orderpriority")

  /** Scalar string functions over part. */
  def scalarString(s: SparkSession, d: String): DataFrame =
    part(s, d).select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        col("p_name").substr(1, 8).as("name8"),
        length(col("p_type")).cast("long").as("type_len"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        when(col("p_name").like("%ar%"), lit(1L)).otherwise(lit(0L)).as("has_ar"))
      .orderBy("p_partkey")

  /** Scalar datetime functions over NTZ timestamps. */
  def scalarDatetime(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        to_date(date_trunc("month", col("o_orderdate"))).as("mstart"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1995-01-01"))).cast("long").as("days_since"))
      .orderBy("o_orderkey")

  /** Scalar math functions, integer-materialized outputs. */
  def scalarMath(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select(
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        e4(abs(col("l_discount") - lit(0.05))).as("absdisc_e4"),
        ceil(col("l_quantity")).cast("long").as("qty_ceil"),
        floor(col("l_quantity")).cast("long").as("qty_floor"),
        (col("l_orderkey") % 7).cast("long").as("okmod7"),
        signum(col("l_discount") - lit(0.05)).cast("long").as("sgn"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Scalar array functions over the embedding vectors (size / element_at /
    * slice+fold), float widened to double before any arithmetic. */
  def scalarArray(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    emb.select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        e4(element_at(col("embedding"), 1).cast("double")).as("e1_e4"),
        e4(element_at(col("embedding"), 33).cast("double")).as("e33_e4"),
        e4(aggregate(slice(toDoubleArr(col("embedding")), 1, 4), lit(0.0), (a, x) => a + x)).as("head4_sum_e4"))
      .orderBy("vec_id")
  }

  /** JSON extraction from the events props column. */
  def scalarJson(s: SparkSession, d: String): DataFrame =
    events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id")
}
