package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** DATA-QUALITY / VALIDATION surface — the profiling and expectation
  * checks (Deequ/Great-Expectations-shaped) a pipeline runs on every new
  * data drop BEFORE letting it near training: column profiles, key
  * integrity, referential integrity, null rates, domain constraints.
  * Every check is a plain aggregate/anti-join, so the whole battery is
  * oracle-checked like any other query — a validation layer nobody can
  * trust is worse than none.
  */
object DataQuality {

  /** COLUMN PROFILES over the documents table: per column, row count,
    * null count, distinct count, lexicographic/numeric min and max
    * (cast to string for a uniform report schema — doc_id/n_chars are
    * integers, so their string forms are engine-identical; doubles are
    * deliberately NOT profiled this way, rule R2).
    *
    * Scale shape: ONE pass per profiled column over a columnar scan that
    * prunes to just that column; each profile is a 1-row full aggregate
    * (count/min/max partial-aggregate map-side; the exact distinct is
    * the one shuffle, swap in approx_count_distinct at 100 TB — the HLL
    * twin — when exactness isn't contractual). The per-column frames
    * union into the report, so Spark runs them as independent stages of
    * one job. */
  def profile(s: SparkSession, d: String): DataFrame =
    profileDf(Tables.documents(s, d),
      Seq("doc_id", "lang", "source", "n_chars"))

  /** Same, over any frame and column list (planted tests). */
  def profileDf(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.select(
        lit(c).as("column"),
        count(lit(1)).as("n_rows"),
        sum(col(c).isNull.cast("long")).as("n_null"),
        count_distinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_v"),
        max(col(c)).cast("string").as("max_v"))
    }.reduce(_ unionAll _).orderBy("column")

  /** EXPECTATION BATTERY over the TPC-H-ish schema — the contract a
    * drop must satisfy: primary-key uniqueness, referential integrity
    * (FK anti-joins), null-freedom, and domain constraints. Emits one
    * row per check: (check, violations, pass) — violations is the count
    * of offending rows, so a failing drop reports HOW broken, not just
    * that it broke.
    *
    * Scale shape: uniqueness is one groupBy on the key; each FK check
    * is a LEFT ANTI join where the parent side is the (usually smaller)
    * dimension — broadcast when it fits, shuffle otherwise, exactly the
    * join it would be in a query; nulls/domains are map-side conditional
    * sums. The checks union into a checks×3 report — bounded output
    * however large the drop. */
  def expectations(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val lineitem = Tables.lineitem(s, d)
    val customer = Tables.customer(s, d)
    def check(name: String, violations: Column, from: DataFrame): DataFrame =
      from.agg(sum(violations.cast("long")).as("violations"))
        .select(lit(name).as("check"),
          coalesce(col("violations"), lit(0L)).as("violations"))
    val pkOrders = orders.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
      .agg(sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("violations"))
      .select(lit("pk_orders_unique").as("check"),
        coalesce(col("violations"), lit(0L)).as("violations"))
    val fkOrders = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("fk_orders_customer").as("check"), col("violations"))
    val fkLineitem = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("fk_lineitem_orders").as("check"), col("violations"))
    val checks = Seq(
      pkOrders,
      fkOrders,
      fkLineitem,
      check("null_customer_name", col("c_name").isNull, customer),
      check("range_discount_0_1",
        col("l_discount") < 0 || col("l_discount") > 1, lineitem),
      check("range_quantity_pos", col("l_quantity") <= 0, lineitem),
      check("enum_orderstatus",
        !col("o_orderstatus").isin("O", "F", "P"), orders))
    checks.reduce(_ unionAll _)
      .select(col("check"), col("violations"),
        (col("violations") === 0L).cast("long").as("pass"))
      .orderBy("check")
  }

  /** Per-group PEARSON CORRELATION between quantity and extended price —
    * the profiling statistic behind drift dashboards and feature QA.
    * Moments (Σx, Σy, Σxy, Σx², Σy² over integer cents) accumulate in
    * Decimal(38,0) — the [[Events.momentsOf]] recipe, exact far past the
    * Long range, HUGEINT on the oracle side — and the float tail is one
    * pinned chain: numerator and the two variance terms cast to double,
    * two IEEE sqrts, one divide, e4 round. Zero-variance groups emit 0
    * by the same guard as the z-score. One partial-aggregated shuffle of
    * 5 moment columns per group — map-side combine does ~all the work. */
  def correlation(s: SparkSession, d: String): DataFrame =
    correlationDf(Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        round(col("l_quantity") * 100).cast("long").as("x"),
        round(col("l_extendedprice") * 100).cast("long").as("y")))

  /** Same, over any (l_returnflag, x, y) integer frame (planted tests).
    *
    * Capacity bound of the Decimal(38, 0) moments: the largest
    * intermediates are n·Σx² and (Σx)², each ≤ (n·max|x|)² — so with
    * cent-scale values (|x| ≤ 1e7) the recipe is exact up to ~1e12 rows
    * PER GROUP, right at the 100 TB envelope. Past it, Spark 4's default
    * ANSI mode raises ARITHMETIC_OVERFLOW at the sum — already matching
    * the DuckDB HUGEINT twin's raise. A NON-ANSI session instead returns
    * NULL on decimal overflow (a silent divergence), so the overflow
    * guard below converts any null moment product into a loud
    * `raise_error`: the query fails identically under either mode. */
  def correlationDf(pairs: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val m = pairs
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("y")).as("sxy"),
        sum(col("x").cast(dec) * col("x")).as("sxx"),
        sum(col("y").cast(dec) * col("y")).as("syy"))
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    // Inputs are non-null ints, so a null moment/product can only mean
    // decimal overflow (non-ANSI null-on-overflow) — fail like the oracle.
    val overflow = col("sx").isNull || col("sy").isNull ||
      col("sxy").isNull || col("sxx").isNull || col("syy").isNull ||
      vx.isNull || vy.isNull
    val r = num / (sqrt(vx.cast("double")) * sqrt(vy.cast("double")))
    m.select(col("l_returnflag"), col("n"),
        when(overflow, raise_error(
            lit("correlation moments overflowed Decimal(38,0) — group too " +
              "large for the exact recipe; pre-aggregate or shard the group"))
          .cast("long"))
          .when(vx === 0 || vy === 0, lit(0L))
          .otherwise(round(r * 10000).cast("long")).as("corr_e4"))
      .orderBy("l_returnflag")
  }
}
