package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables

/** Relational query inventory (SURVEY.md §2.2): scans, filters, joins of
  * every flavor, aggregations (incl. cube/rollup/grouping sets), window
  * functions, top-k, set ops, and scalar-function coverage (JSON, dates,
  * strings, CASE, scalar subqueries).
  *
  * Conventions shared with the DuckDB oracle (see [[graft.SparkEntry.oracleSql]]):
  *   - every computed column is aliased identically on both sides (the
  *     driver's compare sorts columns BY NAME before hashing);
  *   - double-typed aggregates are rounded to 2 decimals on both sides so
  *     summation-order differences between engines can't flip the hash;
  *   - grouping-total rows from cube/rollup/grouping-sets coalesce their
  *     NULL keys to 'ALL' (fixture keys are non-null) so null-sort-order
  *     differences between engines can't reorder rows;
  *   - every query ends in a deterministic ORDER BY;
  *   - raw `events.ts` (ns-precision parquet) is never a direct output
  *     column — Spark truncates to µs, DuckDB keeps TIMESTAMP_NS, and the
  *     printed values would differ (SURVEY.md §7.4).
  *
  * Scale notes (100 TB design bar) are given per query; general rules:
  * filters/projections stay declarative so Catalyst pushes them into the
  * parquet scan, dimension tables are explicitly `broadcast()`, heavy
  * fact-fact joins shuffle once on their join key, and nothing collects
  * to the driver.
  */
object Relational {

  /** Round a double aggregate for engine-stable comparison. */
  private def r2(c: Column) = round(c, 2)

  /** Money columns in the fixtures are 2-decimal doubles; casting to
    * DECIMAL(12,2) is exact, and decimal sums are order-independent —
    * unlike double sums, whose partition-order-dependent rounding can land
    * either side of a round() boundary and flip the driver's hash (seen
    * empirically on q8 at sf0.001). Sum exactly in decimal, round, then
    * cast back to double so both engines emit identical bits. */
  private val money = org.apache.spark.sql.types.DecimalType(12, 2)
  private def dec(c: Column) = c.cast(money)
  private def dsum(c: Column) = round(sum(dec(c)), 2).cast("double")
  private def davg(c: Column) = round(avg(dec(c)), 2).cast("double")
  private def dsumExpr(c: Column) = round(sum(c), 2).cast("double")

  // ---------------------------------------------------------------------
  // Aggregation family
  // ---------------------------------------------------------------------

  /** q1_agg — TPC-H Q1 shape: scan-filter-aggregate over lineitem.
    * At scale: one shuffle on tiny-cardinality group keys with map-side
    * partial agg; shipdate predicate pushed to parquet row-group stats. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1997-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumExpr(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).as("sum_disc_price"),
        dsumExpr(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))) * (lit(1) + dec(col("l_tax")))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** q2_having — group filter after aggregation (HAVING). */
  def q2Having(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
      .filter(col("n_orders") >= 3)
      .orderBy(col("o_custkey"))

  /** q3_distinct_agg — exact distinct counts (shuffle-dedup then count);
    * contrast q22_approx_distinct for the 100 TB path. */
  def q3DistinctAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** q4_minmax — min/max/first-order stats per group. */
  def q4MinMax(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        r2(min(col("o_totalprice"))).as("min_price"),
        r2(max(col("o_totalprice"))).as("max_price"),
        min(col("o_orderdate")).as("first_date"),
        max(col("o_orderdate")).as("last_date"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** q5_cube — CUBE over two keys; NULL subtotal keys coalesced to 'ALL'. */
  def q5Cube(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(r2(sum(col("l_quantity"))).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** q6_rollup — ROLLUP over the region→nation hierarchy, via two
    * broadcast dim joins (nation, region are tiny at any scale). */
  def q6Rollup(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(dsum(col("c_acctbal")).as("bal"), count(lit(1)).as("n"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("bal"), col("n"))
      .orderBy(col("region"), col("nation"))
  }

  /** q7_grouping_sets — explicit GROUPING SETS ((brand), (type), ()). */
  def q7GroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .groupingSets(
        Seq(Seq(col("p_brand")), Seq(col("p_type")), Seq.empty),
        col("p_brand"), col("p_type"))
      .agg(davg(col("p_retailprice")).as("avg_price"), count(lit(1)).as("n"))
      .select(
        coalesce(col("p_brand"), lit("ALL")).as("brand"),
        coalesce(col("p_type"), lit("ALL")).as("ptype"),
        col("avg_price"), col("n"))
      .orderBy(col("brand"), col("ptype"))

  // ---------------------------------------------------------------------
  // Join family
  // ---------------------------------------------------------------------

  /** q8_join3 — TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem, revenue by
    * order. At scale: lineitem⋈orders shuffles on orderkey once; customer
    * filter applied pre-join to shrink the build side; AQE may broadcast
    * the filtered customer set. */
  def q8Join3(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(dsumExpr(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).as("revenue"))
      .orderBy(col("l_orderkey"))
  }

  /** q9_broadcast_join — fact ⋈ small dim with an explicit broadcast hint:
    * zero shuffle of lineitem; `.explain` must show BroadcastHashJoin.
    * `part` is an SF-SCALED table (not a fixed dim like nation/region),
    * so the hint is statistics-guarded: past
    * [[graft.operators.Guards.MaxHintedBroadcastBytes]] it detaches and
    * AQE owns the strategy — a bare hint would hit Spark's 8 GB
    * broadcast hard limit at the 100 TB design point. */
  def q9BroadcastJoin(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    l.join(graft.operators.Guards.broadcastIfEstimatedUnder(p),
        l("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(dsum(col("l_extendedprice")).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))
  }

  /** q10_semi_join — customers WITH at least one open order (LEFT SEMI:
    * no row multiplication, build side reduced to distinct keys). */
  def q10SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** q11_anti_join — orders with NO lineitems (LEFT ANTI ≡ NOT EXISTS;
    * non-empty at every SF, unlike customers-without-orders). */
  def q11AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))
  }

  /** q12_outer_join — LEFT OUTER with null-aware aggregation: order count
    * per customer including zero-order customers. */
  def q12OuterJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("spend"))
      .orderBy(col("c_custkey"))
  }

  /** q13_theta_join — non-equi (theta) self-join: supplier pairs ranked by
    * account balance. The predicate (`rich > 2 * poor`) is an UNBOUNDED
    * inequality, so the OUTPUT is Θ(N²) rows — no plan shape fixes that
    * (contrast q28, whose bounded interval bands into an equi-join). The
    * operator therefore fail-fasts above [[MaxThetaInputBytes]] via
    * optimizer statistics (no probe job) instead of silently melting a
    * cluster; inputs that need inequality semantics at scale must band
    * (bounded ranges, q28) or pre-aggregate before pairing. */
  def q13ThetaJoin(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(s, dir)
    graft.operators.Guards.requireEstimatedBytesAtMost(
      sup, MaxThetaInputBytes, "q13_theta_join (quadratic-output theta join)")
    val a = sup.select(
      col("s_suppkey").as("rich_key"), col("s_acctbal").as("rich_bal"))
    val b = sup.select(
      col("s_suppkey").as("poor_key"), col("s_acctbal").as("poor_bal"))
    a.join(b, col("rich_bal") > col("poor_bal") * 2)
      .select(col("rich_key"), col("poor_key"))
      .orderBy(col("rich_key"), col("poor_key"))
  }

  /** Input cap for the cross-product theta join: 64 MB of estimated input
    * (~a few hundred thousand rows) bounds the pair count at ~10¹⁰ — the
    * documented ceiling where q13's Θ(N²) output stops being a query and
    * becomes a bug. */
  val MaxThetaInputBytes: Long = 64L << 20

  /** q14_star_join — full star: lineitem ⋈ supplier ⋈ nation ⋈ region,
    * revenue by region. Dims broadcast; the fact table never shuffles
    * until the final tiny-key aggregation. nation (25 rows) and region
    * (5) are FIXED-size and broadcast unconditionally; supplier scales
    * with SF, so its hint is statistics-guarded (see q9). */
  def q14StarJoin(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val su = Tables.supplier(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    l.join(graft.operators.Guards.broadcastIfEstimatedUnder(su),
        l("l_suppkey") === su("s_suppkey"))
      .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(dsumExpr(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).as("revenue"))
      .orderBy(col("r_name"))
  }

  /** q15_asof_join — AS-OF join: for each event, the most recent order of
    * that user at-or-before the event time.
    *
    * Implementation is the scalable union-and-carry-forward pattern, NOT a
    * range cross-join: tag both sides, union, single shuffle on user_id,
    * one window sorted by time carrying the last order key forward, keep
    * event rows. Cost is one shuffle + one sort — the same plan a
    * merge-based as-of join would produce, expressible entirely in
    * DataFrame ops. Orders are pre-deduped per (user, date) so ties are
    * deterministic on both engines. DuckDB oracle uses its native
    * ASOF LEFT JOIN. */
  def q15AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(
      col("event_id"), col("user_id"), col("ts").as("t"),
      lit(1).as("is_event"), lit(null).cast("long").as("o_orderkey"))
    val or = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate").as("t"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
      .select(lit(null).cast("long").as("event_id"), col("user_id"), col("t"),
        lit(0).as("is_event"), col("o_orderkey"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("is_event"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(or)
      .withColumn("last_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1)
      .select(col("event_id"), col("user_id"), col("last_orderkey"))
      .orderBy(col("event_id"))
  }

  /** q16_scalar_subquery — customers above the global average balance.
    * The scalar aggregate is computed once and cross-joined (broadcast of
    * a 1-row relation — free at any scale). */
  def q16ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    // `bal > avg(bal)` decided in EXACT decimal arithmetic as
    // `bal * n > sum(bal)`: a double mean is summation-order dependent,
    // and a row sitting exactly on the boundary could flip between
    // engines (the header's q8 lesson applied to a filter instead of an
    // output column). Same rows, same plan shape (1-row broadcast).
    val tot = c.agg(sum(dec(col("c_acctbal"))).as("total_bal"),
      count(lit(1)).as("n_cust"))
    c.crossJoin(broadcast(tot))
      .filter(dec(col("c_acctbal")) * col("n_cust") > col("total_bal"))
      .select(col("c_custkey"), r2(col("c_acctbal")).as("acctbal"))
      .orderBy(col("c_custkey"))
  }

  // ---------------------------------------------------------------------
  // Window-function family
  // ---------------------------------------------------------------------

  /** q17_window_rank — per-customer top-3 orders by price (rank with
    * deterministic tiebreak). The standard per-group top-k: one shuffle on
    * the partition key, ranks computed streaming per partition, filter
    * keeps k — never materializes a global sort. */
  def q17WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        r2(col("o_totalprice")).as("price"), col("rk"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  /** q18_window_running — running spend per customer over order history
    * (ROWS UNBOUNDED PRECEDING, unique sort key for determinism). */
  def q18WindowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("running_spend", round(sum(dec(col("o_totalprice"))).over(w), 2).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** q19_lag_lead — previous/next order totals per customer. */
  def q19LagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        r2(lag(col("o_totalprice"), 1).over(w)).as("prev_price"),
        r2(lead(col("o_totalprice"), 1).over(w)).as("next_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** q20_topk — global top-k: Catalyst plans TakeOrderedAndProject
    * (per-partition heap + driver merge of k rows, never a full sort). */
  def q20TopK(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
      .select(col("o_orderkey"), col("o_custkey"), r2(col("o_totalprice")).as("price"))

  /** q21_ntile_dense — dense_rank + ntile quartiles over one global
    * ordering of nations by customer count.
    *
    * The unpartitioned window (WindowExec warns) is deliberate and safe:
    * it runs AFTER the aggregation, whose cardinality is bounded by the
    * grouping key's domain (#nations ≤ 25) — not by the fact table. A
    * global ranking whose input grows with the data would instead need
    * the two-pass range-partitioned ranking pattern. */
  def q21NtileDense(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.customer(s, dir)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
    val w = Window.orderBy(col("n_cust").desc, col("c_nationkey"))
    counts
      .select(col("c_nationkey"), col("n_cust"),
        dense_rank().over(w).as("drk"), ntile(4).over(w).as("quartile"))
      .orderBy(col("c_nationkey"))
  }

  // ---------------------------------------------------------------------
  // Set ops, approx, scalar functions
  // ---------------------------------------------------------------------

  /** q22_approx_distinct — HLL++ approximate distinct (the 100 TB path for
    * q3-style cardinality). No SQL oracle — sketch estimates are
    * engine-specific; the driver records a rows-only check. */
  def q22ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"),
        round(expr("approx_percentile(l_extendedprice, 0.5, 1000)"), 2).as("approx_median_price"))
      .orderBy(col("l_returnflag"))

  /** q23_setops — UNION / INTERSECT / EXCEPT (distinct set semantics) over
    * nation keys seen via customers vs suppliers. */
  def q23SetOps(s: SparkSession, dir: String): DataFrame = {
    val cn = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey")).distinct()
    val sn = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")).distinct()
    val both = cn.intersect(sn).withColumn("src", lit("both"))
    val custOnly = cn.except(sn).withColumn("src", lit("customer_only"))
    val supOnly = sn.except(cn).withColumn("src", lit("supplier_only"))
    both.unionByName(custOnly).unionByName(supOnly)
      .orderBy(col("nationkey"), col("src"))
  }

  /** q24_json — extract a typed field from the JSON `events.props` column
    * with from_json (schema'd, codegen-friendly) and aggregate. */
  def q24Json(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", IntegerType)))
    Tables.events(s, dir)
      .withColumn("k", from_json(col("props"), schema).getField("k"))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n_with_k"),
        r2(avg(col("k"))).as("avg_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  /** q25_datetime — calendar bucketing: revenue by (year, month) of
    * shipdate; demonstrates date_part extraction + multi-key agg. */
  def q25Datetime(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(
        year(col("l_shipdate")).as("yr"),
        month(col("l_shipdate")).as("mo"))
      .agg(dsum(col("l_extendedprice")).as("revenue"), count(lit(1)).as("n"))
      .orderBy(col("yr"), col("mo"))

  /** q26_string_fns — string expression coverage: case, length, substring,
    * concat, LIKE-filter. */
  def q26StringFns(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .filter(col("p_type").like("%OM%"))
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_uc"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 5).as("type_head"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy(col("p_partkey"))

  /** q27_case_expr — CASE WHEN bucketing + conditional aggregation
    * (the deterministic alternative to PIVOT: identical aliases on both
    * engines instead of value-derived column names). */
  def q27CaseExpr(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        dsum(when(col("o_orderpriority") === "1-URGENT", col("o_totalprice")).otherwise(0.0)).as("urgent_total"),
        dsum(when(col("o_orderpriority") === "2-HIGH", col("o_totalprice")).otherwise(0.0)).as("high_total"),
        dsum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), col("o_totalprice")).otherwise(0.0)).as("other_total"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** q28_range_join — banded interval join: per event, orders of the same
    * user in the 7 days up to the event. A naive theta join is a cross
    * product; instead both sides are bucketed to 7-day epochs and the
    * event probes its own and the previous bucket (a 7-day window spans
    * at most two buckets) — an equi-join Spark hash-partitions, with the
    * exact interval predicate applied post-join. This is the standard
    * scalable range-join rewrite. */
  def q28RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val bucketLen = 7L * 24 * 3600 // seconds
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        floor(unix_timestamp(col("ts")) / bucketLen).as("b0"))
      .withColumn("bucket", explode(array(col("b0"), col("b0") - 1)))
    val or = Tables.orders(s, dir)
      .select(col("o_custkey").as("user_id"), col("o_orderdate"), col("o_totalprice"),
        floor(unix_timestamp(col("o_orderdate")) / bucketLen).as("bucket"))
    ev.join(or, Seq("user_id", "bucket"), "left_outer")
      .withColumn("in_range",
        col("o_orderdate").isNotNull &&
          col("o_orderdate") <= col("ts") &&
          col("o_orderdate") >= col("ts") - expr("INTERVAL 7 DAYS"))
      .groupBy(col("event_id"))
      .agg(
        sum(when(col("in_range"), 1).otherwise(0)).as("n_orders_7d"),
        coalesce(round(sum(when(col("in_range"), col("o_totalprice").cast(money))), 2)
          .cast("double"), lit(0.0)).as("spend_7d"))
      .orderBy(col("event_id"))
  }

  /** q29_percentile — exact interpolated percentiles (median/p90); both
    * engines use the same (n-1)*p linear-interpolation definition. */
  def q29Percentile(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("median_price"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90_price"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** wa1_weighted_avg — custom typed Aggregator (UDAF surface): quantity-
    * weighted mean unit price per brand, exact partial sums (see
    * [[graft.functions.Aggregators.WeightedMean]]), part's broadcast
    * hint statistics-guarded like q9's (SF-scaled dim). */
  def wa1WeightedAvg(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    l.join(graft.operators.Guards.broadcastIfEstimatedUnder(p),
        l("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(graft.functions.Aggregators.weightedMean(
        col("l_extendedprice"), col("l_quantity")).as("w_avg_price"))
      .orderBy(col("p_brand"))
  }

  /** q30_window_range — RANGE frame over event time: per order, the
    * customer's rolling 30-day order count/spend (value-based frame, not
    * row-based; both engines use the same closed-interval RANGE
    * semantics over the epoch-seconds ordering key). */
  def q30WindowRange(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("epoch_s"))
      .rangeBetween(-30L * 24 * 3600, 0)
    Tables.orders(s, dir)
      .withColumn("epoch_s", unix_timestamp(col("o_orderdate")))
      .withColumn("n_30d", count(lit(1)).over(w))
      .withColumn("spend_30d", round(sum(col("o_totalprice").cast(money)).over(w), 2).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("n_30d"), col("spend_30d"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** q31_map_fns — MapType surface: parse `events.props` into
    * map<string,int>, explode entries, aggregate per key/event_type. */
  def q31MapFns(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    Tables.events(s, dir)
      .withColumn("m", from_json(col("props"), MapType(StringType, IntegerType)))
      .select(col("event_type"), explode(col("m")).as(Seq("key", "val")))
      .groupBy(col("event_type"), col("key"))
      .agg(count(lit(1)).as("n"), max(col("val")).as("max_val"),
        round(avg(col("val")), 2).as("avg_val"))
      .orderBy(col("event_type"), col("key"))
  }

  /** q32_pivot — PIVOT with pinned value columns (deterministic output
    * schema; arbitrary-value pivots need a driver-side distinct first,
    * which is why the value list is explicit at scale). */
  def q32Pivot(s: SparkSession, dir: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", prios)
      .agg(round(sum(dec(col("o_totalprice"))), 2).cast("double"))
      .orderBy(col("o_orderstatus"))
  }

  /** q33_unpivot — melt wide metrics to long (the inverse of q32),
    * re-aggregated per metric. */
  def q33Unpivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .unpivot(
        Array.empty[Column],
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "metric", "val")
      .groupBy(col("metric"))
      .agg(dsum(col("val")).as("total"), count(lit(1)).as("n"))
      .orderBy(col("metric"))

  /** q34_array_fns — array expression surface over the embedding column:
    * size, min/max elements, sequential double sum. */
  def q34ArrayFns(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(array_min(col("embedding")).cast("double"), 3).as("mn"),
        round(array_max(col("embedding")).cast("double"), 3).as("mx"),
        round(aggregate(col("embedding"), lit(0.0), (acc, x) => acc + x.cast("double")), 3).as("sm"))
      .orderBy(col("vec_id"))

  /** q35_full_outer — FULL OUTER join of two aggregates: customer vs
    * supplier presence per nation, null-completed on both sides. */
  def q35FullOuter(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_cust"))
    val su = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("nk2"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(su, col("nk") === col("nk2"), "full_outer")
      .select(
        coalesce(col("nk"), col("nk2")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  /** q36_collect — ordered collect: per-nation sorted name roster joined
    * to a string (sorted so the collect is deterministic; raw
    * collect_list order is partition-dependent and must never be
    * compared). */
  def q36Collect(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupBy(col("c_nationkey"))
      .agg(array_join(array_sort(collect_list(col("c_name"))), "|").as("names"),
        count(lit(1)).as("n"))
      .orderBy(col("c_nationkey"))

  // ---------------------------------------------------------------------
  // Event analytics family (time-series over `events`)
  // ---------------------------------------------------------------------

  /** q37_resample — per-user daily time-series resampling with gap fill:
    * aggregate events to a (user, day) grain, generate each user's full
    * [first, last] day spine (`sequence` + `explode` — the date-spine
    * idiom), left-join actuals, and forward-fill gaps with a running
    * `last(ignoreNulls)` window. The gap-filling every downstream
    * ML/metrics join needs before daily features make sense.
    *
    * Scale: the spine explode is per-user rows × days (bounded by the
    * observation window, not the corpus); the fill is one window over
    * the user-day partition — the same single shuffle the daily agg
    * already needs. Day DATEs (not raw ns ts) keep the oracle exact. */
  def q37Resample(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      .groupBy(col("user_id"), col("day"))
      .agg(dsum(col("value")).as("day_value"))
    val spine = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .withColumn("active", col("day_value").isNotNull)
      .withColumn("filled_value", last(col("day_value"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("day"), col("active"), col("filled_value"))
      .orderBy(col("user_id"), col("day"))
  }

  /** q38_funnel — ordered conversion funnel signup → click → purchase:
    * each stage's timestamp is the user's FIRST qualifying event strictly
    * after the previous stage (a true ordered funnel, not independent
    * min-per-type). Output is one row per stage with the surviving user
    * count — the monotone drop-off a product-analytics funnel reports.
    *
    * Scale: three conditional-min aggregates over one events scan per
    * stage, each shuffling slim (user, ts) rows on user_id; stage joins
    * are tiny (≤ distinct users). Strict ts comparisons are safe
    * cross-engine: fixture ns components are zero (verified), and within
    * one engine truncation is consistent anyway. */
  def q38Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
    val s1 = ev.where(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.where(col("event_type") === "click").join(s1, "user_id")
      .where(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.where(col("event_type") === "purchase").join(s2, "user_id")
      .where(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val counts = Seq(
      ("1_signup", s1), ("2_click_after_signup", s2), ("3_purchase_after_click", s3))
    counts.map { case (stage, df) =>
      df.agg(count(lit(1)).as("users")).select(lit(stage).as("stage"), col("users"))
    }.reduce(_.unionByName(_)).orderBy(col("stage"))
  }

  /** q39_cohort_retention — weekly cohort retention: users are cohorted
    * by the Monday week of their first event; each later active week
    * increments that cohort's week-N cell (the classic retention
    * triangle, flattened to rows). `weeks_since` is exact integer day
    * arithmetic on DATE — no float, no ts output.
    *
    * Scale: first-touch is one min-aggregate; activity is a distinct on
    * (user, week) — both shuffle slim rows on user_id, then a tiny-key
    * count by (cohort_week, weeks_since). */
  def q39CohortRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("week"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    ev.distinct().join(cohort, "user_id")
      .withColumn("weeks_since", (datediff(col("week"), col("cohort_week")) / 7).cast("int"))
      .groupBy(col("cohort_week"), col("weeks_since"))
      .agg(countDistinct(col("user_id")).as("users"))
      .orderBy(col("cohort_week"), col("weeks_since"))
  }

  // ---------------------------------------------------------------------
  // Catalog
  // ---------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q2_having" -> (q2Having _),
    "q3_distinct_agg" -> (q3DistinctAgg _),
    "q4_minmax" -> (q4MinMax _),
    "q5_cube" -> (q5Cube _),
    "q6_rollup" -> (q6Rollup _),
    "q7_grouping_sets" -> (q7GroupingSets _),
    "q8_join3" -> (q8Join3 _),
    "q9_broadcast_join" -> (q9BroadcastJoin _),
    "q10_semi_join" -> (q10SemiJoin _),
    "q11_anti_join" -> (q11AntiJoin _),
    "q12_outer_join" -> (q12OuterJoin _),
    "q13_theta_join" -> (q13ThetaJoin _),
    "q14_star_join" -> (q14StarJoin _),
    "q15_asof_join" -> (q15AsofJoin _),
    "q16_scalar_subquery" -> (q16ScalarSubquery _),
    "q17_window_rank" -> (q17WindowRank _),
    "q18_window_running" -> (q18WindowRunning _),
    "q19_lag_lead" -> (q19LagLead _),
    "q20_topk" -> (q20TopK _),
    "q21_ntile_dense" -> (q21NtileDense _),
    "q22_approx_distinct" -> (q22ApproxDistinct _),
    "q23_setops" -> (q23SetOps _),
    "q24_json" -> (q24Json _),
    "q25_datetime" -> (q25Datetime _),
    "q26_string_fns" -> (q26StringFns _),
    "q27_case_expr" -> (q27CaseExpr _),
    "q28_range_join" -> (q28RangeJoin _),
    "q29_percentile" -> (q29Percentile _),
    "wa1_weighted_avg" -> (wa1WeightedAvg _),
    "q30_window_range" -> (q30WindowRange _),
    "q31_map_fns" -> (q31MapFns _),
    "q32_pivot" -> (q32Pivot _),
    "q33_unpivot" -> (q33Unpivot _),
    "q34_array_fns" -> (q34ArrayFns _),
    "q35_full_outer" -> (q35FullOuter _),
    "q36_collect" -> (q36Collect _),
    "q37_resample" -> (q37Resample _),
    "q38_funnel" -> (q38Funnel _),
    "q39_cohort_retention" -> (q39CohortRetention _),
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_disc_price,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_charge,
         CAST(round(avg(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS avg_qty,
         CAST(round(avg(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS avg_price,
         CAST(round(avg(CAST(l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS avg_disc,
         count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1997-09-01'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""",
    "q2_having" ->
      """SELECT o_custkey, count(*) AS n_orders, CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS spend
       FROM orders GROUP BY o_custkey HAVING count(*) >= 3 ORDER BY o_custkey""",
    "q3_distinct_agg" ->
      """SELECT l_returnflag,
         count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps,
         count(*) AS n_rows
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q4_minmax" ->
      """SELECT o_orderstatus,
         round(min(o_totalprice), 2) AS min_price,
         round(max(o_totalprice), 2) AS max_price,
         min(o_orderdate) AS first_date,
         max(o_orderdate) AS last_date,
         count(*) AS n
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q5_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
              coalesce(l_linestatus, 'ALL') AS linestatus,
              round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
       FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
       ORDER BY returnflag, linestatus""",
    "q6_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region,
              coalesce(n_name, 'ALL') AS nation,
              CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS bal, count(*) AS n
       FROM customer
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY ROLLUP (r_name, n_name)
       ORDER BY region, nation""",
    "q7_grouping_sets" ->
      """SELECT coalesce(p_brand, 'ALL') AS brand,
              coalesce(p_type, 'ALL') AS ptype,
              CAST(round(avg(CAST(p_retailprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS avg_price, count(*) AS n
       FROM part GROUP BY GROUPING SETS ((p_brand), (p_type), ())
       ORDER BY brand, ptype""",
    "q8_join3" ->
      """SELECT l_orderkey,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       WHERE c_mktsegment = 'BUILDING'
       GROUP BY l_orderkey ORDER BY l_orderkey""",
    "q9_broadcast_join" ->
      """SELECT p_brand, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue, count(*) AS n_items
       FROM lineitem JOIN part ON l_partkey = p_partkey
       GROUP BY p_brand ORDER BY p_brand""",
    "q10_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
       WHERE EXISTS (SELECT 1 FROM orders
                     WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
       ORDER BY c_custkey""",
    "q11_anti_join" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
       WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
       ORDER BY o_orderkey""",
    "q12_outer_join" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
              coalesce(CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE), 0.0) AS spend
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey ORDER BY c_custkey""",
    "q13_theta_join" ->
      """SELECT a.s_suppkey AS rich_key, b.s_suppkey AS poor_key
       FROM supplier a JOIN supplier b ON a.s_acctbal > b.s_acctbal * 2
       ORDER BY rich_key, poor_key""",
    "q14_star_join" ->
      """SELECT r_name, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS revenue
       FROM lineitem
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name ORDER BY r_name""",
    "q15_asof_join" ->
      """WITH o AS (SELECT o_custkey AS user_id, o_orderdate AS t,
                         max(o_orderkey) AS o_orderkey
                  FROM orders GROUP BY 1, 2)
       SELECT e.event_id, e.user_id, o.o_orderkey AS last_orderkey
       FROM events e ASOF LEFT JOIN o
         ON e.user_id = o.user_id AND e.ts >= o.t
       ORDER BY e.event_id""",
    "q16_scalar_subquery" ->
      """SELECT c_custkey, round(c_acctbal, 2) AS acctbal FROM customer
       WHERE CAST(c_acctbal AS DECIMAL(12,2)) * (SELECT count(*) FROM customer)
             > (SELECT sum(CAST(c_acctbal AS DECIMAL(12,2))) FROM customer)
       ORDER BY c_custkey""",
    "q17_window_rank" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
            CAST(rk AS INTEGER) AS rk
       FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders) t
       WHERE rk <= 3 ORDER BY o_custkey, rk""",
    "q18_window_running" ->
      """SELECT o_custkey, o_orderkey,
              CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_spend
       FROM orders ORDER BY o_custkey, o_orderkey""",
    "q19_lag_lead" ->
      """SELECT o_custkey, o_orderkey,
              round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
              round(lead(o_totalprice, 1) OVER w, 2) AS next_price
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
       ORDER BY o_custkey, o_orderkey""",
    "q20_topk" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
       FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
    "q21_ntile_dense" ->
      """SELECT c_nationkey, n_cust,
              CAST(dense_rank() OVER w AS INTEGER) AS drk,
              CAST(ntile(4) OVER w AS INTEGER) AS quartile
       FROM (SELECT c_nationkey, count(*) AS n_cust
           FROM customer GROUP BY c_nationkey) t
       WINDOW w AS (ORDER BY n_cust DESC, c_nationkey)
       ORDER BY c_nationkey""",
    // q22_approx_distinct: intentionally no oracle — HLL estimates are
    // engine-specific; driver records rows-only.
    "q23_setops" ->
      """WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
            sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
       SELECT nationkey, 'both' AS src FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
       UNION ALL
       SELECT nationkey, 'customer_only' AS src FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
       UNION ALL
       SELECT nationkey, 'supplier_only' AS src FROM (SELECT nationkey FROM sn EXCEPT SELECT nationkey FROM cn)
       ORDER BY nationkey, src""",
    "q24_json" ->
      """SELECT event_type,
              count(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_with_k,
              round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 2) AS avg_k,
              max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
       FROM events GROUP BY event_type ORDER BY event_type""",
    "q25_datetime" ->
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS yr,
              CAST(month(l_shipdate) AS INTEGER) AS mo,
              CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue, count(*) AS n
       FROM lineitem GROUP BY 1, 2 ORDER BY yr, mo""",
    "q26_string_fns" ->
      """SELECT p_partkey, upper(p_brand) AS brand_uc,
              CAST(length(p_name) AS INTEGER) AS name_len,
              substring(p_type, 1, 5) AS type_head,
              concat_ws('|', p_brand, p_type) AS brand_type
       FROM part WHERE p_type LIKE '%OM%' ORDER BY p_partkey""",
    "q27_case_expr" ->
      """SELECT o_orderstatus,
              CAST(round(sum(CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0 END AS DECIMAL(12,2))), 2) AS DOUBLE) AS urgent_total,
              CAST(round(sum(CAST(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice ELSE 0 END AS DECIMAL(12,2))), 2) AS DOUBLE) AS high_total,
              CAST(round(sum(CAST(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN o_totalprice ELSE 0 END AS DECIMAL(12,2))), 2) AS DOUBLE) AS other_total,
              count(*) AS n
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q28_range_join" ->
      """SELECT e.event_id,
              count(o.o_orderdate) AS n_orders_7d,
              coalesce(CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE), 0.0) AS spend_7d
       FROM events e LEFT JOIN orders o
         ON e.user_id = o.o_custkey
        AND o.o_orderdate <= e.ts
        AND o.o_orderdate >= e.ts - INTERVAL 7 DAY
       GROUP BY e.event_id ORDER BY e.event_id""",
    "q29_percentile" ->
      """SELECT o_orderstatus,
              round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
              round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price,
              count(*) AS n
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "wa1_weighted_avg" ->
      """SELECT p_brand,
              CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)))
                       / sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS w_avg_price
       FROM lineitem JOIN part ON l_partkey = p_partkey
       GROUP BY p_brand ORDER BY p_brand""",
    "q30_window_range" ->
      """SELECT o_custkey, o_orderkey,
              count(*) OVER w AS n_30d,
              CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w, 2) AS DOUBLE) AS spend_30d
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                  RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
       ORDER BY o_custkey, o_orderkey""",
    "q31_map_fns" ->
      """SELECT event_type, 'k' AS key, count(*) AS n,
              max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_val,
              round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 2) AS avg_val
       FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
       GROUP BY event_type ORDER BY event_type, key""",
    "q32_pivot" ->
      """SELECT o_orderstatus,
              CAST(round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS "1-URGENT",
              CAST(round(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS "2-HIGH",
              CAST(round(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS "3-MEDIUM",
              CAST(round(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS "4-NOT SPECIFIED",
              CAST(round(sum(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(o_totalprice AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS "5-LOW"
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q33_unpivot" ->
      """SELECT metric, CAST(round(sum(CAST(val AS DECIMAL(12,2))), 2) AS DOUBLE) AS total,
              count(*) AS n
       FROM (
        SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
        UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL SELECT 'l_discount', l_discount FROM lineitem)
       GROUP BY metric ORDER BY metric""",
    "q34_array_fns" ->
      """SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
              round(CAST(list_min(embedding) AS DOUBLE), 3) AS mn,
              round(CAST(list_max(embedding) AS DOUBLE), 3) AS mx,
              round(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum'), 3) AS sm
       FROM embeddings ORDER BY vec_id""",
    "q35_full_outer" ->
      """SELECT coalesce(c.nk, s.nk) AS nationkey,
              coalesce(c.n_cust, 0) AS n_cust, coalesce(s.n_supp, 0) AS n_supp
       FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) c
       FULL JOIN (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1) s
         ON c.nk = s.nk
       ORDER BY nationkey""",
    "q36_collect" ->
      """SELECT c_nationkey, string_agg(c_name, '|' ORDER BY c_name) AS names,
              count(*) AS n
       FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q37_resample" ->
      """WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS day_value
        FROM events GROUP BY 1, 2),
      spine AS (
        SELECT user_id,
               CAST(unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS DATE) AS day
        FROM daily GROUP BY user_id)
      SELECT s.user_id, s.day, d.day_value IS NOT NULL AS active,
             last_value(d.day_value IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
      FROM spine s LEFT JOIN daily d USING (user_id, day)
      ORDER BY user_id, day""",
    "q38_funnel" ->
      """WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id),
      s2 AS (
        SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
      s3 AS (
        SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
      SELECT '1_signup' AS stage, count(*) AS users FROM s1
      UNION ALL SELECT '2_click_after_signup', count(*) FROM s2
      UNION ALL SELECT '3_purchase_after_click', count(*) FROM s3
      ORDER BY stage""",
    "q39_cohort_retention" ->
      """WITH wk AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
      cohort AS (
        SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id)
      SELECT c.cohort_week, CAST((w.week - c.cohort_week) / 7 AS INTEGER) AS weeks_since,
             count(DISTINCT w.user_id) AS users
      FROM wk w JOIN cohort c USING (user_id)
      GROUP BY 1, 2 ORDER BY cohort_week, weeks_since""",
  )
}
