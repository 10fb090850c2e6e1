package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics over the TPC-H-ish star schema (SURVEY §2.9 E6).
  * Everything here is deliberately plain DataFrame algebra: Catalyst gets
  * declarative plans and does pushdown/pruning/join-selection; dimension
  * tables are broadcast (they stay small at any scale factor — region 5,
  * nation 25; customer/supplier grow slowly), the fact-table shuffle is on
  * the aggregation key only.
  *
  * Money sums are cast to decimal before aggregation: deterministic,
  * order-insensitive, and bit-identical across engines — double sums
  * would drift with partial-aggregation order.
  */
object Relational {

  /** Decimal-safe money sum, surfaced as double. Scale 6 ≥ the decimal
    * scale of any money product here (2dp × 2dp × 2dp), so the per-row
    * double→decimal cast never lands on a rounding tie — ties at lower
    * scales resolve differently across engines (Spark rounds the exact
    * binary expansion, others the shortest decimal repr). */
  private def dsum(c: Column): Column = sum(c.cast("decimal(26,6)")).cast("double")

  /** TPC-H Q1-flavored pricing summary. */
  def pricingSummary(lineitem: DataFrame, cutoff: String = "1998-09-02"): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= to_timestamp(lit(cutoff)))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
          .as("sum_charge"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-flavored: top unshipped-revenue orders for one segment. */
  def topOrders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                segment: String = "BUILDING", date: String = "1997-01-01",
                n: Int = 10): DataFrame =
    lineitem
      .filter(col("l_shipdate") > to_timestamp(lit(date)))
      .join(orders.filter(col("o_orderdate") < to_timestamp(lit(date))),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.filter(col("c_mktsegment") === segment)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(n)

  /** TPC-H Q5-flavored: revenue by nation within one region, suppliers
    * and customers co-national.
    *
    * Join order is selectivity-first: the region filter reaches `orders`
    * through a broadcast of the reduced customer⨝nation⨝region dimension
    * BEFORE anything touches `lineitem`, so the one unavoidable big join
    * (lineitem ⨝ orders) only ever sees the ~1/|regions| of orders that
    * survive — never a shuffle of the unfiltered fact tables. */
  def regionRevenue(region: DataFrame, nation: DataFrame, customer: DataFrame,
                    supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
                    regionName: String = "EUROPE"): DataFrame = {
    val regionNations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val regionCustomers = customer
      .join(broadcast(regionNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val regionOrders = orders
      .join(broadcast(regionCustomers), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_nationkey"), col("n_name"))
    lineitem
      .join(regionOrders, col("l_orderkey") === col("o_orderkey"))
      // co-nationality: the supplier must share the (already-resolved)
      // customer nation, so supplier needs no separate nation join
      .join(broadcast(supplier),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
  }

  /** Window ranking: top-N customers by account balance per nation. */
  def customerRankByNation(customer: DataFrame, nation: DataFrame, n: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
      .select(col("n_name"), col("c_custkey"), col("c_name"),
        round(col("c_acctbal"), 2).as("acctbal"), col("rank"))
  }

  /** TPC-H Q4-flavored: order counts per priority for orders with at
    * least one line shipped after the order date (left-semi join — the
    * EXISTS plan). */
  def orderPriorityCounts(orders: DataFrame, lineitem: DataFrame,
                          from: String = "1996-01-01", to: String = "1997-01-01"): DataFrame =
    orders
      .filter(col("o_orderdate") >= to_timestamp(lit(from)) &&
              col("o_orderdate") < to_timestamp(lit(to)))
      .join(lineitem,
        col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))

  /** Set operation: customers active in both years (INTERSECT of the
    * yearly customer sets). */
  def repeatCustomers(orders: DataFrame, y1: Int, y2: Int): DataFrame = {
    def custsIn(y: Int) = orders
      .filter(year(col("o_orderdate")) === y).select(col("o_custkey")).distinct()
    custsIn(y1).intersect(custsIn(y2))
  }

  /** Monthly order cadence: date + string scalar functions over orders. */
  def ordersByMonth(orders: DataFrame): DataFrame =
    orders.groupBy(
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(26,6)")).cast("double").as("total_price"),
        countDistinct(upper(substring(col("o_orderpriority"), 1, 1))).as("n_priority_classes"))

  /** Anti-join: per-nation count of customers with no orders at all. */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame,
                             nation: DataFrame): DataFrame =
    customer
      .join(orders.select(col("o_custkey")).distinct(),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"))

  /** Part catalog stats by brand: distinct types, size span, mean price. */
  def partStatsByBrand(part: DataFrame): DataFrame =
    part.groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_parts"),
        countDistinct(col("p_type")).as("n_types"),
        min(col("p_size")).as("min_size"),
        max(col("p_size")).as("max_size"),
        round(sum(col("p_retailprice").cast("decimal(20,4)")).cast("double")
          / count(lit(1)), 4).as("avg_price"))

  /** Per-customer running revenue: cumulative-frame window (ROWS
    * UNBOUNDED PRECEDING..CURRENT) ordered by date + orderkey. The frame
    * order is total, so the decimal cumsum is exact and engine-portable.
    * Scale: partitioned by customer — each window sorts one customer's
    * orders, never a global sort. */
  def runningCustomerRevenue(orders: DataFrame, maxCust: Long = 200L): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.filter(col("o_custkey") <= maxCust)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("o_date"),
        sum(col("o_totalprice").cast("decimal(26,6)")).over(w)
          .cast("double").as("run_total"))
  }

  /** Per-customer trailing-window revenue: RANGE frame over integer
    * epoch-seconds (value-based, so same-day orders are frame peers in
    * every engine — a ROWS frame would tie-break arbitrarily). */
  def movingRevenue(orders: DataFrame, days: Int = 30,
                    maxCust: Long = 200L): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_date"))
      .rangeBetween(-days.toLong * 86400L, 0L)
    orders.filter(col("o_custkey") <= maxCust)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("o_date"), col("o_totalprice"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_date"),
        sum(col("o_totalprice").cast("decimal(26,6)")).over(w)
          .cast("double").as("mov_rev"))
  }

  /** TPC-H Q2-flavored min-cost supplier: for every part, the supplier
    * selling it at the lowest realized unit price (revenue/quantity over
    * that supplier's lineitems). One fact-table aggregation on
    * (part, supplier), a per-part window rank, then a broadcast join to
    * the supplier dim — the correlated-min subquery shape without a
    * correlated scan of the fact table. */
  def minCostSupplier(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val perPair = lineitem
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(26,6)")).as("__rev"),
        sum(col("l_quantity").cast("decimal(26,6)")).as("__qty"))
      // round(rev/qty, 4) computed EXACTLY in integer arithmetic:
      // floor((2*rev*10^4 + qty) / (2*qty)) over micro-unit integers —
      // a double division would flip the 4th decimal on half-way
      // boundaries differently per engine. The final /10^4 maps equal
      // integers to bit-equal doubles everywhere. The micro-unit values
      // stay in decimal(38,0), NOT long: a bigint cast overflows to null
      // SILENTLY (non-ANSI) once per-pair revenue exceeds ~4.6e8 units;
      // decimal(38,0) holds ~5e33 micro-units through the *20000 — the
      // quotient (unit_price * 1e4) is what DIV returns as long, and that
      // is bounded by the price domain.
      .select(col("l_partkey"), col("l_suppkey"),
        ((col("__rev") * lit(1000000)).cast("decimal(38,0)") * lit(20000L) +
          (col("__qty") * lit(1000000)).cast("decimal(38,0)")).as("__num"),
        ((col("__qty") * lit(1000000)).cast("decimal(38,0)") * lit(2L)).as("__den"))
      .select(col("l_partkey"), col("l_suppkey"),
        expr("__num DIV __den").as("__q"))
    // Per-part argmin as a HASH-ONLY two-phase aggregation (r19; guide
    // §3/§4 — hash over sort). The previous min(struct(price, suppkey))
    // form planned as partial+final SortAggregate (struct buffers can't
    // hash-aggregate): two sorts of the pair table per call. Here the
    // micro-unit quotient __q (a long; unit_price = __q / 1e4 is
    // monotone AND injective in it — __q is bounded by the price domain
    // × 1e4, far under 2^53, so the double division is exact) carries
    // the ordering: min __q per part == min unit_price, and min suppkey
    // among __q-ties == the struct's lexicographic tiebreak. The pair
    // table is pinned per call — it is the REDUCED one-row-per-(part,
    // supp) aggregate, orders smaller than the fact table, and both
    // phases read it.
    val pairs = perPair.localCheckpoint(true)
    val minQ = pairs.groupBy(col("l_partkey")).agg(min(col("__q")).as("__qmin"))
    pairs.join(minQ, Seq("l_partkey"))
      .filter(col("__q") === col("__qmin"))
      .groupBy(col("l_partkey"))
      .agg(min(col("l_suppkey")).as("l_suppkey"), min(col("__q")).as("__q"))
      .select(col("l_partkey"), col("l_suppkey"),
        (col("__q").cast("double") / lit(10000.0)).as("unit_price"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey").as("p_partkey"), col("s_suppkey"),
        col("s_name"), col("unit_price"))
  }

  /** TPC-H Q21-flavored: suppliers that were the ONLY late shipper in a
    * multi-supplier order ("kept the order waiting"). The EXISTS /
    * NOT-EXISTS pair is expressed as one per-order aggregation (supplier
    * count + late-supplier count) — a single fact shuffle on orderkey —
    * with the oracle deliberately written in correlated-subquery form so
    * the two formulations check each other.
    * @param lateDays a lineitem is late if it ships more than this many
    *                 days after the order date */
  def onlyLateSupplier(orders: DataFrame, lineitem: DataFrame,
                       supplier: DataFrame, lateDays: Int = 60): DataFrame = {
    // reduce to (order, supplier, any-late) FIRST: one fact-table shuffle
    // on the pair key, and everything downstream (per-order counts, the
    // qualifying join, the final supplier count) runs on the reduced pair
    // table — no countDistinct Expand, no second pass over lineitem
    val pairs = lineitem
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate") >
        col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS")).as("__late"))
    // per-order rollup recovers the culprit IN the same aggregation: a
    // qualifying order has exactly one late supplier, so
    // max(when(late, suppkey)) IS that supplier — no second pass over
    // pairs (a pairs-vs-perOrder self-join re-executed the whole fact
    // scan + join subtree twice; Spark re-computes shared subtrees)
    pairs.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("__n_supp"),
        count(when(col("__late"), 1)).as("__n_late"),
        max(when(col("__late"), col("l_suppkey"))).as("__late_supp"))
      .filter(col("__n_supp") > 1 && col("__n_late") === 1)
      .groupBy(col("__late_supp"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(supplier), col("__late_supp") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
  }
}
