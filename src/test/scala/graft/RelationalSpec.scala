package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.sources.Tables

class RelationalSpec extends SparkSuite {

  import spark.implicits._

  test("runningCustomerRevenue: monotone per customer, final value equals the total") {
    val orders = Tables.table(spark, sfDir, "orders")
    val run = Relational.runningCustomerRevenue(orders, maxCust = 50L)
      .orderBy("o_custkey", "o_date", "o_orderkey").collect()
    val byCust = run.groupBy(_.getAs[Long]("o_custkey"))
    for ((c, rows) <- byCust) {
      val totals = rows.map(_.getAs[Double]("run_total"))
      assert(totals.zip(totals.tail).forall { case (a, b) => b >= a },
        s"running total must be monotone for customer $c")
    }
    val expect = orders.filter(col("o_custkey") <= 50)
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(26,6)")).cast("double").as("t"))
      .collect().map(r => r.getAs[Long]("o_custkey") -> r.getAs[Double]("t")).toMap
    for ((c, rows) <- byCust)
      assert(math.abs(rows.last.getAs[Double]("run_total") - expect(c)) < 1e-6)
  }

  test("movingRevenue: trailing window bounded below by the order itself, above by the running total") {
    val all = Tables.table(spark, sfDir, "orders")
    // same-date peer orders are in the RANGE frame but not yet in the
    // running total — compare only customers with unique order dates
    val uniqueDateCusts = all.groupBy("o_custkey", "o_orderdate").count()
      .groupBy("o_custkey").agg(max("count").as("m")).filter(col("m") === 1)
      .select("o_custkey")
    val orders = all.join(uniqueDateCusts, "o_custkey")
    val mov = Relational.movingRevenue(orders, days = 30, maxCust = 50L)
    val run = Relational.runningCustomerRevenue(orders, maxCust = 50L)
    val j = mov.alias("m").join(run.alias("r"), Seq("o_custkey", "o_orderkey"))
      .join(all.select(col("o_orderkey"), col("o_totalprice")), "o_orderkey")
      .select(col("mov_rev"), col("run_total"), col("o_totalprice")).collect()
    assert(j.nonEmpty)
    for (r <- j) {
      assert(r.getAs[Double]("mov_rev") >= r.getAs[Double]("o_totalprice") - 1e-6)
      assert(r.getAs[Double]("mov_rev") <= r.getAs[Double]("run_total") + 1e-6)
    }
    // an unbounded trailing window IS the running total
    val wide = Relational.movingRevenue(orders, days = 100000, maxCust = 50L)
      .select(col("o_orderkey"), col("mov_rev"))
    val diff = wide.join(run, "o_orderkey")
      .filter(abs(col("mov_rev") - col("run_total")) > 1e-6).count()
    assert(diff === 0L)
  }

  test("minCostSupplier: one row per part, and it is the minimum unit price") {
    val li = Tables.table(spark, sfDir, "lineitem")
    val supp = Tables.table(spark, sfDir, "supplier")
    val out = Relational.minCostSupplier(li, supp)
    val parts = out.groupBy("p_partkey").count().filter(col("count") > 1).count()
    assert(parts === 0L, "must emit exactly one supplier per part")
    // cross-check one part against a brute-force recompute
    val probe = out.orderBy("p_partkey").first()
    val pk = probe.getAs[Long]("p_partkey")
    val brute = li.filter(col("l_partkey") === pk)
      .groupBy("l_suppkey")
      .agg((sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(26,6)")).cast("double") /
        sum(col("l_quantity").cast("decimal(26,6)")).cast("double")).as("up"))
      .orderBy(col("up").asc, col("l_suppkey").asc).first()
    assert(probe.getAs[Long]("s_suppkey") === brute.getAs[Long]("l_suppkey"))
  }

  test("minCostSupplier: per-pair revenue far above the old bigint bound stays exact") {
    // the previous formulation cast micro-unit revenue to long, which
    // wrapped/nulled SILENTLY above ~4.6e8 revenue units per (part,
    // supplier); decimal(38,0) must carry this through unharmed
    val li = Seq(
      (1L, 1L, BigDecimal("20000000000.00"), BigDecimal("0.00"), BigDecimal("4.00")),
      (1L, 2L, BigDecimal("30000000000.00"), BigDecimal("0.00"), BigDecimal("4.00"))
    ).toDF("l_partkey", "l_suppkey", "l_extendedprice", "l_discount", "l_quantity")
    val supp = Seq((1L, "cheap"), (2L, "dear")).toDF("s_suppkey", "s_name")
    val out = Relational.minCostSupplier(li, supp).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("s_suppkey") === 1L)
    assert(out.head.getAs[Double]("unit_price") === 5.0e9)
  }

  test("onlyLateSupplier: counts only the sole late shipper of multi-supplier orders") {
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    // order 1: suppliers 10 (late) + 11 (on time)  -> supplier 10 counted
    // order 2: suppliers 10 + 11 both late          -> nobody counted
    // order 3: single supplier 12, late             -> not counted (no co-supplier)
    val orders = Seq((1L, ts("1995-01-01")), (2L, ts("1995-01-01")), (3L, ts("1995-01-01")))
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      (1L, 10L, ts("1995-06-01")), (1L, 11L, ts("1995-01-15")),
      (2L, 10L, ts("1995-06-01")), (2L, 11L, ts("1995-06-01")),
      (3L, 12L, ts("1995-06-01"))
    ).toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val supp = Seq((10L, "s10"), (11L, "s11"), (12L, "s12")).toDF("s_suppkey", "s_name")
    val out = Relational.onlyLateSupplier(orders, li, supp, lateDays = 60)
      .collect().map(r => r.getAs[Long]("s_suppkey") -> r.getAs[Long]("numwait")).toMap
    assert(out === Map(10L -> 1L))
  }
}
