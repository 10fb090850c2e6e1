package graft

import org.apache.spark.sql.functions._
import graft.operators.Profile
import graft.sources.Tables

class ProfileSpec extends SparkSuite {

  import spark.implicits._

  test("exact profile: null / distinct / range per column, strings rangeless") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), None),
      (Some(2L), Some("b")), (None, Some("b"))
    ).toDF("x", "s")
    val p = Profile.profile(df, numericCols = Seq("x"), stringCols = Seq("s"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    val x = p("x")
    assert(x.getAs[Long]("n_null") === 1L)
    assert(x.getAs[Long]("n_distinct") === 2L)
    assert(x.getAs[Double]("min_val") === 1.0)
    assert(x.getAs[Double]("max_val") === 2.0)
    val s = p("s")
    assert(s.getAs[Long]("n_null") === 1L)
    assert(s.getAs[Long]("n_distinct") === 2L)
    assert(s.isNullAt(s.fieldIndex("min_val")) && s.isNullAt(s.fieldIndex("max_val")))
  }

  test("duplicate column in a profile list fails fast with a clear error") {
    val df = Seq((1L, "a")).toDF("x", "s")
    val e = intercept[IllegalArgumentException] {
      Profile.profile(df, numericCols = Seq("x", "x"), stringCols = Seq("s"))
    }
    assert(e.getMessage.contains("duplicate columns"))
    val e2 = intercept[IllegalArgumentException] {
      Profile.profile(df, numericCols = Seq("x"), stringCols = Seq("s", "s"))
    }
    assert(e2.getMessage.contains("duplicate columns"))
  }

  test("approx profile matches exact on ranges and is close on cardinality") {
    val orders = Tables.table(spark, sfDir, "orders")
    val exact = Profile.profile(orders, Seq("o_orderkey", "o_totalprice"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    val approx = Profile.approxProfile(orders, Seq("o_orderkey", "o_totalprice"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    for (c <- Seq("o_orderkey", "o_totalprice")) {
      assert(approx(c).getAs[Double]("min_val") === exact(c).getAs[Double]("min_val"))
      assert(approx(c).getAs[Double]("max_val") === exact(c).getAs[Double]("max_val"))
      val e = exact(c).getAs[Long]("n_distinct").toDouble
      val a = approx(c).getAs[Long]("n_distinct").toDouble
      assert(math.abs(a - e) / e < 0.15, s"$c approx cardinality drift: $a vs $e")
    }
  }

  test("psi: identical distributions read ~0; planted shift reads large; one-sided buckets survive") {
    val ref = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c"))
      .zipWithIndex.map(_.swap).toDF("id", "bucket")
    // identical mix -> p == q exactly per bucket -> every term ln(1)*0 = 0
    val same = Profile.psi(ref, ref, "bucket").collect()
    assert(same.forall(_.getAs[Double]("psi_term") === 0.0))
    assert(same.head.getAs[Double]("psi_total") === 0.0)
    // planted shift: 'c' collapses into 'a', plus a NEW bucket 'd' on the
    // current side only -> union bucket set carries all four, PSI large
    val cur = (Seq.fill(70)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("d"))
      .zipWithIndex.map(_.swap).toDF("id", "bucket")
    val drift = Profile.psi(ref, cur, "bucket").collect()
    assert(drift.map(_.getAs[String]("bucket")).toSet === Set("a", "b", "c", "d"))
    val byB = drift.map(r => r.getAs[String]("bucket") ->
      (r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"))).toMap
    assert(byB("c") === ((20L, 0L)) && byB("d") === ((0L, 10L)))
    assert(drift.head.getAs[Double]("psi_total") > 0.25,
      s"planted shift must cross the investigate threshold: ${drift.head}")
  }

  test("psi is partition-invariant (decimal term sum)") {
    val ref = (0 until 300).map(i => (i.toLong, s"b${i % 7}")).toDF("id", "bucket")
    val cur = (0 until 300).map(i => (i.toLong, s"b${i % 5}")).toDF("id", "bucket")
    val r1 = Profile.psi(ref, cur, "bucket").orderBy("bucket").collect()
    val r2 = Profile.psi(ref.repartition(11), cur.repartition(3), "bucket")
      .orderBy("bucket").collect()
    assert(r1.map(_.toSeq).toSeq === r2.map(_.toSeq).toSeq)
  }

  test("checkRows: planted violations counted exactly; uniqueness from distinct") {
    val df = Seq(
      (Some(1L), Some(10.0)), (Some(2L), Some(-3.0)), (Some(2L), None),
      (Some(4L), Some(200.0)), (None, Some(5.0))
    ).toDF("k", "v")
    val rep = Profile.checkRows(df,
        Seq("v_not_null" -> col("v").isNull,
            "v_in_range" -> !col("v").between(0.0, 100.0)),
        uniqueCols = Seq("k"))
      .collect().map(r => r.getAs[String]("check") ->
        (r.getAs[Long]("total"), r.getAs[Long]("violations"))).toMap
    assert(rep("v_not_null") === ((5L, 1L)))
    // null v rows do NOT violate the range check (nullability is its own
    // check): only -3.0 and 200.0 fall outside [0, 100]
    assert(rep("v_in_range") === ((5L, 2L)))
    // NULL keys are a nullability defect, not a duplicate: uniqueness
    // counts only the duplicated 2L, never the null-key row
    assert(rep("k_unique") === ((5L, 1L)))
  }

  test("checkRows rejects duplicate check names") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Profile.checkRows(df, Seq("a_unique" -> col("a").isNull),
        uniqueCols = Seq("a"))
    }
    assert(e.getMessage.contains("duplicate check names"))
  }

  test("checks on EMPTY tables report zero totals, never error") {
    import org.apache.spark.sql.types._
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("k", LongType), StructField("v", DoubleType))))
    val rep = Profile.checkRows(empty,
        Seq("v_not_null" -> col("v").isNull), uniqueCols = Seq("k"))
      .collect().map(r => r.getAs[String]("check") ->
        (r.getAs[Long]("total"), r.getAs[Long]("violations"))).toMap
    assert(rep("v_not_null") === ((0L, 0L)))
    assert(rep("k_unique") === ((0L, 0L)))
    val fk = Profile.checkForeignKey(empty.select(col("k").as("fk")), "fk",
      Seq(1L).toDF("dk"), "dk", "fk_empty").collect().head
    assert((fk.getAs[Long]("total"), fk.getAs[Long]("violations")) === ((0L, 0L)))
  }

  test("checkForeignKey: dangling and null fact keys violate, both join modes") {
    val dim = Seq(1L, 2L, 3L).toDF("dk")
    val fact = Seq(Some(1L), Some(2L), Some(9L), None, Some(3L)).toDF("fk")
    for (bc <- Seq(true, false)) {
      val r = Profile.checkForeignKey(fact, "fk", dim, "dk", "fk_check",
        broadcastDim = bc).collect().head
      assert(r.getAs[String]("check") === "fk_check")
      assert(r.getAs[Long]("total") === 5L, s"broadcastDim=$bc")
      assert(r.getAs[Long]("violations") === 2L, s"broadcastDim=$bc")
    }
  }
}
