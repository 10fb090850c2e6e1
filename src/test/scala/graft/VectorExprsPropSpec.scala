package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorExprs

/** Property-based checks of the custom expressions' interpreted eval path
  * against straight Scala folds (SURVEY §5.2 "property-based"). No Spark
  * session needed — Literal children + eval(null). */
class VectorExprsPropSpec extends AnyFunSuite {

  private val pairGen: Gen[(List[Float], List[Float])] = for {
    n <- Gen.choose(1, 128)
    a <- Gen.listOfN(n, Gen.chooseNum(-10.0f, 10.0f))
    b <- Gen.listOfN(n, Gen.chooseNum(-10.0f, 10.0f))
  } yield (a, b)

  private def lit(xs: List[Float]) =
    Literal.create(xs.toArray, ArrayType(FloatType, containsNull = false))

  private def run(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("DotProduct matches the reference fold") {
    run(Prop.forAll(pairGen) { case (a, b) =>
      val got = VectorExprs.DotProduct(lit(a), lit(b)).eval(null).asInstanceOf[Double]
      val want = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      got == want
    })
  }

  test("L2SqDistance is non-negative, symmetric, zero on self") {
    run(Prop.forAll(pairGen) { case (a, b) =>
      val ab = VectorExprs.L2SqDistance(lit(a), lit(b)).eval(null).asInstanceOf[Double]
      val ba = VectorExprs.L2SqDistance(lit(b), lit(a)).eval(null).asInstanceOf[Double]
      val self = VectorExprs.L2SqDistance(lit(a), lit(a)).eval(null).asInstanceOf[Double]
      ab >= 0.0 && ab == ba && self == 0.0
    })
  }

  test("CosineSim is within [-1,1] and symmetric for nonzero vectors") {
    val nonzero = pairGen.suchThat { case (a, b) =>
      a.exists(_ != 0.0f) && b.exists(_ != 0.0f) }
    run(Prop.forAll(nonzero) { case (a, b) =>
      val ab = VectorExprs.CosineSim(lit(a), lit(b)).eval(null).asInstanceOf[Double]
      val ba = VectorExprs.CosineSim(lit(b), lit(a)).eval(null).asInstanceOf[Double]
      ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9 && ab == ba
    })
  }

  test("CosineSim is invariant under positive scaling") {
    run(Prop.forAll(nonzeroWithScale) { case ((a, b), s) =>
      val base = VectorExprs.CosineSim(lit(a), lit(b)).eval(null).asInstanceOf[Double]
      val scaled = VectorExprs.CosineSim(lit(a.map(_ * s)), lit(b)).eval(null).asInstanceOf[Double]
      math.abs(base - scaled) < 1e-6
    })
  }

  private val nonzeroWithScale: Gen[((List[Float], List[Float]), Float)] = for {
    p <- pairGen.suchThat { case (a, b) => a.exists(_ != 0.0f) && b.exists(_ != 0.0f) }
    s <- Gen.chooseNum(0.5f, 4.0f)
  } yield (p, s)

  test("SignProjection bit p equals the sign of DotProduct against plane p") {
    val gen: Gen[(List[Float], Int, Long)] = for {
      dim <- Gen.choose(1, 48)
      v <- Gen.listOfN(dim, Gen.chooseNum(-10.0f, 10.0f))
      planes <- Gen.choose(1, 16)
      seed <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield (v, planes, seed)
    run(Prop.forAll(gen) { case (v, planes, seed) =>
      val rnd = new scala.util.Random(seed)
      val hyper = Array.fill(planes)(Array.fill(v.length)(rnd.nextGaussian()))
      val got = VectorExprs.SignProjection(lit(v), planes, hyper.flatten.toIndexedSeq)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toIntArray().toSeq
      val want = hyper.toIndexedSeq.map { h =>
        val dp = v.zip(h).foldLeft(0.0) { case (acc, (x, w)) => acc + w * x.toDouble }
        if (dp >= 0.0) 1 else 0
      }
      got == want
    })
  }
}
