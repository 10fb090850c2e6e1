package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KnnTopK

/** Property-based pin of the bounded top-k Aggregator's REDUCTION
  * semantics — the partial/final contract every k-NN path now rides on
  * ([[KnnTopK.boundedTopK]]). Spark may split the input into arbitrary
  * partial buffers in any order; the properties drive `reduce`/`merge`
  * directly over random splits and demand the exact global
  * sort-then-take answer (score, then id tiebreak). No session needed. */
class TopKAggPropSpec extends AnyFunSuite {

  private val inputGen: Gen[(Int, List[(Double, Long)], List[Int])] = for {
    k <- Gen.choose(1, 8)
    n <- Gen.choose(0, 60)
    // duplicate scores are the interesting case — force collisions by
    // drawing from a small score set; ids kept distinct
    scores <- Gen.listOfN(n, Gen.choose(0, 9).map(_ / 4.0))
    rows = scores.zipWithIndex.map { case (s, i) => (s, i.toLong) }
    cuts <- Gen.listOfN(4, Gen.choose(0, math.max(n, 1)))
  } yield (k, rows, cuts.sorted)

  private def expected(rows: List[(Double, Long)], k: Int,
                       asc: Boolean): Seq[(Double, Long)] = {
    val sorted =
      if (asc) rows.sortBy { case (s, id) => (s, id) }
      else rows.sortBy { case (s, id) => (-s, id) }
    sorted.take(k)
  }

  private def viaAgg(rows: List[(Double, Long)], cuts: List[Int], k: Int,
                     asc: Boolean): Seq[(Double, Long)] = {
    val agg = new KnnTopK.TopKAgg(k, asc)
    // split rows at the random cut points into partial buffers
    val bounds = (0 :: cuts) :+ rows.length
    val chunks = bounds.zip(bounds.tail).map { case (a, b) =>
      rows.slice(math.min(a, b), math.max(a, b))
    }
    val buffers = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
    agg.finish(buffers.foldLeft(agg.zero)(agg.merge))
  }

  private def run(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("arbitrary partition splits produce the exact sort-then-take top-k (asc)") {
    run(Prop.forAll(inputGen) { case (k, rows, cuts) =>
      viaAgg(rows, cuts, k, asc = true) == expected(rows, k, asc = true)
    })
  }

  test("arbitrary partition splits produce the exact sort-then-take top-k (desc)") {
    run(Prop.forAll(inputGen) { case (k, rows, cuts) =>
      viaAgg(rows, cuts, k, asc = false) == expected(rows, k, asc = false)
    })
  }

  test("NaN scores are rejected: result equals the top-k of the non-NaN rows") {
    // NaN (0/0 cosine on a zero-norm vector) must neither occupy a slot
    // nor — at the heap root — veto later offers/merges
    val gen = for {
      base <- inputGen
      nanAt <- Gen.listOfN(6, Gen.choose(0, math.max(base._2.length, 1)))
    } yield (base, nanAt)
    run(Prop.forAll(gen) { case ((k, rows, cuts), nanAt) =>
      val withNaN = rows.zipWithIndex.flatMap { case (r, i) =>
        if (nanAt.contains(i)) Seq((Double.NaN, 1000L + i), r) else Seq(r)
      }
      val agg = new KnnTopK.TopKAgg(k, asc = true)
      val got = agg.finish(withNaN.foldLeft(agg.zero)(agg.reduce))
      got == expected(rows, k, asc = true) && got.forall(!_._1.isNaN)
    })
  }

  test("merge is order-insensitive: forward and reversed buffer merge agree") {
    run(Prop.forAll(inputGen) { case (k, rows, cuts) =>
      val agg = new KnnTopK.TopKAgg(k, asc = true)
      val bounds = (0 :: cuts) :+ rows.length
      val buffers = bounds.zip(bounds.tail).map { case (a, b) =>
        rows.slice(math.min(a, b), math.max(a, b)).foldLeft(agg.zero)(agg.reduce)
      }
      val fwd = agg.finish(buffers.foldLeft(agg.zero)(agg.merge))
      val rev = agg.finish(buffers.reverse.foldLeft(agg.zero)(agg.merge))
      fwd == rev
    })
  }
}
