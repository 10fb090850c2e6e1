package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector distance/similarity expressions over `ArrayType(FloatType)`
  * columns, built from Catalyst higher-order functions (`zip_with`,
  * `aggregate`, `transform`) so every metric stays inside whole-stage
  * codegen — no UDFs.
  *
  * Mirrors the reference's metric surface (`/root/reference/executor.py:259-275`:
  * `euclidean -> l2`, `inner_product -> ip`, `cosine`) and its
  * distance->similarity transform (`/root/reference/executor.py:117-124`).
  *
  * All arithmetic is promoted to double so results agree bit-for-bit with a
  * double-precision oracle (DuckDB `list_dot_product` etc.); callers round
  * for comparison.
  */
object VectorOps {

  private def asCol(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.GraftColumnBridge.column(e)
  private def asExpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftColumnBridge.expression(c)

  /** Sum_i a_i * b_i, accumulated left-to-right in double precision.
    * Codegen'd primitive loop ([[VectorExprs.DotProduct]]). */
  def dot(a: Column, b: Column): Column =
    asCol(VectorExprs.DotProduct(asExpr(a), asExpr(b)))

  /** Interpreted higher-order-function formulation of [[dot]] — kept as
    * the cross-check twin for the custom expression (same arithmetic). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Euclidean norm ||a||_2. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** All random-projection sign bits at once (codegen'd single pass;
    * arithmetic identical to one [[dot]]-vs-literal per plane). */
  def signProjection(a: Column, hyper: Array[Array[Double]]): Column =
    asCol(VectorExprs.SignProjection(asExpr(a), hyper.length,
      hyper.flatten.toIndexedSeq))

  /** PQ ADC table lookup `Σ_s lut[s*k + codes[s]]` — codegen'd
    * ([[VectorExprs.AdcLookup]]); `lut` is flattened subspace-major. */
  def adcLookup(codes: Column, lut: Column, k: Int): Column =
    asCol(VectorExprs.AdcLookup(asExpr(codes), asExpr(lut), k))

  /** Squared L2 distance — what hnswlib's `l2` space reports
    * (`/root/reference/executor.py:261-262`). */
  def l2Sq(a: Column, b: Column): Column =
    asCol(VectorExprs.L2SqDistance(asExpr(a), asExpr(b)))

  /** Higher-order-function twin of [[l2Sq]]. */
  def l2SqHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)

  /** Euclidean (root) L2 distance. */
  def l2(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  /** Sign-bit packing for binary quantization — codegen'd
    * ([[VectorExprs.BqPack]]): bit i of word i/64 set iff a_i > 0. */
  def bqPack(a: Column): Column =
    asCol(VectorExprs.BqPack(asExpr(a)))

  /** Higher-order-function twin of [[bqPack]] (cross-check only): the
    * same little-endian sign-bit words built from fold arithmetic.
    * (The Scala-API `shiftleft` only takes a literal shift, so the
    * column-valued shift goes through the Catalyst expression.) */
  def bqPackHof(a: Column): Column = {
    def shl(v: Column, by: Column): Column =
      asCol(org.apache.spark.sql.catalyst.expressions.ShiftLeft(asExpr(v), asExpr(by)))
    // empty guard: sequence(0, (0-1)/64 = 0) would emit one word for an
    // empty vector where BqPack emits none (the sequence-on-empty trap)
    when(size(a) === 0, typedLit(Seq.empty[Long]))
      .otherwise(transform(
        sequence(lit(0), ((size(a) - lit(1)) / lit(64)).cast("int")),
        w => aggregate(
          slice(a, w * 64 + 1, lit(64)),
          struct(lit(0L).as("bits"), lit(0).as("pos")),
          (acc, x) => struct(
            (acc.getField("bits").bitwiseOR(
              when(x.cast("double") > 0.0, shl(lit(1L), acc.getField("pos")))
                .otherwise(lit(0L)))).as("bits"),
            (acc.getField("pos") + 1).as("pos")),
          acc => acc.getField("bits"))))
  }

  /** Hamming distance over [[bqPack]]-packed codes — codegen'd popcount
    * loop ([[VectorExprs.BqHamming]]). */
  def bqHamming(a: Column, b: Column): Column =
    asCol(VectorExprs.BqHamming(asExpr(a), asExpr(b)))

  /** cos(a, b) in [-1, 1] — fused single-pass codegen
    * ([[VectorExprs.CosineSim]]); arithmetic identical to
    * dot/(sqrt(dot)*sqrt(dot)). */
  def cosineSimilarity(a: Column, b: Column): Column =
    asCol(VectorExprs.CosineSim(asExpr(a), asExpr(b)))

  /** hnswlib cosine-space distance: 1 - cos(a, b). */
  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - cosineSimilarity(a, b)

  /** hnswlib ip-space distance: 1 - <a, b>. */
  def ipDistance(a: Column, b: Column): Column = lit(1.0) - dot(a, b)

  /** L2-normalized copy of the vector (unit length), kept float to match
    * the corpus storage type. Zero vectors pass through unchanged. */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    transform(a, x => when(n === 0.0, x).otherwise((x.cast("double") / n).cast("float")))
  }

  /** Metric-name -> distance expression; unknown metric warns and falls
    * back to l2, matching `/root/reference/executor.py:268-273` (which
    * logs "Invalid distance metric ... using default l2"). */
  def distance(metric: String, a: Column, b: Column): Column = metric match {
    case "cosine"        => cosineDistance(a, b)
    case "inner_product" => ipDistance(a, b)
    case "euclidean"     => l2Sq(a, b)
    case other =>
      Console.err.println(
        s"[graft] WARN: invalid distance metric '$other' — falling back to l2 (executor.py:268-273)")
      l2Sq(a, b)
  }

  /** Distance -> similarity, opt-in per request in the reference
    * (`is_distance=False`, `/root/reference/executor.py:117-124`):
    * cosine/ip use 1 - d; euclidean uses 1 / (1 + d). */
  def distanceToSimilarity(metric: String, d: Column): Column = metric match {
    case "cosine" | "inner_product" => lit(1.0) - d
    case _                          => lit(1.0) / (lit(1.0) + d)
  }

  /** Validation predicate: embedding width equals the declared dim —
    * the reference raises on mismatch (`/root/reference/executor.py:105-110`). */
  def hasDim(a: Column, dim: Int): Column = size(a) === dim
}
