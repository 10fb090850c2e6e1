package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, NumericType}

/** Custom codegen'd vector expressions — the one place SURVEY §4.2 budgets
  * custom Catalyst work. Spark's higher-order functions (`zip_with`,
  * `aggregate`) evaluate their lambdas interpreted, with per-element
  * boxing; these expressions emit a primitive `for` loop into whole-stage
  * codegen instead, which is the difference between an interpreted
  * inner loop and a vectorizable one on a 100 TB scan.
  *
  * All accumulate in double, left-to-right — bit-identical to the
  * higher-order formulations in [[VectorOps]] and to a double-precision
  * SQL oracle, so swapping them in changes nothing observable.
  */
object VectorExprs {

  private def accessor(e: Expression): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => "getFloat"
      case _         => "getDouble"
    }

  private def read(e: Expression, arr: ArrayData, i: Int): Double =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => arr.getFloat(i).toDouble
      case _         => arr.getDouble(i)
    }

  abstract class VectorFold extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(t: DataType) = t match {
        case ArrayType(e: NumericType, _) => e == FloatType || e == DoubleType
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects float/double array inputs, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }
  }

  /** Sum_i a_i * b_i in double precision. */
  case class DotProduct(left: Expression, right: Expression) extends VectorFold {
    override def prettyName: String = "vec_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var i = 0
      while (i < n) { s += read(left, x, i) * read(right, y, i); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (i, n, s) = (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("s"))
        s"""
          int $n = java.lang.Math.min($a.numElements(), $b.numElements());
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $s += (double)$a.${accessor(left)}($i) * (double)$b.${accessor(right)}($i);
          }
          ${ev.value} = $s;
        """
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Sum_i (a_i - b_i)^2 in double precision (hnswlib l2-space distance,
    * reference executor.py:261-262). */
  case class L2SqDistance(left: Expression, right: Expression) extends VectorFold {
    override def prettyName: String = "vec_l2sq"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var i = 0
      while (i < n) { val d = read(left, x, i) - read(right, y, i); s += d * d; i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (i, n, s, d) = (ctx.freshName("i"), ctx.freshName("n"),
          ctx.freshName("s"), ctx.freshName("d"))
        s"""
          int $n = java.lang.Math.min($a.numElements(), $b.numElements());
          double $s = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $d = (double)$a.${accessor(left)}($i) - (double)$b.${accessor(right)}($i);
            $s += $d * $d;
          }
          ${ev.value} = $s;
        """
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** PQ asymmetric-distance table lookup: quantization codes
    * (`array<int>`, length m) against a FLATTENED subspace-major lookup
    * table (`array<double>`, length m*k): `Σ_s lut[s*k + codes[s]]`.
    * This is the per-(query, corpus-row) hot path of ADC search
    * ([[graft.operators.Pq.adcSearch]]) — one primitive loop in
    * whole-stage codegen instead of interpreted nested `element_at`
    * lambdas. Out-of-range codes read as 0.0 contributions (defensive;
    * encode() never produces them). */
  case class AdcLookup(left: Expression, right: Expression, k: Int)
      extends BinaryExpression {
    require(k >= 1, s"codebook size $k must be >= 1")

    override def prettyName: String = "adc_lookup"
    override def dataType: DataType = DoubleType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case (l, r) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName expects (array<int>, array<double>), got ${l.sql} and ${r.sql}")
      }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val codes = a.asInstanceOf[ArrayData]; val lut = b.asInstanceOf[ArrayData]
      val m = codes.numElements(); val total = lut.numElements()
      var s = 0.0; var i = 0
      while (i < m) {
        val idx = i * k + codes.getInt(i)
        if (idx >= 0 && idx < total) s += lut.getDouble(idx)
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (i, m, t, s, idx) = (ctx.freshName("i"), ctx.freshName("m"),
          ctx.freshName("t"), ctx.freshName("s"), ctx.freshName("idx"))
        s"""
          int $m = $a.numElements();
          int $t = $b.numElements();
          double $s = 0.0;
          for (int $i = 0; $i < $m; $i++) {
            int $idx = $i * $k + $a.getInt($i);
            if ($idx >= 0 && $idx < $t) $s += $b.getDouble($idx);
          }
          ${ev.value} = $s;
        """
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Binary quantization packing: one SIGN bit per dimension (set iff
    * x_i > 0), 64 dims per little-endian long word — a float corpus
    * shrinks 32x (64-dim: 256 B -> 8 B/vector), the storage form modern
    * embedding pipelines scan first and rescore after. Deterministic and
    * engine-portable: the bit for dim i lands in word i/64 at position
    * i%64, and the Hamming distance it induces equals the number of
    * dims whose signs disagree — which a SQL oracle computes directly
    * from ±1 sign vectors without packing. */
  case class BqPack(child: Expression) extends UnaryExpression {
    override def prettyName: String = "bq_pack"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(e: NumericType, _) if e == FloatType || e == DoubleType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName expects a float/double array input, got ${t.sql}")
      }

    private def elemAccessor: String = child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => "getFloat"
      case _         => "getDouble"
    }

    override def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val n = v.numElements()
      val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
      val words = new Array[Long]((n + 63) >>> 6)
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        if (x > 0.0) words(i >>> 6) |= 1L << (i & 63)
        i += 1
      }
      new GenericArrayData(words)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val (i, n, w) = (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("w"))
        s"""
          int $n = $a.numElements();
          long[] $w = new long[($n + 63) >>> 6];
          for (int $i = 0; $i < $n; $i++) {
            if ((double)$a.$elemAccessor($i) > 0.0) $w[$i >>> 6] |= (1L << ($i & 63));
          }
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($w);
        """
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Hamming distance between two [[BqPack]]-packed codes:
    * Σ_w Long.bitCount(a_w ^ b_w). The per-(query, corpus-row) hot path
    * of binary-quantized search — one popcount word op per 64 dims in
    * whole-stage codegen, vs 64 float multiplies for the cosine it
    * approximates. */
  case class BqHamming(left: Expression, right: Expression) extends BinaryExpression {
    override def prettyName: String = "bq_hamming"
    override def dataType: DataType = LongType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case (l, r) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName expects (array<bigint>, array<bigint>), got ${l.sql} and ${r.sql}")
      }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0L; var i = 0
      while (i < n) { s += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i)); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (i, n, s) = (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("s"))
        s"""
          int $n = java.lang.Math.min($a.numElements(), $b.numElements());
          long $s = 0L;
          for (int $i = 0; $i < $n; $i++) {
            $s += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
          }
          ${ev.value} = $s;
        """
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Fused one-pass cosine similarity: dot, |a|^2 and |b|^2 in a single
    * loop — dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))), the exact
    * arithmetic of the composed form. */
  case class CosineSim(left: Expression, right: Expression) extends VectorFold {
    override def prettyName: String = "vec_cosine"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val xv = read(left, x, i); val yv = read(right, y, i)
        dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (i, n) = (ctx.freshName("i"), ctx.freshName("n"))
        val (dp, na, nb) = (ctx.freshName("dp"), ctx.freshName("na"), ctx.freshName("nb"))
        val (xv, yv) = (ctx.freshName("xv"), ctx.freshName("yv"))
        s"""
          int $n = java.lang.Math.min($a.numElements(), $b.numElements());
          double $dp = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $xv = (double)$a.${accessor(left)}($i);
            double $yv = (double)$b.${accessor(right)}($i);
            $dp += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
          }
          ${ev.value} = $dp / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        """
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** All `planes` random-projection sign bits in ONE pass: bit_p =
    * (Σ_i M[p][i]·v_i >= 0) ? 1 : 0 over a flattened plane-major matrix
    * carried as a codegen reference object. The composed form — one
    * projection column per plane, each dotting against its own literal
    * array — builds a 64-literal expression tree whose analysis + Janino
    * compile dominated the LSH stage (~4s of a 4.3s query at sf0.1,
    * plan-bound, not data-bound). Arithmetic is bit-identical to the
    * per-plane [[DotProduct]] against a literal: double accumulation,
    * left-to-right, min(len, dim) elements. */
  /** `flat` is a Seq (not a raw Array): case-class equality on an Array
    * field is reference equality, which silently defeats semanticEquals /
    * canonicalization / common-subexpression elimination for two
    * value-identical projections. The tight loops read the private
    * unwrapped array. */
  case class SignProjection(child: Expression, planes: Int, flat: Seq[Double])
      extends UnaryExpression {
    override def prettyName: String = "vec_sign_proj"
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    private val flatArr: Array[Double] = flat.toArray
    private val dim = if (planes == 0) 0 else flatArr.length / planes

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(e: NumericType, _) if e == FloatType || e == DoubleType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName expects a float/double array input, got ${other.sql}")
      }

    override def nullSafeEval(v: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), dim)
      val bits = new Array[Int](planes)
      var p = 0
      while (p < planes) {
        val off = p * dim
        var s = 0.0; var i = 0
        while (i < n) { s += flatArr(off + i) * read(child, x, i); i += 1 }
        bits(p) = if (s >= 0.0) 1 else 0
        p += 1
      }
      ArrayData.toArrayData(bits)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val m = ctx.addReferenceObj("signProjMatrix", flatArr, "double[]")
        val (p, i, n, s, bits) = (ctx.freshName("p"), ctx.freshName("i"),
          ctx.freshName("n"), ctx.freshName("s"), ctx.freshName("bits"))
        s"""
          int $n = java.lang.Math.min($a.numElements(), $dim);
          int[] $bits = new int[$planes];
          for (int $p = 0; $p < $planes; $p++) {
            double $s = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              $s += $m[$p * $dim + $i] * (double)$a.${accessor(child)}($i);
            }
            $bits[$p] = ($s >= 0.0) ? 1 : 0;
          }
          ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($bits);
        """
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }
}
