package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen'd text-signature expressions.
  *
  * [[ShingleHashes]] turns a token array into the array of its n-shingle
  * hashes in one pass over the row — data-local, no explode, no window.
  * The previous formulation (posexplode + per-token xxhash64 + `lead()`
  * windows) was codegen'd too, but a window over (doc, position) forces a
  * corpus-wide hash-partition shuffle + sort BEFORE any signature exists;
  * per-row computation makes every signature pipeline (MinHash, SimHash,
  * n-gram Jaccard) start with a narrow map stage instead — at 100 TB
  * that removes a full-corpus shuffle per dedup job.
  */
object TextExprs {

  private val Seed = 42L // Spark's xxhash64 default seed

  /** Array of n-gram shingle hashes of a string array.
    *
    * hash(i) folds tokens i..i+n-1 through xxHash64:
    * `h = hashUTF8String(token, h)` starting from the default seed — the
    * arithmetic of Spark's own multi-argument `xxhash64(...)` over string
    * columns.
    *
    * @param trailing when true, emit one hash per POSITION (out-of-range
    *                 components fall back to token i — every non-empty
    *                 doc yields >= 1 shingle, the MinHash contract);
    *                 when false, emit only the max(T-n+1, 0) complete
    *                 shingles (the char-n-gram contract — callers union a
    *                 short-doc fallback).
    */
  case class ShingleHashes(child: Expression, n: Int, trailing: Boolean)
      extends UnaryExpression {

    require(n >= 1, s"shingle width $n must be >= 1")

    override def prettyName: String = "shingle_hashes"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName expects array<string>, got ${other.sql}")
      }

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val t = arr.numElements()
      val out = new Array[Long](if (trailing) t else math.max(t - n + 1, 0))
      var i = 0
      while (i < out.length) {
        var h = Seed
        var j = 0
        while (j < n) {
          val idx = if (i + j < t) i + j else i
          val s = arr.getUTF8String(idx)
          h = if (s == null) h else XXH64.hashUTF8String(s, h)
          j += 1
        }
        out(i) = h
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val (t, outLen, out) = (ctx.freshName("t"), ctx.freshName("outLen"), ctx.freshName("out"))
        val (i, j, idx, h, s) = (ctx.freshName("i"), ctx.freshName("j"),
          ctx.freshName("idx"), ctx.freshName("h"), ctx.freshName("s"))
        val xxh = classOf[XXH64].getName
        val lenExpr = if (trailing) t else s"java.lang.Math.max($t - ${n - 1}, 0)"
        s"""
          int $t = $a.numElements();
          int $outLen = $lenExpr;
          long[] $out = new long[$outLen];
          for (int $i = 0; $i < $outLen; $i++) {
            long $h = ${Seed}L;
            for (int $j = 0; $j < $n; $j++) {
              int $idx = ($i + $j < $t) ? ($i + $j) : $i;
              org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($idx);
              if ($s != null) { $h = $xxh.hashUTF8String($s, $h); }
            }
            $out[$i] = $h;
          }
          ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
        """
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
