package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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

  /** md5 twin of [[ShingleHashes]]: the portable 60-bit hash
    * (`conv(substr(md5(shingle),1,15),16,10)` — what DuckDB computes as
    * `CAST('0x' || substr(md5(s),1,15) AS BIGINT)`) of every n-token
    * shingle, one compiled pass per row. Exists so the portable dedup
    * twins keep the flagships' narrow-signature shape: its output feeds
    * the SAME codegen'd [[MinHashSig]]/[[SimHashBits]] reducers. */
  case class Md5ShingleHashes(child: Expression, n: Int, trailing: Boolean)
      extends UnaryExpression {

    require(n >= 1, s"shingle width $n must be >= 1")

    override def prettyName: String = "md5_shingle_hashes"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName expects array<string>, got ${other.sql}")
      }

    override def nullSafeEval(input: Any): Any =
      Md5Kernel.shingleHashes(input.asInstanceOf[ArrayData], n, trailing)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        // the whole kernel is one compiled static call (Md5Kernel is a
        // top-level object — its static forwarder is plain Java) — keeps
        // the stage inside whole-stage codegen without generating the
        // md5 loop itself
        s"${ev.value} = graft.functions.Md5Kernel.shingleHashes($a, $n, $trailing);"
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** One-permutation MinHash signature of a shingle-hash array, rotation-
    * densified — the whole signature computed inside the row (with
    * [[ShingleHashes]] upstream, a MinHash job's only shuffle left is the
    * LSH band join). Bucket b = pmod(h, numPerms) takes min(h); empty
    * buckets borrow from the next filled slot cyclically. Arithmetic
    * identical to the former min(when)-aggregation formulation. */
  case class MinHashSig(child: Expression, numPerms: Int)
      extends UnaryExpression {

    require(numPerms >= 1, s"numPerms $numPerms must be >= 1")

    override def prettyName: String = "minhash_sig"
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName expects array<bigint>, got ${other.sql}")
      }

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val p = numPerms
      val mins = Array.fill(p)(Long.MaxValue)
      val filled = new Array[Boolean](p)
      var i = 0
      while (i < arr.numElements()) {
        val h = arr.getLong(i)
        val b = ((h % p) + p).toInt % p
        if (!filled(b) || h < mins(b)) { mins(b) = h; filled(b) = true }
        i += 1
      }
      val out = new Array[Long](p)
      var s = 0
      while (s < p) {
        var src = -1
        var j = s
        while (src < 0 && j < p) { if (filled(j)) src = j; j += 1 }
        j = 0
        while (src < 0 && j < s) { if (filled(j)) src = j; j += 1 }
        out(s) = if (src >= 0) mins(src) else 0L
        s += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val p = numPerms
        val (mins, filled, out) = (ctx.freshName("mins"), ctx.freshName("filled"), ctx.freshName("out"))
        val (i, h, b, s, j, src) = (ctx.freshName("i"), ctx.freshName("h"), ctx.freshName("b"),
          ctx.freshName("s"), ctx.freshName("j"), ctx.freshName("src"))
        s"""
          long[] $mins = new long[$p];
          boolean[] $filled = new boolean[$p];
          for (int $i = 0; $i < $a.numElements(); $i++) {
            long $h = $a.getLong($i);
            int $b = (int)((($h % $p) + $p) % $p);
            if (!$filled[$b] || $h < $mins[$b]) { $mins[$b] = $h; $filled[$b] = true; }
          }
          long[] $out = new long[$p];
          for (int $s = 0; $s < $p; $s++) {
            int $src = -1;
            for (int $j = $s; $src < 0 && $j < $p; $j++) { if ($filled[$j]) $src = $j; }
            for (int $j = 0; $src < 0 && $j < $s; $j++) { if ($filled[$j]) $src = $j; }
            $out[$s] = ($src >= 0) ? $mins[$src] : 0L;
          }
          ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
        """
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** SimHash bit vector of a shingle-hash array: bit i is the sign of
    * sum over hashes of +-1 by bit i of the hash — per-row, matching the
    * former explode + 64-partial-sum aggregation bit for bit. */
  case class SimHashBits(child: Expression, bits: Int)
      extends UnaryExpression {

    require(bits >= 1 && bits <= 64, s"bits $bits must be in [1,64]")

    override def prettyName: String = "simhash_bits"
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(LongType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName expects array<bigint>, got ${other.sql}")
      }

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val counts = new Array[Int](bits)
      var i = 0
      while (i < arr.numElements()) {
        val h = arr.getLong(i)
        var b = 0
        while (b < bits) {
          counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(counts.map(c => if (c >= 0) 1 else 0))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val (counts, out) = (ctx.freshName("counts"), ctx.freshName("out"))
        val (i, h, b) = (ctx.freshName("i"), ctx.freshName("h"), ctx.freshName("b"))
        s"""
          int[] $counts = new int[$bits];
          for (int $i = 0; $i < $a.numElements(); $i++) {
            long $h = $a.getLong($i);
            for (int $b = 0; $b < $bits; $b++) {
              $counts[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
            }
          }
          int[] $out = new int[$bits];
          for (int $b = 0; $b < $bits; $b++) { $out[$b] = ($counts[$b] >= 0) ? 1 : 0; }
          ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
        """
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Deflate compression ratio of the UTF-8 text: compressed bytes /
    * raw bytes (empty → 1.0). The RedPajama-v2 / Dolma quality signal:
    * highly compressible text (low ratio) is repetitive boilerplate;
    * near-incompressible (ratio ≈ 1) is noise. One static kernel call
    * per row inside whole-stage codegen; the zlib Deflater is
    * per-thread and reset between rows ([[DeflateKernel]]). */
  case class DeflateRatio(child: Expression, level: Int) extends UnaryExpression {
    require(level >= 1 && level <= 9, s"deflate level $level out of [1,9]")

    override def prettyName: String = "deflate_ratio"
    override def dataType: DataType = DoubleType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName expects a string input, got ${t.sql}")
      }

    override def nullSafeEval(input: Any): Any =
      DeflateKernel.ratio(input.asInstanceOf[UTF8String], level)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.DeflateKernel.ratio($c, $level)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Unicode NFC normalization — the canonical-composition pass every
    * text pipeline runs before hashing/dedup (decomposed 'e'+U+0301 and
    * composed 'é' must dedup together); one static kernel call inside
    * whole-stage codegen. */
  case class NfcNormalize(child: Expression) extends UnaryExpression {
    override def prettyName: String = "nfc_normalize"
    override def dataType: DataType = StringType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName expects string, got ${other.sql}")
      }

    override def nullSafeEval(input: Any): Any =
      UnicodeKernel.nfc(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeKernel.nfc($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Accent strip (NFD + drop combining marks) — CCNet's
    * normalization-for-hashing semantics, utf8proc-compatible. */
  case class StripAccents(child: Expression) extends UnaryExpression {
    override def prettyName: String = "strip_accents"
    override def dataType: DataType = StringType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName expects string, got ${other.sql}")
      }

    override def nullSafeEval(input: Any): Any =
      UnicodeKernel.stripAccents(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeKernel.stripAccents($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}

/** Compiled kernel for [[TextExprs.DeflateRatio]]: per-thread zlib
  * Deflater (raw/nowrap), reset between rows — no per-row native
  * allocation on the hot path. */
object DeflateKernel {
  private val deflaters = new ThreadLocal[java.util.HashMap[Integer, java.util.zip.Deflater]] {
    override def initialValue() = new java.util.HashMap[Integer, java.util.zip.Deflater]()
  }

  def ratio(s: UTF8String, level: Int): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val perLevel = deflaters.get()
    var d = perLevel.get(level)
    if (d == null) {
      d = new java.util.zip.Deflater(level, true)
      perLevel.put(level, d)
    } else d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }
}

/** Compiled kernel for [[TextExprs.Md5ShingleHashes]]. Top-level object:
  * Scala emits a static forwarder class, so generated Java calls
  * `graft.functions.Md5Kernel.shingleHashes(...)` directly. */
object Md5Kernel {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Space = Array[Byte](' ')

  /** 60-bit value of the first 15 hex chars of md5 over the UTF-8 bytes
    * of the n-token shingle at position i (out-of-range components fall
    * back to token i — [[TextExprs.ShingleHashes]]'s trailing contract),
    * for every position (or only complete shingles when !trailing). */
  def shingleHashes(arr: ArrayData, n: Int, trailing: Boolean): UnsafeArrayData = {
    val md = digests.get()
    val t = arr.numElements()
    val out = new Array[Long](if (trailing) t else math.max(t - n + 1, 0))
    var i = 0
    while (i < out.length) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(Space)
        val idx = if (i + j < t) i + j else i
        val s = arr.getUTF8String(idx)
        if (s != null) md.update(s.getBytes)
        j += 1
      }
      val h = md.digest()
      // value of int(md5hex[:15], 16): 7 full bytes + the high nibble
      var v = 0L
      var k = 0
      while (k < 7) { v = (v << 8) | (h(k) & 0xffL); k += 1 }
      out(i) = (v << 4) | ((h(7) & 0xffL) >>> 4)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Compiled kernel for the Unicode-normalization expressions (top-level
  * object — static forwarders keep the calls codegen-friendly). */
object UnicodeKernel {
  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))

  /** NFD-decompose, drop combining marks (Unicode category Mn) — the
    * CCNet/utf8proc accent-strip semantics; base letters survive. */
  def stripAccents(s: UTF8String): UTF8String = {
    val d = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val c = d.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
