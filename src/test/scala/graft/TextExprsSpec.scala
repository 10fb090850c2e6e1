package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftColumnBridge
import graft.functions.TextExprs
import graft.operators.{Dedup, TextOps}

class TextExprsSpec extends SparkSuite {
  import spark.implicits._

  private def shingles(toks: Seq[String], n: Int, trailing: Boolean): Seq[Long] =
    Seq(1).toDF("x").select(GraftColumnBridge.column(
        TextExprs.ShingleHashes(
          GraftColumnBridge.expression(typedLit(toks)), n, trailing)).as("h"))
      .head().getSeq[Long](0)

  private def xx(parts: String*): Long =
    Seq(1).toDF("x").select(xxhash64(parts.map(lit): _*)).head().getLong(0)

  test("shingle hashes equal Spark's multi-arg xxhash64 over the same strings") {
    assert(shingles(Seq("a", "b", "c", "d"), 3, trailing = false)
      === Seq(xx("a", "b", "c"), xx("b", "c", "d")))
  }

  test("trailing mode falls back to the position's own token") {
    assert(shingles(Seq("x", "y"), 3, trailing = true)
      === Seq(xx("x", "y", "x"), xx("y", "y", "y")))
    assert(shingles(Seq.empty, 3, trailing = true) === Seq.empty)
    assert(shingles(Seq("only"), 2, trailing = false) === Seq.empty)
  }

  test("md5 shingle hashes equal the builtin conv(md5) chain on fixture texts") {
    // the compiled kernel (MessageDigest + nibble arithmetic) must be
    // bit-equal to the expression it replaces: portableHash64 over the
    // trailing shingle STRINGS — on real corpus token arrays
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
      .select(Dedup.tokens(col("text")).as("ts"))
      .filter(size(col("ts")) > 0)
    for ((n, trailing) <- Seq((3, true), (2, true), (3, false))) {
      val kernel = docs.select(GraftColumnBridge.column(
        TextExprs.Md5ShingleHashes(
          GraftColumnBridge.expression(col("ts")), n, trailing)).as("h"))
      val builtin =
        if (trailing)
          docs.select(transform(Dedup.trailingShingleStrings(col("ts"), n),
            s => Dedup.portableHash64(s)).as("h"))
        else
          docs.select(when(size(col("ts")) >= n,
            transform(sequence(lit(1), size(col("ts")) - (n - 1)), i =>
              Dedup.portableHash64(concat_ws(" ", slice(col("ts"), i, lit(n))))))
            .otherwise(array().cast("array<bigint>")).as("h"))
      assert(kernel.collect().map(_.getSeq[Long](0)).toSeq
        === builtin.collect().map(_.getSeq[Long](0)).toSeq,
        s"mismatch at n=$n trailing=$trailing")
    }
  }

  test("md5 kernel matches the builtin chain on unicode / degenerate token arrays") {
    // the kernel hashes UTF8String.getBytes — multibyte text is where a
    // byte-level bug would hide (the fixture corpus is pure ASCII)
    val cases: Seq[Seq[String]] = Seq(
      Seq("héllo", "wörld", "naïve"),
      Seq("日本語", "の", "テスト", "です"),
      Seq("mixed", "ascii", "日本", "🎉emoji🎉", "tail"),
      Seq("🎉"),                       // single multibyte token
      Seq("a" * 500, "b", "c" * 300),  // long tokens
      Seq.empty[String]                // no tokens -> no shingles
    )
    import spark.implicits._
    val df = cases.toDF("ts")
    for ((n, trailing) <- Seq((3, true), (2, true), (3, false))) {
      val both = df.select(
        GraftColumnBridge.column(TextExprs.Md5ShingleHashes(
          GraftColumnBridge.expression(col("ts")), n, trailing)).as("kernel"),
        (if (trailing)
          transform(Dedup.trailingShingleStrings(col("ts"), n),
            s => Dedup.portableHash64(s))
        else
          when(size(col("ts")) >= n,
            transform(sequence(lit(1), size(col("ts")) - (n - 1)), i =>
              Dedup.portableHash64(concat_ws(" ", slice(col("ts"), i, lit(n))))))
            .otherwise(array().cast("array<bigint>"))).as("builtin")
      ).collect()
      both.zip(cases).foreach { case (r, c) =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](1),
          s"mismatch on $c at n=$n trailing=$trailing")
      }
    }
  }

  test("minhash_sig takes per-bucket minima and rotation-densifies") {
    def sig(hs: Seq[Long], p: Int): Seq[Long] =
      Seq(1).toDF("x").select(GraftColumnBridge.column(
          TextExprs.MinHashSig(GraftColumnBridge.expression(typedLit(hs)), p)).as("s"))
        .head().getSeq[Long](0)
    // 5 and 13 both land in slot 1 (mod 4): min 5; every empty slot
    // borrows forward-cyclically from slot 1
    assert(sig(Seq(5L, 13L), 4) === Seq(5L, 5L, 5L, 5L))
    // 4 -> slot 0, 7 -> slot 3: slots 1,2 borrow forward from 3
    assert(sig(Seq(4L, 7L), 4) === Seq(4L, 7L, 7L, 7L))
    // negative hash buckets via pmod: -3 % 4 -> 1
    assert(sig(Seq(-3L), 4) === Seq(-3L, -3L, -3L, -3L))
  }

  test("simhash_bits votes each bit by sign") {
    def bits(hs: Seq[Long], b: Int): Seq[Int] =
      Seq(1).toDF("x").select(GraftColumnBridge.column(
          TextExprs.SimHashBits(GraftColumnBridge.expression(typedLit(hs)), b)).as("s"))
        .head().getSeq[Int](0)
    // single hash 0b0110: bits 1,2 set -> votes +1; bits 0,3 -> -1
    assert(bits(Seq(6L), 4) === Seq(0, 1, 1, 0))
    // 0b0110 + 0b0101: bit0 and bit1 tie at 0 (>= 0 -> 1); bit2 +2 -> 1;
    // bit3 -2 -> 0
    assert(bits(Seq(6L, 5L), 4) === Seq(1, 1, 1, 0))
  }

  test("codegen and interpreted paths agree on fixture docs") {
    val docs = sparkDocs
    val viaPlan = Dedup.shingleHashes(docs, "doc_id", "text", 3)
      .groupBy("doc_id").agg(sort_array(collect_list("__h")).as("hs"))
    val interp = docs.select(col("doc_id"),
        TextExprsSpecHelper.interpreted(col("text"), 3).as("h"))
      .select(col("doc_id"), explode(col("h")).as("__h"))
      .groupBy("doc_id").agg(sort_array(collect_list("__h")).as("hs"))
    assert(viaPlan.exceptAll(interp).isEmpty && interp.exceptAll(viaPlan).isEmpty)
  }

  test("deflate ratio separates repetitive from high-entropy text; empty is 1.0") {
    import graft.operators.TextOps
    val rnd = new scala.util.Random(7)
    val noisy = Array.fill(4000)(rnd.nextPrintableChar()).mkString
    val docs = Seq(
      (1L, "spam " * 800),                 // repetitive boilerplate
      (2L, noisy),                         // near-incompressible
      (3L, "")                             // empty
    ).toDF("doc_id", "text")
    val r = TextOps.compressionReport(docs).collect()
      .map(x => x.getLong(0) -> (x.getDouble(2), x.getBoolean(3), x.getBoolean(4))).toMap
    assert(r(1L)._1 < 0.05 && r(1L)._2, s"repetitive text should flag: ${r(1L)}")
    assert(r(2L)._1 > 0.7 && !r(2L)._2, s"random text must not flag repetitive: ${r(2L)}")
    assert(r(3L)._1 === 1.0)
    // deterministic across evaluations (same kernel, same zlib)
    val again = TextOps.compressionReport(docs).collect()
      .map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(again === r.map { case (k, v) => k -> v._1 })
  }

  test("entropy report matches closed forms: uniform = ln n, constant = 0") {
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "a b c d"),        // 4 distinct: H = ln 4
      (2L, "a a a a"),        // constant: H = 0
      (3L, "a a b b"),        // 2 x 2: H = ln 2
      (4L, "")                // empty: excluded
    ).toDF("doc_id", "text")
    val r = TextOps.entropyReport(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(!r.contains(4L))
    assert(r(1L) === ((4L, math.rint(math.log(4) * 10000) / 10000)))
    assert(r(2L) === ((4L, 0.0)))
    assert(r(3L) === ((4L, math.rint(math.log(2) * 10000) / 10000)))
  }

  test("deflate ratio codegen path equals the interpreted eval path") {
    import graft.operators.TextOps
    val docs = sparkDocs
    val viaPlan = docs.select($"doc_id", TextOps.compressionRatio($"text").as("r"))
    // force interpreted eval: higher-order-function lambdas evaluate
    // children interpreted
    val interp = docs.select($"doc_id",
      transform(array($"text"), t => TextOps.compressionRatio(t)).getItem(0).as("r"))
    assert(viaPlan.exceptAll(interp).isEmpty && interp.exceptAll(viaPlan).isEmpty)
  }

  test("canonicalizeUrl: each rule individually, idempotence, NULL on garbage") {
    import spark.implicits._
    val cases = Seq(
      // rule -> (input, expected canonical)
      ("HTTP://WWW.Ex.COM/Path", "http://www.ex.com/Path"), // case: scheme+host only
      ("http://ex.com:80/a", "http://ex.com/a"),            // default port http
      ("https://ex.com:443/a", "https://ex.com/a"),         // default port https
      ("http://ex.com:443/a", "http://ex.com:443/a"),       // NON-default port kept
      ("https://ex.com:8080/a", "https://ex.com:8080/a"),
      ("https://ex.com", "https://ex.com/"),                // empty path -> '/'
      ("https://ex.com/a#sec-2", "https://ex.com/a"),       // fragment stripped
      ("https://ex.com/a?b=2&a=1", "https://ex.com/a?a=1&b=2"), // params sorted
      ("https://ex.com/a?utm_source=x&utm_medium=y", "https://ex.com/a"), // all tracking
      ("https://ex.com/a?ref=t&z=9&fbclid=f&gclid=g", "https://ex.com/a?z=9"),
      ("nonsense", null),
      ("", null)
    ).toDF("url", "want")
    val got = cases.select(col("url"), col("want"),
      TextOps.canonicalizeUrl(col("url")).as("got"))
    val bad = got.filter(!(col("got") <=> col("want"))).collect()
    assert(bad.isEmpty, s"rule mismatches: ${bad.mkString("; ")}")
    // idempotence: canonical output re-canonicalizes to itself
    val twice = got.filter(col("want").isNotNull)
      .select(col("want"), TextOps.canonicalizeUrl(col("want")).as("again"))
      .filter(!(col("again") <=> col("want"))).collect()
    assert(twice.isEmpty, s"not idempotent: ${twice.mkString("; ")}")
    // domain key: host without port, NULL on garbage
    val doms = Seq("https://A.Ex.com:8080/x" -> "a.ex.com", "junk" -> null)
      .toDF("url", "want")
      .select(col("want"), TextOps.urlDomain(col("url")).as("got"))
      .filter(!(col("got") <=> col("want"))).collect()
    assert(doms.isEmpty)
  }

  private def sparkDocs =
    spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text").limit(100)

  test("nfc normalize: decomposed composes to the precomposed spelling; idempotent") {
    val decomposed = "café näive" // e+acute, a+diaeresis
    val composed = "café näive"
    val out = Seq((1L, decomposed), (2L, composed)).toDF("id", "t")
      .select(col("id"), TextOps.nfcNormalize(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === composed, "NFC must compose combining sequences")
    assert(out(2L) === composed, "NFC is idempotent on composed text")
    // dedup consequence: byte-different spellings now hash identically
    assert(out(1L) === out(2L))
  }

  test("strip accents: marks drop from both composed and decomposed forms; ASCII untouched") {
    val rows = Seq(
      (1L, "café Å ñ"), // decomposed
      (2L, "café Å ñ"),    // precomposed
      (3L, "plain ascii 123"))
    val out = rows.toDF("id", "t")
      .select(col("id"), TextOps.stripAccents(col("t")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "cafe A n")
    assert(out(2L) === "cafe A n")
    assert(out(3L) === "plain ascii 123")
  }

  test("unicode expressions: interpreted eval equals the codegen'd dataframe path") {
    val s = "égalité égalité"
    val viaDf = Seq(Tuple1(s)).toDF("t")
      .select(TextOps.nfcNormalize(col("t")), TextOps.stripAccents(col("t")))
      .head()
    val nfcExpr = TextExprs.NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType))
    val stripExpr = TextExprs.StripAccents(nfcExpr.child)
    assert(nfcExpr.eval(null).toString === viaDf.getString(0))
    assert(stripExpr.eval(null).toString === viaDf.getString(1))
  }
}

object TextExprsSpecHelper {
  import org.apache.spark.sql.Column
  /** Force the interpreted eval path by wrapping in a non-codegen context:
    * evaluate ShingleHashes via an untyped transform over a 1-element
    * array (higher-order functions evaluate children interpreted). */
  def interpreted(text: Column, n: Int): Column = {
    val toks = Dedup.tokens(text)
    transform(array(toks), t => GraftColumnBridge.column(
      TextExprs.ShingleHashes(GraftColumnBridge.expression(t), n, trailing = true)))
      .getItem(0)
  }
}

class TextExtractHtmlSpec extends SparkSuite {

  test("extractHtmlText: each hazard class, plain-text identity, idempotence") {
    import spark.implicits._
    val cases = Seq(
      // script/style bodies drop whole, incl. hostile </>& inside code
      ("<style>p { color: red; }</style><p>body</p>", "body"),
      ("<script>if (x<2 && y>1) { track(\"&amp;\"); }</script>after", "after"),
      // UPPERCASE tags and script — (?i) paths
      ("<SCRIPT SRC=\"x.js\">var z=1;</SCRIPT><LI>item</LI>", "item"),
      // comments drop FIRST, even when they hide tags
      ("a<!-- <p>hidden</p> -->b", "a b"),
      // quoted attribute values may contain '>'
      ("<p title=\"a > b\" data-x='1 > 0'>kept</p>", "kept"),
      // entity set, single-pass: &amp;amp; -> &amp; (literal), not '&'
      ("x &lt;tag&gt; &amp;amp; &quot;q&quot; &#39;s&#39;&nbsp;y",
        "x <tag> &amp; \"q\" 's' y"),
      // stray '<' not opening an element is text and survives
      ("2 < 3 and 5 > 4 unchanged", "2 < 3 and 5 > 4 unchanged"),
      // DOCTYPE + whitespace collapse + trim
      ("<!DOCTYPE html> <html><body>  a\n\n b </body></html>", "a b"),
      // tagless plain text is the identity
      ("plain text stays", "plain text stays"),
      ("", "")
    ).toDF("html", "want")
    val bad = cases.select(col("html"), col("want"),
        TextOps.extractHtmlText(col("html")).as("got"))
      .filter(!(col("got") <=> col("want"))).collect()
    assert(bad.isEmpty, s"extraction mismatches: ${bad.mkString("; ")}")
    // idempotence: extracted text re-extracts to itself UNLESS the
    // decode step manufactured markup-looking text — '<tag>' from
    // '&lt;tag&gt;' is the documented reason decode runs after strip,
    // so feed the decode-free rows only
    val twice = cases.filter(!col("html").contains("&"))
      .select(col("want"), TextOps.extractHtmlText(col("want")).as("again"))
      .filter(!(col("again") <=> col("want"))).collect()
    assert(twice.isEmpty, s"not idempotent: ${twice.mkString("; ")}")
  }
}
