package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §2.9 E3):
  * token counting, quality scoring, language-ID heuristic, document
  * fingerprinting. All pure column expressions (codegen'd, no UDFs) so
  * they run as one narrow map stage over the corpus — no shuffle at any
  * scale except where an aggregation is explicitly requested.
  */
object TextOps {

  /** Common analysis stopwords (also the quality signal's function-word
    * list). Kept tiny and fixed for determinism. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  def tokenCount(text: Column): Column = size(Dedup.tokens(text))

  /** Deflate compression ratio (compressed/raw UTF-8 bytes; empty → 1)
    * — the RedPajama-v2 / Dolma repetitiveness signal, served by the
    * codegen'd [[graft.functions.TextExprs.DeflateRatio]] kernel. */
  def compressionRatio(text: Column, level: Int = 6): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.TextExprs.DeflateRatio(
        org.apache.spark.sql.GraftColumnBridge.expression(text), level))

  /** Unicode NFC normalization (codegen'd
    * [[graft.functions.TextExprs.NfcNormalize]]): canonical composition
    * so byte-different spellings of the same text (decomposed e+U+0301
    * vs composed é) hash/dedup identically — run it BEFORE any
    * fingerprinting pass over scraped text. */
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.TextExprs.NfcNormalize(
        org.apache.spark.sql.GraftColumnBridge.expression(text)))

  /** Accent strip — NFD + drop combining marks (CCNet's
    * normalization-for-hashing; utf8proc-compatible). */
  def stripAccents(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.TextExprs.StripAccents(
        org.apache.spark.sql.GraftColumnBridge.expression(text)))

  /** Per-doc token (unigram) Shannon entropy in NATS:
    * H = ln(n) − (Σ c·ln c)/n over word counts c — the vocabulary-
    * diversity twin of [[compressionRatio]] (low entropy = repetitive).
    * Scale shape: one (doc, word) shuffle with map-side combine, then a
    * per-doc aggregation — the corpus text never moves twice.
    * Cross-engine determinism: each c·ln c term is rounded to 6dp and
    * summed in DECIMAL (exact, order-free) — a raw double SUM's
    * partition-order nondeterminism would flip 4dp half-boundary
    * roundings between engines. Empty docs are excluded (no tokens, no
    * entropy), matching the other tokenizing reports. */
  def entropyReport(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(Dedup.tokens(col(textCol))).as("__w"))
      .groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol)).agg(
        sum(col("__c")).as("__n"),
        sum(round(col("__c").cast("double") * log(col("__c").cast("double")), 6)
          .cast("decimal(18,12)")).as("__clc"))
      .select(col(idCol),
        col("__n").cast("long").as("n_tokens"),
        round(log(col("__n").cast("double"))
          - col("__clc").cast("double") / col("__n").cast("double"), 4)
          .as("entropy_nats"))

  /** Per-doc compression-quality report: (idCol, n_bytes, deflate_ratio,
    * repetitive, noisy). The flag bounds follow the published pipelines'
    * shape (drop the extremes; both thresholds are parameters because
    * every corpus calibrates its own). One narrow map stage. */
  def compressionReport(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", level: Int = 6,
                        repetitiveBelow: Double = 0.30,
                        noisyAbove: Double = 0.95): DataFrame =
    docs.select(col(idCol),
        octet_length(col(textCol)).cast("long").as("n_bytes"),
        round(compressionRatio(col(textCol), level), 4).as("deflate_ratio"))
      .withColumn("repetitive", col("deflate_ratio") < repetitiveBelow)
      .withColumn("noisy", col("deflate_ratio") > noisyAbove)

  /** Ratio of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column): Column = {
    val ts = Dedup.tokens(text)
    val stops = array(Stopwords.map(lit): _*)
    size(filter(ts, t => array_contains(stops, t))).cast("double") /
      greatest(size(ts), lit(1)).cast("double")
  }

  /** BPE-style pre-tokenization count: contractions, letter runs, digit
    * runs, punctuation runs (the GPT-2 pre-tokenizer pattern family,
    * ASCII-restricted so regex dialects agree across engines). A proxy
    * for LLM token budgeting ~4x cheaper than real BPE merges. */
  val BpePattern: String =
    "('s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s']+)"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))
  def avgTokenLen(text: Column): Column = {
    val ts = Dedup.tokens(text)
    aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(ts), lit(1)).cast("double")
  }

  /** Composite quality score in [0,1]: longer docs with low punctuation
    * noise and moderate stopword density score higher. Deterministic
    * arithmetic only — components are rounded before combination so an
    * oracle reproduces it exactly. */
  def qualityScore(nTokens: Column, punct: Column, stop: Column): Column =
    round(least(nTokens.cast("double") / 100.0, lit(1.0))
      * (lit(1.0) - punct) * (lit(1.0) - lit(0.5) * stop), 4)

  /** Language-marker token sets for the n-gram/stopword language-ID
    * heuristic. Public-knowledge function-word lists, truncated. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "es" -> Seq("el", "la", "de", "que", "es"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Heuristic language ID: score each language by marker-token hits
    * (CJK additionally by codepoint class); argmax with fixed tie order.
    * Returns the language code column. */
  def langId(text: Column): Column = {
    val ts = Dedup.tokens(text)
    val cjk = length(regexp_replace(text, "[^\\u4e00-\\u9fff]", ""))
    val scores: Seq[(String, Column)] = LangMarkers.map { case (lang, markers) =>
      val m = array(markers.map(lit): _*)
      val base = size(filter(ts, t => array_contains(m, t)))
      lang -> (if (lang == "zh") base + cjk else base)
    }
    // argmax with deterministic tie-break = declaration order
    scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
         when(score > bestScore, score).otherwise(bestScore))
    }._1
  }

  /** Document fingerprint: minimum 64-bit hash over the rolling character
    * 8-gram windows (winnowing-style min-sampling; robust to small
    * in-place edits, cheap to compare at corpus scale). */
  def fingerprint(text: Column, window: Int = 8): Column =
    array_min(transform(Dedup.charNgrams(text, window), g => xxhash64(g)))

  /** Engine-portable variant of [[fingerprint]]: min md5-hex over the same
    * rolling windows. md5 hex strings order identically everywhere
    * (lowercase hex, lexicographic = numeric), so a SQL oracle reproduces
    * it exactly; the xxhash64 form stays the scale default (8-byte longs
    * vs 32-char strings). Short texts fall back to md5(text) via
    * charNgrams' whole-text branch. */
  def fingerprintMd5(text: Column, window: Int = 8): Column =
    array_min(transform(Dedup.charNgrams(text, window), g => md5(g.cast("binary"))))

  /** Top-k most document-distinctive terms per doc — TF-IDF-shaped
    * keyword extraction with the rational relevance score
    * `tf * N / df` instead of `tf * ln(N/df)`: every input is an integer
    * count, so the one division is the only rounding step and both
    * engines produce bit-identical scores (libm `ln` carries no such
    * guarantee — a last-ulp disagreement on a rounding boundary is
    * exactly the flake class that broke the cosine oracles). For a fixed
    * tf the transform is monotone in N/df, so rare terms rank above
    * common ones just as with the log form.
    *
    * Plan: two hash aggregations (doc-term tf, term df) + a broadcast of
    * the single-row corpus count + per-doc window. The df table is
    * vocabulary-sized, the window partitions by doc — nothing global.
    * @return (doc_id, term, score, rank) */
  def topTermsByRelevance(docs: DataFrame, k: Int = 3,
                          idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol), explode(Dedup.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    // document frequency as a COUNT WINDOW over the already-reduced tf
    // frame (the [[Retrieval.bm25]] pattern): a separate tf.groupBy(term)
    // + join re-executes the whole scan+tokenize+tf subtree — a second
    // full corpus pass at 100 TB
    val dfw = Window.partitionBy(col("term"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term").asc)
    tf.withColumn("df", count(lit(1)).over(dfw))
      .crossJoin(broadcast(n))
      .withColumn("score",
        round((col("tf") * col("__n")).cast("double") / col("df"), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("score"), col("rank"))
  }

  /** Word-level repetition ratio (C4/Gopher-style quality rule): fraction
    * of tokens that are repeats of an earlier token, `1 - distinct/total`.
    * High values flag boilerplate/spam for filtering. Pure column
    * expression, no shuffle. */
  def repetitionRatio(text: Column): Column = {
    val ts = Dedup.tokens(text)
    round(lit(1.0) - size(array_distinct(ts)).cast("double") /
      greatest(size(ts), lit(1)).cast("double"), 4)
  }

  /** Pattern redaction (PII/noise scrubbing): replace every match of
    * `pattern` with `replacement`. Thin, but an explicit operator so
    * pipelines declare WHAT they scrub; global replace in one codegen'd
    * projection. */
  def redact(text: Column, pattern: String, replacement: String): Column =
    regexp_replace(text, pattern, replacement)

  /** Digit-run redaction — the common numeric-PII default. */
  val NumberPattern = "[0-9]+"

  /** Token-window document chunking — the RAG/pretraining segmentation
    * pass: overlapping windows of `chunkSize` tokens advancing by
    * `stride`. Pure per-row explode (narrow, no shuffle); chunk count is
    * `ceil((n - chunkSize)/stride) + 1`, so the last window may be short
    * but every token is covered and consecutive chunks overlap by
    * `chunkSize - stride` tokens.
    * @return input row per chunk + (chunk_id, chunk_text, chunk_tokens) */
  def chunkByTokens(docs: DataFrame, chunkSize: Int = 32, stride: Int = 24,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got $stride/$chunkSize")
    val ts = Dedup.tokens(col(textCol))
    val n = size(ts)
    val nChunks = when(n <= chunkSize, lit(1))
      .otherwise(floor((n - chunkSize + (stride - 1)).cast("double") / stride) + 1)
    docs
      .select(col(idCol), ts.as("__ts"), nChunks.cast("int").as("__nc"))
      .select(col(idCol), col("__ts"),
        explode(sequence(lit(0), col("__nc") - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("__ts"), col("chunk_id") * stride + 1, lit(chunkSize)))
          .as("chunk_text"),
        size(slice(col("__ts"), col("chunk_id") * stride + 1, lit(chunkSize)))
          .cast("long").as("chunk_tokens"))
  }

  /** Gopher-style document quality rules (Rae et al. 2021 §A1.1 family,
    * public-knowledge heuristics): word-count bounds, mean-word-length
    * band, symbol-to-word ratio, alphabetic-word ratio, and a minimum
    * count of distinct stopwords. Every signal is integer/rational
    * arithmetic over the token list (no libm), rounded before the rule
    * comparisons, so an engine-independent oracle reproduces both the
    * signals and the verdict bit-for-bit. Pure narrow projection — one
    * map stage at any corpus size.
    * @return (id, n_words, mean_word_len, symbol_ratio, alpha_word_ratio,
    *          n_stop_hits, passes) */
  def gopherReport(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text",
                   minWords: Int = 50, maxWords: Int = 100000,
                   minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                   maxSymbolRatio: Double = 0.1,
                   minAlphaRatio: Double = 0.8,
                   minStopHits: Int = 2): DataFrame = {
    val t = col(textCol)
    // tokenize ONCE in a dedicated projection: the five signal
    // expressions below each reference the token array, and HOF
    // expressions get no common-subexpression elimination — inlining
    // `tokens(text)` here would re-run the regex split per signal
    // (same trap [[Dedup.wordShingles]] documents)
    val ts = col("__ts")
    val nW = size(ts)
    val stops = array(Stopwords.map(lit): _*)
    docs.select(col(idCol), t, Dedup.tokens(t).as("__ts"))
      .select(
        col(idCol),
        nW.cast("long").as("n_words"),
        round(aggregate(ts, lit(0L), (acc, w) => acc + length(w)).cast("double") /
          greatest(nW, lit(1)), 4).as("mean_word_len"),
        // Gopher's symbol set: '#' and the ellipsis codepoint
        round(length(regexp_replace(t, "[^#…]", "")).cast("double") /
          greatest(nW, lit(1)), 4).as("symbol_ratio"),
        round(size(filter(ts, w => w.rlike("[a-zA-Z]"))).cast("double") /
          greatest(nW, lit(1)), 4).as("alpha_word_ratio"),
        size(array_intersect(array_distinct(ts), stops)).cast("long").as("n_stop_hits"))
      .withColumn("passes",
        (col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_word_len") >= minMeanLen && col("mean_word_len") <= maxMeanLen &&
          col("symbol_ratio") <= maxSymbolRatio &&
          col("alpha_word_ratio") >= minAlphaRatio &&
          col("n_stop_hits") >= minStopHits).cast("long"))
  }

  /** Token-count histogram: docs bucketed by floor(n_tokens / width) —
    * the length-distribution profile every corpus report starts with.
    * One narrow projection + one small aggregation. */
  def tokenHistogram(docs: DataFrame, bucketWidth: Int = 10,
                     textCol: String = "text"): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth $bucketWidth must be positive")
    docs.select(floor(tokenCount(col(textCol)) / bucketWidth).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .select((col("bucket") * bucketWidth).as("min_tokens"), col("n_docs"))
  }

  /** Quantile-calibrated quality gate: flag the worst `q` fraction of the
    * corpus by composite quality score — the data-driven alternative to a
    * fixed threshold. Exact percentile (Spark `percentile` ==
    * interpolated `quantile_cont`) over the 4dp-rounded scores, broadcast
    * as a one-row literal into a narrow filter. Two passes over the
    * quality projection; at scale the threshold pass reads one column.
    * @return flagged docs (doc_id, quality, threshold) */
  def calibratedQualityGate(docs: DataFrame, q: Double = 0.1,
                            idCol: String = "doc_id"): DataFrame = {
    require(q > 0 && q < 1, s"quantile $q outside (0,1)")
    val scored = qualityReport(docs, idCol = idCol)
      .select(col(idCol), col("quality"))
    val thr = scored.agg(
      round(expr(s"percentile(quality, $q)"), 4).as("threshold"))
    scored.crossJoin(broadcast(thr))
      .filter(col("quality") < col("threshold"))
  }

  /** Per-language corpus statistics (one shuffle, map-side partials). */
  def statsByLang(docs: DataFrame, textCol: String = "text",
                  langCol: String = "lang"): DataFrame =
    docs.groupBy(col(langCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol)).cast("long")).as("total_tokens"),
        round(sum(col("n_chars")).cast("double") / count(lit(1)), 4).as("avg_chars"),
        max(col("n_chars")).as("max_chars"))

  /** Per-document quality report. */
  def qualityReport(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    docs.select(
        col(idCol),
        tokenCount(t).cast("long").as("n_tokens"),
        round(punctRatio(t), 4).as("punct_ratio"),
        round(stopwordRatio(t), 4).as("stopword_ratio"))
      .withColumn("quality",
        qualityScore(col("n_tokens"), col("punct_ratio"), col("stopword_ratio")))
  }

  /** Cross-document repeated word-n-gram report — boilerplate detection
    * / memorization-risk audit: every n-gram appearing in at least
    * `minDocs` distinct documents, with its document count. (The same
    * verbatim-overlap currency as [[Contamination]], pointed at the
    * corpus itself instead of an eval split.)
    *
    * Scale: per-doc grams are DISTINCT ([[Dedup.wordShingles]]), so the
    * per-gram doc count is a plain `count` — one explode + one shuffle
    * on the gram key, no countDistinct Expand. Boilerplate grams are by
    * definition heavy hitters; the map-side partial count absorbs the
    * skew before the shuffle. */
  def repeatedNgramReport(docs: DataFrame, n: Int = 8, minDocs: Int = 2,
                          idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame =
    // tokenize in ITS OWN projection: CollapseProject keeps the split()
    // materialized (non-cheap, multiply-referenced), so the shingle
    // lambda reads a token ARRAY instead of re-splitting per shingle
    docs.select(col(idCol), Dedup.tokens(col(textCol)).as("__ts"))
      .select(col(idCol),
        explode(Dedup.wordShinglesOfTokens(col("__ts"), n)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)

  /** Tracking-parameter prefixes dropped by [[canonicalizeUrl]] — the
    * analytics noise (utm campaign tags, click ids) that makes one page
    * look like a thousand distinct URLs in a crawl. */
  private val trackingPrefixes = Seq("utm_", "fbclid=", "gclid=", "ref=")

  /** Canonicalize a URL for crawl-scale dedup/aggregation — the
    * web-pipeline normalization step (one page, one key) applied before
    * any URL-keyed dedup or per-domain cap. Pure built-in column ops
    * (regexp + array functions — codegen'd, no UDF), with every rule
    * chosen to be expressible identically in the DuckDB oracle:
    *
    *   1. fragment stripped (`#...` never reaches the server);
    *   2. scheme and host lowercased; default ports (`:80` http,
    *      `:443` https) removed;
    *   3. empty path becomes `/`;
    *   4. tracking params ([[trackingPrefixes]]) dropped; survivors
    *      SORTED (param order is transport noise), `?` dropped when
    *      none survive.
    *
    * Rows that don't parse as `scheme://host...` canonicalize to NULL —
    * typed absence, not a half-normalized string. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostRaw = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]+)", 1))
    val host = when(scheme === "http", regexp_replace(hostRaw, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostRaw, ":443$", ""))
      .otherwise(hostRaw)
    val path = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)", 1)
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val kept = array_sort(filter(split(query, "&"), p =>
      p =!= "" && !trackingPrefixes.map(pre => p.startsWith(pre)).reduce(_ || _)))
    when(scheme === "" || hostRaw === "", lit(null).cast("string"))
      .otherwise(concat(
        scheme, lit("://"), host,
        when(path === "", lit("/")).otherwise(path),
        when(size(kept) === 0, lit(""))
          .otherwise(concat(lit("?"), array_join(kept, "&")))))
  }

  /** The registrable-host key for per-domain caps/stats (the crawl
    * pipeline's "no more than N pages per site" guard): lowercased
    * host with any port stripped; NULL when the URL doesn't parse. */
  def urlDomain(url: Column): Column = {
    val host = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?:]+)", 1))
    when(host === "", lit(null).cast("string")).otherwise(host)
  }

  /** HTML → text extraction, the crawl pipeline's first transform (the
    * trafilatura/jusText role at regex level — a deterministic,
    * cross-engine-replayable extractor, NOT a DOM parser; malformed
    * markup degrades to leaving the offending run in place rather than
    * throwing). One narrow codegen'd `regexp_replace` chain, ORDER
    * LOAD-BEARING:
    *
    *  1. comments `<!--.*?-->` drop FIRST (a comment may contain tags,
    *     and the later `<![^>]*>` alternative would stop at the first
    *     `>` inside one);
    *  2. `<script>`/`<style>` blocks drop WHOLE (their bodies are code,
    *     not text, and legitimately contain `<`/`>`);
    *  3. remaining tags drop via a quote-aware element regex
    *     (`"…"`/`'…'` attribute values may contain `>`), plus
    *     `<!DOCTYPE…>`; a stray `<` NOT followed by a letter (`2 < 3`)
    *     is text and survives;
    *  4. the fixed entity set decodes AFTER tag removal (so literal
    *     `&lt;tag&gt;` text can never become a strippable tag) with
    *     `&amp;` LAST — single-pass decode: `&amp;lt;` → `&lt;`, the
    *     HTML-correct answer;
    *  5. whitespace collapses to single spaces and trims.
    *
    * Every pattern is RE2∩Java-regex portable (inline `(?is)` flags,
    * non-greedy, no backreferences/lookaround), so a DuckDB oracle
    * replays the chain verbatim. */
  def extractHtmlText(html: Column): Column = {
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript =
      regexp_replace(noComments, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle,
      "(?s)</?[A-Za-z](?:\"[^\"]*\"|'[^']*'|[^>\"'])*>|<![^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (ent, repl)) =>
      // entities/replacements carry no regex or substitution
      // metacharacters (`&`, `#`, `;` are literals in both engines)
      regexp_replace(c, ent, repl)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
