package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text analysis for large-scale training-data pipelines: tokenization
  * stats, language ID, quality scoring, document fingerprinting.
  *
  * Everything here is per-document column arithmetic over higher-order
  * array functions — narrow transformations, fully codegen-eligible, no
  * shuffle, no UDFs. At 100 TB these run at parquet-scan speed and the
  * only shuffles are in the final (small) aggregations a caller adds.
  */
object TextOps {

  /** Whitespace tokenization (trim + split on runs of whitespace). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Token count — whitespace tokenizer. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish sub-word proxy: counts word pieces produced by splitting
    * on non-alphanumerics AND on letter/digit boundaries; approximates
    * sub-word token counts with pure column arithmetic. */
  def approxBpeTokenCount(text: Column): Column =
    size(filter(
      split(regexp_replace(trim(text), "([a-zA-Z])(\\d)|(\\d)([a-zA-Z])", "$1$3 $2$4"), "[^a-zA-Z0-9]+"),
      t => length(t) > 0))

  /** Tiny per-language function-word profiles for the n-gram/stopword
    * language-ID heuristic. Public-knowledge word lists. */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "en"))

  /** Count of whole-word occurrences of a fixed word set. Implemented
    * with a single regexp scan (`\b(w1|w2|…)\b`) instead of a
    * higher-order `filter` over the token array: higher-order functions
    * are interpreted, and the regexp form benchmarked ~20× faster. */
  def wordSetHits(text: Column, words: Seq[String]): Column =
    regexp_count(text, lit(words.mkString("\\b(", "|", ")\\b")))

  /** Language ID: score = hits of each language's function words; argmax
    * with deterministic tiebreak on language code; 'und' when no
    * profile matches at all. */
  def langId(text: Column): Column = {
    val scored = langProfiles.toSeq.sortBy(_._1).map { case (code, words) =>
      struct(wordSetHits(text, words).as("hits"), lit(code).as("code"))
    }
    // array_max on struct orders by (hits, code); ties broken by the
    // lexicographically LARGEST code — deterministic either way.
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("code")).otherwise(lit("und"))
  }

  /** Stopword ratio (English stopword profile). */
  def stopwordRatio(text: Column): Column =
    wordSetHits(text, langProfiles("en")).cast(DoubleType) /
      greatest(tokenCount(text).cast(DoubleType), lit(1.0))

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast(DoubleType) /
      greatest(length(text).cast(DoubleType), lit(1.0))

  /** Mean token length. */
  def meanTokenLength(text: Column): Column =
    length(regexp_replace(trim(text), "\\s+", "")).cast(DoubleType) /
      greatest(tokenCount(text).cast(DoubleType), lit(1.0))

  /** Composite quality score in [0,1]: rewards mid-range length, low
    * punctuation density and a healthy stopword ratio — the standard
    * C4-style heuristic trio, as pure arithmetic. */
  def qualityScore(text: Column): Column = {
    val lenScore  = least(tokenCount(text).cast(DoubleType) / lit(64.0), lit(1.0))
    val punctPen  = greatest(lit(1.0) - punctRatio(text) * 4.0, lit(0.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    // floor-based rounding: engine-portable (see Queries.rnd)
    floor((lenScore * 0.4 + punctPen * 0.3 + stopScore * 0.3) * 1e6 + 0.5) / 1e6
  }

  /** k-token shingles joined with single spaces. */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Document fingerprint: minimum md5 over k-token shingles (a
    * winnowing-style rolling fingerprint; md5 is the rolling hash so the
    * same fingerprint is reproducible in any engine). */
  def fingerprint(text: Column, k: Int = 5): Column =
    array_min(transform(shingles(text, k), s => md5(s)))

  /** PII patterns for redaction/auditing, applied in this order (order
    * matters: SSNs must be replaced before the looser phone pattern can
    * see them, IPs before phones so dotted octets never half-match).
    * Patterns stay within the common Java-regex/RE2 subset (no
    * backreferences, no lookaround) so the same literal runs in any
    * engine. */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ssn"   -> "\\b\\d{3}-\\d{2}-\\d{4}\\b",
    "ip"    -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "phone" -> "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b")

  /** Redacts each PII class to a `<CLASS>` placeholder. A chain of four
    * codegen'd regexp_replace scans — narrow, no shuffle; at 100 TB this
    * is scan-bound CPU like the rest of the text suite. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (name, p)) =>
      regexp_replace(c, lit(p), lit(s"<${name.toUpperCase}>"))
    }

  /** Per-class PII hit counts as one struct column (email, ssn, ip,
    * phone) — the audit signal next to [[redactPii]]'s scrub. Counted
    * in the SAME order redaction applies, over the progressively
    * redacted text, so overlapping classes are attributed exactly like
    * the redaction resolves them. */
  def piiCounts(text: Column): Column = {
    val (_, counts) = piiPatterns.foldLeft((text, Seq.empty[Column])) {
      case ((c, acc), (name, p)) =>
        (regexp_replace(c, lit(p), lit(s"<${name.toUpperCase}>")),
          acc :+ regexp_count(c, lit(p)).as("n_" + name))
    }
    struct(counts: _*)
  }

  /** Canonical text normalization for dedup/fingerprint keys: control
    * and zero-width characters stripped, whitespace runs collapsed to
    * one space, trimmed, lowercased. Pure codegen'd regexp/string ops —
    * the standard pre-dedup canonicalization (NFC unicode normalization
    * is intentionally NOT included: Spark has no built-in and a UDF
    * would break the zero-UDF contract; byte-identical corpora don't
    * need it). */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(
      regexp_replace(text,
        // strip FIRST: zero-widths and non-whitespace controls (\x09-\x0d
        // are whitespace — they collapse to a space in the next step);
        // explicit \xNN ranges + literal chars keep the class inside the
        // Java-regex/RE2 common subset
        "[\\x00-\\x08\\x0e-\\x1f\\x7f\u200B\u200C\u200D\uFEFF]", ""),
      "\\s+", " ")))

  /** Hostnames of every http(s) URL in the text (the unit web-corpus
    * domain filters operate on). One codegen'd regexp scan. */
  def urlDomains(text: Column): Column =
    regexp_extract_all(text, lit("https?://([A-Za-z0-9.-]+)"), lit(1))

  /** True when any extracted domain is `blocked` or a subdomain of a
    * blocked entry — the standard suffix-match blocklist test. The
    * blocklist is a literal array (policy data, not row data). */
  def domainBlocked(text: Column, blocked: Seq[String]): Column =
    exists(urlDomains(text), d =>
      blocked.map(b => d === b || d.endsWith("." + b))
        .reduce[Column](_ || _))

  /** Within-document repetition: the fraction of n-gram occurrences that
    * are repeats of an earlier n-gram (1 − distinct/total) — the
    * Gopher-style repetitious-text quality signal. 0.0 for documents
    * shorter than n tokens (their single whole-text shingle is unique). */
  /** Bigram collocations ranked by lift = P(ab) / (P(a)·P(b)) — the
    * association measure without the logarithm (PMI = ln(lift)), so the
    * ranking key is pure integer-derived multiply/divide: IEEE
    * correctly-rounded, hence BIT-IDENTICAL across engines. A log-based
    * score would rank by a transcendental whose last ulp differs
    * between libm implementations and could flip the top-k order.
    *
    * Plan shape: one narrow bigram explode (adjacent zip, no window),
    * token/bigram counts map-side combined, the `minCount` support
    * filter applied BEFORE the two vocabulary joins, and the 1-row
    * total attached by broadcast. At 100 TB the vocabulary joins
    * shuffle vocab-sized frames, never the corpus.
    *
    * Output: (t1, t2, n_ab, n_a, n_b, lift_raw).
    */
  def collocations(df: DataFrame, text: Column, minCount: Long): DataFrame = {
    // referenced three times below (two vocab joins + the total);
    // without the persist each reference re-tokenizes the corpus
    val uni = df.select(explode(tokens(text)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = uni.agg(sum(col("n")).as("n_total"))
    val t = tokens(text)
    val pairs = df
      .select(explode(arrays_zip(
        slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1))).as("p"))
      .select(col("p").getField("0").as("t1"), col("p").getField("1").as("t2"))
    pairs.groupBy("t1", "t2").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
      .join(uni.select(col("token").as("t1"), col("n").as("n_a")), "t1")
      .join(uni.select(col("token").as("t2"), col("n").as("n_b")), "t2")
      .crossJoin(broadcast(total))
      .withColumn("lift_raw",
        (col("n_ab").cast(DoubleType) * col("n_total").cast(DoubleType)) /
          (col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType)))
      .drop("n_total")
  }

  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val sh = shingles(text, n)
    lit(1.0) - size(array_distinct(sh)).cast(DoubleType) / size(sh)
  }

  /** Content-defined chunking over token streams (the FastCDC/rsync
    * boundary idea): a chunk boundary opens at every position p > 0
    * whose rolling `w`-gram portable hash ≡ 0 (mod `modulus`) — so an
    * edit only reshapes the chunks it touches, while a fixed grid
    * (q99) shifts every downstream chunk. Expected chunk length ≈
    * `modulus` tokens. Returns (doc_id, chunk_id, chunk_tokens,
    * digest) with digest = md5 of the space-joined chunk (the chunk-
    * dedup key). Docs shorter than `w` tokens are skipped.
    *
    * Plan: one gram pass (boundary flags are a codegen'd hash+mod), a
    * per-document cumsum window for chunk ids, one per-chunk ordered
    * fold — document-sized state, chunk-count-sized output. */
  def cdcChunks(docs: org.apache.spark.sql.DataFrame, id: Column,
                text: Column, w: Int = 4,
                modulus: Long = 64L): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(id.as("doc_id"), tokens(text).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= w)
    val pos = toks.select(col("doc_id"), col("n"),
      posexplode(col("toks")).as(Seq("pos", "tok")))
    val bounds = toks.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), col("n") - w),
        i => array_join(slice(col("toks"), i + 1, lit(w)), " ")))
        .as(Seq("pos", "gram")))
      .filter(col("pos") > 0 &&
        pmod(graft.ext.PortableHash.long60(col("gram")), lit(modulus)) === 0L)
      .select(col("doc_id"), col("pos"), lit(1).as("bflag"))
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    pos.join(bounds, Seq("doc_id", "pos"), "left")
      .na.fill(0, Seq("bflag"))
      .withColumn("chunk_id",
        sum("bflag").over(byPos.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "chunk_id")
      .agg(count(lit(1)).as("chunk_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          t => t.getField("tok")), " ")).as("digest"))
  }
}
