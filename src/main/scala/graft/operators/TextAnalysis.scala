package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting. All are
  * narrow (per-row) column expressions or pure maps — no shuffles; they
  * run at input-scan speed and stay inside whole-stage codegen where
  * built-ins suffice.
  */
object TextAnalysis {

  /** The ONE whitespace frame every curation axis tokenizes under:
    * collapse all Java whitespace (tabs, newlines, U+2028, U+3000, …)
    * to single spaces, then trim. Decontamination / cutSpans /
    * keepCorpus tokenize on \p{javaWhitespace} via Hashing.tokenHashes;
    * the column-expression axes here MUST share that frame or a doc
    * containing a tab gets different token indices across the axes
    * composed in [[Curate.report]]. */
  private[operators] def collapseWs(c: Column): Column =
    trim(regexp_replace(c, "\\p{javaWhitespace}+", " "))

  /** Whitespace token count, portable across engines:
    * tokens = spaces-in-collapsed-text + 1 (0 for empty). */
  def tokenCount(c: Column): Column = {
    val collapsed = collapseWs(c)
    when(length(collapsed) === 0, lit(0)).otherwise(
      length(collapsed) - length(regexp_replace(collapsed, " ", "")) + 1)
  }

  /** BPE-style subword token count: number of pre-tokenizer matches of
    * the GPT-2 pattern (Radford et al. 2019), simplified to an
    * RE2-compatible form — no lookahead, ASCII classes — so the DuckDB
    * oracle evaluates the IDENTICAL regex:
    * {{{ ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +}}}
    * Each match is one pre-token ("hello world 42!" → 4); real BPE
    * splits pre-tokens further by learned merges, so this lower-bounds
    * and tracks the true BPE count. Narrow per-row expr — scan speed. */
  def subwordTokenCount(c: Column): Column =
    regexp_count(c, lit(" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +")).cast("bigint")

  /** Stopword-marker language ID — n-gram/keyword heuristic over the
    * five corpus languages. Returns 'und' when no marker hits. A real
    * deployment swaps in a trained n-gram profile; the operator shape
    * (pure column expr, no shuffle) is what matters at scale. */
  def langId(c: Column): Column = {
    val t = concat(lit(" "), lower(c), lit(" "))
    def hasAny(words: Seq[String]): Column =
      words.map(w => t.contains(s" $w ")).reduce(_ || _)
    // CJK: presence of chars in the unified-ideograph block
    when(c.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(hasAny(Seq("der", "die", "und", "nicht", "ist", "das")), "de")
      .when(hasAny(Seq("el", "la", "los", "las", "es", "una", "que")), "es")
      .when(hasAny(Seq("le", "les", "est", "une", "des", "dans")), "fr")
      .when(hasAny(Seq("the", "is", "and", "of", "to", "in")), "en")
      .otherwise("und")
  }

  /** Quality features: length, token count, mean token length,
    * punctuation count, uppercase-start flag. Returned ×10000-scaled
    * as BIGINT where fractional (engine-portable integer compare). */
  def qualityFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    val c = col(textCol)
    val toks = tokenCount(c)
    val punct = length(c) - length(regexp_replace(c, "[.,;:!?]", ""))
    df.withColumn("n_tokens", toks.cast("bigint"))
      .withColumn("n_punct", punct.cast("bigint"))
      .withColumn("mean_tok_len_x10000",
        when(toks === 0, lit(0L)).otherwise(
          floor(lit(10000.0) * length(regexp_replace(collapseWs(c), " ", ""))
            / toks)).cast("bigint"))
      .withColumn("punct_ratio_x10000",
        when(length(c) === 0, lit(0L))
          .otherwise(floor(lit(10000.0) * punct / length(c))).cast("bigint"))
  }

  /** Composite quality score in [0,100]: docs that are too short, all
    * punctuation, or one-word-repeated score low. Integer arithmetic
    * only (portable). */
  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val f = qualityFeatures(df, textCol)
    f.withColumn("quality_score",
      (least(col("n_tokens"), lit(100L)) / lit(2)
        + when(col("mean_tok_len_x10000").between(30000L, 90000L), lit(30L)).otherwise(lit(0L))
        + when(col("punct_ratio_x10000") <= 1500L, lit(20L)).otherwise(lit(0L)))
        .cast("bigint"))
  }

  /** 64-bit content fingerprint of normalized text (rolling FNV+mix —
    * [[Hashing.hashString]] via the native codegen'd
    * [[graft.plans.DocFpExpr]]); whole-doc identity key for
    * normalization-insensitive dedup — use xxhash64(col) when raw-text
    * identity suffices. */
  def fingerprint(df: DataFrame, textCol: String = "text"): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    df.withColumn("doc_fp", call_function("graft_doc_fp", col(textCol)))
  }

  /** Repetition-based quality signals (the public Gopher/MassiveText
    * filter family, Rae et al. 2021 §A1.1: duplicate-token fraction,
    * top-token coverage, duplicate-n-gram coverage — adapted to
    * token granularity since this corpus has no line structure). All
    * per-row higher-order-function expressions over one tokenization:
    * NO shuffle, embarrassingly parallel, runs at scan speed at any
    * corpus size. Ratios are ×10000-scaled BIGINTs (engine-portable
    * integer compare):
    *  - `dup_token_ratio_x10000`: fraction of tokens that are repeats
    *    of an earlier token, (n − n_distinct) / n.
    *  - `top_token_ratio_x10000`: the most frequent token's share of
    *    all tokens (computed as the longest run in the sorted token
    *    array — one linear `aggregate`, not an n² count-per-distinct).
    *  - `dup_2gram_ratio_x10000`: fraction of adjacent-token bigrams
    *    that are repeats, (g − g_distinct) / g.
    */
  def repetitionStats(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // NULL text ≡ empty (all ratios 0, keep=true) — matches the DuckDB
    // oracle's LEFT JOIN + coalesce path; without this a NULL propagates
    // through the when() guards into NULL ratios and a NULL keep
    val norm = collapseWs(lower(coalesce(col(textCol), lit(""))))
    val toks = split(norm, " ")
    val empty = length(norm) === 0
    val n = when(empty, lit(0L)).otherwise(size(toks).cast("bigint"))
    val nDistinct = when(empty, lit(0L)).otherwise(size(array_distinct(toks)).cast("bigint"))
    // longest run in the sorted array == max token frequency; one
    // linear pass with a (prev, run, best) struct accumulator
    val top = aggregate(
      array_sort(toks),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"), greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    val topCount = when(n === 0L, lit(0L)).otherwise(top)
    val grams = zip_with(
      slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat(a, lit(" "), b))
    val g = when(n >= 2L, size(grams).cast("bigint")).otherwise(lit(0L))
    val gDistinct = when(n >= 2L, size(array_distinct(grams)).cast("bigint")).otherwise(lit(0L))
    def ratio(num: Column, den: Column): Column =
      when(den === 0L, lit(0L)).otherwise(floor(lit(10000.0) * num / den))
    df.select(col(idCol),
      n.as("n_tokens"),
      ratio(n - nDistinct, n).as("dup_token_ratio_x10000"),
      ratio(topCount, n).as("top_token_ratio_x10000"),
      ratio(g - gDistinct, g).as("dup_2gram_ratio_x10000"))
  }

  /** Repetition filter: [[repetitionStats]] plus the keep decision —
    * a doc is kept when every repetition signal is under its threshold
    * (defaults are of the Gopher magnitude; tune per corpus). */
  def repetitionFilter(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxDupTokenX10000: Long = 3000L,
      maxTopTokenX10000: Long = 2500L,
      maxDup2gramX10000: Long = 2000L): DataFrame =
    repetitionStats(df, idCol, textCol).withColumn("keep",
      col("dup_token_ratio_x10000") <= maxDupTokenX10000 &&
        col("top_token_ratio_x10000") <= maxTopTokenX10000 &&
        col("dup_2gram_ratio_x10000") <= maxDup2gramX10000)

  /** Deduped-corpus export: one row per distinct NORMALIZED text — the
    * kept doc (lowest id, first-writer-wins like the reference's
    * first-occurrence rule, /root/reference/src/dedup.c:150-173) plus
    * its reference count. This is the "cleaned training corpus" answer
    * a dedup pipeline exists to produce.
    *
    * Identity is a 128-bit composite of two doc fingerprints so the
    * groupBy shuffles 16 bytes per doc, never the text, and stays
    * collision-safe at 10^12 docs (a single 64-bit key collides with
    * near-certainty there). The second half is the SAME normalized text
    * hashed under a different FNV initial state (seeded graft_doc_fp):
    * each seed induces a different bytes→hash bijection, so a collision
    * on fp_hi does not propagate to fp_lo — unlike hashing a derived
    * string (e.g. text ⧺ suffix), where the suffixed FNV state is a
    * bijective function of the unsuffixed one and both halves collide
    * together, silently reducing the key to 64 bits of entropy. */
  def keepCorpus(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("fp_hi", call_function("graft_doc_fp", col("text")))
      .withColumn("fp_lo", call_function("graft_doc_fp", col("text"), lit(0x71C67A39E5B495A7L)))
      .groupBy(col("fp_hi"), col("fp_lo"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_refs"))
      .select(col("doc_id"), col("n_refs"))
  }

  /** PII patterns (C4-style scrub list, Raffel et al. 2020 §2.2 family):
    * RE2-compatible — no lookaround, ASCII classes — so the DuckDB
    * oracle evaluates the IDENTICAL regex. Both engines find the same
    * leftmost non-overlapping matches. Ordered so scrubbing is
    * composition-safe: emails first (their user part may contain
    * digits), then IPs (dotted digits) before bare phone runs. */
  private[graft] val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+",
    "ip" -> "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}",
    "phone" -> "[0-9]{3}-[0-9]{3}-[0-9]{4}")

  /** Per-doc PII occurrence counts (n_emails, n_ips, n_phones, has_pii)
    * — narrow per-row regexp_count exprs, scan speed, no shuffle. */
  def piiStats(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val counts = piiPatterns.map { case (name, pat) =>
      coalesce(regexp_count(col(textCol), lit(pat)), lit(0)).cast("bigint")
        .as(s"n_${name}s")
    }
    df.select(col(idCol).as("doc_id") +: counts: _*)
      .withColumn("has_pii",
        piiPatterns.map(p => col(s"n_${p._1}s") > 0).reduce(_ || _))
  }

  /** PII redaction: each pattern family replaced by its sentinel
    * (`<EMAIL>`/`<IP>`/`<PHONE>`), applied in [[piiPatterns]] order.
    * Pure per-row transform — the 100 TB shape is a rewrite riding the
    * existing corpus scan/write, no extra pass. */
  def piiScrub(c: Column): Column =
    piiPatterns.foldLeft(c) { case (acc, (name, pat)) =>
      regexp_replace(acc, pat, s"<${name.toUpperCase}>")
    }
}
