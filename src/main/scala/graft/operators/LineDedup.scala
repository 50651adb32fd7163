package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-document LINE-level deduplication — the C4 / RefinedWeb
  * remediation family (Raffel et al. 2020 §2.2 "we discard all but one
  * of any three-sentence span occurring more than once"; Penedo et al.
  * 2023 §4.2 remove exact-duplicate lines): a line whose normalized
  * form occurs in >= `minDf` distinct documents is duplicated; the
  * first writer (minimum doc id) keeps its copies and every later
  * document drops every occurrence. Optionally, a line reaching
  * `boilerplateDf` distinct documents is BOILERPLATE (nav bars, cookie
  * banners, license headers) and is removed from every document, the
  * owner included — the RefinedWeb production setting.
  *
  * This is the line-granularity sibling of [[SpanDedup]] (token-window
  * granularity) and shares its contract: keep the documents, cut the
  * duplicated material, first writer wins. The reference engine's
  * within-stream chunk dedup (/root/reference/src/dedup.c:105-175)
  * keys on content-defined chunks; here the "chunk" is a newline-
  * delimited line, the natural frame for web/transcript boilerplate.
  *
  * Scale shape (the 100 TB path):
  *  - lines never shuffle as text: the explode is narrow, each
  *    occurrence is immediately reduced to (doc_id, line_idx, 128-bit
  *    fp) — 28-byte rows — via the same seeded `graft_doc_fp` pair as
  *    [[TextAnalysis.keepCorpus]] (collision-safe at 10^12 lines;
  *    the fp normalizes case + whitespace internally, so keying frame
  *    == the corpus-wide curation frame);
  *  - ownership = distinct (fp, doc) then ONE partial-aggregated
  *    groupBy(fp); the >= minDf filter drops the (overwhelmingly most
  *    common) unique lines before the join back;
  *  - the hit join is a shuffle equi-join on the fp (the duplicated-
  *    line side is corpus-dependent, NOT broadcastable);
  *  - the cut is a per-row higher-order filter over the doc's own
  *    split: cut indexes arrive interval-merged (a whole later copy is
  *    ONE interval), so the test is O(intervals) per doc, and the only
  *    join touching text carries a per-doc interval row on its other
  *    side — broadcast when it fits (docs-with-cuts rows), one text
  *    exchange at the sort-merge fallback (the price any rewrite of
  *    those docs pays). Gated in LineDedupSpec.
  * Whitespace-only lines are never keys (every doc has them; cutting
  * them would shred formatting for no dedup value). The DuckDB oracle
  * (q_line_dedup / q_line_boilerplate) recomputes ownership from the
  * line STRINGS and replays the cut row for row, pinning that the
  * hashed plan equals exact-string semantics.
  */
object LineDedup {

  /** Independent seed for the fp's second 64-bit half (PCG-family
    * multiplier, public constant) — distinct from keepCorpus's doc
    * seed so line and doc fingerprint spaces never alias. */
  private val LineFpSeed = 0x5851F42D4C957F2DL

  /** One row per input doc: (doc_id, cut_text, n_cut_lines).
    * `cut_text` is the original text with cut lines removed (original
    * bytes for survivors — normalization is only the KEYING frame);
    * `n_cut_lines` counts this doc's removed line occurrences (0 for
    * owners and docs sharing nothing — their text comes back verbatim).
    *
    * @param minDf         lines in >= this many distinct docs are
    *                      duplicated (first writer keeps)
    * @param boilerplateDf lines in >= this many distinct docs are
    *                      removed EVERYWHERE (owner too); default off
    */
  def cutDuplicateLines(
      spark: SparkSession, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      minDf: Long = 2L, boilerplateDf: Long = Long.MaxValue): DataFrame = {
    require(minDf >= 2, s"lineDedup: minDf must be >= 2, got $minDf")
    require(boilerplateDf >= minDf,
      s"lineDedup: boilerplateDf ($boilerplateDf) must be >= minDf ($minDf)")
    graft.plans.GraftFunctions.register(spark)
    import spark.implicits._

    val occ = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("line_idx", "line")))
      .filter(length(trim(regexp_replace($"line", "\\p{javaWhitespace}+", " "))) > 0)
      .select($"doc_id", $"line_idx",
        struct(
          call_function("graft_doc_fp", $"line").as("hi"),
          call_function("graft_doc_fp", $"line", lit(LineFpSeed)).as("lo")).as("lfp"))

    // first-writer ownership over DISTINCT (line, doc): a within-doc
    // repeat counts once, so n_docs >= minDf means genuinely cross-doc
    val stats = occ.select($"lfp", $"doc_id").distinct()
      .groupBy($"lfp")
      .agg(min($"doc_id").as("owner"), count(lit(1)).as("n_docs"))
      .filter($"n_docs" >= minDf)

    // merge the sorted cut indexes into [s, e) intervals (width-1
    // windows through the shared Decontaminate merge): a fully
    // duplicated doc's cut set is one contiguous run collapsing to ONE
    // interval, so the per-line coverage test below is O(intervals),
    // not O(cut lines) — an array_contains membership test would make
    // exactly the target workload (whole later copies) quadratic.
    val cuts = occ.join(stats, Seq("lfp"))
      .filter($"doc_id" =!= $"owner" || $"n_docs" >= boilerplateDf)
      .groupBy($"doc_id")
      .agg(sort_array(collect_set($"line_idx".cast("long"))).as("cut_pos"))
      .select($"doc_id",
        Decontaminate.mergeIntervals($"cut_pos", 1L).as("iv"),
        size($"cut_pos").cast("long").as("n_cut"))

    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .join(cuts, Seq("doc_id"), "left")
      .select($"doc_id",
        when($"iv".isNull, $"text")
          .otherwise(array_join(
            filter(split($"text", "\n", -1),
              (_: Column, i: Column) => not(exists($"iv",
                iv => iv.getField("s") <= i.cast("long") &&
                  i.cast("long") < iv.getField("e")))),
            "\n"))
          .as("cut_text"),
        coalesce($"n_cut", lit(0L)).as("n_cut_lines"))
  }
}
