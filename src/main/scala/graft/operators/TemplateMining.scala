package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Turn-template mining — boilerplate discovery for agent transcripts:
  * tool outputs and status turns are typically PARAMETRIC duplicates
  * ("fetched 382 bytes in 23ms" / "fetched 9 bytes in 1001ms") that
  * exact turn dedup can never group and that near-dup shingling smears
  * across unrelated conversations. Masking digit runs collapses each
  * parametric family to one template; ranking templates by occurrence
  * mass is the corpus-analysis step run BEFORE choosing what to strip
  * (the transcript sibling of [[SpanDedup.duplicationProfile]], and the
  * discovery side of [[LineDedup]]'s boilerplate rule — its df
  * threshold wants to be read off this operator's output).
  *
  * Reference analog: the dedup-ratio trajectory counters the reference
  * logs per 10k chunks (/root/reference/src/optsmr.c:316-332) — the
  * "how duplicated is this stream, and by what" measurement, here at
  * template granularity.
  *
  * Scale shape (the 100 TB path):
  *  - ONE narrow pass reduces every turn to a 128-bit template
  *    fingerprint (two seeded graft_doc_fp halves over the digit-masked
  *    text — the fp normalizes case + whitespace internally, so the
  *    keying frame matches the corpus-wide curation frame);
  *  - ONE partial-aggregated groupBy over the 16-byte keys (count +
  *    distinct-conv count + min-struct representative election) — a hub
  *    template with 10^9 occurrences combines map-side;
  *  - the template's display string is recomputed from the
  *    REPRESENTATIVE row only, via an equi-join of the (small,
  *    driver-independent) rep-key frame back to the transcripts — the
  *    one join that touches text, broadcast when the template count
  *    fits, one text exchange at the sort-merge fallback.
  */
object TemplateMining {

  /** Independent FNV initial state for the template fp's second half
    * (distinct from every other operator's seed — see
    * [[TextAnalysis.keepCorpus]] for why two seeded halves compose to a
    * genuine 128-bit key). */
  private val TemplateFpSeed = 0xA0761D6478BD642FL

  /** Digit runs → '0': the parametric-turn mask. */
  private def masked(c: Column): Column = regexp_replace(c, "[0-9]+", "0")

  /** The display form of a template: masked, lowercased, whitespace
    * collapsed — the exact string frame the fp keys on. */
  private def display(c: Column): Column =
    trim(regexp_replace(lower(masked(c)), "\\p{javaWhitespace}+", " "))

  /** One row per template occurring in >= `minDf` turns:
    * (template, n_occurrences, n_convs, rep_conv_id, rep_turn_idx) —
    * the representative is the first writer by (ts, conv_id, turn_idx).
    * Ranked consumers sort by n_occurrences themselves (the output is
    * corpus-sized in templates, not turns). */
  def mineTemplates(
      spark: SparkSession, transcripts: DataFrame, minDf: Long = 2L): DataFrame = {
    require(minDf >= 1, s"templateMining: minDf must be >= 1, got $minDf")
    graft.plans.GraftFunctions.register(spark)
    import spark.implicits._

    val occ = transcripts.select(
      $"conv_id", $"turn_idx", $"ts",
      call_function("graft_doc_fp", masked($"text")).as("tf1"),
      call_function("graft_doc_fp", masked($"text"), lit(TemplateFpSeed)).as("tf2"))

    val groups = occ
      .groupBy($"tf1", $"tf2")
      .agg(
        count(lit(1)).as("n_occurrences"),
        countDistinct($"conv_id").as("n_convs"),
        min(struct($"ts", $"conv_id", $"turn_idx")).as("rep"))
      .filter($"n_occurrences" >= minDf)
      .select($"n_occurrences", $"n_convs",
        $"rep.conv_id".as("rep_conv_id"), $"rep.turn_idx".as("rep_turn_idx"))

    // recompute the display string from the representative rows only
    groups
      .join(transcripts.select($"conv_id".as("rep_conv_id"),
          $"turn_idx".as("rep_turn_idx"), display($"text").as("template")),
        Seq("rep_conv_id", "rep_turn_idx"))
      .select($"template", $"n_occurrences", $"n_convs",
        $"rep_conv_id", $"rep_turn_idx")
  }
}
