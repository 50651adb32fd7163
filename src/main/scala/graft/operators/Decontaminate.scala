package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Train/eval decontamination: flag training documents that share any
  * token n-gram with a benchmark (eval) set — the public GPT-3-style
  * 13-gram overlap rule (Brown et al. 2020 appendix C; the same family
  * PaLM/Llama report). A training-data pipeline runs this before every
  * release so eval questions don't leak into the corpus; the reference
  * engine has no analog (dedup-only), so this extends the §2 surface
  * the way the builder brief asks.
  *
  * Scale shape (100 TB corpus vs MB-scale eval sets):
  *  - benchmark side: explode n-grams, distinct, reduce each gram to
  *    the 16-byte 128-bit [[ExactDedup.fp]] struct — gram STRINGS never
  *    leave their scan — and broadcast (eval sets are a few MB of
  *    grams; ~10M grams ≈ 160 MB is still broadcast-sized).
  *  - training side: ONE narrow pass explodes each doc's distinct gram
  *    fingerprints into a broadcast left join; the only exchange is the
  *    partial-aggregated groupBy(doc_id) — ~one (id, 2×long) row per
  *    doc per input partition. Corpus text never shuffles.
  * 128-bit keys make hash-collision false "contaminated" flags
  * negligible at any realistic scale (ExactDedup.fp scaladoc math);
  * the DuckDB oracle joins the gram strings themselves, so the tests
  * also pin that the hashed plan equals the exact-string semantics.
  */
object Decontaminate {

  /** Distinct normalized token n-grams of a text column as an array —
    * narrow per-row expression (lowercase + whitespace collapse, the
    * corpus-wide normalization granularity). Docs shorter than n
    * tokens have no n-grams. */
  private[graft] def gramsCol(textCol: Column, n: Int): Column = {
    val toks = split(regexp_replace(trim(lower(textCol)), " +", " "), " ")
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
        .otherwise(array().cast("array<string>")))
  }

  /** Per-training-doc contamination report against `bench`:
    * (doc_id, n_grams, n_hits, contaminated) where n_grams = the doc's
    * distinct n-gram count, n_hits = how many of them occur anywhere
    * in the benchmark set. Every training doc appears exactly once
    * (short docs report n_grams = 0). */
  def contamination(
      spark: SparkSession, train: DataFrame, bench: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 13): DataFrame = {
    import spark.implicits._
    val grams = gramsCol(col(textCol), n)
    val benchFps = bench
      .select(explode(grams).as("gram"))
      .distinct()
      .select(ExactDedup.fp($"gram").as("gfp"), lit(1).as("hit"))
    train
      // explode_outer keeps gram-less docs as one NULL-gram row; its
      // gfp is NULL (not the hash of NULL) so it can't equi-match
      .select(col(idCol).as("doc_id"), explode_outer(grams).as("gram"))
      .select($"doc_id", $"gram",
        when($"gram".isNotNull, ExactDedup.fp($"gram")).as("gfp"))
      .join(broadcast(benchFps), Seq("gfp"), "left")
      .groupBy($"doc_id")
      .agg(
        count($"gram").as("n_grams"),
        coalesce(sum(when($"hit".isNotNull, 1L).otherwise(0L)), lit(0L))
          .as("n_hits"))
      .select($"doc_id", $"n_grams", $"n_hits",
        ($"n_hits" > 0).as("contaminated"))
  }
}
