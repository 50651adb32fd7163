package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *  - grams are the NATIVE codegen'd `graft_substr_anchors128` kernel
  *    at sample = 1 (keep every gram): one tokenization pass emits each
  *    doc's distinct n-grams as 16-byte 128-bit keys — gram STRINGS are
  *    never materialized (an earlier HOF-expression draft built every
  *    gram string interpreted and measured 10× slower at sf0.1).
  *  - benchmark side: distinct gram keys, broadcast (eval sets are a
  *    few MB of grams; ~10M grams ≈ 160 MB is still broadcast-sized).
  *  - training side: ONE narrow pass explodes gram keys into a
  *    broadcast left join; the only exchange is the partial-aggregated
  *    groupBy(doc_id) — ~one (id, 2×long) row per doc per input
  *    partition. Corpus text never shuffles.
  * The two key halves are independently-initialized rolling hashes
  * (Hashing.substringAnchors128 scaladoc), so false "contaminated"
  * flags need a 128-bit collision — negligible at any realistic scale.
  * Tokenization is lowercase + whitespace-split (Hashing.tokenHashes),
  * the corpus-wide normalization granularity; the DuckDB oracle joins
  * the normalized gram STRINGS themselves, so the tests also pin that
  * the hashed plan equals exact-string semantics.
  */
object Decontaminate {

  /** Per-training-doc contamination report against `bench`:
    * (doc_id, n_grams, n_hits, contaminated) where n_grams = the doc's
    * distinct n-gram count, n_hits = how many of them occur anywhere
    * in the benchmark set. Every training doc appears exactly once
    * (docs shorter than n tokens report n_grams = 0). */
  def contamination(
      spark: SparkSession, train: DataFrame, bench: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 13): DataFrame = {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // all distinct n-gram 128-bit keys (sample = 1 disables winnowing)
    val grams = call_function("graft_substr_anchors128",
      col(textCol), lit(n), lit(1))
    val benchFps = bench
      .select(explode(grams).as("gfp"))
      .distinct()
      .select($"gfp", lit(1).as("hit"))
    train
      // explode_outer keeps gram-less docs as one NULL-key row, which
      // can never equi-match a bench key
      .select(col(idCol).as("doc_id"), explode_outer(grams).as("gfp"))
      .join(broadcast(benchFps), Seq("gfp"), "left")
      .groupBy($"doc_id")
      .agg(
        count($"gfp").as("n_grams"),
        count($"hit").as("n_hits"))
      .select($"doc_id", $"n_grams", $"n_hits",
        ($"n_hits" > 0).as("contaminated"))
  }
}
