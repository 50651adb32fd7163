package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{DedupConfig, Doc, DupPair}
import graft.functions.Hashing

/** Exact long-substring duplication detector — the distributed stand-in
  * for a global suffix array (SURVEY.md §7.7): documents sharing a
  * ≥ substrQ-token exact substring are linked.
  *
  * Method (public technique family: winnowing/MOSS fingerprinting,
  * Schleimer-Wilkerson-Aiken SIGMOD'03): hash every q-token gram of a
  * doc, keep the grams whose hash ≡ 0 (mod substrSample) as ANCHORS, and
  * equi-join docs on anchor hash. A shared substring of length
  * L ≥ q tokens contributes L-q+1 aligned q-gram hashes, so the chance
  * that no anchor survives decays as (1-1/s)^(L-q+1); with the defaults
  * (q=32, s=8) a 64-token shared block is missed with prob < 1.5%, a
  * 100-token block < 0.01%.
  *
  * Reference analog: content-defined chunk boundaries — copies align on
  * content, not offsets (/root/reference/src/chunk.c:91-96) — applied at
  * token granularity, with the same "fingerprint equality = duplicate"
  * decision as /root/reference/src/dedup.c:129-147.
  *
  * Scale: anchor extraction is a narrow flatMap; candidate generation is
  * the capped bucket groupBy shared with the LSH path (boilerplate
  * blocks shared by millions of docs → star edges, not n² pairs).
  */
object SubstringDetector {

  def dupPairs(spark: SparkSession, docs: Dataset[Doc], cfg: DedupConfig): Dataset[DupPair] = {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val keys = docs.toDF.select(
      explode(call_function("graft_substr_anchors", $"doc_text",
        lit(cfg.substrQ), lit(cfg.substrSample))).as("band_key"),
      $"conv_id")
      .as[MinHashLSH.BandKey]
    MinHashLSH
      .candidatePairs(spark, keys, cfg)
      .select($"doc_a", $"doc_b")
      .as[(String, String)]
      .map { case (a, b) => DupPair(a, b, "substring", 1.0) }
  }
}
