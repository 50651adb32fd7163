package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{DedupConfig, Doc, DupPair}
import graft.functions.Hashing

/** 64-bit SimHash fuzzy near-dup detection (Charikar STOC'02; block
  * bucketing per Manku et al., WWW'07 "Detecting Near-Duplicates for Web
  * Crawling" — public techniques).
  *
  * Candidate generation: split the 64-bit simhash into `simhashBlocks`
  * equal blocks; two hashes within Hamming distance < blocks share at
  * least one exact block (pigeonhole), so an equi-join on
  * (block_id, block_bits) finds every pair within radius ≤ blocks-1.
  * With 4 blocks the default radius 3 is exact-recall; verification is
  * the cheap codegen'd `bit_count(a ^ b) <= r` on the joined rows.
  *
  * Scale: simhash is a narrow map; block keys a 4× flatMap; ONE wide
  * groupBy on block key with the same star-edge cap as the LSH bucket
  * path (hot block values — e.g. all-zero blocks of short docs — would
  * otherwise go quadratic).
  */
object SimHashDetector {

  final case class SimSig(conv_id: String, simhash: Long)

  def signatures(spark: SparkSession, docs: Dataset[Doc], cfg: DedupConfig): Dataset[SimSig] = {
    import spark.implicits._
    val k = cfg.shingleK
    docs.map(d => SimSig(d.conv_id, Hashing.simhash(Hashing.shingleHashes(d.doc_text, k))))
  }

  def dupPairs(spark: SparkSession, docs: Dataset[Doc], cfg: DedupConfig): Dataset[DupPair] = {
    import spark.implicits._
    val sigs = signatures(spark, docs, cfg).cache()
    val blocks = cfg.simhashBlocks
    val keys = sigs.flatMap { s =>
      Hashing.simhashBlocks(s.simhash, blocks).iterator
        .map(bk => MinHashLSH.BandKey(bk, s.conv_id))
    }
    val cands = MinHashLSH.candidatePairs(spark, keys, cfg)
    val sigDf = sigs.toDF("conv_id", "simhash")
    cands
      .join(sigDf.withColumnRenamed("conv_id", "doc_a").withColumnRenamed("simhash", "sh_a"), Seq("doc_a"))
      .join(sigDf.withColumnRenamed("conv_id", "doc_b").withColumnRenamed("simhash", "sh_b"), Seq("doc_b"))
      .withColumn("hd", bit_count($"sh_a".bitwiseXOR($"sh_b")))
      .filter($"hd" <= lit(cfg.hammingRadius))
      .select(
        $"doc_a",
        $"doc_b",
        lit("simhash").as("detector"),
        (lit(1.0) - $"hd".cast("double") / lit(64.0)).as("score"))
      .as[DupPair]
  }
}
