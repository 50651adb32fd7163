package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{DedupConfig, Doc, DupPair}
import graft.functions.Hashing

/** MinHash + LSH near-duplicate detection (Broder '97 resemblance /
  * banding per Leskovec-Rajaraman-Ullman, "Mining of Massive Datasets"
  * ch.3 — public technique).
  *
  * Reference analog: the fingerprint index probe generalized from
  * equality to Jaccard similarity (/root/reference/src/dedup.c:105-175);
  * an LSH band bucket plays the role of a hash-index bucket
  * (/root/reference/src/diskhash.c:103-104).
  *
  * Scale design:
  *  - Signatures are a NARROW map over docs (no shuffle): the signature
  *    is a pure function of doc_text.
  *  - Banding is a flatMap (bands× fan-out, still narrow).
  *  - The only wide operations: one groupBy(band_key) for candidate
  *    generation and the joins that attach signatures for verification.
  *  - Skew (north_rule): buckets larger than cfg.bucketCap emit STAR
  *    edges (each member → bucket hub) instead of all pairs — linear,
  *    preserves connected-component connectivity, avoids the quadratic
  *    blowup of a mega-template bucket. All-pair emission only below the
  *    cap, where it buys recall for the pairwise-verify step.
  */
object MinHashLSH {

  final case class Sig(conv_id: String, sig: Array[Long])
  final case class BandKey(band_key: Long, conv_id: String)

  /** Per-doc MinHash signatures — a narrow projection through the
    * native [[graft.plans.MinHashSigExpr]] expression: stays inside
    * whole-stage codegen, no encoder round-trip. */
  def signatures(spark: SparkSession, docs: Dataset[Doc], cfg: DedupConfig): Dataset[Sig] = {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    docs.toDF.select(
      $"conv_id",
      call_function("graft_minhash_sig", $"doc_text",
        lit(cfg.shingleK), lit(cfg.numHashes), lit(cfg.seed)).as("sig"))
      .as[Sig]
  }

  /** (band_key, conv_id) rows: `bands` rows per doc (codegen'd
    * band-hash + explode — still narrow). */
  def bandKeys(spark: SparkSession, sigs: Dataset[Sig], cfg: DedupConfig): Dataset[BandKey] = {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    sigs.toDF.select(
      explode(call_function("graft_band_hashes", $"sig",
        lit(cfg.bands), lit(cfg.rowsPerBand))).as("band_key"),
      $"conv_id")
      .as[BandKey]
  }

  /** Candidate pairs from shared band buckets; deduplicated across
    * bands. Returned with doc_a < doc_b lexicographically. */
  def candidatePairs(spark: SparkSession, keys: Dataset[BandKey], cfg: DedupConfig): DataFrame = {
    import spark.implicits._
    val cap = cfg.bucketCap
    keys
      .groupByKey(_.band_key)
      .flatMapGroups { (_, it) =>
        // buffer up to cap+1 members; beyond that stream star edges
        val buf = new scala.collection.mutable.ArrayBuffer[String](16)
        var overflow = false
        while (it.hasNext && !overflow) {
          buf += it.next().conv_id
          if (buf.length > cap) overflow = true
        }
        if (!overflow) {
          val arr = buf.sorted
          val pairs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
          var i = 0
          while (i < arr.length) {
            var j = i + 1
            while (j < arr.length) {
              if (arr(i) != arr(j)) pairs += ((arr(i), arr(j)))
              j += 1
            }
            i += 1
          }
          pairs.iterator
        } else {
          // overflow: stream star edges around the buffered minimum.
          // The hub depends on which cap+1 members were buffered first,
          // so the emitted EDGE SET may differ between task attempts —
          // connectivity (what CC consumes) is hub-invariant, which is
          // the property the pipeline relies on.
          val hub = buf.min
          val starBuf = buf.iterator.filter(_ != hub).map(c => orient(hub, c))
          val starRest = it.map(bk => orient(hub, bk.conv_id)).filter(p => p._1 != p._2)
          (starBuf ++ starRest)
        }
      }
      .toDF("doc_a", "doc_b")
      .dropDuplicates("doc_a", "doc_b")
  }

  @inline private def orient(a: String, b: String): (String, String) =
    if (a < b) (a, b) else (b, a)

  /** Verify candidates against signature-estimated Jaccard (unbiased,
    * σ ≈ sqrt(J(1-J)/numHashes) ≈ 0.04 at 128 hashes). `slack` lowers
    * the accept threshold so estimator noise doesn't drop true pairs at
    * the boundary (recall-first; precision is re-checked downstream by
    * whoever consumes scores). */
  def verifiedPairs(
      spark: SparkSession,
      candidates: DataFrame,
      sigs: Dataset[Sig],
      cfg: DedupConfig,
      slack: Double = 0.05): Dataset[DupPair] = {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val sigDf = sigs.toDF("conv_id", "sig")
    candidates
      .join(sigDf.withColumnRenamed("conv_id", "doc_a").withColumnRenamed("sig", "sig_a"), Seq("doc_a"))
      .join(sigDf.withColumnRenamed("conv_id", "doc_b").withColumnRenamed("sig", "sig_b"), Seq("doc_b"))
      .withColumn("score", call_function("graft_sig_jaccard", $"sig_a", $"sig_b"))
      .filter($"score" >= lit(cfg.jaccardThreshold - slack))
      .select($"doc_a", $"doc_b", lit("minhash").as("detector"), $"score")
      .as[DupPair]
  }

  /** Full detector: docs → verified near-dup pairs. */
  def dupPairs(spark: SparkSession, docs: Dataset[Doc], cfg: DedupConfig): Dataset[DupPair] = {
    val sigs = signatures(spark, docs, cfg).cache()
    val cands = candidatePairs(spark, bandKeys(spark, sigs, cfg), cfg)
    verifiedPairs(spark, cands, sigs, cfg)
  }
}
