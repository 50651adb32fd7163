package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{DedupConfig, Doc, DupPair}

/** MinHash-LSH + SimHash in ONE sweep over the corpus.
  *
  * Run standalone, each detector pays (a) its own normalize+tokenize
  * walk over every byte of every document and (b) its own key exchange
  * (bands× and 68× fan-outs shuffled separately). Fused:
  *
  *  - ONE narrow projection computes both signatures per doc
  *    ([[graft.plans.FusedSigExpr]] — tokenizes once, bit-identical
  *    signatures);
  *  - ONE exchange carries both detectors' candidate keys, tagged so
  *    buckets never mix (bucket identity = (key, tag); the shared
  *    [[PairSweep]] keeps per-bucket caps and deterministic hubs);
  *  - per-detector verification is unchanged (signature Jaccard for
  *    minhash, `bit_count(a^b) <= r` for simhash) and reads the same
  *    cached signature table.
  *
  * The output is row-identical to
  * `MinHashLSH.dupPairs ∪ SimHashDetector.dupPairs` (FusedSpec asserts
  * this) — fusion changes the physical plan, not the semantics. This is
  * the production path for clustering (Pipeline/Bench); the standalone
  * detectors remain the unit-testable / individually-oracled surfaces.
  *
  * Reference analog: the reference's dedup pass also computes its
  * chunk fingerprint and its index probe in the same read of the data
  * (/root/reference/src/dedup.c:80-147) rather than one pass per
  * structure.
  */
object FusedDetectors {

  private val MinHashTag = 0L
  private val SimHashTag = 1L

  /** Verification slack shared by the batch and incremental paths —
    * single-sourced so the two can never silently diverge. */
  val DefaultSlack = 0.05

  /** Tagged candidate key stream from a [[signatures]]-shaped frame
    * (sig, simhash + the `carry` columns — conv_id always; is_new for
    * the incremental path). Tags keep the two detectors' bucket spaces
    * disjoint inside one exchange. */
  private[operators] def taggedKeys(sigs: DataFrame, cfg: DedupConfig,
      carry: Seq[String]): DataFrame = {
    val cc = carry.map(col).toList
    val mh = sigs.select(
      explode(call_function("graft_band_hashes", col("sig"),
        lit(cfg.bands), lit(cfg.rowsPerBand))).as("k1") ::
        lit(MinHashTag).as("k2") :: cc: _*)
    val sh = sigs.select(
      explode(call_function("graft_ball_keys", col("simhash"),
        lit(cfg.simhashBlocks))).as("k1") ::
        lit(SimHashTag).as("k2") :: cc: _*)
    mh.unionAll(sh)
  }

  /** Per-detector verification of a tagged candidate set against the
    * signature frame: signature Jaccard for minhash, Hamming radius
    * for simhash — THE verification both the batch and incremental
    * paths run, by construction the same. */
  private[operators] def verifyPairs(cands: DataFrame, sigs: DataFrame,
      cfg: DedupConfig, slack: Double): DataFrame = {
    val withSigs = cands
      .join(sigs.select(col("conv_id").as("doc_a"),
        col("sig").as("sig_a"), col("simhash").as("sh_a")), Seq("doc_a"))
      .join(sigs.select(col("conv_id").as("doc_b"),
        col("sig").as("sig_b"), col("simhash").as("sh_b")), Seq("doc_b"))
    val mh = withSigs
      .filter(col("k2") === MinHashTag)
      .withColumn("score", call_function("graft_sig_jaccard", col("sig_a"), col("sig_b")))
      .filter(col("score") >= lit(cfg.jaccardThreshold - slack))
      .select(col("doc_a"), col("doc_b"), lit("minhash").as("detector"), col("score"))
    val sh = withSigs
      .filter(col("k2") === SimHashTag)
      .withColumn("hd", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hd") <= lit(cfg.hammingRadius))
      .select(col("doc_a"), col("doc_b"), lit("simhash").as("detector"),
        (lit(1.0) - col("hd").cast("double") / lit(64.0)).as("score"))
    mh.unionAll(sh)
  }

  /** (conv_id, sig: array<bigint>, simhash: bigint) — one tokenization
    * pass per doc, signatures bit-identical to the standalone kernels. */
  def signatures(spark: SparkSession, docs: Dataset[Doc], cfg: DedupConfig): DataFrame = {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    docs.toDF.select(
      $"conv_id",
      call_function("graft_fused_sig", $"doc_text",
        lit(cfg.shingleK), lit(cfg.numHashes), lit(cfg.seed),
        lit(cfg.simhashShingleK)).as("s"))
      .select($"conv_id", $"s.mh".as("sig"), $"s.sh".as("simhash"))
  }

  /** Both detectors' verified dup pairs from one corpus sweep.
    *
    * LIFETIME CONTRACT: the returned Dataset is a localCheckpoint whose
    * blocks are retired by the NEXT `dupPairs` call on the same
    * SparkSession (lineage is truncated, so a stale handle fails with
    * block-not-found rather than recomputing). Valid until that next
    * call; `persist()` or write it first if you need to hold two
    * results. Same contract as [[ConnectedComponents]] labels and
    * [[SuffixArrayDetector.dupPairs]]. */
  def dupPairs(spark: SparkSession, docs: Dataset[Doc], cfg: DedupConfig,
      slack: Double = DefaultSlack): Dataset[DupPair] = {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // cache() alone is NOT enough here: the signature table feeds four
    // plan branches (two key streams + two verification join sides),
    // and AQE materializes leaf exchanges CONCURRENTLY — before any
    // cached block lands, every concurrent branch computes the full
    // signature pipeline independently (measured: the sig stage ran
    // twice at sf0.1, doubling the query's CPU). One eager count() runs
    // it exactly once; every branch then reads cache.
    val sigs0 = signatures(spark, docs, cfg).cache()
    sigs0.count()
    // plan boundary over the materialized cache: the four consumer
    // branches below embed `sigs`' logical tree, and AQE's concurrent
    // leaf materialization can plan a branch against the not-yet-
    // registered cache entry and re-execute the signature kernel. The
    // boundary pins every consumer to the ONE compiled cache-scan RDD —
    // recomputation becomes structurally impossible, not just unlikely.
    val sigs = org.apache.spark.sql.GraftPlanBridge.planBoundary(sigs0.toDF)

    // tagged key stream: (k1 = bucket key, k2 = detector tag).
    // materialize the candidate set ONCE: both detector branches read
    // it, and an uncached sweep pipeline would execute per branch (the
    // exchange is reused, but the sort + streaming pass above it run
    // again for every consumer). Candidates are pairs — tiny next to
    // the key stream — so the cache is cheap at any scale.
    val cands = PairSweep.pairs(spark, taggedKeys(sigs, cfg, Seq("conv_id")), cfg.bucketCap)
      .dropDuplicates("doc_a", "doc_b", "k2")
      .cache()
    cands.count()

    // verification joins read the one cached signature table; each
    // detector filters to ITS candidate tag so fused recall/precision
    // equals the standalone detectors' exactly. The result (pairs —
    // tiny) is materialized so the two corpus-sized caches above can be
    // freed HERE instead of leaking for the session's lifetime (a bench
    // run invokes this per pass; a long-lived ingest session many
    // times). Checkpointed blocks are untracked by the cache manager —
    // retire the previous invocation's output (same contract as CC
    // labels: valid until the next dupPairs on the SAME session;
    // persist/write first to hold two results).
    val out = verifyPairs(cands, sigs, cfg, slack).as[DupPair].localCheckpoint(true)
    sigs0.unpersist(false)
    cands.unpersist(false)
    Retire.swap(spark, "fused_pairs", out.toDF)
    out
  }
}
