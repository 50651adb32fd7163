package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental dedup of a NEW batch against an already-deduplicated
  * corpus, with a Bloom-filter prefilter.
  *
  * Direct analog of the reference's hot path: probe each incoming
  * fingerprint against the global index, with a Bloom filter in front
  * so definitely-new chunks skip the expensive probe
  * (/root/reference/src/dedup.c:120-134, bloom filter
  * /root/reference/src/bloomfilter.c:96-191). In Spark the "expensive
  * probe" is the shuffle join against the corpus fingerprint set; the
  * BF (built in one pass with `bloom_filter_agg`, shipped as a binary
  * literal) lets the probe side drop definitely-new rows BEFORE the
  * exchange — map-side, codegen'd `might_contain`.
  *
  * At 10^12-turn scale this is the resume/append path: only rows whose
  * fp MIGHT exist shuffle; everything else appends directly. The BF
  * invariant carried from the reference: bf miss ⇒ definitely new (no
  * false negatives).
  */
object IncrementalDedup {

  /** Hard cap on BF size (bits): 64 MiB — past this the filter no
    * longer pays for its shipping cost. */
  val MaxBloomBits: Long = 67108864L * 8L

  /** One-pass BF build over the corpus fingerprints (BF sized like the
    * reference's: bits ≈ items × ln(1/fpp) / ln2², config.h:153-154's
    * fixed 16 MiB generalized). The filter keys on the fp's h1 half —
    * equal text ⇒ equal h1, so the no-false-negative invariant holds.
    *
    * When `expectedFps` exceeds what [[MaxBloomBits]] can hold at the
    * requested fpp, the EFFECTIVE fpp degrades; that is logged rather
    * than silently absorbed (at fpp→1 the prefilter stops filtering and
    * every row pays the shuffle probe — correct, just not faster). */
  def buildBloom(
      spark: SparkSession,
      corpusFps: DataFrame,
      expectedFps: Long,
      fpp: Double = 0.01): Array[Byte] = {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val items = math.max(expectedFps, 1000L)
    val wantBits = (items * math.log(1.0 / fpp) / (math.log(2) * math.log(2))).toLong
    val numBits = math.min(wantBits, MaxBloomBits)
    if (wantBits > MaxBloomBits) {
      val effFpp = math.exp(-(numBits.toDouble / items) * math.log(2) * math.log(2))
      System.err.println(
        f"[incremental-dedup] WARN bloom bits capped $wantBits -> $numBits; " +
          f"effective fpp ~ $effFpp%.4f (requested $fpp%.4f) at $items items — " +
          "prefilter selectivity degrades, correctness unaffected")
    }
    corpusFps
      .agg(call_function("graft_bloom_agg", $"fp.h1", lit(items), lit(numBits)).as("bf"))
      .collect()(0).getAs[Array[Byte]]("bf")
  }

  /** @param corpusFps DataFrame with column `fp` (existing unique fps)
    * @param batch     new transcripts (conv_id, turn_idx, ..., text)
    * @return batch rows + fp + `bf_hit` (prefilter verdict) +
    *         `is_known` (fp exists in corpus, exact). */
  def dedupeAgainst(
      spark: SparkSession,
      corpusFps: DataFrame,
      batch: DataFrame,
      expectedFps: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val bf = buildBloom(spark, corpusFps, expectedFps, fpp)
    // broadcast, NOT lit(bf): a literal embeds the (up to 64 MiB)
    // filter in the expression tree serialized with every task; the
    // broadcast ships a handle and executors fetch the blob once
    val bcBf = spark.sparkContext.broadcast(bf)
    val flagged = batch
      .withColumn("fp", ExactDedup.fp($"text"))
      .withColumn("bf_hit", org.apache.spark.sql.GraftColumnBridge.column(
        graft.plans.BloomContainsBroadcast(bcBf,
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq("fp", "h1")))))
    // only bf-hit rows pay the shuffle probe; bf-miss rows are
    // definitely new and never enter the exchange
    val known = flagged.filter($"bf_hit")
      .join(corpusFps.select($"fp").distinct(), Seq("fp"), "left_semi")
      .select($"conv_id", $"turn_idx")
      .withColumn("is_known", lit(true))
    flagged
      .join(known, Seq("conv_id", "turn_idx"), "left")
      .withColumn("is_known", coalesce($"is_known", lit(false)))
  }
}
