package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.{DedupConfig, Doc, DupPair}
import graft.functions.Hashing

/** EXACT long-substring duplication via a distributed suffix-array pass
  * (the north-star's named algorithm) — prefix doubling in pure
  * DataFrame transforms, no RDD loop, no global sort.
  *
  * [[SubstringDetector]] (winnowed anchors) is the 100 TB production
  * path: it SAMPLES q-gram fingerprints (1/s of them), so a shared run
  * of length L ≥ q tokens escapes with probability (1-1/s)^(L-q+1).
  * This pass is its exhaustive counterpart: it links EVERY pair of
  * documents sharing an exact ≥ L-token run, deterministically, with no
  * hashing anywhere in the decision path — the exact baseline the
  * sampled detector is audited against (same role brute-force cosine
  * plays for the RHP-LSH ANN path), and the Spark-native re-expression
  * of the suffix-array dedup of Lee et al. ACL'22 ("Deduplicating
  * Training Data Makes Language Models Better").
  *
  * Method (Manber–Myers prefix doubling, SIAM J.Comput'93 — public):
  * one row per token position ("suffix"). Iteratively compute
  * EQUIVALENCE CLASSES of suffix prefixes of width w = 1, 2, 4, … :
  * two positions are in one class iff their (up to) w-token prefixes
  * are identical (suffixes shorter than w compare with implicit
  * end-markers: the missing half maps to a -1 sentinel, so a truncated
  * prefix never merges with a longer one). A class id is the MINIMUM
  * suffix id of its members — a pure function of the data (task retries
  * reproduce it), assigned by `groupBy(clsₗ, clsᵣ) → min(sid)`, i.e.
  * plain shuffles; the textbook's rank-sort never materializes.
  * Classes at width w1 = 2^⌊log₂ L⌋ then decide membership directly via
  * the overlapping power-of-two trick: positions p, p' carry an equal
  * L-gram  ⟺  cls(p) = cls(p') ∧ cls(p+L-w1) = cls(p'+L-w1)
  * (the two width-w1 windows cover [p, p+L) exactly) — so the
  * candidate key IS the decision, with zero false positives and zero
  * misses by construction.
  *
  * Reference analog: same "fingerprint equality = duplicate" decision
  * as /root/reference/src/dedup.c:129-147, but over class ids that are
  * exact equivalence witnesses instead of hashes.
  *
  * Scale shape: log₂(L/1) rounds, each 3 token-grain shuffles
  * (lookup-at-p+w self-join, class groupBy with map-side partial agg,
  * assignment join-back), chained through lazy plan boundaries
  * ([[org.apache.spark.sql.GraftPlanBridge.planBoundary]]) so Catalyst
  * analyzes one round's tree at a time and the WHOLE doubling ladder
  * executes as a single job. Pair emission is an UNCAPPED spill-safe
  * sort-merge self-join over distinct (gram class, doc) rows: a gram
  * shared by B docs inherently yields C(B,2) pairs — exactness means
  * paying that output volume, never a star fallback (which would
  * silently drop non-hub pairs and corrupt audits that use this pass
  * as ground truth). Token rows are (long, int, long) triples — ~20 B —
  * so a 10^9-token scope shuffles ~20 GB per round; exhaustiveness
  * costs ~s× the sampled detector's key volume plus the quadratic
  * output on mega-shared grams, which is why THIS pass is for bounded
  * scopes (per-shard audits, recall measurement, verification corpora)
  * and the winnowed pass is for the full corpus.
  *
  * The returned frame is materialized (localCheckpoint) and valid
  * until the next `dupPairs` on the SAME SparkSession (previous output
  * blocks are then retired — same contract as CC labels); persist or
  * write it first if held longer.
  */
object SuffixArrayDetector {

  /** All (doc_a < doc_b) pairs sharing an exact run of ≥ cfg.substrQ
    * tokens (same tokenization as the winnowed detector:
    * [[Hashing.tokens]] — lowercased maximal non-whitespace runs).
    *
    * `maxTokens` (hard ceiling 2^22 — the suffix-id encoding reserves
    * 22 position bits): a LONGER doc degrades to its first `maxTokens`
    * tokens and is counted + logged, it does NOT kill the job — an
    * executor-side throw on one pathological document would take down
    * the whole audit pass, and degrade-one-row is the engine-wide
    * convention (Multimodal treats corrupt payloads the same way).
    * Truncation can only LOSE pairs whose every shared run lies past
    * the cut, which the log line makes auditable. */
  def dupPairs(spark: SparkSession, docs: Dataset[Doc], cfg: DedupConfig,
      maxTokens: Int = 1 << 22): Dataset[DupPair] = {
    import spark.implicits._
    val L = cfg.substrQ
    require(L >= 2, s"substrQ must be >= 2, got $L")
    require(maxTokens >= L && maxTokens <= (1 << 22),
      s"maxTokens must be in [$L, 2^22], got $maxTokens")
    val truncAcc = spark.sparkContext.longAccumulator("suffix_array_truncated_docs")
    val w1 = Integer.highestOneBit(L)

    // ---- dense doc ids (two tiny jobs over the distinct-doc set) ----
    // suffix id sid = did * 2^22 + pos must be unique, so did must be
    // DENSE (< n_docs), not the CC dict's (pid << 40 | rank) encoding.
    // Pass 1 counts docs per sorted hash partition; pass 2 assigns
    // rank + broadcast prefix offset. Deterministic across retries
    // (hash partition + in-partition sort are pure functions of data).
    val docIds = docs.toDF.select($"conv_id", $"doc_text")
      .repartition($"conv_id")
      .sortWithinPartitions($"conv_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val perPart = docIds
      .mapPartitions { it =>
        Iterator.single((org.apache.spark.TaskContext.getPartitionId(), it.size.toLong))
      }.collect().toMap
    val nParts = docIds.rdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    var acc = 0L
    for (p <- 0 until nParts) { offsets(p) = acc; acc += perPart.getOrElse(p, 0L) }
    val offB = spark.sparkContext.broadcast(offsets)

    // ---- suffix rows: (did, pos, tok) + per-doc lengths ----
    val suffixes = docIds
      .mapPartitions { it =>
        val base = offB.value(org.apache.spark.TaskContext.getPartitionId())
        var i = 0L
        it.flatMap { row =>
          val did = base + i
          i += 1
          val toks0 = Hashing.tokens(row.getString(1))
          // degrade, don't fail: an oversized doc contributes its prefix
          // and is counted (see the maxTokens scaladoc)
          val toks = if (toks0.length > maxTokens) {
            truncAcc.add(1)
            toks0.take(maxTokens)
          } else toks0
          toks.iterator.zipWithIndex.map { case (t, p) => (did, p, t) }
        }
      }
      .toDF("did", "pos", "tok")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val lengths = suffixes.groupBy($"did").agg(count(lit(1)).cast("int").as("len"))
    val dict = docIds
      .mapPartitions { it =>
        val base = offB.value(org.apache.spark.TaskContext.getPartitionId())
        var i = 0L
        it.map { row => val did = base + i; i += 1; (did, row.getString(0)) }
      }
      .toDF("did", "conv_id")

    val sid = (($"did" * lit(1L << 22)) + $"pos").as("sid")

    // ---- width-1 classes: one class per distinct token ----
    var cls: DataFrame = {
      val tokCls = suffixes.groupBy($"tok").agg(min(sid).as("ncls"))
      suffixes.join(tokCls, Seq("tok")).select($"did", $"pos", $"ncls".as("cls"))
    }
    cls = org.apache.spark.sql.GraftPlanBridge.planBoundary(cls)

    // ---- doubling ladder: classes at width 2w from classes at width w —
    // all rounds ONE job (lazy boundaries keep per-round plans small) ----
    var w = 1
    while (w < w1) {
      val rightCls = cls.select($"did", ($"pos" - w).as("pos"), $"cls".as("cls_r"))
      val paired = cls
        .join(rightCls, Seq("did", "pos"), "left")
        .select($"did", $"pos", $"cls", coalesce($"cls_r", lit(-1L)).as("cls_r"))
      val pairCls = paired.groupBy($"cls", $"cls_r").agg(min(sid).as("ncls"))
      cls = org.apache.spark.sql.GraftPlanBridge.planBoundary(
        paired.join(pairCls, Seq("cls", "cls_r")).select($"did", $"pos", $"ncls".as("cls")))
      w *= 2
    }

    // ---- membership keys: the two width-w1 windows covering [pos, pos+L) ----
    val withLen = cls.join(lengths, Seq("did")).filter($"pos" + L <= $"len")
    val keyed =
      if (L == w1)
        withLen.select($"did", $"cls".as("k1"), $"cls".as("k2"))
      else
        withLen
          .join(cls.select($"did", ($"pos" - (L - w1)).as("pos"), $"cls".as("k2")), Seq("did", "pos"))
          .select($"did", $"cls".as("k1"), $"k2")

    // exhaustive pair emission: DISTINCT docs per L-gram class (a doc
    // repeating a gram contributes once), then an UNCAPPED equi-self-
    // join with did_a < did_b. No star fallback here — the exact
    // contract IS every pair, so a gram shared by B docs inherently
    // yields C(B,2) rows; the sort-merge join spills, so a mega-shared
    // gram costs output volume, never memory. (The capped/star-edge
    // treatment of such grams is the SAMPLED detector's scale
    // trade-off; applying it here would silently drop non-hub pairs
    // and corrupt any audit that uses this pass as ground truth.)
    val k = keyed.dropDuplicates("k1", "k2", "did")
    val pairsDid = k.as("a")
      .join(k.as("b"),
        col("a.k1") === col("b.k1") && col("a.k2") === col("b.k2") &&
          col("a.did") < col("b.did"))
      .select(col("a.did").as("did_a"), col("b.did").as("did_b"))
      .dropDuplicates("did_a", "did_b")
    val out = pairsDid
      .join(dict.select($"did".as("did_a"), $"conv_id".as("ca")), Seq("did_a"))
      .join(dict.select($"did".as("did_b"), $"conv_id".as("cb")), Seq("did_b"))
      .select(
        least($"ca", $"cb").as("doc_a"),
        greatest($"ca", $"cb").as("doc_b"),
        lit("suffix_array").as("detector"), lit(1.0).as("score"))
      .as[DupPair]
      .localCheckpoint(true)
    // `out` is materialized (localCheckpoint above), so the accumulator
    // is final here; the count makes prefix-only coverage auditable.
    // AT-LEAST-ONCE: the add() runs inside a transformation, so a task
    // retry / lost-cached-partition recompute / speculative duplicate
    // counts the same doc again — Spark only dedups accumulator updates
    // from actions. Acceptable for a warn-threshold diagnostic (zero
    // stays exactly zero; a positive count may overstate); an exact
    // count would cost a second tokenization pass over the corpus.
    if (truncAcc.value > 0)
      System.err.println(s"[suffix_array] truncated >=${truncAcc.value} doc(s) " +
        s"(at-least-once count; retries may double-count) " +
        s"to their first $maxTokens tokens (shared runs past the cut are not linked)")
    suffixes.unpersist(false)
    docIds.unpersist(false)
    // checkpointed blocks are untracked by the cache manager — retire
    // the previous invocation's output (same contract as CC labels)
    Retire.swap(spark, "suffix_array_pairs", out.toDF)
    out
  }
}
