package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over dup-pair edges as an iterative DataFrame
  * algorithm — hash-min label propagation with pointer jumping (the
  * public "hash-to-min" family, Rastogi et al. ICDE'13; no GraphX, no
  * RDDs per north_rule).
  *
  * Reference analog: container co-location of duplicates — every chunk
  * referencing the same stored copy belongs to one group
  * (/root/reference/src/container.c:435-483 +
  * /root/reference/src/dedup.c:150-173).
  *
  * Each iteration: comp(v) ← min(comp(v), min_{(u,v)∈E} comp(u)), then
  * two pointer-jumping steps comp(v) ← comp(comp(v)) which cut path
  * lengths 4×, giving O(log d) convergence on diameter-d components
  * with few driver round-trips.
  *
  * Labels are DICTIONARY-ENCODED before the loop: each distinct node id
  * gets a dense 64-bit code (shuffle-partition id << 40 | in-partition
  * rank — a pure function of the data, so task retries reproduce it),
  * and every loop shuffle moves 8-byte longs instead of strings. The
  * string cluster_id contract (= lexicographic min member) is restored
  * after convergence by a per-component min(conv_id) regroup, so the
  * output is bit-identical to the un-encoded algorithm.
  *
  * Driver round-trips: ONE job per ROUND of `batchIters` iterations
  * (0 = auto by deployment shape; see [[graft.DedupConfig.ccBatchIters]]) —
  * intermediate iterations end at lazy plan boundaries
  * ([[org.apache.spark.sql.GraftPlanBridge.planBoundary]]) so the whole
  * batch executes as a single job, and the convergence metric (sum of
  * label hashes, which only ever decreases) rides the materializing
  * action itself as an `observe()` metric instead of a separate
  * collect. Plan lineage is truncated every `checkpointEvery`
  * rounds; when the SparkContext has a
  * checkpoint dir configured the truncation is a RELIABLE checkpoint
  * (survives executor loss on a real cluster; the iteration is
  * persisted first so the checkpoint-write job re-reads cache instead
  * of recomputing), otherwise localCheckpoint (fine for local mode).
  * Every superseded iteration's blocks — including localCheckpoints and
  * the initial label table — are unpersisted as soon as the next
  * iteration is material, so repeated CC invocations in one session do
  * not accumulate dead blocks.
  *
  * Skew: star-capped candidate generation upstream keeps component
  * diameter small; the groupBy(dst) min-aggregation is a partial
  * (map-side) aggregate so a mega-cluster's fan-in is combined before
  * the shuffle.
  */
object ConnectedComponents {

  // the returned frame is localCheckpoint'd (its lineage — detectors +
  // loop — is gone, so the blocks ARE the data and can't be dropped
  // while a caller may still read it). Callers don't manage it, so each
  // run() retires the PREVIOUS invocation's output FOR ITS OWN SESSION
  // via the shared [[Retire]] slot: at most one live label table per
  // session instead of one per invocation.

  /** edges: DataFrame with string columns (doc_a, doc_b).
    * @return (conv_id, cluster_id) where cluster_id = min member id.
    *         Valid until the next run() on the SAME SparkSession (blocks
    *         are then freed); persist/write it first if you need it
    *         longer, or run from another session to hold two results. */
  def run(spark: SparkSession, edges: DataFrame, maxIters: Int = 25, checkpointEvery: Int = 1, batchIters: Int = 0): DataFrame = {
    import spark.implicits._
    // batchIters = 0 → AUTO by deployment shape (DedupConfig.ccBatchIters
    // scaladoc has the measurements): in-process local masters have no
    // per-stage RPC, so fewer job-syncs win (3); everywhere else each
    // post-fixpoint overshoot iteration costs real stage dispatch (1).
    val batch =
      if (batchIters > 0) batchIters
      else if (spark.sparkContext.master.startsWith("local[")) 3
      else 1
    val debug = sys.env.contains("GRAFT_CC_DEBUG")
    var tPhase = System.nanoTime()
    def lap(phase: String): Unit = if (debug) {
      val now = System.nanoTime()
      System.err.println(f"[cc] phase=$phase ${(now - tPhase) / 1e9}%.2fs")
      tPhase = now
    }
    // ---- phase 1 (session settings: codegen + AQE on) ----
    // materialize the ONE-DIRECTIONAL edge set first: the edge input is
    // often a full detector pipeline (MinHash/SimHash kernels), which
    // must run wide, codegen'd and AQE-planned — only the tiny label
    // loop below benefits from interpreted eval. Materializing before
    // symmetrizing matters: a union of two projections of an un-cached
    // detector plan embeds that plan in BOTH branches, and the map-side
    // work between the detectors' last exchange and the union executes
    // twice (ReuseExchange only dedups the exchanges themselves) —
    // measured ~2× the detector cost at sf0.1. One count here runs the
    // detectors exactly once; the swap-union then reads this cache.
    // (no distinct here: symWide's own distinct right below dedups the
    // union anyway — a pre-distinct would only add an exchange)
    val ed = edges
      .select($"doc_a".as("src"), $"doc_b".as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    ed.count()
    val symWide = ed
      .union(ed.select($"dst".as("src"), $"src".as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // dictionary: distinct node → dense long code. The encoding is a
    // pure function of the data (hash partition on conv_id, rank within
    // sorted partition), so retries are deterministic. 2^40 ids per
    // partition / 2^23 partitions of headroom at 10^12 nodes.
    // Partition count is sized to the EDGE volume (~32k edges/part,
    // capped at the session setting): a dup graph is far smaller than
    // its corpus, and a fixed session-width dict means hundreds of
    // near-empty tasks in every downstream stage.
    val nEdges = symWide.count()
    ed.unpersist(false)
    val sessionShuffleParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val dictParts = math.max(1L, math.min(sessionShuffleParts.toLong,
      (nEdges + 32767L) / 32768L)).toInt
    val dict = symWide
      .select($"src".as("conv_id"))
      .distinct()
      .repartition(dictParts, $"conv_id")
      .sortWithinPartitions($"conv_id")
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        var i = 0L
        it.map { row =>
          val id = (pid << 40) | i
          i += 1
          (row.getString(0), id)
        }
      }
      .toDF("conv_id", "id")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // edges in code space: two hash joins against the dictionary —
    // one-time cost outside the loop, after which every iteration
    // shuffles longs only
    val symCoded = symWide
      .join(dict.withColumnsRenamed(Map("conv_id" -> "src", "id" -> "src_id")), Seq("src"))
      .join(dict.withColumnsRenamed(Map("conv_id" -> "dst", "id" -> "dst_id")), Seq("dst"))
      .select($"src_id".as("src"), $"dst_id".as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nLabels = dict.count()
    lap("sym+dict")
    symCoded.count()
    symWide.unpersist(false)
    // PLAN boundaries over the two cached frames every later step reads:
    // their logical trees embed the whole upstream detector pipeline
    // (dict contains symWide contains the edge input — measured as a
    // multi-megabyte plan string), and Catalyst re-optimizes a frame's
    // FULL tree at every materialization that references it — i.e. every
    // loop iteration. The boundary swaps in an opaque scan of the
    // already-cached data (partitioning preserved, cache respected by
    // the physical planning underneath), so per-iteration driver
    // analysis is over a three-node tree instead of the corpus pipeline.
    val dictB = org.apache.spark.sql.GraftPlanBridge.planBoundary(dict)
    val symCodedB = org.apache.spark.sql.GraftPlanBridge.planBoundary(symCoded)
    lap("encode")

    // ---- phase 2 (loop settings) ----
    // label tables are tiny relative to the corpus; AQE's per-shuffle
    // re-planning adds fixed latency to every one of the loop's jobs —
    // turn it off for the loop, restore afterwards. Same for codegen:
    // every iteration's plan carries fresh expression ids, so
    // whole-stage codegen JANINO-COMPILES anew each iteration (~0.5-1s
    // of pure driver serial time) for code that processes a tiny label
    // table — interpreted eval is strictly faster here
    // (-Dgraft.cc.codegen=true re-enables it, for A/B probing).
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val codegenBefore = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    if (!sys.props.get("graft.cc.codegen").contains("true"))
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val coded =
      try runLoop(spark, symCodedB, dictB, nLabels, maxIters, checkpointEvery, batch)
      finally {
        lap("loop")
        spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
        spark.conf.set("spark.sql.shuffle.partitions", partsBefore)
        spark.conf.set("spark.sql.codegen.wholeStage", codegenBefore)
      }

    // ---- phase 3 (session settings): decode + restore the
    // "cluster_id = lexicographic min member" contract ----
    val named = coded
      .join(dictB, Seq("id"))
      .select($"conv_id", $"comp")
    val repNames = named
      .groupBy($"comp")
      .agg(min($"conv_id").as("cluster_id"))
    val out = named
      .join(repNames, Seq("comp"))
      .select($"conv_id", $"cluster_id")
      .localCheckpoint(true)
    coded.unpersist(false)
    symCoded.unpersist(false)
    dict.unpersist(false)
    Retire.swap(spark, "cc_labels", out)
    lap("decode")
    out
  }

  /** Hash-min loop in code space. edges: (src: Long, dst: Long),
    * symmetric and distinct. Returns a MATERIALIZED (id, comp) frame —
    * caller unpersists. */
  private def runLoop(
      spark: SparkSession,
      sym0: DataFrame,
      dict: DataFrame,
      nLabels: Long,
      maxIters: Int,
      checkpointEvery: Int,
      batchIters: Int): DataFrame = {
    import spark.implicits._
    val reliable = spark.sparkContext.getCheckpointDir.isDefined

    // size the loop's shuffles to the LABEL table, not the session
    // default: per-task overhead dominates below ~100k rows/partition,
    // and with AQE off nothing coalesces the empties. At 10^9 labels
    // this climbs back to the session setting. ~16k rows/partition:
    // small enough that iterations use the cores (interpreted join work
    // is ~µs/row), large enough that task scheduling doesn't dominate.
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val loopParts = math.max(1L, math.min(sessionParts.toLong, (nLabels + 16383L) / 16384L))
    spark.conf.set("spark.sql.shuffle.partitions", loopParts.toString)

    // initial labels comp(v)=v: a narrow projection of the cached dict
    // (its id set IS the node set — no second distinct), squeezed to
    // loopParts blocks so every iteration reads right-sized partitions
    var labels = dict
      .select($"id", $"id".as("comp"))
      .coalesce(loopParts.toInt)
      .localCheckpoint(true)
    if (nLabels == 0) return labels

    // the loop re-reads sym every iteration: coalesce its cached
    // partitioning down to loopParts so each iteration's map stages are
    // a handful of right-sized tasks, not sessionParts tiny ones
    val sym =
      if (sym0.rdd.getNumPartitions <= loopParts * 2) sym0
      else {
        val c = sym0.coalesce(loopParts.toInt).persist(StorageLevel.MEMORY_AND_DISK)
        c.count()
        c
      }

    // convergence detection: labels only ever decrease, so the fixpoint
    // is reached exactly when the label-hash sum is unchanged.
    // decimal(38,0) accumulator: Long sum would overflow (ANSI throws).
    def labelSumCol = sum(xxhash64($"comp").cast("decimal(38,0)")).as("label_sum")

    // no initial-sum job: on a nonempty symmetric edge set some label
    // strictly decreases in iteration 1 (for any edge (a,b), a<b, node
    // b\'s label drops), so iter 1 can never be the fixpoint — the null
    // sentinel never equals a real sum
    // one hash-min + double-pointer-jump iteration as a pure plan
    // transform (partial agg before the groupBy(dst) shuffle; the
    // repeated self-join subtrees share physical exchanges via
    // ReuseExchange, so each jump costs two more small shuffles, not a
    // recompute)
    def step(cur: DataFrame): DataFrame = {
      val nbrMin = sym
        .join(cur.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy($"dst")
        .agg(min($"comp").as("nbr_comp"))
        .withColumnRenamed("dst", "id")
      val propagated = cur
        .join(nbrMin, Seq("id"), "left")
        .select($"id", least($"comp", coalesce($"nbr_comp", $"comp")).as("comp"))
      val compMap = propagated.select($"id".as("cid"), $"comp".as("ccomp"))
      val jump1 = propagated
        .join(compMap, propagated("comp") === compMap("cid"), "left")
        .select($"id", least($"comp", coalesce($"ccomp", $"comp")).as("comp"))
      val compMap2 = jump1.select($"id".as("cid2"), $"comp".as("ccomp2"))
      jump1
        .join(compMap2, jump1("comp") === compMap2("cid2"), "left")
        .select($"id", least($"comp", coalesce($"ccomp2", $"comp")).as("comp"))
    }

    var prevSum: Any = null
    var iter = 0
    var mat = 0 // materializations ("rounds"): one job each
    var converged = false
    // blocks superseded by the CURRENT materialized round — freed as
    // soon as the next one is material (includes localCheckpoint blocks
    // and the initial label table; reliable checkpoint files are owned
    // by the ContextCleaner when cleanCheckpoints is on)
    var retired = List[DataFrame](labels)
    while (iter < maxIters && !converged) {
      val tIter = System.nanoTime()
      // BATCH `batchIters` iterations into ONE job: intermediate
      // iterations end at a lazy plan boundary (GraftPlanBridge — an
      // opaque LogicalRDD, so Catalyst analyzes one iteration's tree at
      // a time instead of the ~8×/iteration tree blowup the self-joins
      // cause; see ccCheckpointEvery's notes), but nothing runs until
      // the batch's single materializing count. One driver job-sync —
      // the CC loop's measured input-independent fixed cost — per
      // `batchIters` iterations instead of per iteration. No blocks are
      // persisted at the boundaries and shuffle lineage is intact, so
      // fault tolerance is unchanged.
      val thisBatch = math.min(batchIters, maxIters - iter)
      var cur = labels
      var b = 0
      while (b < thisBatch) {
        cur = step(cur)
        b += 1
        if (b < thisBatch)
          cur = org.apache.spark.sql.GraftPlanBridge.planBoundary(cur)
      }
      // one job: materialize the round AND deliver the convergence
      // metric through observe() — no separate driver collect
      val obs = org.apache.spark.sql.Observation()
      val observed = cur.observe(obs, labelSumCol)
      val truncate = (mat + 1) % checkpointEvery == 0
      // persist → count (one job, delivers the observe metric); on
      // truncation rounds the checkpoint then re-reads those cached
      // blocks instead of re-executing the whole round (both locally
      // and reliably — RDD checkpointing always runs a second job over
      // the plan's partitions)
      val p = observed.persist(StorageLevel.MEMORY_AND_DISK)
      p.count()
      val next =
        if (truncate && reliable) { val ck = p.checkpoint(true); retired = p :: retired; ck }
        else if (truncate) { val ck = p.localCheckpoint(true); retired = p :: retired; ck }
        else p
      val curSum = obs.get.getOrElse("label_sum", null)
      // previous rounds' blocks are dead once `next` is material
      // (Retire.free also reaches localCheckpoint RDDs the cache
      // manager doesn't track)
      retired.foreach(Retire.free)
      retired = List(next)
      labels = next
      // sums compare round-end to round-end: labels only decrease, so
      // an unchanged sum across a whole batch means no iteration inside
      // it changed anything — the fixpoint
      converged = curSum == prevSum
      prevSum = curSum
      iter += thisBatch
      mat += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(f"[cc] round=$mat iters=$iter ${(System.nanoTime() - tIter) / 1e9}%.2fs converged=$converged")
    }
    if (!(sym eq sym0)) sym.unpersist(false)
    // `labels` is the last materialized iteration (still persisted /
    // checkpointed — the retired list is only drained when a NEWER
    // iteration supersedes it, which hasn't happened for the final one);
    // run() unpersists it via the coded handle after decoding
    labels
  }
}
