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
  * Driver round-trips: ONE job per iteration — the convergence metric
  * (sum of label hashes, which only ever decreases) rides the
  * materializing action itself as an `observe()` metric instead of a
  * separate collect. Plan lineage is truncated every
  * `checkpointEvery` iterations; when the SparkContext has a
  * checkpoint dir configured the truncation is a RELIABLE checkpoint
  * (survives executor loss on a real cluster), otherwise
  * localCheckpoint (fine for local mode; blocks die with executors).
  *
  * Skew: star-capped candidate generation upstream keeps component
  * diameter small; the groupBy(dst) min-aggregation is a partial
  * (map-side) aggregate so a mega-cluster's fan-in is combined before
  * the shuffle.
  */
object ConnectedComponents {

  /** edges: DataFrame with string columns (doc_a, doc_b).
    * @return (conv_id, cluster_id) where cluster_id = min member id. */
  def run(spark: SparkSession, edges: DataFrame, maxIters: Int = 25, checkpointEvery: Int = 2): DataFrame = {
    import spark.implicits._
    // label tables are tiny relative to the corpus; AQE's per-shuffle
    // re-planning adds fixed latency to every one of the loop's jobs —
    // turn it off for the loop, restore afterwards (shuffle partitions
    // are resized to the label count inside runLoop for the same reason)
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val codegenBefore = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // every iteration's plan carries fresh expression ids, so whole-stage
    // codegen JANINO-COMPILES anew each iteration (~0.5-1s of pure driver
    // serial time per iteration) for generated code that then processes a
    // tiny label table — interpreted eval is strictly faster here
    // (-Dgraft.cc.codegen=true re-enables it, for A/B probing)
    if (!sys.props.get("graft.cc.codegen").contains("true"))
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try runLoop(spark, edges, maxIters, checkpointEvery)
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      spark.conf.set("spark.sql.shuffle.partitions", partsBefore)
      spark.conf.set("spark.sql.codegen.wholeStage", codegenBefore)
    }
  }

  private def runLoop(spark: SparkSession, edges: DataFrame, maxIters: Int, checkpointEvery: Int): DataFrame = {
    import spark.implicits._
    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    // the distinct over the (possibly expensive) edge input runs at
    // session parallelism — that part should be wide
    val symWide = edges
      .select($"doc_a".as("src"), $"doc_b".as("dst"))
      .union(edges.select($"doc_b".as("src"), $"doc_a".as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = symWide
      .select($"src".as("id"))
      .distinct()
      .withColumn("comp", $"id")
      .localCheckpoint(true)

    // size the loop's shuffles to the LABEL table, not the session
    // default: per-task overhead dominates below ~100k rows/partition,
    // and with AQE off nothing coalesces the empties. At 10^9 labels
    // this climbs back to the session setting.
    val nLabels = labels.count()
    if (nLabels == 0) {
      symWide.unpersist(false)
      return labels.select($"id".as("conv_id"), $"comp".as("cluster_id"))
    }
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // ~16k rows/partition: small enough that iterations use the cores
    // (interpreted join work is ~µs/row), large enough that task
    // scheduling doesn't dominate
    val loopParts = math.max(1L, math.min(sessionParts.toLong, (nLabels + 16383L) / 16384L))
    spark.conf.set("spark.sql.shuffle.partitions", loopParts.toString)

    // the loop re-reads sym every iteration: coalesce its cached
    // partitioning down to loopParts so each iteration's map stages are
    // a handful of right-sized tasks, not sessionParts tiny ones
    val sym =
      if (symWide.rdd.getNumPartitions <= loopParts * 2) symWide
      else {
        val c = symWide.coalesce(loopParts.toInt).persist(StorageLevel.MEMORY_AND_DISK)
        c.count()
        symWide.unpersist(false)
        c
      }

    // convergence detection: labels only ever decrease, so the fixpoint
    // is reached exactly when the label-hash sum is unchanged.
    // decimal(38,0) accumulator: Long sum would overflow (ANSI throws).
    def labelSumCol = sum(xxhash64($"comp").cast("decimal(38,0)")).as("label_sum")

    // initial sum: one cheap aggregate over the (just-materialized)
    // tiny label table, so a no-op first iteration already converges
    var prevSum: Any = labels.agg(labelSumCol).collect()(0).get(0)
    var iter = 0
    var converged = false
    val retired = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    while (iter < maxIters && !converged) {
      val tIter = System.nanoTime()
      // min component label among neighbors (partial agg before shuffle)
      val nbrMin = sym
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy($"dst")
        .agg(min($"comp").as("nbr_comp"))
        .withColumnRenamed("dst", "id")
      val propagated = labels
        .join(nbrMin, Seq("id"), "left")
        .select($"id", least($"comp", coalesce($"nbr_comp", $"comp")).as("comp"))
      // pointer jump ×2: comp(v) ← comp(comp(v)), twice — quadruples
      // path compression per driver round-trip. The repeated subtrees
      // share physical exchanges (ReuseExchange), so the second jump
      // costs two more small shuffles, not a recompute.
      val compMap = propagated.select($"id".as("cid"), $"comp".as("ccomp"))
      val jump1 = propagated
        .join(compMap, propagated("comp") === compMap("cid"), "left")
        .select($"id", least($"comp", coalesce($"ccomp", $"comp")).as("comp"))
      val compMap2 = jump1.select($"id".as("cid2"), $"comp".as("ccomp2"))
      val jumped = jump1
        .join(compMap2, jump1("comp") === compMap2("cid2"), "left")
        .select($"id", least($"comp", coalesce($"ccomp2", $"comp")).as("comp"))
      // one job: materialize the iteration AND deliver the convergence
      // metric through observe() — no separate driver collect
      val obs = org.apache.spark.sql.Observation()
      val observed = jumped.observe(obs, labelSumCol)
      val truncate = (iter + 1) % checkpointEvery == 0
      val next =
        if (truncate && reliable) observed.checkpoint(true)
        else if (truncate) observed.localCheckpoint(true)
        else { val p = observed.persist(StorageLevel.MEMORY_AND_DISK); p.count(); p }
      val curSum = obs.get.getOrElse("label_sum", null)
      // previous iterations' blocks are dead once `next` is material
      retired.foreach(_.unpersist(false)); retired.clear()
      if (!truncate) retired += next
      labels = next
      converged = curSum == prevSum
      prevSum = curSum
      iter += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(f"[cc] iter=$iter ${(System.nanoTime() - tIter) / 1e9}%.2fs converged=$converged")
    }
    sym.unpersist(false)
    labels.select($"id".as("conv_id"), $"comp".as("cluster_id"))
  }
}
