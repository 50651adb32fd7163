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
  * one pointer-jumping step comp(v) ← comp(comp(v)) which halves path
  * lengths, giving O(log d) convergence on diameter-d components.
  * Lineage is truncated every `ccCheckpointEvery` iterations
  * (localCheckpoint here; set `spark.sparkContext.setCheckpointDir` and
  * swap to `.checkpoint()` for fault-tolerant cluster runs).
  *
  * Skew: star-capped candidate generation upstream keeps component
  * diameter small; the groupBy(dst) min-aggregation is a partial
  * (map-side) aggregate so a mega-cluster's fan-in is combined before
  * the shuffle.
  */
object ConnectedComponents {

  /** edges: DataFrame with string columns (doc_a, doc_b).
    * @return (conv_id, cluster_id) where cluster_id = min member id. */
  def run(spark: SparkSession, edges: DataFrame, maxIters: Int = 25, checkpointEvery: Int = 1): DataFrame = {
    import spark.implicits._
    // label tables are tiny relative to the corpus; AQE's per-shuffle
    // re-planning adds fixed latency to every one of the loop's jobs —
    // turn it off for the loop, restore afterwards
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try runLoop(spark, edges, maxIters, checkpointEvery)
    finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  private def runLoop(spark: SparkSession, edges: DataFrame, maxIters: Int, checkpointEvery: Int): DataFrame = {
    import spark.implicits._
    val sym = edges
      .select($"doc_a".as("src"), $"doc_b".as("dst"))
      .union(edges.select($"doc_b".as("src"), $"doc_a".as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = sym
      .select($"src".as("id"))
      .distinct()
      .withColumn("comp", $"id")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // convergence detection: labels only ever decrease, so the
    // fixpoint is reached exactly when the label-hash sum is unchanged
    // — ONE cheap aggregate per iteration instead of a self-join diff
    // decimal(38,0) accumulator: Long sum would overflow (ANSI throws)
    def labelSum(df: DataFrame): java.math.BigDecimal = df
      .agg(sum(xxhash64($"comp").cast("decimal(38,0)")))
      .collect()(0).getDecimal(0)

    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    val tStart = System.nanoTime()
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
      // pointer jump: comp(v) ← comp(comp(v))
      val compMap = propagated.select($"id".as("cid"), $"comp".as("ccomp"))
      var next = propagated
        .join(compMap, propagated("comp") === compMap("cid"), "left")
        .select($"id", least($"comp", coalesce($"ccomp", $"comp")).as("comp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // truncate lineage BEFORE the convergence check — the iterative
      // plan otherwise doubles per iteration (each step references the
      // previous labels twice) and analysis alone becomes exponential
      if ((iter + 1) % checkpointEvery == 0) next = next.localCheckpoint(true)
      val curSum = labelSum(next)
      labels.unpersist(false)
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
