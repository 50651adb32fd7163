package graft

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.{Layout, TableStore}

/** End-to-end dedup pipeline orchestration: the engine's `main()`
  * (reference analog: the mode dispatch in
  * /root/reference/src/optsmr.c:193-358), expressed as committed stages
  * over a TableStore so a killed run resumes from the last committed
  * stage (north_rule resumability).
  *
  * Stages (each = one atomic commit of its output tables + metrics):
  *   docs        turns → per-conversation documents
  *   exact       turn-level fingerprint dedup: raw lineage + unique store
  *   pairs       doc-level dup pairs from all detectors
  *   clusters    connected components + representatives
  *   lineage     per-turn lineage backfilled with cluster_id — the full
  *               "recipe" row (conv_id, turn_idx, fp, cluster_id), the
  *               reference's recipe-carries-location semantic
  *               (/root/reference/src/metadata.h:18-31, metadata.c:91-95)
  *   restore     corpus rebuilt from lineage ⋈ unique store
  *
  * Physical layout (T11/R4): lineage, clusters and restored are
  * hash-partitioned on `pbucket` (a stable 64-way hash of conv_id — a
  * conversation lives in exactly one partition, so a point write patches
  * one directory); restored rows are sorted by (conv_id, turn_idx)
  * within files.
  *
  * Metrics (R12, reference counter discipline
  * /root/reference/src/optsmr.c:316-332): every stage's
  * rows_in/rows_out/dup_pairs ride the stage's own write job as
  * `observe()` metrics — no extra pass over the data. On a RESUMED
  * (already-committed) stage the body never runs, so every counter is
  * re-derived from the COMMITTED tables (zero-column counts / one
  * boolean-column scan) — a resumed run's metrics table carries no -1
  * placeholders anywhere.
  */
/** Shared stage-metrics discipline for committed pipelines
  * ([[Pipeline]], [[CurationPipeline]]): run one stage, record its
  * counters. `obs` is attached to the stage's primary output inside the
  * body, so the counters ride the write job; `resumedFallback` supplies
  * (rows_in, rows_out, dup_pairs) when the stage was skipped as
  * already-committed (re-derived from the committed tables — no -1
  * placeholders, fresh or resumed). */
private[graft] final class StageRecorder(
    store: TableStore,
    metricsBuf: scala.collection.mutable.ArrayBuffer[StageMetrics]) {

  def timed[T](stage: String, obs: Observation)(
      resumedFallback: => (Long, Long, Long))(body: => T): T = {
    val resumed = store.isCommitted(stage)
    val t0 = System.nanoTime()
    val r = body
    val wall = (System.nanoTime() - t0) / 1000000
    // obs.get blocks until the metric arrives — safe only when the
    // stage body actually executed (its write delivered the metric)
    val m: Map[String, Any] = if (resumed) Map.empty else obs.get
    def metric(k: String): Long = m.get(k) match {
      case Some(n: Number) => n.longValue
      case Some(_) => 0L // SQL NULL: sum() over a zero-row write
      case None => -1L // metric key genuinely missing
    }
    val (ri, ro, dp) =
      if (m.nonEmpty) (metric("rows_in"), metric("rows_out"), metric("dup_pairs"))
      else resumedFallback
    metricsBuf += StageMetrics(stage, ri, ro, dp, wall)
    r
  }
}

object Pipeline {

  /** Stable partition key: one conversation ⇒ one bucket. */
  val NumBuckets = 64
  def pbucket(convId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(convId), lit(NumBuckets.toLong)).cast("int")

  val LineageLayout: Layout = Layout(Seq("pbucket"), Seq("conv_id", "turn_idx"))
  val ClustersLayout: Layout = Layout(Seq("pbucket"), Seq("conv_id"))
  val RestoredLayout: Layout = Layout(Seq("pbucket"), Seq("conv_id", "turn_idx"))

  final case class Result(
      docs: DataFrame,
      lineage: DataFrame,
      uniqueTurns: DataFrame,
      dupPairs: DataFrame,
      clusters: DataFrame,
      restored: DataFrame,
      metrics: DataFrame)

  def run(
      spark: SparkSession,
      transcripts: DataFrame,
      storeRoot: String,
      cfg: DedupConfig = DedupConfig.default): Result = {
    val store = new TableStore(storeRoot)
    val metricsBuf = scala.collection.mutable.ArrayBuffer.empty[StageMetrics]

    // reliable-checkpoint home for the CC loop (and any other iterative
    // op): store-relative and PER-RUN, so (a) a real cluster gets
    // fault-tolerant truncation instead of a silent localCheckpoint
    // fallback, (b) a session running pipelines against several stores
    // never writes one store's recovery data into another (the dir is
    // re-pointed every run, not only when unset), and (c) the files —
    // dead once every stage is committed to parquet — are deleted in a
    // finally (a KILLED run must not leak its dir: killed runs are the
    // resume scenario's whole premise) and any stale run_* siblings a
    // previous crash left behind are swept at startup. Deletion goes
    // through the Hadoop FileSystem resolved from the path, so a
    // non-local storeRoot (hdfs://, s3a://) is cleaned just the same —
    // java.io.File would silently delete nothing there. Concurrent
    // pipelines against the SAME store are unsupported anyway (manifest
    // commits would race), so the sweep cannot hit a live run's dir.
    val hadoopConf = spark.sessionState.newHadoopConf()
    val ckptParent = new org.apache.hadoop.fs.Path(storeRoot, "_checkpoints")
    val fs = ckptParent.getFileSystem(hadoopConf)
    if (fs.exists(ckptParent))
      fs.listStatus(ckptParent)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("run_"))
        .foreach(st => fs.delete(st.getPath, true))
    val ckptDir = new org.apache.hadoop.fs.Path(ckptParent, s"run_${System.nanoTime()}")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    try runStages(spark, transcripts, store, cfg, metricsBuf)
    finally fs.delete(ckptDir, true)
  }

  private def runStages(
      spark: SparkSession,
      transcripts: DataFrame,
      store: TableStore,
      cfg: DedupConfig,
      metricsBuf: scala.collection.mutable.ArrayBuffer[StageMetrics]): Result = {
    import spark.implicits._

    val recorder = new StageRecorder(store, metricsBuf)
    def timed[T](stage: String, obs: Observation)(
        resumedFallback: => (Long, Long, Long))(body: => T): T =
      recorder.timed(stage, obs)(resumedFallback)(body)
    /** Zero-column count of an already-committed table (cheap scan). */
    def committedCount(stage: String, table: String): Long =
      store.read(spark, stage, table).count()

    val obsDocs = Observation()
    val docsOut = timed("docs", obsDocs)({
      // rows_in (turns folded into docs) is the committed docs table's
      // n_turns sum — a one-column scan, no transcript re-read;
      // coalesce: the sum is SQL NULL over an empty committed table
      val committed = store.read(spark, "docs", "docs")
      val ri = committed.agg(coalesce(sum($"n_turns"), lit(0L)).cast("long"))
        .as[Long].head()
      (ri, committed.count(), 0L)
    }) {
      store.stage(spark, "docs", Seq("docs")) {
        // rows_in = turns folded into docs; rows_out = conversations
        Map("docs" -> DocAssembly.assemble(spark, transcripts).toDF
          .observe(obsDocs,
            sum($"n_turns").cast("long").as("rows_in"),
            count(lit(1)).as("rows_out"),
            lit(0L).cast("long").as("dup_pairs")))
      }
    }
    val docs = docsOut("docs").as[Doc]

    val obsExact = Observation()
    val exactOut = timed("exact", obsExact)({
      val ri = committedCount("exact", "lineage_raw")
      val ro = committedCount("exact", "unique_turns")
      (ri, ro, ri - ro)
    }) {
      store.stage(spark, "exact", Seq("lineage_raw", "unique_turns"),
        Map("lineage_raw" -> LineageLayout)) {
        val turnMap = ExactDedup.dedupTurns(spark, transcripts)
          // observe BEFORE the projection drops is_unique: rows_in =
          // turns scanned, rows_out = unique turns stored, dup_pairs =
          // turns deduplicated away (the reference's dup/unique chunk
          // counters, optsmr.c:316-332)
          .observe(obsExact,
            count(lit(1)).as("rows_in"),
            sum(when($"is_unique", 1L).otherwise(0L)).as("rows_out"),
            sum(when($"is_unique", 0L).otherwise(1L)).as("dup_pairs"))
        val lineageRaw = turnMap.select(
          lit("exact").as("stage"),
          $"conv_id", $"turn_idx", $"fp",
          pbucket($"conv_id").as("pbucket"))
        Map(
          "lineage_raw" -> lineageRaw,
          "unique_turns" -> ExactDedup.uniqueTurns(spark, transcripts))
      }
    }

    // rows_in for the pairs stage = documents scanned by the detectors —
    // already counted by the docs stage (its rows_out), fresh or resumed;
    // no extra job
    val docsRowsIn = metricsBuf.find(_.stage == "docs").map(_.rows_out).getOrElse(-1L)
    val obsPairs = Observation()
    val pairsOut = timed("pairs", obsPairs)({
      val n = committedCount("pairs", "dup_pairs"); (docsRowsIn, n, n)
    }) {
      store.stage(spark, "pairs", Seq("dup_pairs")) {
        val exactPairs = ExactDedup.docDupPairs(spark, docs.toDF)
        // minhash+simhash+substring run as ONE fused sweep (one
        // tokenization pass, one tagged key exchange for all three) —
        // row-identical to the standalone detectors' union; the
        // substring keys stay a structurally disjoint 128-bit space
        // via the sweep's tag column
        val fused = FusedDetectors.dupPairs(spark, docs, cfg,
          withSubstring = true).toDF
        Map("dup_pairs" -> exactPairs.unionByName(fused)
          .observe(obsPairs,
            lit(docsRowsIn).cast("long").as("rows_in"),
            count(lit(1)).as("rows_out"),
            count(lit(1)).as("dup_pairs")))
      }
    }

    // rows_in for clusters = dup pairs actually FED to CC — the stage
    // filters substring edges out below, so the pairs stage's rows_out
    // would overstate it by the substring share. pairsOut reads the
    // committed table, so this count is a cheap parquet scan of the
    // (tiny) pairs table, fresh or resumed.
    val pairsRowsIn = pairsOut("dup_pairs")
      .filter($"detector" =!= "substring").count()
    val obsClusters = Observation()
    val clustersOut = timed("clusters", obsClusters)({
      // dup_pairs (non-representative members) is derivable from the
      // committed table itself — one cheap boolean-column scan
      val committed = store.read(spark, "clusters", "clusters")
      (pairsRowsIn, committed.count(),
        committed.filter(!$"is_representative").count())
    }) {
      store.stage(spark, "clusters", Seq("clusters"),
        Map("clusters" -> ClustersLayout)) {
        // substring edges link docs that merely SHARE a block — they are
        // duplication lineage, not whole-doc duplicates, so whole-doc
        // clustering uses the exact/minhash/simhash detectors only.
        val wholeDocPairs = pairsOut("dup_pairs")
          .filter($"detector" =!= "substring")
          .as[DupPair]
        // rows_out = assignments; dup_pairs = non-representative members
        // (docs folded into another doc's cluster)
        Map("clusters" -> Clustering.assign(spark, docs, wholeDocPairs, cfg).toDF
          .withColumn("pbucket", pbucket($"conv_id"))
          .observe(obsClusters,
            lit(pairsRowsIn).cast("long").as("rows_in"),
            count(lit(1)).as("rows_out"),
            sum(when($"is_representative", 0L).otherwise(1L)).as("dup_pairs")))
      }
    }

    // per-turn lineage with cluster_id backfilled from the clusters
    // stage — the complete recipe row. Broadcast when the cluster map is
    // small; at corpus scale both sides are bucketed on conv_id hash.
    val obsLineage = Observation()
    val lineageOut = timed("lineage", obsLineage)({
      // the fresh path reports rows_in = rows scanned = lineage_raw rows
      // (the left join is row-preserving), so the resumed value is the
      // committed upstream table's count — same trick as pairsRowsIn
      (committedCount("exact", "lineage_raw"),
        committedCount("lineage", "lineage"), 0L)
    }) {
      store.stage(spark, "lineage", Seq("lineage"),
        Map("lineage" -> LineageLayout)) {
        val clusterMap = clustersOut("clusters").select($"conv_id", $"cluster_id")
        Map("lineage" -> exactOut("lineage_raw")
          .drop("stage")
          .join(clusterMap, Seq("conv_id"), "left")
          .select(
            lit("lineage").as("stage"),
            $"conv_id", $"turn_idx", $"fp",
            coalesce($"cluster_id", $"conv_id").as("cluster_id"),
            $"pbucket")
          .observe(obsLineage,
            count(lit(1)).as("rows_in"),
            count(lit(1)).as("rows_out"),
            lit(0L).cast("long").as("dup_pairs")))
      }
    }

    val obsRestore = Observation()
    val restoreOut = timed("restore", obsRestore)({
      // fresh path observes rows_in = rows_out on the restored output
      val n = committedCount("restore", "restored")
      (n, n, 0L)
    }) {
      store.stage(spark, "restore", Seq("restored"),
        Map("restored" -> RestoredLayout)) {
        Map("restored" -> Restore.restore(
          spark, lineageOut("lineage"), exactOut("unique_turns"))
          .withColumn("pbucket", pbucket($"conv_id"))
          .observe(obsRestore,
            count(lit(1)).as("rows_in"),
            count(lit(1)).as("rows_out"),
            lit(0L).cast("long").as("dup_pairs")))
      }
    }

    val obsMetrics = Observation()
    val metrics = timed("metrics", obsMetrics)(
      (metricsBuf.size.toLong, metricsBuf.size.toLong, 0L)) {
      store.stage(spark, "metrics", Seq("metrics")) {
        // the observation must be attached here too: timed() blocks on
        // obs.get whenever the stage body executes
        Map("metrics" -> spark.createDataFrame(metricsBuf.toSeq)
          .observe(obsMetrics,
            count(lit(1)).cast("long").as("rows_in"),
            count(lit(1)).cast("long").as("rows_out"),
            lit(0L).cast("long").as("dup_pairs")))
      }
    }

    Result(
      docs = docsOut("docs"),
      lineage = lineageOut("lineage"),
      uniqueTurns = exactOut("unique_turns"),
      dupPairs = pairsOut("dup_pairs"),
      clusters = clustersOut("clusters"),
      restored = restoreOut("restored"),
      metrics = metrics("metrics"))
  }
}
