package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  */
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
    import spark.implicits._
    val store = new TableStore(storeRoot)
    val metricsBuf = scala.collection.mutable.ArrayBuffer.empty[StageMetrics]

    def timed[T](stage: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      metricsBuf += StageMetrics(stage, -1L, -1L, -1L, (System.nanoTime() - t0) / 1000000)
      r
    }

    val docsOut = timed("docs") {
      store.stage(spark, "docs", Seq("docs")) {
        Map("docs" -> DocAssembly.assemble(spark, transcripts).toDF)
      }
    }
    val docs = docsOut("docs").as[Doc]

    val exactOut = timed("exact") {
      store.stage(spark, "exact", Seq("lineage_raw", "unique_turns"),
        Map("lineage_raw" -> LineageLayout)) {
        val turnMap = ExactDedup.dedupTurns(spark, transcripts)
        val lineageRaw = turnMap.select(
          lit("exact").as("stage"),
          $"conv_id", $"turn_idx", $"fp",
          pbucket($"conv_id").as("pbucket"))
        Map(
          "lineage_raw" -> lineageRaw,
          "unique_turns" -> ExactDedup.uniqueTurns(spark, transcripts))
      }
    }

    val pairsOut = timed("pairs") {
      store.stage(spark, "pairs", Seq("dup_pairs")) {
        val exactPairs = ExactDedup.docDupPairs(spark, docs.toDF)
        val mh = MinHashLSH.dupPairs(spark, docs, cfg).toDF
        val sh = SimHashDetector.dupPairs(spark, docs, cfg).toDF
        val ss = SubstringDetector.dupPairs(spark, docs, cfg).toDF
        Map("dup_pairs" -> exactPairs.unionByName(mh).unionByName(sh).unionByName(ss))
      }
    }

    val clustersOut = timed("clusters") {
      store.stage(spark, "clusters", Seq("clusters"),
        Map("clusters" -> ClustersLayout)) {
        // substring edges link docs that merely SHARE a block — they are
        // duplication lineage, not whole-doc duplicates, so whole-doc
        // clustering uses the exact/minhash/simhash detectors only.
        val wholeDocPairs = pairsOut("dup_pairs")
          .filter($"detector" =!= "substring")
          .as[DupPair]
        Map("clusters" -> Clustering.assign(spark, docs, wholeDocPairs, cfg).toDF
          .withColumn("pbucket", pbucket($"conv_id")))
      }
    }

    // per-turn lineage with cluster_id backfilled from the clusters
    // stage — the complete recipe row. Broadcast when the cluster map is
    // small; at corpus scale both sides are bucketed on conv_id hash.
    val lineageOut = timed("lineage") {
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
            $"pbucket"))
      }
    }

    val restoreOut = timed("restore") {
      store.stage(spark, "restore", Seq("restored"),
        Map("restored" -> RestoredLayout)) {
        Map("restored" -> Restore.restore(
          spark, lineageOut("lineage"), exactOut("unique_turns"))
          .withColumn("pbucket", pbucket($"conv_id")))
      }
    }

    val metrics = timed("metrics") {
      store.stage(spark, "metrics", Seq("metrics")) {
        Map("metrics" -> spark.createDataFrame(metricsBuf.toSeq))
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
