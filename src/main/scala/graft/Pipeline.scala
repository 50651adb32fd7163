package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.TableStore

/** End-to-end dedup pipeline orchestration: the engine's `main()`
  * (reference analog: the mode dispatch in
  * /root/reference/src/optsmr.c:193-358), expressed as committed stages
  * over a TableStore so a killed run resumes from the last committed
  * stage (north_rule resumability).
  *
  * Stages (each = one atomic commit of its output tables + metrics):
  *   docs        turns → per-conversation documents
  *   exact       turn-level fingerprint dedup: lineage + unique store
  *   pairs       doc-level dup pairs from all detectors
  *   clusters    connected components + representatives
  *   restore     corpus rebuilt from lineage ⋈ unique store
  */
object Pipeline {

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
      store.stage(spark, "exact", Seq("lineage", "unique_turns")) {
        val turnMap = ExactDedup.dedupTurns(spark, transcripts)
        val lineage = turnMap.select(
          lit("exact").as("stage"),
          $"conv_id", $"turn_idx", $"fp",
          lit(null).cast("string").as("cluster_id"))
        Map(
          "lineage" -> lineage,
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
      store.stage(spark, "clusters", Seq("clusters")) {
        // substring edges link docs that merely SHARE a block — they are
        // duplication lineage, not whole-doc duplicates, so whole-doc
        // clustering uses the exact/minhash/simhash detectors only.
        val wholeDocPairs = pairsOut("dup_pairs")
          .filter($"detector" =!= "substring")
          .as[DupPair]
        Map("clusters" -> Clustering.assign(spark, docs, wholeDocPairs, cfg).toDF)
      }
    }

    val restoreOut = timed("restore") {
      store.stage(spark, "restore", Seq("restored")) {
        Map("restored" -> Restore.restore(
          spark, exactOut("lineage"), exactOut("unique_turns")))
      }
    }

    val metrics = timed("metrics") {
      store.stage(spark, "metrics", Seq("metrics")) {
        Map("metrics" -> spark.createDataFrame(metricsBuf.toSeq))
      }
    }

    Result(
      docs = docsOut("docs"),
      lineage = exactOut("lineage"),
      uniqueTurns = exactOut("unique_turns"),
      dupPairs = pairsOut("dup_pairs"),
      clusters = clustersOut("clusters"),
      restored = restoreOut("restored"),
      metrics = metrics("metrics"))
  }
}
