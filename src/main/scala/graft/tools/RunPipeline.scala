package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{DedupConfig, Pipeline}
import graft.corpus.CorpusGen

/** CLI entry: run the full dedup pipeline end-to-end on the
  * deterministic synthetic corpus and print per-stage results.
  *
  *   sbt "runMain graft.tools.RunPipeline <nConvs> <storeDir> [cpus]"
  *
  * Re-running with the same storeDir resumes from the last committed
  * stage (TableStore manifests).
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 500L
    val store = if (args.length > 1) args(1) else "/tmp/graft_store"
    val cpus = if (args.length > 2) args(2) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxPlanStringLength", "1048576")
      // one shuffle file per map task at any width (see Bench.buildSession)
      .config("spark.shuffle.sort.bypassMergeThreshold", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val transcripts = CorpusGen.transcripts(spark, n).toDF
    val res = Pipeline.run(spark, transcripts, store, DedupConfig.default)
    val nTurns = transcripts.count()
    val nDocs = res.docs.count()
    val nPairs = res.dupPairs.count()
    val nClusters = res.clusters.select("cluster_id").distinct().count()
    val mismatches = graft.operators.Restore
      .mismatchCount(spark, transcripts, res.restored)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"pipeline: convs=$nDocs turns=$nTurns dup_pairs=$nPairs " +
      f"clusters=$nClusters restore_mismatches=$mismatches " +
      f"wall=$secs%.1fs turns_per_sec=${nTurns / secs}%.0f")
    res.metrics.orderBy("stage").show(20, false)
    spark.stop()
  }
}
