package graft.operators

import org.apache.spark.sql.functions._
import graft.Bench
import graft.DupPair

/** Phase-by-phase timing of the bench's cluster_assign body (docs cache,
  * fused-sweep internals, exact pairs, CC, label/represent) plus the
  * physical join strategies of the fused verification joins — locates
  * which sub-plan carries the query's wall time and whether the sig
  * attachments broadcast or sort-merge.
  *
  *   sbt "runMain graft.tools.ClusterAssignProbe /root/testdata/sf0.1 32"
  */
object ClusterAssignProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = Bench.buildSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val cfg = graft.DedupConfig.default
    graft.plans.GraftFunctions.register(spark)

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[caprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3fs")
      r
    }

    for (round <- 1 to 3) {
      System.err.println(s"[caprobe] --- round $round ---")
      val d = t("docs_cache_count") {
        val d0 = DocAssembly.assemble(spark, graft.SparkEntry.transcriptsView(spark, sfDir))
          .repartition(spark.sparkContext.defaultParallelism * 4).cache()
        d0.count()
        d0
      }
      // fused internals, step by step (mirrors FusedDetectors.dupPairs
      // withSubstring = true)
      val sigs0 = FusedDetectors.signatures3(spark, d, cfg).cache()
      t("sig3_count")(sigs0.count())
      val sigs = org.apache.spark.sql.GraftPlanBridge.planBoundary(sigs0.toDF)
      val cands = t("cands_count") {
        val c = PairSweep.pairs(spark,
          FusedDetectors.taggedKeys(sigs, cfg, Seq("conv_id")), cfg.bucketCap)
          .dropDuplicates("doc_a", "doc_b", "k3")
          .cache()
        c.count()
        c
      }
      val verified = FusedDetectors.verifyPairs(cands, sigs, cfg, FusedDetectors.DefaultSlack)
      if (round == 1) {
        val joins = verified.queryExecution.executedPlan.toString.linesIterator
          .filter(l => l.contains("Join") || l.contains("Exchange"))
          .take(20).toList
        joins.foreach(l => System.err.println(s"[caprobe][plan] ${l.trim.take(150)}"))
      }
      t("verify_count")(verified.count())
      val all = verified.unionAll(cands
        .filter(col("k3") === 2L)
        .select(col("doc_a"), col("doc_b"), lit("substring").as("detector"), lit(1.0).as("score")))
      val fusedOut = t("fused_checkpoint")(all.as[DupPair].localCheckpoint(true))
      sigs0.unpersist(false)
      cands.unpersist(false)
      val pairs = ExactDedup.docDupPairs(spark, d.toDF).as[DupPair].unionByName(fusedOut)
      val assigns = t("cc_total")(Clustering.assign(spark, d, pairs, cfg))
      t("assign_count")(assigns.count())
      d.unpersist(false)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
