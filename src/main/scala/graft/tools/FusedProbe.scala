package graft.tools

import org.apache.spark.sql.functions._
import graft.Bench
import graft.operators._

/** Times each sub-plan of the fused detector sweep separately (sig
  * kernel, each key explode, the pair sweep) to locate CPU cost. */
object FusedProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = Bench.buildSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val stages = scala.collection.mutable.Map.empty[Int, (Long, Int, Long, Long)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        stages.synchronized { stages(si.stageId) =
          (si.taskMetrics.executorRunTime, si.numTasks,
           si.taskMetrics.shuffleReadMetrics.recordsRead,
           si.taskMetrics.shuffleWriteMetrics.recordsWritten) }
      }
    })
    def dumpStages(tag: String): Unit = {
      Thread.sleep(300)
      stages.synchronized {
        stages.toSeq.sortBy(_._1).foreach { case (id, (cpu, n, sr, sw)) =>
          if (cpu > 1000) System.err.println(f"[fstage] $tag stage=$id cpu=${cpu / 1000.0}%.1fs ntasks=$n shRead=$sr shWrite=$sw")
        }
        stages.clear()
      }
    }
    val cfg = graft.DedupConfig.default
    graft.plans.GraftFunctions.register(spark)
    val docs = DocAssembly.assemble(spark, graft.SparkEntry.transcriptsView(spark, sfDir))
      .repartition(spark.sparkContext.defaultParallelism * 4).cache()
    docs.count()
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      System.err.println(f"[fprobe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    // in-process sampling profiler: aggregates top-of-stack frames of
    // executor task threads while `f` runs (external jstack attach is
    // unavailable in this sandbox)
    def sampled(name: String)(f: => Long): Unit = {
      val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      @volatile var on = true
      val sampler = new Thread(() => {
        while (on) {
          val all = Thread.getAllStackTraces
          all.forEach { (th, st) =>
            if (th.getName.startsWith("Executor task launch") && st.nonEmpty) {
              // first non-Thread frame plus one anchor frame deeper
              val top = st.iterator.take(8).map(e => s"${e.getClassName}.${e.getMethodName}")
                .find(fr => !fr.startsWith("java.lang.Thread") && !fr.startsWith("jdk.internal"))
                .getOrElse("?")
              counts.merge(s"${th.getState} $top", 1, (a, b) => a + b)
            }
          }
          Thread.sleep(5)
        }
      })
      sampler.setDaemon(true); sampler.start()
      t(name)(f)
      on = false; sampler.join(200)
      import scala.jdk.CollectionConverters._
      counts.asScala.toSeq.sortBy(-_._2).take(14).foreach { case (fr, c) =>
        System.err.println(s"[fsample] $name $c  $fr")
      }
    }
    for (round <- 1 to 3) {
      System.err.println(s"[fprobe] --- round $round ---")
      val sigs = FusedDetectors.signatures(spark, docs, cfg).cache()
      t("sigs.count")(sigs.count())
      t("mh_keys")(sigs.select(explode(call_function("graft_band_hashes", $"sig",
        lit(cfg.bands), lit(cfg.rowsPerBand))).as("k1")).count())
      t("sh_keys")(sigs.select(explode(call_function("graft_ball_keys", $"simhash",
        lit(cfg.simhashBlocks))).as("k1")).count())
      val mhK = sigs.select(explode(call_function("graft_band_hashes", $"sig",
        lit(cfg.bands), lit(cfg.rowsPerBand))).as("k1"), lit(0L).as("k2"),
        lit(0L).as("k3"), $"conv_id")
      val shK = sigs.select(explode(call_function("graft_ball_keys", $"simhash",
        lit(cfg.simhashBlocks))).as("k1"), lit(0L).as("k2"),
        lit(1L).as("k3"), $"conv_id")
      dumpStages("pre")
      sampled("pair_sweep")(PairSweep.pairs(spark, mhK.unionAll(shK), cfg.bucketCap).count())
      dumpStages("pair_sweep")
      sampled("fused_total")(FusedDetectors.dupPairs(spark, docs, cfg).count())
      dumpStages("fused_total")
      sigs.unpersist(true)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
