package graft.tools
import org.apache.spark.scheduler._
import graft.Bench
import scala.collection.mutable

/** Per-stage wall vs task-time profile of the dedup workload. */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0) else "32"
    val input = if (args.length > 1) args(1) else "/tmp/graft_scaling_corpus_20000"
    val spark = Bench.buildSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val stages = mutable.Map.empty[Int, (String, Long, Long, Int)] // id -> (name, taskMs, wallMs, nTasks)
    spark.sparkContext.addSparkListener(new SparkListener {
      val t0 = mutable.Map.empty[Int, Long]
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        t0(s.stageInfo.stageId) = System.currentTimeMillis()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val wall = System.currentTimeMillis() - t0.getOrElse(si.stageId, 0L)
        stages(si.stageId) = (si.name.takeWhile(_ != '\n').take(60),
          si.taskMetrics.executorRunTime, wall, si.numTasks)
      }
    })
    if (!new java.io.File(s"$input/_SUCCESS").exists()) {
      // auto-generate only for the tool's own ..._<nConvs> corpus paths;
      // anything else missing _SUCCESS is a user mistake, not a request
      // to overwrite their directory with synthetic data
      val suffix = "_([0-9]+)$".r.findFirstMatchIn(input)
      require(suffix.isDefined,
        s"$input has no _SUCCESS marker and no trailing _<nConvs> suffix to generate from")
      graft.corpus.CorpusGen.transcripts(spark, suffix.get.group(1).toLong)
        .write.mode("overwrite").parquet(input)
    }
    val t = spark.read.parquet(input)
    t.count()
    Bench.runDedupWorkload(spark, t) // warmup
    stages.clear()
    val secs = Bench.runDedupWorkload(spark, t)
    Thread.sleep(1000)
    val rows = stages.toSeq.sortBy(-_._2._3)
    System.err.println(f"[profile] total=${secs}%.1fs  sum(stage wall)=${rows.map(_._2._3).sum / 1000.0}%.1fs  sum(taskTime)=${rows.map(_._2._2).sum / 1000.0}%.1fs")
    rows.take(25).foreach { case (id, (name, taskMs, wallMs, n)) =>
      System.err.println(f"[profile] stage=$id%4d wall=${wallMs / 1000.0}%6.2fs task=${taskMs / 1000.0}%7.2fs ntasks=$n%4d par=${taskMs.toDouble / math.max(wallMs, 1)}%5.1f  $name")
    }
    spark.stop()
  }
}
