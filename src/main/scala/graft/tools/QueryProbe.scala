package graft.tools

import org.apache.spark.scheduler._
import graft.Bench
import scala.collection.mutable

/** Per-stage wall vs task-time profile of ONE headline bench query
  * (by name), over a testdata SF dir. Same listener shape as
  * [[ProfileProbe]] but scoped to a single query so a detector's
  * shuffle/sort/verify split is readable.
  *
  *   sbt "runMain graft.tools.QueryProbe simhash_pairs /root/testdata/sf0.1 32"
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val qname = if (args.length > 0) args(0) else "simhash_pairs"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = Bench.buildSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val stages = mutable.Map.empty[Int, (String, Long, Long, Int)]
    val details = mutable.Map.empty[Int, String]
    spark.sparkContext.addSparkListener(new SparkListener {
      val t0 = mutable.Map.empty[Int, Long]
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        t0(s.stageInfo.stageId) = System.currentTimeMillis()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val wall = System.currentTimeMillis() - t0.getOrElse(si.stageId, 0L)
        val tm = si.taskMetrics
        stages(si.stageId) = (
          f"in=${tm.inputMetrics.recordsRead}%d shRead=${tm.shuffleReadMetrics.recordsRead}%d shWrite=${tm.shuffleWriteMetrics.recordsWritten}%d  ${si.name.takeWhile(_ != '\n').take(40)}",
          tm.executorRunTime, wall, si.numTasks)
        details(si.stageId) = si.rddInfos.map(r =>
          s"${r.id}:${r.name}@${r.callSite.takeWhile(_ != '\n').take(60)}").mkString(" | ")
      }
    })
    val fn = Bench.headline(spark, sfDir).toMap.apply(qname)
    fn() // warm
    fn() // warm 2
    stages.clear()
    val t0 = System.nanoTime()
    val rows = fn()
    val secs = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    val rs = stages.toSeq.sortBy(_._1)
    System.err.println(f"[qprobe] $qname rows=$rows wall=$secs%.2fs  sum(stage wall)=${rs.map(_._2._3).sum / 1000.0}%.1fs sum(task)=${rs.map(_._2._2).sum / 1000.0}%.1fs")
    rs.foreach { case (id, (name, taskMs, wallMs, n)) =>
      System.err.println(f"[qprobe] stage=$id%4d wall=${wallMs / 1000.0}%6.2fs task=${taskMs / 1000.0}%7.2fs ntasks=$n%4d par=${taskMs.toDouble / math.max(wallMs, 1)}%5.1f  $name")
    }
    // RDD lineage of the costliest stages (identifies which operator a
    // generic AQE-materialization stage actually executes)
    rs.sortBy(-_._2._2).take(6).foreach { case (id, _) =>
      System.err.println(s"[qprobe] detail stage=$id ${details.getOrElse(id, "?")}")
    }
    spark.stop()
  }
}
