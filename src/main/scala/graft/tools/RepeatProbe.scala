package graft.tools
import graft.Bench
object RepeatProbe {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0) else "32"
    val spark = Bench.buildSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val t = spark.read.parquet(if (args.length > 1) args(1) else "/tmp/graft_scaling_corpus_20000")
    t.count()
    for (i <- 1 to 3) {
      val secs = Bench.runDedupWorkload(spark, t)
      val gc = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      var gcMs = 0L
      gc.forEach(b => gcMs += b.getCollectionTime)
      System.err.println(f"[repeat] run$i $secs%.1fs cumGC=${gcMs / 1000.0}%.1fs")
    }
    spark.stop()
  }
}
