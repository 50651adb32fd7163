package graft.tools

import graft.Bench
import graft.operators.DocAssembly

/** Noop-sink isolation (guide §1.4) of the docs() pipeline: times the
  * events scan, the transcripts view (scan + window), and full doc
  * assembly (view + collect/sort/concat aggregate) separately, so the
  * window-sort vs aggregate split is measurable.
  *
  *   sbt "runMain graft.tools.AssemblyProbe /root/testdata/sf0.1 32"
  */
object AssemblyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = Bench.buildSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      System.err.println(f"[aprobe] $name%-18s ${(System.nanoTime() - t0) / 1e9}%6.3fs")
    }
    for (round <- 1 to 3) {
      System.err.println(s"[aprobe] --- round $round ---")
      t("scan")(noop(spark.read.parquet(s"$sfDir/events.parquet")))
      t("view_window")(noop(graft.SparkEntry.transcriptsView(spark, sfDir)))
      t("assemble")(noop(DocAssembly.assemble(spark,
        graft.SparkEntry.transcriptsView(spark, sfDir)).toDF))
    }
    spark.stop()
  }
}
