package graft.tools

import org.apache.spark.sql.functions._
import graft.Bench
import graft.operators.ConnectedComponents

/** CC micro-benchmark on a synthetic graph: chains (worst-case
  * diameter) + random cluster stars, sized like a 100k-conv corpus.
  * Compares wall time with whole-stage codegen on vs off inside the
  * loop (the loop itself toggles the conf; here we time the whole run
  * under both session defaults to see which the loop should force). */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 50000
    val cpus = if (args.length > 1) args(1) else "8"
    val spark = Bench.buildSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // 60% star edges (hub i*10 -> members), 40% chain edges of length 16
    val edges = (0 until n).map { i =>
      if (i % 10 != 0) (s"d${(i / 10) * 10}", s"d$i")
      else (s"c${i / 160 * 160}", s"c$i") // chains via coarse hubs
    }.toDF("doc_a", "doc_b").cache()
    edges.count()
    val ckEvery = sys.env.getOrElse("GRAFT_CC_CKEVERY", "1").toInt
    val batch = sys.env.getOrElse("GRAFT_CC_BATCH", "3").toInt
    for (mode <- Seq("warm", "on", "off")) {
      val t0 = System.nanoTime()
      System.setProperty("graft.cc.codegen", (mode != "off").toString)
      val out = ConnectedComponents.run(spark, edges, checkpointEvery = ckEvery, batchIters = batch)
      val c = out.select("cluster_id").distinct().count()
      System.err.println(f"[ccprobe] mode=$mode clusters=$c wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
