package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Bench
import graft.corpus.CorpusGen

/** Two-parallelism scaling evidence (BASELINE.json north_rule: ≥0.8
  * throughput scaling efficiency from N to 4N executors; sandbox
  * stand-in per the driver instruction = the same job at local[N] and
  * local[4N] on identical input).
  *
  *   sbt "runMain graft.tools.Scaling [nConvs] [N]"   (defaults 30000, 8)
  *
  * The input is the deterministic synthetic corpus materialized to
  * parquet ONCE, then the identical dedup workload (doc assembly, turn
  * dedup, all detectors, clustering, restore) runs at local[N] and
  * local[4N]. Prints one JSON line with throughput at both sizes and
  * efficiency = thpt(4N) / (4 × thpt(N)).
  */
object Scaling {
  def main(args: Array[String]): Unit = {
    val nConvs = if (args.length > 0) args(0).toLong else 30000L
    val n = if (args.length > 1) args(1).toInt else 8
    val input = s"/tmp/graft_scaling_corpus_$nConvs"

    // materialize the corpus once (not timed)
    if (!new java.io.File(s"$input/_SUCCESS").exists()) {
      val s0 = Bench.buildSession("32")
      s0.sparkContext.setLogLevel("WARN")
      CorpusGen.transcripts(s0, nConvs).write.mode("overwrite").parquet(input)
      s0.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }

    def measure(cpus: Int): (Double, Long) = {
      val spark = Bench.buildSession(cpus.toString)
      spark.sparkContext.setLogLevel("WARN")
      val t = spark.read.parquet(input)
      val nTurns = t.count()
      // warmup: classload/JIT the whole operator surface on a slice
      Bench.runDedupWorkload(spark, t.limit(2000))
      // min of two measured runs damps JIT/scheduler jitter
      val secs = math.min(
        Bench.runDedupWorkload(spark, t),
        Bench.runDedupWorkload(spark, t))
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      (secs, nTurns)
    }

    val (secsN, turns) = measure(n)
    val (secs4N, _) = measure(4 * n)
    val thptN = turns / secsN
    val thpt4N = turns / secs4N
    val eff = thpt4N / (4.0 * thptN)
    println(
      s"""{"metric":"scaling_efficiency","value":${f"$eff%.3f"},"unit":"ratio","n_cpus":$n,"n4_cpus":${4 * n},"turns":$turns,"sec_n":${f"$secsN%.3f"},"sec_4n":${f"$secs4N%.3f"},"turns_per_sec_n":${f"$thptN%.1f"},"turns_per_sec_4n":${f"$thpt4N%.1f"},"n_convs":$nConvs}""")
  }
}
