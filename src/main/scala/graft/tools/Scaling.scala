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

    var turns = 0L
    def measureOnce(cpus: Int, warm: Boolean): Double = {
      val spark = Bench.buildSession(cpus.toString)
      spark.sparkContext.setLogLevel("WARN")
      val t = spark.read.parquet(input)
      turns = t.count()
      if (warm) Bench.runDedupWorkload(spark, t.limit(2000))
      val secs = Bench.runDedupWorkload(spark, t)
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      secs
    }

    // interleave sizes over `rounds` passes and take the min per size:
    // damps both JIT warmup and time-varying host noise (a quiet or
    // noisy patch of wall-clock hits both sizes equally)
    val rounds = sys.env.getOrElse("GRAFT_SCALING_ROUNDS", "2").toInt
    val samples = scala.collection.mutable.Map[Int, List[Double]]().withDefaultValue(Nil)
    for (r <- 1 to rounds; cpus <- Seq(n, 4 * n)) {
      val s = measureOnce(cpus, warm = r == 1)
      samples(cpus) = samples(cpus) :+ s
      System.err.println(f"[scaling] round=$r cpus=$cpus secs=$s%.1f")
    }
    val secsN = samples(n).min
    val secs4N = samples(4 * n).min
    val thptN = turns / secsN
    val thpt4N = turns / secs4N
    val eff = thpt4N / (4.0 * thptN)
    def arr(xs: List[Double]) = xs.map(x => f"$x%.1f").mkString("[", ",", "]")
    println(
      s"""{"metric":"scaling_efficiency","value":${f"$eff%.3f"},"unit":"ratio","n_cpus":$n,"n4_cpus":${4 * n},"turns":$turns,"sec_n":${f"$secsN%.3f"},"sec_4n":${f"$secs4N%.3f"},"turns_per_sec_n":${f"$thptN%.1f"},"turns_per_sec_4n":${f"$thpt4N%.1f"},"samples_n":${arr(samples(n))},"samples_4n":${arr(samples(4 * n))},"n_convs":$nConvs}""")
  }
}
