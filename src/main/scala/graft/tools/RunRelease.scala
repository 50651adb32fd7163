package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{CurationPipeline, Pipeline}
import graft.corpus.CorpusGen
import graft.operators.DocAssembly

/** The full RELEASE run, end to end: raw transcripts → committed dedup
  * pipeline (docs → exact → detectors → clusters → restore-verified) →
  * one representative document per cluster → committed curation
  * pipeline (verdict → optional cross-conversation duplicate-TURN cut →
  * span cut → metrics). Composes [[Pipeline]] and [[CurationPipeline]]
  * against two sub-stores of one root, so a kill anywhere resumes from
  * the last committed stage of whichever pipeline it fell in.
  *
  *   sbt "runMain graft.tools.RunRelease 2000 /tmp/graft_release 8 2"
  *
  * The 4th arg (optional) enables the line-dedup stage with that
  * boilerplate document frequency. Representative docs are re-framed
  * with one TURN per LINE (the assembly separator becomes '\n'), so
  * line-level dedup is literally "cut turns duplicated across
  * conversations" — the transcript-native boilerplate cut (repeated
  * tool dumps, canned greetings). bench = every ~97th doc by id hash
  * (the deterministic eval-set convention).
  *
  * The 5th arg (optional) cuts shared conversation PREFIXES of at
  * least that many turns before the dedup pipeline runs
  * ([[graft.operators.PrefixDedup]]: system-prompt / replayed-head
  * duplication — first writer keeps its head, every later copy loses
  * exactly the shared turns, an exact replay vanishes). The cut
  * transcripts are a COMMITTED store stage of their own
  * (`$store/prefix`), so the detection sweep runs once — the dedup
  * pipeline's several consumers read the committed table instead of
  * re-deriving the cut — and a resumed run skips it entirely; the
  * pipeline's restore-equality gate verifies against the CUT frame.
  */
object RunRelease {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000L
    val store = if (args.length > 1) args(1) else "/tmp/graft_release"
    val cpus = if (args.length > 2) args(2) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val lineDf = if (args.length > 3) Some(args(3).toLong) else None
    val prefixMinTurns = if (args.length > 4) Some(args(4).toInt) else None
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-release")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.shuffle.sort.bypassMergeThreshold", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val t0 = System.nanoTime()

    val raw = CorpusGen.transcripts(spark, n).toDF
    val transcripts = prefixMinTurns.fold(raw) { mt =>
      val pstore = new graft.sources.TableStore(s"$store/prefix")
      pstore.stage(spark, "prefix_cut", Seq("transcripts"),
        Map("transcripts" -> graft.sources.Layout(
          Seq("pbucket"), Seq("conv_id", "turn_idx")))) {
        Map("transcripts" ->
          graft.operators.PrefixDedup.cutSharedPrefixes(spark, raw, minTurns = mt)
            .withColumn("pbucket", Pipeline.pbucket($"conv_id")))
      }.apply("transcripts").drop("pbucket")
    }
    val ded = Pipeline.run(spark, transcripts, s"$store/dedup")

    // one doc per cluster (first-occurrence representative — T6), with
    // one turn per line so downstream line ops see turn granularity
    val docs = ded.clusters.filter($"is_representative")
      .select($"conv_id")
      .join(ded.docs, Seq("conv_id"))
      .select($"conv_id".as("doc_id"),
        translate($"doc_text", DocAssembly.TurnSep, "\n").as("text"))
    val bench = docs.filter(pmod(xxhash64($"doc_id"), lit(97L)) === 0L)
    val cur = CurationPipeline.run(spark, docs, bench, s"$store/curation",
      lineBoilerplateDf = lineDf)

    val nPrefixCut = prefixMinTurns.fold(0L)(_ => raw.count() - transcripts.count())
    val nTurns = transcripts.count()
    val nClusters = ded.clusters.select($"cluster_id").distinct().count()
    val nReps = docs.count()
    val nKept = cur.curated.count()
    val nSpanCut = cur.curated.filter($"n_hit_grams" > 0).count()
    val nLineCut = cur.curated.filter($"n_cut_lines" > 0).count()
    val badMetrics = ded.metrics.unionByName(cur.metrics)
      .filter($"rows_in" === -1L || $"rows_out" === -1L || $"dup_pairs" === -1L)
      .count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"release: turns=$nTurns prefix_cut_turns=$nPrefixCut " +
      f"clusters=$nClusters reps=$nReps " +
      f"kept=$nKept span_cut_docs=$nSpanCut line_cut_docs=$nLineCut " +
      f"metrics_minus1=$badMetrics wall=$secs%.1fs turns_per_sec=${nTurns / secs}%.0f")
    ded.metrics.unionByName(cur.metrics).orderBy("stage").show(20, false)
    spark.stop()
  }
}
