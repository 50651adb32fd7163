package graft

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Curate, LineDedup, SpanDedup}
import graft.sources.{Layout, TableStore}

/** Committed, resumable CURATION pipeline — the release-run counterpart
  * of [[Pipeline]] (which covers the dedup/restore stages): the round-4
  * curation surface (per-axis verdicts + corpus-internal span
  * remediation) wired through the same TableStore stage discipline, so
  * a killed curation run resumes from the last committed stage and
  * every stage's counters ride its own write job via `observe()` — on a
  * RESUMED stage the counters are re-derived from the committed tables
  * (no -1 placeholders anywhere, fresh or resumed).
  *
  * Stages (each = one atomic manifest commit):
  *   cur_verdict  one row per input doc: the five per-axis booleans +
  *                `keep` ([[Curate.report]]) — the release's loss-rate
  *                accounting table
  *   cur_corpus   the released text: docs passing `keep`, with
  *                cross-doc duplicated spans cut (first writer keeps —
  *                [[SpanDedup.cutDuplicateSpans]]); rows are
  *                (doc_id, text, n_hit_grams) where `text` is the
  *                normalized post-cut text
  *   cur_metrics  the stage-metrics table itself
  *
  * Physical layout: both data tables hash-partition on `pbucket`
  * (64-way doc_id hash — same point-write story as [[Pipeline]]'s
  * conv_id buckets) and the corpus sorts by doc_id within files.
  */
object CurationPipeline {

  def pbucket(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(docId), lit(Pipeline.NumBuckets.toLong)).cast("int")

  val VerdictLayout: Layout = Layout(Seq("pbucket"), Seq("doc_id"))
  val CorpusLayout: Layout = Layout(Seq("pbucket"), Seq("doc_id"))

  final case class Result(
      verdict: DataFrame,
      curated: DataFrame,
      metrics: DataFrame)

  /** `docs`/`bench`: (doc_id: long, text: string) frames — bench is the
    * eval set the decon axis guards against.
    *
    * `lineBoilerplateDf`: when set, kept docs pass through
    * [[LineDedup.cutDuplicateLines]] BEFORE the span cut (the
    * RefinedWeb order — lines need their newlines, which the span
    * pass's normalization collapses): duplicated lines keep one
    * first-writer copy, lines reaching this document frequency are
    * boilerplate and removed everywhere. The curated table always
    * carries `n_cut_lines` (0 when the stage is off), so the resumed
    * counter path reads one schema; stores committed by pre-line-dedup
    * builds lack the column and must be recreated. */
  def run(
      spark: SparkSession,
      docs: DataFrame,
      bench: DataFrame,
      storeRoot: String,
      minQuality: Long = 60L,
      n: Int = 13,
      lineBoilerplateDf: Option[Long] = None): Result = {
    import spark.implicits._
    val store = new TableStore(storeRoot)
    val metricsBuf = scala.collection.mutable.ArrayBuffer.empty[StageMetrics]

    // same stage/metrics discipline as Pipeline.runStages — one shared
    // implementation, so resumed-metric fixes apply to both pipelines
    val recorder = new StageRecorder(store, metricsBuf)
    def timed[T](stage: String, obs: Observation)(
        resumedFallback: => (Long, Long, Long))(body: => T): T =
      recorder.timed(stage, obs)(resumedFallback)(body)

    val obsVerdict = Observation()
    val verdictOut = timed("cur_verdict", obsVerdict)({
      // report is row-preserving (one verdict per doc), so rows_in =
      // rows_out = the committed table's count; dup_pairs (docs the
      // release drops) is one boolean-column scan
      val committed = store.read(spark, "cur_verdict", "verdict")
      val nRows = committed.count()
      (nRows, nRows, committed.filter(!$"keep").count())
    }) {
      store.stage(spark, "cur_verdict", Seq("verdict"),
        Map("verdict" -> VerdictLayout)) {
        Map("verdict" -> Curate.report(spark, docs, bench,
            minQuality = minQuality, n = n)
          .withColumn("pbucket", pbucket($"doc_id"))
          .observe(obsVerdict,
            count(lit(1)).as("rows_in"),
            count(lit(1)).as("rows_out"),
            sum(when($"keep", 0L).otherwise(1L)).as("dup_pairs")))
      }
    }

    val obsCorpus = Observation()
    var afterLinesCache: Option[DataFrame] = None
    val curatedOut = try timed("cur_corpus", obsCorpus)({
      // the cuts are row-preserving over the kept docs, so rows_in =
      // rows_out = the committed corpus count; dup_pairs (docs that
      // lost lines or spans) is one integer-column scan. Stores
      // committed by pre-line-dedup builds lack n_cut_lines — read
      // them as 0 so their resume keeps working.
      val committed0 = store.read(spark, "cur_corpus", "curated")
      val committed =
        if (committed0.columns.contains("n_cut_lines")) committed0
        else committed0.withColumn("n_cut_lines", lit(0L))
      val nRows = committed.count()
      (nRows, nRows,
        committed.filter($"n_hit_grams" > 0 || $"n_cut_lines" > 0).count())
    }) {
      store.stage(spark, "cur_corpus", Seq("curated"),
        Map("curated" -> CorpusLayout)) {
        val kept = docs.join(
          verdictOut("verdict").filter($"keep").select($"doc_id"),
          Seq("doc_id"), "left_semi")
        val curated = lineBoilerplateDf match {
          case Some(bdf) =>
            // persisted: the span pass scans its input three times
            // (gram ownership, hit join, cut) — recomputing the line
            // dedup per consumer would triple the stage. n_cut_lines
            // rides through as a passthrough column (no join-back).
            val afterLines = LineDedup.cutDuplicateLines(spark, kept, boilerplateDf = bdf)
              .select($"doc_id", $"cut_text".as("text"), $"n_cut_lines")
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            afterLinesCache = Some(afterLines)
            SpanDedup.cutDuplicateSpans(spark, afterLines, n = n,
                passthrough = Seq("n_cut_lines"))
              .select($"doc_id", $"cut_text".as("text"), $"n_cut_lines", $"n_hit_grams")
          case None =>
            SpanDedup.cutDuplicateSpans(spark, kept, n = n)
              .select($"doc_id", $"cut_text".as("text"),
                lit(0L).as("n_cut_lines"), $"n_hit_grams")
        }
        Map("curated" -> curated
          .withColumn("pbucket", pbucket($"doc_id"))
          .observe(obsCorpus,
            count(lit(1)).as("rows_in"),
            count(lit(1)).as("rows_out"),
            sum(when($"n_hit_grams" > 0 || $"n_cut_lines" > 0, 1L).otherwise(0L))
              .as("dup_pairs")))
      }
    } finally afterLinesCache.foreach(_.unpersist(false))

    val obsMetrics = Observation()
    val metrics = timed("cur_metrics", obsMetrics)(
      (metricsBuf.size.toLong, metricsBuf.size.toLong, 0L)) {
      store.stage(spark, "cur_metrics", Seq("metrics")) {
        Map("metrics" -> spark.createDataFrame(metricsBuf.toSeq)
          .observe(obsMetrics,
            count(lit(1)).cast("long").as("rows_in"),
            count(lit(1)).cast("long").as("rows_out"),
            lit(0L).cast("long").as("dup_pairs")))
      }
    }

    Result(
      verdict = verdictOut("verdict"),
      curated = curatedOut("curated"),
      metrics = metrics("metrics"))
  }
}
