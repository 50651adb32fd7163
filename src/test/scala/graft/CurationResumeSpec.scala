package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame

/** Committed curation pipeline: verdict → span-cut corpus → metrics,
  * resumable per stage, counters never -1 (fresh or resumed). */
class CurationResumeSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private val good = (1 to 60).map(i => s"tok$i").mkString(" ") + ". Fine text here?"
  private val benchDoc = (100 to 125).map(i => s"bw$i").mkString(" ")
  // first 20 tokens shared with `good` (8 duplicated 13-gram windows),
  // then unique text of comparable length/shape — passes every verdict
  // axis, so the cross-doc overlap must be remediated by the SPAN CUT,
  // not by dropping the doc
  private val prefixShare = (1 to 20).map(i => s"tok$i").mkString(" ") + " " +
    (1 to 40).map(i => s"v$i").mkString(" ") + ". Fine text here?"

  private def corpus(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (0L, good),                                   // keeper, owner of the shared prefix
      (1L, good),                                   // exact dup of 0 → not canonical → dropped
      (2L, good + " mail me x@y.io now"),           // PII → dropped
      (3L, "short doc"),                            // quality floor → dropped
      (4L, Seq.fill(50)("spam").mkString(" ")),     // repetition → dropped
      (5L, s"prefix $benchDoc suffix " + (1 to 40).map(i => s"u$i").mkString(" ")), // contaminated → dropped
      (6L, prefixShare),                            // keeper, loses the shared prefix
      (97L, benchDoc + " " + (200 to 240).map(i => s"bx$i").mkString(" "))) // bench doc, self-hit → dropped
      .toDF("doc_id", "text")
  }

  private def runPipe(store: String): CurationPipeline.Result = {
    import spark.implicits._
    val docs = corpus(spark)
    CurationPipeline.run(spark, docs, docs.filter($"doc_id" === 97L), store)
  }

  test("fresh run: verdict gates, span-cut corpus, real counters everywhere") {
    import spark.implicits._
    val store = tmpDir("cur1")
    val res = runPipe(store)
    val kept = res.verdict.filter($"keep").select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 6L))
    val cur = res.curated.select($"doc_id", $"text", $"n_hit_grams")
      .as[(Long, String, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // owner intact (normalized = lowercased)
    assert(cur(0L) == ((good.toLowerCase, 0L)))
    // later doc lost exactly the 20 shared prefix tokens (8 hit windows)
    assert(cur(6L) == (((1 to 40).map(i => s"v$i").mkString(" ") + ". fine text here?", 8L)))
    assert(cur.size == 2)
    val m = res.metrics.as[StageMetrics].collect().map(x => x.stage -> x).toMap
    assert(m("cur_verdict").rows_out == 8 && m("cur_verdict").dup_pairs == 6)
    assert(m("cur_corpus").rows_out == 2 && m("cur_corpus").dup_pairs == 1)
    assert(res.metrics.filter($"rows_in" === -1L || $"rows_out" === -1L ||
      $"dup_pairs" === -1L).count() == 0, "fresh-run metrics must carry no -1")
  }

  test("kill between stages: resume reuses the committed verdict and reproduces the corpus") {
    import spark.implicits._
    val store = tmpDir("cur2")
    val first = runPipe(store)
    def rows(df: DataFrame) = df.select($"doc_id", $"text", $"n_hit_grams")
      .as[(Long, String, Long)].collect().toSet
    val firstRows = rows(first.curated) // materialize before the rerun overwrites
    // crash after cur_verdict: later stages uncommitted
    for (s <- Seq("cur_corpus", "cur_metrics"))
      Files.deleteIfExists(Paths.get(store, s"_manifest.$s.json"))
    val vManifest = Paths.get(store, "_manifest.cur_verdict.json")
    val mtime = Files.getLastModifiedTime(vManifest)
    val second = runPipe(store)
    assert(rows(second.curated) == firstRows)
    // the committed verdict stage was NOT recomputed
    assert(Files.getLastModifiedTime(vManifest) == mtime)
  }

  test("line-dedup stage: boilerplate lines cut before the span pass; resume reproduces it") {
    import spark.implicits._
    val store = tmpDir("cur4")
    // both keepers carry the same banner line; with boilerplateDf = 2
    // it is boilerplate and must vanish from BOTH (owner included),
    // after which the span pass proceeds exactly as in the base corpus.
    // Doc 1 gets the banner too so it STAYS an exact dup of doc 0 (the
    // verdict must keep dropping it — line dedup only sees kept docs).
    val banner = "cookie banner please accept"
    val docs = corpus(spark).select($"doc_id",
      when($"doc_id".isin(0L, 1L, 6L), concat(lit(banner + "\n"), $"text"))
        .otherwise($"text").as("text"))
    def runLd() = CurationPipeline.run(spark, docs,
      docs.filter($"doc_id" === 97L), store,
      lineBoilerplateDf = Some(2L))
    val res = runLd()
    val cur = res.curated.select($"doc_id", $"text", $"n_cut_lines", $"n_hit_grams")
      .as[(Long, String, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(cur(0L) == ((good.toLowerCase, 1L, 0L)))
    assert(cur(6L) == (((1 to 40).map(i => s"v$i").mkString(" ") + ". fine text here?", 1L, 8L)))
    assert(cur.size == 2)
    val m = res.metrics.as[StageMetrics].collect().map(x => x.stage -> x).toMap
    // dup_pairs counts docs that lost lines OR spans — here both did
    assert(m("cur_corpus").dup_pairs == 2)
    // fully resumed rerun re-derives the same counters from the tables
    Files.deleteIfExists(Paths.get(store, "_manifest.cur_metrics.json"))
    val res2 = runLd()
    val m2 = res2.metrics.as[StageMetrics].collect().map(x => x.stage -> x).toMap
    assert(m2("cur_corpus").rows_out == 2 && m2("cur_corpus").dup_pairs == 2)
    assert(res2.metrics.filter($"rows_in" === -1L || $"rows_out" === -1L ||
      $"dup_pairs" === -1L).count() == 0)
  }

  test("fully resumed run re-derives every counter from the committed tables (no -1)") {
    import spark.implicits._
    val store = tmpDir("cur3")
    runPipe(store)
    // everything committed except the metrics table itself — the rerun
    // takes the resumed-fallback path for both data stages
    Files.deleteIfExists(Paths.get(store, "_manifest.cur_metrics.json"))
    val res = runPipe(store)
    val m = res.metrics.as[StageMetrics].collect().map(x => x.stage -> x).toMap
    assert(m("cur_verdict").rows_in == 8 && m("cur_verdict").rows_out == 8)
    assert(m("cur_verdict").dup_pairs == 6)
    assert(m("cur_corpus").rows_in == 2 && m("cur_corpus").rows_out == 2)
    assert(m("cur_corpus").dup_pairs == 1)
    assert(res.metrics.filter($"rows_in" === -1L || $"rows_out" === -1L ||
      $"dup_pairs" === -1L).count() == 0, "resumed-run metrics must carry no -1")
  }
}
