package graft

import graft.operators._
import org.apache.spark.sql.functions._

class DetectorAuditSpec extends SparkSpec {

  private def pairsDf(ps: Seq[(String, String)]) = {
    import spark.implicits._
    ps.toDF("doc_a", "doc_b")
  }

  test("recall arithmetic: direction-normalized, deduplicated, basis points") {
    import spark.implicits._
    val truth = pairsDf(Seq(("a", "b"), ("c", "d"), ("e", "f"), ("g", "h")))
    // detected: 3 of 4 truth pairs — one reversed, one duplicated —
    // plus a spurious pair that must not count as a hit
    val det = pairsDf(Seq(("b", "a"), ("c", "d"), ("c", "d"), ("e", "f"), ("x", "y")))
    val row = DetectorAudit.pairRecall(spark, det, truth)
      .as[(Long, Long, Long, Long)].head()
    assert(row == ((4L, 4L, 3L, 7500L)))
  }

  test("empty truth reports recall 1.0; empty detection reports 0") {
    import spark.implicits._
    val none = pairsDf(Seq.empty)
    val some = pairsDf(Seq(("a", "b")))
    assert(DetectorAudit.pairRecall(spark, some, none)
      .as[(Long, Long, Long, Long)].head() == ((0L, 1L, 0L, 10000L)))
    assert(DetectorAudit.pairRecall(spark, none, some)
      .as[(Long, Long, Long, Long)].head() == ((1L, 0L, 0L, 0L)))
  }

  test("winnowed-vs-exact audit is consistent with the raw pair sets") {
    import spark.implicits._
    val transcripts = graft.corpus.CorpusGen.transcripts(spark, 200L).toDF
    val docs = DocAssembly.assemble(spark, transcripts).cache()
    docs.count()
    val cfg = DedupConfig.default
    val sampled = SubstringDetector.dupPairs(spark, docs, cfg).toDF
    val exact = SuffixArrayDetector.dupPairs(spark, docs, cfg).toDF
    val (nTruth, nDet, nHit, bp) = DetectorAudit.pairRecall(spark, sampled, exact)
      .as[(Long, Long, Long, Long)].head()
    def set(df: org.apache.spark.sql.DataFrame) =
      df.select(least($"doc_a", $"doc_b"), greatest($"doc_a", $"doc_b"))
        .as[(String, String)].collect().toSet
    val s = set(sampled); val e = set(exact)
    assert(nTruth == e.size && nDet == s.size && nHit == s.intersect(e).size)
    assert(bp == (if (e.isEmpty) 10000L else s.intersect(e).size * 10000L / e.size))
    docs.unpersist()
  }
}
