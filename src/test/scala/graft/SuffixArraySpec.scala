package graft

import graft.functions.Hashing
import graft.operators._
import org.apache.spark.sql.functions._

/** The suffix-array pass is EXACT: its output must equal a brute-force
  * shared-L-gram reference on any input, and must contain everything
  * the sampled (winnowed-anchor) detector finds at the same threshold. */
class SuffixArraySpec extends SparkSpec {

  private def mkDocs(texts: Map[String, String]) = {
    import spark.implicits._
    texts.toSeq
      .map { case (id, t) => Doc(id, t, 1, java.sql.Timestamp.valueOf("2026-01-01 00:00:00")) }
      .toDS()
  }

  /** Brute force: all unordered doc pairs sharing an exact L-token gram
    * under the detector's own tokenization. */
  private def bruteForce(texts: Map[String, String], L: Int): Set[(String, String)] = {
    val grams: Map[String, Set[Seq[String]]] = texts.map { case (id, t) =>
      val toks = Hashing.tokens(t).toSeq
      id -> toks.sliding(L).filter(_.length == L).toSet
    }
    (for {
      a <- texts.keys; b <- texts.keys if a < b
      if grams(a).intersect(grams(b)).nonEmpty
    } yield (a, b)).toSet
  }

  private def run(texts: Map[String, String], L: Int): Set[(String, String)] = {
    import spark.implicits._
    val cfg = DedupConfig.default.copy(substrQ = L)
    SuffixArrayDetector.dupPairs(spark, mkDocs(texts), cfg).toDF
      .select(least($"doc_a", $"doc_b"), greatest($"doc_a", $"doc_b"))
      .as[(String, String)].collect().toSet
  }

  test("matches brute force on crafted edge cases (power-of-two L)") {
    val run8 = "r1 r2 r3 r4 r5 r6 r7 r8" // the shared 8-token run
    val texts = Map(
      "a" -> s"alpha one two $run8 tail-a x y",
      "b" -> s"$run8 beta gamma",                 // run at doc START
      "c" -> s"prefix words here then $run8",     // run at doc END
      "d" -> "r1 r2 r3 r4 r5 r6 r7 qq",           // 7 of 8 — NOT a dup
      "e" -> "unrelated content entirely here now with many words",
      "f" -> s"$run8",                            // run IS the doc (len == L)
      "g" -> "short doc",                         // shorter than L
      "h" -> s"x $run8 y $run8 z")                // run repeated WITHIN one doc
    val L = 8
    assert(run(texts, L) == bruteForce(texts, L))
    // sanity on the reference itself: a,b,c,f,h pairwise linked; d,e,g not
    assert(bruteForce(texts, L) ==
      (for { x <- Seq("a", "b", "c", "f", "h"); y <- Seq("a", "b", "c", "f", "h") if x < y }
        yield (x, y)).toSet)
  }

  test("matches brute force for non-power-of-two L (overlapping windows)") {
    val toks = (1 to 40).map(i => s"t$i")
    val texts = Map(
      "a" -> toks.mkString(" "),
      "b" -> (Seq("pre") ++ toks.slice(5, 17) ++ Seq("post")).mkString(" "),  // 12 shared
      "c" -> (Seq("zz") ++ toks.slice(20, 31)).mkString(" "),                 // 11 shared
      "d" -> toks.take(11).reverse.mkString(" "))                             // same tokens, wrong order
    for (l <- Seq(11, 12)) {
      assert(run(texts, l) == bruteForce(texts, l), s"L=$l")
    }
  }

  test("truncated suffixes never merge with longer ones (shared tail < L)") {
    // both docs END with the same 5 tokens; L=8 ⇒ no pair, even though
    // width-8 classes of the tail positions compare equal-length
    // truncated prefixes
    val tail = "s1 s2 s3 s4 s5"
    val texts = Map(
      "a" -> s"aa bb cc dd $tail",
      "b" -> s"xx yy zz ww $tail")
    assert(run(texts, 8) == Set.empty)
    assert(bruteForce(texts, 8) == Set.empty)
  }

  test("superset of the winnowed detector on the planted corpus; exact on random corpora") {
    import spark.implicits._
    val transcripts = graft.corpus.CorpusGen.transcripts(spark, 200L).toDF
    val docs = DocAssembly.assemble(spark, transcripts).cache()
    docs.count()
    val cfg = DedupConfig.default
    val sa = SuffixArrayDetector.dupPairs(spark, docs, cfg).toDF
      .select(least($"doc_a", $"doc_b"), greatest($"doc_a", $"doc_b"))
      .as[(String, String)].collect().toSet
    val winnowed = SubstringDetector.dupPairs(spark, docs, cfg).toDF
      .select(least($"doc_a", $"doc_b"), greatest($"doc_a", $"doc_b"))
      .as[(String, String)].collect().toSet
    assert(winnowed.subsetOf(sa),
      s"sampled detector found pairs the exact pass missed: ${winnowed.diff(sa).take(5)}")
    // and against brute force on the same corpus
    val texts = docs.collect().map(d => d.conv_id -> d.doc_text).toMap
    assert(sa == bruteForce(texts, cfg.substrQ))
    docs.unpersist()
  }

  test("oversized doc degrades to its prefix (counted), it does not kill the job") {
    import spark.implicits._
    val run8 = "r1 r2 r3 r4 r5 r6 r7 r8"
    val tail8 = "z1 z2 z3 z4 z5 z6 z7 z8"
    // doc a: 100 tokens; shares run8 inside the 64-token cut and tail8
    // ENTIRELY past it (positions 80+). Under the old executor-side
    // require this input killed the whole job; now a contributes its
    // first 64 tokens: (a,b) is still linked, (a,c) is lost — the
    // documented, logged degradation.
    val texts = Map(
      "a" -> (s"$run8 " + (1 to 72).map(i => s"f$i").mkString(" ") + s" $tail8 pad1 pad2 pad3 pad4"),
      "b" -> s"left context $run8 right side",
      "c" -> s"other words $tail8 trailing here")
    val cfg = DedupConfig.default.copy(substrQ = 8)
    val pairs = SuffixArrayDetector.dupPairs(spark, mkDocs(texts), cfg, maxTokens = 64)
      .toDF.select(least($"doc_a", $"doc_b"), greatest($"doc_a", $"doc_b"))
      .as[(String, String)].collect().toSet
    assert(pairs == Set(("a", "b")))
    // the same input UNCAPPED links both (sanity that the loss above is
    // the truncation, not the corpus)
    val full = SuffixArrayDetector.dupPairs(spark, mkDocs(texts), cfg)
      .toDF.select(least($"doc_a", $"doc_b"), greatest($"doc_a", $"doc_b"))
      .as[(String, String)].collect().toSet
    assert(full == Set(("a", "b"), ("a", "c")))
  }
}
