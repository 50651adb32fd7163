package graft

import graft.operators.LineDedup

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)],
      minDf: Long = 2L, boilerplateDf: Long = Long.MaxValue): Map[Long, (String, Long)] =
    LineDedup.cutDuplicateLines(spark, rows.toDF("doc_id", "text"),
        minDf = minDf, boilerplateDf = boilerplateDf)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  test("exact later copy fully cut; owner verbatim") {
    val out = run(Seq(
      1L -> "alpha one\nbeta two\ntail 1",
      2L -> "alpha one\nbeta two\ntail 1"))
    assert(out(1L) === (("alpha one\nbeta two\ntail 1", 0L)))
    assert(out(2L) === (("", 3L)))
  }

  test("shared line cut from later docs only; unique lines survive in place") {
    val out = run(Seq(
      1L -> "unique to one\nshared boilerplate\nalso one",
      2L -> "unique to two\nshared boilerplate\nalso two",
      3L -> "shared boilerplate\nunique to three"))
    assert(out(1L)._1 === "unique to one\nshared boilerplate\nalso one")
    assert(out(2L) === (("unique to two\nalso two", 1L)))
    assert(out(3L) === (("unique to three", 1L)))
  }

  test("boilerplate rule removes high-df lines from the owner too") {
    val docs = (1L to 5L).map(i => i -> s"cookie banner line\ndoc body $i")
    val out = run(docs, boilerplateDf = 4L)
    (1L to 5L).foreach { i =>
      assert(out(i) === ((s"doc body $i", 1L)), s"doc $i")
    }
    // below the boilerplate threshold, first writer still keeps
    val out2 = run(Seq(1L -> "df two line\nbody 1", 2L -> "df two line\nbody 2"),
      boilerplateDf = 4L)
    assert(out2(1L) === (("df two line\nbody 1", 0L)))
    assert(out2(2L) === (("body 2", 1L)))
  }

  test("whitespace-only and empty lines are never keys, never cut") {
    val out = run(Seq(
      1L -> "top\n\n   \nbottom one",
      2L -> "top\n\n   \nbottom two"))
    assert(out(1L) === (("top\n\n   \nbottom one", 0L)))
    // doc 2 loses only "top" — its blank and whitespace lines survive
    assert(out(2L) === (("\n   \nbottom two", 1L)))
  }

  test("within-doc repeats: df counts distinct docs; non-owners lose every occurrence") {
    val out = run(Seq(
      1L -> "solo repeat\nsolo repeat\nmine",
      2L -> "other doc body"))
    // df("solo repeat") = 1 doc → never cut despite two occurrences
    assert(out(1L) === (("solo repeat\nsolo repeat\nmine", 0L)))
    val out2 = run(Seq(
      1L -> "dup line\nowner body",
      2L -> "dup line\nmid\ndup line"))
    assert(out2(1L)._2 === 0L)
    // both occurrences in the later doc are cut (n_cut_lines counts occurrences)
    assert(out2(2L) === (("mid", 2L)))
  }

  test("keying is normalization-framed: case/whitespace variants are the same line") {
    val out = run(Seq(
      1L -> "Shared   Line\nbody one",
      2L -> "shared line\nbody two"))
    assert(out(1L)._2 === 0L)
    assert(out(2L) === (("body two", 1L)))
    // but survivors keep their ORIGINAL bytes
    assert(out(1L)._1 === "Shared   Line\nbody one")
  }

  test("mergeIntervals covers exactly the union of windows (seeded random cases)") {
    // the helper is now shared by three cut paths — pin its coverage
    // semantics against a brute-force recompute over random inputs
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(20260819L)
    val cases = (0 until 40).map { _ =>
      val n = 1 + rnd.nextInt(5)
      val pos = Seq.fill(rnd.nextInt(12))(rnd.nextInt(30).toLong).sorted
      (pos, n)
    } :+ ((Seq.empty[Long], 3)) :+ ((Seq(0L, 1L, 2L), 1))
    for (((pos, n), i) <- cases.zipWithIndex) {
      val df = Seq(Tuple1(pos)).toDF("hit_pos")
        .select(graft.operators.Decontaminate.mergeIntervals(col("hit_pos"), n.toLong).as("iv"))
      val ivs = df.collect()(0).getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getLong(1)))
      val covered = ivs.flatMap { case (s, e) => s until e }.toSet
      val expected = pos.flatMap(p => p until p + n).toSet
      assert(covered == expected, s"case $i: pos=$pos n=$n ivs=$ivs")
      // intervals are disjoint and non-adjacent (a merge happened wherever possible)
      val sortedIv = ivs.sortBy(_._1)
      for (Seq((_, e1), (s2, _)) <- sortedIv.sliding(2) if sortedIv.size > 1)
        assert(e1 < s2, s"case $i: overlapping/adjacent intervals $sortedIv")
    }
  }

  test("document text never shuffles: the cut is a per-row HOF over the doc's own scan") {
    val docs = Seq(1L -> "a\nb", 2L -> "a\nc").toDF("doc_id", "text")
    val qe = LineDedup.cutDuplicateLines(spark, docs).queryExecution
    // logical gate: no grouping aggregate consumes a raw line string —
    // occurrences reduce to (doc_id, line_idx, fp) before any exchange
    val aggOverText = qe.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.groupingExpressions.nonEmpty &&
            a.child.output.exists(att =>
              (att.name == "line" || att.name == "text") &&
                att.dataType == org.apache.spark.sql.types.StringType) => a
    }
    assert(aggOverText.isEmpty,
      s"a grouping aggregate consumes raw line text:\n${aggOverText.mkString("\n")}")
    // physical gate (same shape as the span-dedup gate): no shuffle
    // exchange output may carry the text or a line column — the one
    // join touching text must broadcast its (small) cuts side
    val plan = qe.executedPlan.toString
    val shuffles = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toList
    assert(shuffles.nonEmpty)
    for (l <- shuffles) assert(!l.contains("text") && !l.contains("line,"), l)
  }
}
