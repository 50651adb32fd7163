package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import graft.operators.PrefixDedup

/** Shared-conversation-prefix dedup: ownership monotonicity (the
  * total-copy-elimination argument), the exact-replay degenerate case,
  * role-in-identity, normalization keying, minTurns, and the
  * no-text-in-detection-shuffles plan gate. */
class PrefixDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 ${h}%02d:00:00")

  /** (conv, idx, role, text, hour) rows → transcripts frame. */
  private def corpus(rows: Seq[(String, Int, String, String, Int)]): DataFrame =
    rows.map { case (c, i, r, t, h) => (c, i, r, t, "", ts(h)) }
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  private def turnsOf(c: String, n: Int, prefix: String): Seq[(Int, String, String)] =
    (0 until n).map(i => (i, if (i % 2 == 0) "user" else "assistant", s"$prefix$i"))

  // A (oldest): P0..P9. C: P0..P9 ++ Q10,Q11 (middle age).
  // B: P0..P9 ++ Q10,Q11 (newest). {A,B,C} share the 10-prefix (A owns);
  // {B,C} share the 12-prefix (C owns).
  private def chainCorpus: DataFrame = {
    val p = turnsOf("", 10, "shared p")
    val q = Seq((10, "user", "tail q10"), (11, "assistant", "tail q11"))
    corpus(
      p.map { case (i, r, t) => ("A", i, r, t, 1) } ++
        (p ++ q).map { case (i, r, t) => ("C", i, r, t, 2) } ++
        (p ++ q).map { case (i, r, t) => ("B", i, r, t, 3) })
  }

  test("ownership is monotone: owning the longest group can still cut a shorter one") {
    val v = PrefixDedup.sharedPrefixes(spark, chainCorpus)
      .select("conv_id", "prefix_len", "n_sharing", "owner_conv_id", "is_owner", "cut_len")
      .as[(String, Int, Long, String, Boolean, Int)].collect().sortBy(_._1).toSeq
    assert(v == Seq(
      ("A", 10, 3L, "A", true, 0),   // owns its longest (and only) group
      ("B", 12, 2L, "C", false, 12), // non-owner everywhere
      ("C", 12, 2L, "C", true, 10))) // owns the 12-group, loses the 10-head to A
  }

  test("cut leaves exactly one copy of every shared position corpus-wide") {
    val kept = PrefixDedup.cutSharedPrefixes(spark, chainCorpus)
      .select($"conv_id", $"turn_idx").as[(String, Int)].collect().toSet
    val expected =
      (0 until 10).map(("A", _)).toSet ++ Set(("C", 10), ("C", 11)) // B fully cut
    assert(kept == expected)
    // every distinct (role-tagged) turn text survives exactly once
    val texts = PrefixDedup.cutSharedPrefixes(spark, chainCorpus)
      .select($"text").as[String].collect().toSeq
    assert(texts.size == texts.distinct.size && texts.size == 12)
  }

  test("exact replay of an older conversation loses all its rows") {
    val base = turnsOf("", 4, "hello ")
    val df = corpus(
      base.map { case (i, r, t) => ("orig", i, r, t, 1) } ++
        base.map { case (i, r, t) => ("replay", i, r, t, 2) })
    val v = PrefixDedup.sharedPrefixes(spark, df)
      .select("conv_id", "prefix_len", "cut_len")
      .as[(String, Int, Int)].collect().sortBy(_._1).toSeq
    assert(v == Seq(("orig", 4, 0), ("replay", 4, 4)))
    val kept = PrefixDedup.cutSharedPrefixes(spark, df)
      .select($"conv_id").distinct().as[String].collect().toSet
    assert(kept == Set("orig"))
  }

  test("role is part of turn identity; normalization is the keying frame") {
    val df = corpus(Seq(
      ("x", 0, "user", "Hi  There", 1),
      ("y", 0, "user", "hi there", 2),      // same after normalize → shared
      ("z", 0, "assistant", "hi there", 3), // same text, other role → distinct
      ("x", 1, "assistant", "tail x", 1),
      ("y", 1, "assistant", "tail y", 2),
      ("z", 1, "user", "tail z", 3)))
    val v = PrefixDedup.sharedPrefixes(spark, df)
      .select("conv_id", "prefix_len", "owner_conv_id")
      .as[(String, Int, String)].collect().sortBy(_._1).toSeq
    assert(v == Seq(("x", 1, "x"), ("y", 1, "x"))) // z shares nothing
    val keptY = PrefixDedup.cutSharedPrefixes(spark, df)
      .filter($"conv_id" === "y").select($"turn_idx").as[Int].collect().toSeq
    assert(keptY == Seq(1))
  }

  test("minTurns gates detection and the cut independently") {
    val df = corpus(Seq(
      ("m", 0, "user", "same head", 1), ("m", 1, "user", "m tail", 1),
      ("n", 0, "user", "same head", 2), ("n", 1, "user", "n tail", 2)))
    assert(PrefixDedup.sharedPrefixes(spark, df, minTurns = 2).isEmpty)
    // a 1-turn shared head survives a minTurns = 2 cut
    assert(PrefixDedup.cutSharedPrefixes(spark, df, minTurns = 2).count() == 4)
    assert(PrefixDedup.cutSharedPrefixes(spark, df, minTurns = 1).count() == 3)
  }

  test("sparse turn indexes: order, not density, drives the chain and the cut") {
    val df = corpus(Seq(
      ("s", 10, "user", "head a", 1), ("s", 20, "user", "head b", 1),
      ("s", 30, "user", "s tail", 1),
      ("t", 5, "user", "head a", 2), ("t", 99, "user", "head b", 2),
      ("t", 100, "user", "t tail", 2)))
    val v = PrefixDedup.sharedPrefixes(spark, df)
      .select("conv_id", "prefix_len", "cut_len", "cut_idx")
      .as[(String, Int, Int, Int)].collect().sortBy(_._1).toSeq
    assert(v == Seq(("s", 2, 0, -1), ("t", 2, 2, 99)))
    val keptT = PrefixDedup.cutSharedPrefixes(spark, df)
      .filter($"conv_id" === "t").select($"turn_idx").as[Int].collect().toSeq
    assert(keptT == Seq(100))
  }

  test("detection shuffles never carry text: turns reduce to 24-byte fp structs in the scan") {
    val qe = PrefixDedup.sharedPrefixes(spark, chainCorpus).queryExecution
    val aggOverText = qe.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.groupingExpressions.nonEmpty &&
            a.child.output.exists(att =>
              att.name == "text" &&
                att.dataType == org.apache.spark.sql.types.StringType) => a
    }
    assert(aggOverText.isEmpty,
      s"a grouping aggregate consumes raw turn text:\n${aggOverText.mkString("\n")}")
    val plan = qe.executedPlan.toString
    val shuffles = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toList
    assert(shuffles.nonEmpty)
    for (l <- shuffles) assert(!l.contains("text"), l)
  }
}
