package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import graft.operators.TemplateMining

/** Turn-template mining: parametric grouping under the digit mask,
  * first-writer representative election, minDf gate, distinct
  * templates kept apart, and the no-text-in-the-group-exchange gate. */
class TemplateMiningSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 ${h}%02d:00:00")

  private def corpus(rows: Seq[(String, Int, String, Int)]): DataFrame =
    rows.map { case (c, i, t, h) => (c, i, "tool", t, "", ts(h)) }
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")

  test("parametric turns group under the digit mask; rep is the first writer") {
    val df = corpus(Seq(
      ("a", 0, "fetched 382 bytes in 23ms", 2),
      ("b", 0, "Fetched  9 bytes in 1001ms", 1), // earlier ts → rep, case+ws-normalized
      ("b", 1, "fetched 77 bytes in 8ms", 1),    // same conv, second occurrence
      ("c", 0, "wholly unique turn", 1)))
    val v = TemplateMining.mineTemplates(spark, df)
      .as[(String, Long, Long, String, Int)].collect().toSeq
    assert(v == Seq(("fetched 0 bytes in 0ms", 3L, 2L, "b", 0)))
  }

  test("distinct templates stay apart; digit-run length never splits a family") {
    val df = corpus(Seq(
      ("a", 0, "error code 5", 1), ("b", 0, "error code 55555", 2),
      ("c", 0, "error at 5", 1), ("d", 0, "error at 5 again", 2)))
    val v = TemplateMining.mineTemplates(spark, df)
      .select("template", "n_occurrences").as[(String, Long)].collect().toSeq
    assert(v == Seq(("error code 0", 2L))) // "error at 0" vs "error at 0 again" differ
  }

  test("rep election ties on ts break by (conv_id, turn_idx)") {
    val df = corpus(Seq(
      ("z", 3, "run 1 done", 1), ("a", 7, "run 2 done", 1), ("a", 2, "run 3 done", 1)))
    val v = TemplateMining.mineTemplates(spark, df)
      .select("rep_conv_id", "rep_turn_idx").as[(String, Int)].collect().toSeq
    assert(v == Seq(("a", 2)))
  }

  test("minDf gates the output; minDf = 1 reports singletons too") {
    val df = corpus(Seq(("a", 0, "only 1 once", 1), ("b", 0, "other 2 text", 1)))
    assert(TemplateMining.mineTemplates(spark, df).isEmpty)
    assert(TemplateMining.mineTemplates(spark, df, minDf = 1L).count() == 2)
  }

  test("the group exchange carries 16-byte keys, never text") {
    val df = corpus(Seq(("a", 0, "x 1", 1), ("b", 0, "x 2", 2)))
    val qe = TemplateMining.mineTemplates(spark, df).queryExecution
    val aggOverText = qe.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.groupingExpressions.nonEmpty &&
            a.child.output.exists(att =>
              att.name == "text" &&
                att.dataType == org.apache.spark.sql.types.StringType) => a
    }
    assert(aggOverText.isEmpty,
      s"a grouping aggregate consumes raw turn text:\n${aggOverText.mkString("\n")}")
  }
}
