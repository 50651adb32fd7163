package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard near-dup scoring — the non-approximate
  * counterpart of MinHash (used standalone on smaller corpora, or as a
  * precise re-rank of LSH candidates).
  *
  * Plan shape: explode distinct n-grams → self-equi-join on the gram →
  * count shared grams per pair → Jaccard from per-doc gram counts.
  * Both wide ops are hash-partitioned equi-joins Catalyst handles; the
  * gram-frequency cap drops ubiquitous grams (stopword runs) which
  * otherwise create quadratic hot keys — same skew story as the LSH
  * bucket cap, and standard practice (a gram in >maxDf docs carries no
  * near-dup signal).
  */
object NgramJaccard {

  /** Distinct word n-grams per doc. n=1 → token sets. */
  def docGrams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = split(regexp_replace(trim(lower(col(textCol))), "\\s+", " "), " ")
    val grams =
      if (n == 1) array_distinct(toks)
      else array_distinct(
        filter(
          transform(toks, (_, i) => concat_ws(" ", slice(toks, i + 1, lit(n)))),
          g => size(split(g, " ")) === n))
    df.select(col(idCol).as("doc_id"), explode(grams).as("gram"))
  }

  /** Pairwise Jaccard ≥ threshold over word n-grams.
    * @param maxDf drop grams occurring in more than this many docs. */
  def pairs(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 1,
      threshold: Double = 0.5,
      maxDf: Int = 1000): DataFrame = {
    import spark.implicits._
    val grams = docGrams(df, idCol, textCol, n)
    val sizes = grams.groupBy($"doc_id").agg(count(lit(1)).as("n_grams"))
    // document frequency via groupBy + join, NOT a per-gram window: the
    // groupBy partial-aggregates map-side, so a stopword gram at corpus
    // scale is a merged count, not a single-task window sort
    val gramDf = grams.groupBy($"gram").agg(count(lit(1)).as("df"))
      .filter($"df" <= maxDf)
      .select($"gram")
    val rare = grams.join(gramDf, Seq("gram"))
    val shared = rare.as("a")
      .join(rare.as("b"), $"a.gram" === $"b.gram" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    shared
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_grams", "na"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_grams", "nb"), Seq("doc_b"))
      .withColumn("jaccard", $"inter" / ($"na" + $"nb" - $"inter"))
      .filter($"jaccard" >= threshold)
      .select($"doc_a", $"doc_b", $"inter", $"na", $"nb",
        floor($"jaccard" * 10000).cast("bigint").as("jaccard_x10000"))
  }
}
