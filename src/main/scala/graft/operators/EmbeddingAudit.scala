package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** ANN recall audit — the embedding-space twin of [[DetectorAudit]]:
  * measure an approximate index (RHP-LSH, IVF) against the exact
  * brute-force ground truth on a query sample, as a first-class
  * in-engine operator rather than an offline notebook check.
  *
  * Scale shape: ground truth is [[EmbeddingSim.bruteForceTopK]] with
  * the SAMPLE broadcast (one corpus scan); the audited index runs its
  * normal bucketed path; the compare is a semi-join on
  * (query_id, neighbor_id) plus one global aggregate. Auditing always
  * samples queries — exact all-pairs truth at corpus scale is the
  * O(N²) this engine exists to avoid.
  */
object EmbeddingAudit {

  /** Deterministic CLUSTERED embedding corpus: `nClusters` centers
    * with unit-range components from the mix64 chain; vector i belongs
    * to cluster i % nClusters and is its center plus `noise`-scaled
    * per-(vector, dim) perturbation. noise = 0 makes in-cluster
    * vectors IDENTICAL — the closed-form case where any correct ANN
    * has recall exactly 1 (the q_ann_recall oracle). */
  def clusteredEmbeddings(
      spark: SparkSession,
      nVecs: Long,
      dim: Int,
      nClusters: Int,
      noise: Double,
      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    spark.range(0, nVecs).map { id0 =>
      val id = id0.longValue
      val c = (id % nClusters).toInt
      val v = Array.tabulate(dim) { d =>
        val center = Hashing.mix64(seed ^ (c.toLong << 20) ^ d.toLong).toDouble / Long.MaxValue
        val eps =
          if (noise == 0.0) 0.0
          else noise * Hashing.mix64(seed ^ (id << 8) ^ (d.toLong << 40)).toDouble / Long.MaxValue
        (center + eps).toFloat
      }.toSeq
      (id, v)
    }.toDF("vec_id", "embedding")
  }

  /** recall@k of `ann` (any (query_id, neighbor_id, rank, ...) frame)
    * vs brute-force truth over `queryIds`. One output row:
    * (n_queries, n_truth, n_hit, recall_x10000) — the DetectorAudit
    * shape, integral for engine-portable compare. */
  def recallAtK(
      spark: SparkSession,
      corpus: DataFrame,
      ann: DataFrame,
      k: Int,
      queryIds: Seq[Long]): DataFrame = {
    import spark.implicits._
    val truth = EmbeddingSim.bruteForceTopK(spark, corpus, queryIds, k)
      .select($"query_id", $"neighbor_id")
    val annSel = ann
      .filter($"query_id".isin(queryIds: _*) && $"rank" <= k)
      .select($"query_id", $"neighbor_id")
    val hit = truth.join(annSel, Seq("query_id", "neighbor_id"), "left_semi")
    truth.agg(
      countDistinct($"query_id").as("n_queries"),
      count(lit(1)).as("n_truth"))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select($"n_queries", $"n_truth", $"n_hit",
        floor(lit(10000.0) * $"n_hit" / $"n_truth").cast("bigint").as("recall_x10000"))
  }
}
