package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall audit of a sampled/approximate pair detector against an
  * exact baseline on the same corpus — the measurement the north-rule
  * recall criterion (dup-pair recall ≥ 0.99) is stated in terms of.
  *
  * The canonical use pairs the winnowed-anchor substring detector
  * (samples 1/s of gram fingerprints, misses a shared L-run with
  * probability (1-1/s)^(L-q+1)) with [[SuffixArrayDetector]] (finds
  * every shared ≥ q-token run by construction): the audit turns that
  * analytic bound into a measured number for any corpus.
  *
  * Scale: pairs are normalized (small, small) tuples; two groupless
  * joins on the pair key with map-side-combinable counts — no
  * all-pairs, no driver collect beyond the single summary row.
  */
object DetectorAudit {

  /** One summary row: n_truth, n_detected, n_hit, recall_x10000
    * (recall in basis points — integral, so DuckDB-comparable without
    * float drift). Pairs are direction-normalized before comparison;
    * `detected` pairs outside `truth` (possible when the detectors'
    * decision rules differ) count toward n_detected but not n_hit. */
  def pairRecall(spark: SparkSession, detected: DataFrame, truth: DataFrame): DataFrame = {
    import spark.implicits._
    def norm(df: DataFrame): DataFrame = df
      .select(
        least($"doc_a", $"doc_b").as("pa"),
        greatest($"doc_a", $"doc_b").as("pb"))
      .dropDuplicates("pa", "pb")
    val d = norm(detected)
    val t = norm(truth)
    val hits = t.join(d, Seq("pa", "pb"), "left_semi")
    t.agg(count(lit(1)).as("n_truth"))
      .crossJoin(d.agg(count(lit(1)).as("n_detected")))
      .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
      .select(
        $"n_truth", $"n_detected", $"n_hit",
        when($"n_truth" === 0, lit(10000L))
          .otherwise(floor(($"n_hit" * 10000L) / $"n_truth"))
          .cast("long").as("recall_x10000"))
  }
}
