package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Greedy sequence packing for training batches: assign documents to
  * token-budget bins (the public "sample packing" idea — fill each
  * training sequence with multiple short documents instead of padding;
  * e.g. Krell et al. 2021, arXiv:2107.02027). The packing discipline
  * is NEXT-FIT in a deterministic stream order: docs are visited in
  * doc_id order within a group and a new bin opens when the current
  * doc would overflow the budget; an oversized doc (> budget) occupies
  * a bin alone. Next-fit is the one-pass streaming discipline — no
  * state beyond (current bin, fill) — which is what makes it exactly
  * reproducible in SQL and at any scale.
  *
  * Scale shape: ONE exchange on the group key, sortWithinPartitions,
  * one streaming pass (the capSortedByKey pattern) — groups are
  * independent, so parallelism = nGroups; per-group work is linear.
  * The text column is never read (only the token count expression),
  * so the shuffle carries (group, doc_id, n_tokens) rows.
  */
object Packing {

  /** (doc_id, pack_group, bin_seq, n_tokens): bin_seq is the 0-based
    * bin index within pack_group = pmod(doc_id, nGroups). */
  def pack(
      spark: SparkSession, docs: DataFrame, budgetTokens: Long,
      nGroups: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import spark.implicits._
    require(budgetTokens >= 1, "packing: budgetTokens must be >= 1")
    require(nGroups >= 1, "packing: nGroups must be >= 1")
    // fail fast at plan-build time: pmod on a non-numeric id silently
    // yields NULL pack_group, which then crashes the non-nullable
    // (Long,Long,Long) tuple encoder MID-JOB with an opaque error
    val idType = docs.schema(idCol).dataType
    require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(idType),
      s"packing: id column '$idCol' must be integral, got $idType")
    docs
      .select(
        pmod(col(idCol), lit(nGroups.toLong)).as("pack_group"),
        col(idCol).as("doc_id"),
        // NULL text ≡ empty (0 tokens) — the repo-wide convention; an
        // un-coalesced NULL would crash the primitive tuple encoder
        coalesce(TextAnalysis.tokenCount(col(textCol)), lit(0))
          .cast("long").as("n_tokens"))
      .repartition(math.min(nGroups,
        spark.conf.get("spark.sql.shuffle.partitions").toInt), $"pack_group")
      .sortWithinPartitions($"pack_group", $"doc_id")
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        val budget = budgetTokens
        var curGroup = Long.MinValue
        var bin = 0L
        var fill = 0L
        var started = false
        it.map { case (g, id, t) =>
          if (!started || g != curGroup) {
            curGroup = g; started = true; bin = 0L; fill = t
          } else if (fill + t <= budget) {
            fill += t
          } else {
            bin += 1L; fill = t
          }
          (g, id, bin, t)
        }
      }
      .toDF("pack_group", "doc_id", "bin_seq", "n_tokens")
  }
}
