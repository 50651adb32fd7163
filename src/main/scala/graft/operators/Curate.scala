package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation verdict — the composition a training-data
  * release actually runs (the public C4 / Gopher / Llama recipe shape):
  * exact dedup (first-writer-wins), repetition filters, PII gate,
  * train/eval decontamination, and a quality floor; one boolean per
  * axis plus the conjunction, so a pipeline can either filter on `keep`
  * or report per-axis loss rates.
  *
  * Scale shape: every axis reuses its operator's own plan — repetition
  * / PII / quality are narrow per-row passes, dedup is the 16 B/doc
  * fingerprint groupBy, decontamination the broadcast gram join — and
  * the verdict assembly joins id-keyed BOOLEAN frames (9 B rows), which
  * AQE plans as co-partitioned hash joins. The text is never shuffled
  * and never scanned more often than the axes themselves require.
  */
object Curate {

  /** One verdict row per doc:
    * (doc_id, is_canonical, rep_ok, pii_ok, decon_ok, quality_ok, keep).
    *  - is_canonical: the doc is its normalized-text group's
    *    first-writer ([[TextAnalysis.keepCorpus]] rule)
    *  - rep_ok: passes the Gopher repetition thresholds
    *  - pii_ok: no email/IP/phone span
    *  - decon_ok: shares no `n`-gram with `bench`
    *  - quality_ok: [[TextAnalysis.qualityScore]] ≥ `minQuality`
    *  - model_ok (only when `model` is given): the linear classifier's
    *    logit is positive ([[QualityModel.score]]'s `keep`) — the
    *    model-scored sixth gate (CCNet-style); absent, the output
    *    schema is unchanged
    *  - keep = all of the above
    *
    * @param model optional (weights-table, bias×10000) for the
    *              model-scored gate; the weight table broadcasts. */
  def report(
      spark: SparkSession, docs: DataFrame, bench: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      minQuality: Long = 60L, n: Int = 13,
      model: Option[(DataFrame, Long)] = None): DataFrame = {
    import spark.implicits._
    val rep = TextAnalysis.repetitionFilter(docs, idCol, textCol)
      .select(col(idCol).as("doc_id"), $"keep".as("rep_ok"))
    val pii = TextAnalysis.piiStats(docs, idCol, textCol)
      .select($"doc_id", (!$"has_pii").as("pii_ok"))
    val qual = TextAnalysis.qualityScore(docs, textCol)
      .select(col(idCol).as("doc_id"),
        ($"quality_score" >= minQuality).as("quality_ok"))
    val canon = TextAnalysis.keepCorpus(docs, idCol, textCol)
      .select($"doc_id", lit(true).as("is_canonical"))
    val decon = Decontaminate.contamination(spark, docs, bench, idCol, textCol, n)
      .select($"doc_id", (!$"contaminated").as("decon_ok"))
    val base = docs.select(col(idCol).as("doc_id"))
      .join(rep, Seq("doc_id"))
      .join(pii, Seq("doc_id"))
      .join(qual, Seq("doc_id"))
      .join(canon, Seq("doc_id"), "left")
      .join(decon, Seq("doc_id"))
    val axesKeep = coalesce($"is_canonical", lit(false)) &&
      $"rep_ok" && $"pii_ok" && $"decon_ok" && $"quality_ok"
    model match {
      case None =>
        base.select($"doc_id",
          coalesce($"is_canonical", lit(false)).as("is_canonical"),
          $"rep_ok", $"pii_ok", $"decon_ok", $"quality_ok",
          axesKeep.as("keep"))
      case Some((weights, bias)) =>
        val m = QualityModel.score(spark, docs, idCol, textCol, weights, bias)
          .select(col(idCol).as("doc_id"), $"keep".as("model_ok"))
        base.join(m, Seq("doc_id"))
          .select($"doc_id",
            coalesce($"is_canonical", lit(false)).as("is_canonical"),
            $"rep_ok", $"pii_ok", $"decon_ok", $"quality_ok", $"model_ok",
            (axesKeep && $"model_ok").as("keep"))
    }
  }
}
