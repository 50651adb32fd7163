package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality filtering: score each document with a linear
  * bag-of-words model (term → weight), the workhorse of corpus
  * curation (CCNet's fastText quality classifier, GPT-3's
  * logistic-regression page filter). Training the model is out of
  * scope — the operator takes the trained weights as a table and
  * applies them at corpus scale.
  *
  * Score semantics (integer-portable, ×10000 fixed point):
  * {{{ logit = bias + floor(Σ_i w(token_i) / n_tokens) }}}
  * — the mean token weight plus a bias, i.e. fastText's mean-of-
  * embeddings reduced to 1 dimension. Unknown tokens weigh 0. A doc
  * with no tokens scores just the bias.
  *
  * Scale shape: tokens explode map-side, the weight table joins as a
  * BROADCAST hash join (a vocabulary is ≤ a few million rows — tiny
  * next to the corpus), and the per-doc sum is a partial aggregation,
  * so the one exchange carries only (doc_id, sum, n) — the document
  * text itself never shuffles. At 100 TB this is one scan + one
  * narrow exchange, the same shape as the decontamination pass.
  *
  * Reference analog: the reference gates work per-trace via config
  * thresholds (/root/reference/src/optsmr.c:253-283); this is the
  * content-scored generalization a training pipeline needs.
  */
object QualityModel {

  /** Distinct terms of a corpus under the shared whitespace frame —
    * a convenience for building weight tables in tests/fixtures. At
    * corpus scale this is a full distinct shuffle of the token stream;
    * a production model's vocabulary arrives WITH the trained weights,
    * so [[score]] never needs this on the hot path. */
  def vocabulary(df: DataFrame, textCol: String): DataFrame = {
    val collapsed = TextAnalysis.collapseWs(col(textCol))
    df.select(explode(when(length(collapsed) === 0, array().cast("array<string>"))
      .otherwise(split(collapsed, " "))).as("term")).distinct()
  }

  /** Score `df` rows with a linear term-weight model.
    *
    * @param weights table with columns (`term` STRING, `weight_x10000`
    *                BIGINT) — one row per vocabulary term; broadcast.
    * @param biasX10000 model intercept, ×10000 fixed point.
    * @return input columns + `n_tokens`, `logit_x10000`, `keep`
    *         (logit > 0).
    */
  def score(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      textCol: String,
      weights: DataFrame,
      biasX10000: Long,
      broadcastCapBytes: Long = 256L << 20): DataFrame = {
    require(weights.columns.contains("term") && weights.columns.contains("weight_x10000"),
      "quality model weights need columns (term, weight_x10000)")

    // ONE whitespace frame shared by every curation axis
    // (TextAnalysis.collapseWs): collapse \p{javaWhitespace}, trim,
    // split on single spaces. Empty docs produce zero tokens, not [""].
    val collapsed = TextAnalysis.collapseWs(col(textCol))
    val toks = df.select(
      col(idCol),
      explode(when(length(collapsed) === 0, array().cast("array<string>"))
        .otherwise(split(collapsed, " "))).as("term"))

    // vocab join: unknown terms weigh 0; partial agg folds each map
    // task's tokens to one (id, sum, n) before the exchange. The
    // broadcast hint is SIZE-GATED (guide §3.1: a few hundred MB is
    // fine, multiple GB risks the driver and the 8 GB broadcast cap):
    // vocabularies above `broadcastCapBytes` (plan-stats estimate) fall
    // back to a shuffle join — identical rows either way, only the
    // join strategy changes.
    val w = weights.select(col("term"), col("weight_x10000"))
    val wBytes = w.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.optimizedPlan.stats.sizeInBytes
    val wSide = if (wBytes <= BigInt(broadcastCapBytes)) broadcast(w) else w
    val summed = toks
      .join(wSide, Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(coalesce(col("weight_x10000"), lit(0L))).as("w_sum"),
        count(lit(1)).as("n_tokens"))

    // left join back: docs with zero tokens never reach the explode,
    // so fill (n_tokens = 0, logit = bias) for them
    df.join(summed, Seq(idCol), "left")
      .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
      .withColumn("logit_x10000",
        (lit(biasX10000) + when(col("n_tokens") === 0, lit(0L))
          .otherwise(floor(col("w_sum").cast("double") / col("n_tokens"))))
          .cast("bigint"))
      .withColumn("keep", col("logit_x10000") > 0)
      .drop("w_sum")
  }
}
