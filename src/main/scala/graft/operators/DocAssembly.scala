package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Doc

/** Turns → per-conversation documents under stable (conv_id, turn_idx)
  * order.
  *
  * Reference analog: replaying a file's recipe in insertion order
  * (/root/reference/src/trace_work.c:141-222, recipe order established
  * at /root/reference/src/metadata.c:91-95).
  *
  * Scale notes: ONE shuffle on conv_id (unavoidable — turns of a
  * conversation may arrive from any input split). `sort_array` over the
  * collected struct keeps ordering inside the aggregation (no global
  * sort). A conversation must fit in one task's memory — true by the
  * data model (transcripts are bounded; the 10×-length skew fixture
  * checks the tail). All expressions are codegen'd built-ins.
  */
object DocAssembly {

  /** Separator inserted between turns when concatenating a document.
    * U+001E (record separator) never occurs in normalized text. */
  val TurnSep = "\u001E"

  /** The one doc_text aggregate both assembly variants share: sort by
    * turn_idx (first struct field) inside the group — stable doc
    * assembly without a global orderBy. `keep` gates which turns
    * contribute (when() without otherwise() is NULL off-role, and
    * collect_list drops NULLs — one conditional aggregate, no
    * pre-filter join). */
  private def docTextAgg(keep: Option[org.apache.spark.sql.Column])
      : org.apache.spark.sql.Column = {
    val entry = struct(col("turn_idx"), col("text"))
    concat_ws(
      TurnSep,
      transform(
        array_sort(collect_list(keep.fold(entry)(c => when(c, entry)))),
        x => x.getField("text")))
  }

  def assemble(spark: SparkSession, transcripts: DataFrame): Dataset[Doc] = {
    import spark.implicits._
    transcripts
      .groupBy($"conv_id")
      .agg(
        docTextAgg(None).as("doc_text"),
        count(lit(1)).cast("int").as("n_turns"),
        min($"ts").as("ts_min"))
      .as[Doc]
  }

  /** Role-filtered assembly for agent/conversation transcripts: the
    * document is built from only `roles`' turns (same stable turn_idx
    * order, same one-shuffle shape as [[assemble]]). Tool outputs in
    * agent transcripts are machine-generated and hyper-repetitive —
    * logs, stack traces, retrieval payloads — so shingling them lets
    * tool noise glue unrelated conversations into one near-dup cluster;
    * production transcript dedup shingles user+assistant text only.
    * `n_turns` still counts ALL turns (the conversation's identity);
    * `n_kept_turns` counts the contributing ones. A conversation with
    * no kept turns yields doc_text = "" (callers filter or route). */
  def assembleRoles(
      spark: SparkSession, transcripts: DataFrame,
      roles: Seq[String]): DataFrame = {
    import spark.implicits._
    require(roles.nonEmpty, "assembleRoles: roles must be non-empty")
    transcripts
      .groupBy($"conv_id")
      .agg(
        docTextAgg(Some($"role".isin(roles: _*))).as("doc_text"),
        count(lit(1)).cast("int").as("n_turns"),
        count(when($"role".isin(roles: _*), lit(1))).cast("int").as("n_kept_turns"),
        min($"ts").as("ts_min"))
  }
}
