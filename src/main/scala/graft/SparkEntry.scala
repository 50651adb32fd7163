package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators._

/** Driver contract — one `queries` entry per implemented operator family
  * (SURVEY.md §2), with DuckDB-checkable `oracleSql` for the
  * SQL-expressible subset. Signature/LSH/CC/restore semantics are
  * verified by the ScalaTest suites (they need the synthetic corpus with
  * planted ground truth; see FIXTURES.md).
  *
  * The transcripts-like view is derived deterministically from the
  * driver's `events` table (FIXTURES.md §4): conv_id := user_id,
  * turn_idx := dense order by (ts, event_id) within user,
  * text := event_type || ':' || props.
  */
object SparkEntry {

  private def readT(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The shared events→transcripts derivation (keep in lockstep with
    * [[transcriptsViewSql]]). */
  def transcriptsView(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    readT(spark, dir, "events")
      .withColumn("turn_idx", (row_number().over(w) - 1).cast("int"))
      .select(
        concat(lit("c"), $"user_id".cast("string")).as("conv_id"),
        $"turn_idx",
        when($"event_type".isin("signup", "login", "search"), "user")
          .when($"event_type" === "error", "tool")
          .otherwise("assistant").as("role"),
        concat($"event_type", lit(":"), $"props").as("text"),
        when($"event_type" === "error", "tool_err").otherwise("").as("tool"),
        $"ts")
  }

  /** DuckDB-side rendering of the same view (ANSI-ish SQL). */
  private val transcriptsViewSql: String =
    """SELECT 'c' || CAST(user_id AS VARCHAR) AS conv_id,
      |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
      |  CASE WHEN event_type IN ('signup','login','search') THEN 'user'
      |       WHEN event_type = 'error' THEN 'tool' ELSE 'assistant' END AS role,
      |  event_type || ':' || props AS text,
      |  CASE WHEN event_type = 'error' THEN 'tool_err' ELSE '' END AS tool,
      |  ts
      |FROM events""".stripMargin

  /** Flagship: full dedup over the sf0.001 events-derived transcripts —
    * every turn mapped to its canonical first occurrence. */
  def entry(spark: SparkSession): DataFrame = {
    val t = transcriptsView(spark, "/root/testdata/sf0.001")
    ExactDedup.dedupTurns(spark, t)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- dedup-engine operators over the events-derived transcripts ----
    "q_turn_dedup" -> ((s, dir) => {
      import s.implicits._
      ExactDedup.dedupTurns(s, transcriptsView(s, dir))
        .select(
          $"conv_id", $"turn_idx",
          $"rep_conv_id", $"rep_turn_idx",
          $"is_unique", $"n_refs")
    }),
    "q_dedup_stats" -> ((s, dir) => {
      import s.implicits._
      ExactDedup.stats(s, transcriptsView(s, dir))
        .select($"total_turns", $"unique_turns", $"dup_turns",
          round($"dedup_ratio", 4).as("dedup_ratio"))
    }),
    "q_doc_assembly" -> ((s, dir) => {
      import s.implicits._
      DocAssembly.assemble(s, transcriptsView(s, dir)).toDF
        .select($"conv_id", $"doc_text", $"n_turns",
          unix_micros($"ts_min".cast("timestamp")).as("ts_min_us"))
    }),
    "q_doc_exact_pairs" -> ((s, dir) => {
      import s.implicits._
      val docs = DocAssembly.assemble(s, transcriptsView(s, dir)).toDF
      ExactDedup.docDupPairs(s, docs).select($"doc_a", $"doc_b", $"detector")
    }),
    "q_restore_equality" -> ((s, dir) => {
      import s.implicits._
      val t = transcriptsView(s, dir)
      val lineage = ExactDedup.dedupTurns(s, t).select($"conv_id", $"turn_idx", $"fp")
      val restored = Restore.restore(s, lineage, ExactDedup.uniqueTurns(s, t))
      t.select($"conv_id", $"turn_idx", $"text".as("text_in"))
        .join(restored.withColumnRenamed("text", "text_out"), Seq("conv_id", "turn_idx"), "full_outer")
        .agg(
          count(lit(1)).as("turns"),
          sum(when($"text_in".isNull || $"text_out".isNull || $"text_in" =!= $"text_out", 1L)
            .otherwise(0L)).as("mismatches"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_turn_dedup" ->
      s"""WITH t AS ($transcriptsViewSql),
         |r AS (SELECT conv_id, turn_idx, text,
         |        row_number() OVER (PARTITION BY text ORDER BY ts, conv_id, turn_idx) AS rn,
         |        count(*) OVER (PARTITION BY text) AS n_refs
         |      FROM t),
         |firsts AS (SELECT text, conv_id AS rep_conv_id, turn_idx AS rep_turn_idx
         |           FROM r WHERE rn = 1)
         |SELECT r.conv_id, r.turn_idx, firsts.rep_conv_id, firsts.rep_turn_idx,
         |  (r.rn = 1) AS is_unique, r.n_refs AS n_refs
         |FROM r JOIN firsts USING (text)""".stripMargin,
    "q_dedup_stats" ->
      s"""WITH t AS ($transcriptsViewSql)
         |SELECT count(*) AS total_turns,
         |  count(DISTINCT text) AS unique_turns,
         |  count(*) - count(DISTINCT text) AS dup_turns,
         |  round(CAST(count(*) AS DOUBLE) / count(DISTINCT text), 4) AS dedup_ratio
         |FROM t""".stripMargin,
    "q_doc_assembly" ->
      s"""WITH t AS ($transcriptsViewSql)
         |SELECT conv_id,
         |  string_agg(text, chr(30) ORDER BY turn_idx) AS doc_text,
         |  CAST(count(*) AS INT) AS n_turns,
         |  epoch_us(min(ts)) AS ts_min_us
         |FROM t GROUP BY conv_id""".stripMargin,
    "q_doc_exact_pairs" ->
      s"""WITH t AS ($transcriptsViewSql),
         |docs AS (
         |  SELECT conv_id, string_agg(text, chr(30) ORDER BY turn_idx) AS doc_text,
         |         min(ts) AS ts_min
         |  FROM t GROUP BY conv_id),
         |r AS (SELECT conv_id, doc_text,
         |        row_number() OVER (PARTITION BY doc_text ORDER BY ts_min, conv_id) AS rn
         |      FROM docs),
         |canon AS (SELECT doc_text, conv_id AS doc_a FROM r WHERE rn = 1)
         |SELECT canon.doc_a AS doc_a, r.conv_id AS doc_b, 'exact' AS detector
         |FROM r JOIN canon USING (doc_text)
         |WHERE r.conv_id <> canon.doc_a""".stripMargin,
    "q_restore_equality" ->
      s"""WITH t AS ($transcriptsViewSql)
         |SELECT count(*) AS turns, CAST(0 AS BIGINT) AS mismatches FROM t""".stripMargin,
  )
}
