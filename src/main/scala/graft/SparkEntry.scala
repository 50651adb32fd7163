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
    // the window partitions by conv_id (a BIJECTION of user_id — same
    // groups, same order, identical turn_idx) instead of user_id so the
    // exchange it forces is hashpartitioning(conv_id): every downstream
    // conv_id-keyed operator (doc assembly's groupBy, the prefix
    // chains) then REUSES this exchange instead of re-shuffling the
    // full turn text a second time (guide §2.4: operations keyed the
    // same way share one exchange).
    val w = Window.partitionBy($"conv_id").orderBy($"ts", $"event_id")
    readT(spark, dir, "events")
      .withColumn("conv_id", concat(lit("c"), $"user_id".cast("string")))
      .withColumn("turn_idx", (row_number().over(w) - 1).cast("int"))
      .select(
        $"conv_id",
        $"turn_idx",
        when($"event_type".isin("signup", "login", "search"), "user")
          .when($"event_type" === "error", "tool")
          .otherwise("assistant").as("role"),
        concat($"event_type", lit(":"), $"props").as("text"),
        when($"event_type" === "error", "tool_err").otherwise("").as("tool"),
        $"ts")
  }

  /** Transcripts with PLANTED near-duplicate conversations — makes the
    * detector driver-queries non-vacuous (the raw sf data has no
    * near-dups, so pair queries over it return 0 rows and check
    * nothing). Deterministic and SQL-expressible (lockstep with
    * [[plantedSelSql]]): every conversation whose numeric id ≡ 3
    * (mod 10) gets a copy with conv_id || 'd', one token appended to
    * turn 0's text, and ts shifted +1h (the original stays the
    * first-writer). One perturbed token of a ≥49-turn doc keeps
    * Jaccard ≈ 0.94 and SimHash displacement within the verify radius,
    * so each detector must find EXACTLY the planted pairs. */
  def plantedTranscriptsView(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = transcriptsView(spark, dir)
    val copies = t
      .filter(substring($"conv_id", 2, 18).cast("long") % 10 === 3)
      .select(
        concat($"conv_id", lit("d")).as("conv_id"),
        $"turn_idx",
        $"role",
        when($"turn_idx" === 0, concat($"text", lit(" zqxv"))).otherwise($"text").as("text"),
        $"tool",
        ($"ts" + expr("INTERVAL 1 HOUR")).as("ts"))
    t.unionByName(copies)
  }

  /** Transcripts with PLANTED shared-PREFIX duplicates — makes the
    * prefix-dedup queries non-vacuous (raw conversations rarely share
    * multi-turn heads). Deterministic and SQL-expressible (lockstep
    * with [[prefixPlantedSql]]): every conversation whose numeric id
    * ≡ 7 (mod 10) gets a copy conv_id || 'p' whose first 5 turns are
    * verbatim and whose later turns are replaced with unique text
    * (divergent tail), ts shifted +1h so the original stays the first
    * writer. A selected conversation with <= 5 turns yields an EXACT
    * replay — exercising the full-conversation degenerate case. */
  def prefixPlantedTranscriptsView(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = transcriptsView(spark, dir)
    val copies = t
      .filter(substring($"conv_id", 2, 18).cast("long") % 10 === 7)
      .select(
        concat($"conv_id", lit("p")).as("conv_id"),
        $"turn_idx",
        $"role",
        when($"turn_idx" >= 5,
          concat(lit("uniq:"), $"conv_id", lit("p:"), $"turn_idx".cast("string")))
          .otherwise($"text").as("text"),
        $"tool",
        ($"ts" + expr("INTERVAL 1 HOUR")).as("ts"))
    t.unionByName(copies)
  }

  /** DuckDB rendering of [[prefixPlantedTranscriptsView]]. */
  private def prefixPlantedSql: String =
    s"""SELECT * FROM ($transcriptsViewSql)
       |UNION ALL
       |SELECT conv_id || 'p' AS conv_id, turn_idx, role,
       |  CASE WHEN turn_idx >= 5
       |       THEN 'uniq:' || conv_id || 'p:' || CAST(turn_idx AS VARCHAR)
       |       ELSE text END AS text,
       |  tool, ts + INTERVAL 1 HOUR AS ts
       |FROM ($transcriptsViewSql)
       |WHERE CAST(substring(conv_id, 2) AS BIGINT) % 10 = 7""".stripMargin

  /** DuckDB-side rendering of the planted pair set: (orig, orig||'d')
    * for every selected conversation — the exact expected output of
    * each detector over [[plantedTranscriptsView]]. */
  private def plantedSelSql: String =
    s"""WITH t AS ($transcriptsViewSql),
       |sel AS (SELECT DISTINCT conv_id FROM t
       |        WHERE CAST(substring(conv_id, 2) AS BIGINT) % 10 = 3)
       |SELECT conv_id AS doc_a, conv_id || 'd' AS doc_b FROM sel""".stripMargin

  /** Embeddings with planted EXACT twins: a copy (vec_id + 10^7) of
    * every vec_id ≡ 3 (mod 100). Shared by every ANN / semantic-dedup
    * query; lockstep with the closed-form oracles (the raw corpus is
    * near-orthogonal — top-1 cos ≈ 0.35 — so only planted pairs reach
    * cos ≥ 0.95). */
  private def plantedEmbeddings(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = readT(s, dir, "embeddings").select($"vec_id", $"embedding")
    e.unionByName(e.filter($"vec_id" % 100 === 3)
      .select(($"vec_id" + 10000000L).as("vec_id"), $"embedding"))
  }

  /** Documents with PLANTED PII spans — the raw documents are pure
    * lowercase word tokens (no digits or '@'), so PII queries over them
    * would be all-zero and check nothing. Every doc_id ≡ 3 (mod 10)
    * gets one email + one phone + one IP appended (deterministic,
    * SQL-expressible — lockstep with [[piiDocsSql]]); the untouched
    * rows keep checking the no-false-positive direction. */
  private def plantedPiiDocuments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    readT(s, dir, "documents").select(
      $"doc_id",
      when($"doc_id" % 10 === 3,
        concat($"text", lit(" contact u"), $"doc_id".cast("string"),
          lit("@mail.example.org or 555-867-5309 from 10.1.2.9")))
        .otherwise($"text").as("text"))
  }

  /** Curation corpus: the planted-PII docs plus EXACT duplicate copies
    * (doc_id + 10^6) of every doc_id ≡ 1 (mod 25) — gives q_curate a
    * mix of verdicts: copies fail is_canonical, planted-PII rows fail
    * pii_ok, bench docs fail decon_ok, short docs fail the quality
    * floor, repetitive small-vocabulary docs fail rep_ok. */
  private def plantedCurationDocuments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = plantedPiiDocuments(s, dir)
    base.unionByName(base.filter($"doc_id" % 25 === 1)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text"))
  }

  /** Span-dedup corpus: base documents plus (a) EXACT later copies
    * (doc_id + 10^6) of every doc_id ≡ 1 (mod 25) — the whole copy is a
    * duplicated span, so it must come back fully cut — and (b) later
    * docs (doc_id + 2·10^6) of every doc_id ≡ 2 (mod 25) that share the
    * base text as a PREFIX but append a unique tail token — only the
    * shared prefix is cut, the tail survives. Owners (the base docs)
    * must come back intact. */
  private def spanDupDocuments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = readT(s, dir, "documents").select($"doc_id", $"text")
    base
      .unionByName(base.filter($"doc_id" % 25 === 1)
        .select(($"doc_id" + 1000000L).as("doc_id"), $"text"))
      .unionByName(base.filter($"doc_id" % 25 === 2)
        .select(($"doc_id" + 2000000L).as("doc_id"),
          concat($"text", lit(" uniqtail"), $"doc_id".cast("string")).as("text")))
  }

  /** DuckDB rendering of [[spanDupDocuments]] (single-line for the same
    * stripMargin reason as [[piiDocsSql]]). */
  private val spanDupDocsSql: String =
    "SELECT doc_id, text FROM documents " +
      "UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 25 = 1 " +
      "UNION ALL SELECT doc_id + 2000000 AS doc_id, text || ' uniqtail' || CAST(doc_id AS VARCHAR) AS text " +
      "FROM documents WHERE doc_id % 25 = 2"

  /** Multi-line corpus for LINE-level dedup: each base doc becomes
    * base-text line + (for doc_id ≡ 3 mod 7) one of 5 shared
    * boilerplate lines (high document frequency — the boilerplate-rule
    * target) + a unique tail line; every doc_id ≡ 1 (mod 25) gains an
    * EXACT later copy (doc_id + 10^6) whose every line is owned by the
    * base doc, so the copy must come back fully cut while the owner
    * comes back verbatim. */
  private def multiLineDocuments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lined = readT(s, dir, "documents").select($"doc_id",
      concat($"text", lit("\n"),
        when($"doc_id" % 7 === 3,
          concat(lit("shared boilerplate line "),
            ($"doc_id" % 5).cast("string"), lit("\n"))).otherwise(lit("")),
        lit("tail "), $"doc_id".cast("string")).as("text"))
    lined.unionByName(lined.filter($"doc_id" % 25 === 1)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text"))
  }

  /** DuckDB rendering of [[multiLineDocuments]] (the lined-text
    * expression is interpolated twice so the fixture stays a plain
    * subquery — no nested WITH inside the oracle's own CTE). */
  private val multiLineDocsSql: String = {
    val lined = "SELECT doc_id, text || chr(10) || " +
      "CASE WHEN doc_id % 7 = 3 THEN 'shared boilerplate line ' || CAST(doc_id % 5 AS VARCHAR) || chr(10) ELSE '' END " +
      "|| 'tail ' || CAST(doc_id AS VARCHAR) AS text FROM documents"
    s"SELECT doc_id, text FROM ($lined) ml1 " +
      s"UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM ($lined) ml2 WHERE doc_id % 25 = 1"
  }

  /** DuckDB replay of [[LineDedup.cutDuplicateLines]] over
    * [[multiLineDocsSql]]: split every doc into (line_idx, line),
    * key on the SAME normalization frame the engine's fp applies
    * internally (lower + whitespace collapse + trim), recompute
    * first-writer ownership + document frequency from the line
    * strings, cut by index, and reassemble the text with chr(10) —
    * a full row-level compare of every output string. With
    * `boilerplate`, lines in >= 4 docs are cut from the owner too. */
  /** Prefix-dedup oracle: recompute every conversation-prefix group
    * from the normalized (role:text) STRINGS — the cumulative
    * string_agg window is the exact-string equivalent of the engine's
    * 128-bit rolling chain — elect first writers by (ts_min, conv_id),
    * and either emit the per-conversation verdict (cut = false,
    * q_prefix_dup) or replay the non-owner head cut row for row
    * (cut = true, q_prefix_cut, minTurns = 2). */
  private def prefixOracleSql(cut: Boolean): String = {
    val base =
      s"""WITH tt AS ($prefixPlantedSql),
         |n AS (SELECT conv_id, turn_idx, ts,
         |        trim(regexp_replace(lower(role || ':' || text), '\\s+', ' ', 'g')) AS key,
         |        CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS INT) AS len
         |      FROM tt),
         |p AS (SELECT conv_id, turn_idx, len,
         |        string_agg(key, chr(30)) OVER (PARTITION BY conv_id ORDER BY turn_idx
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pref
         |      FROM n),
         |c AS (SELECT conv_id, min(ts) AS ts_min FROM tt GROUP BY conv_id),
         |g AS (SELECT pref, CAST(count(*) AS BIGINT) AS n_sharing
         |      FROM p GROUP BY pref HAVING count(*) >= 2),
         |own AS (SELECT pref, conv_id AS owner_conv_id FROM (
         |          SELECT p2.pref, p2.conv_id,
         |            row_number() OVER (PARTITION BY p2.pref ORDER BY c.ts_min, p2.conv_id) AS rn
         |          FROM p p2 JOIN c ON p2.conv_id = c.conv_id) WHERE rn = 1),
         |sh AS (SELECT p.conv_id, p.len, p.turn_idx, g.n_sharing, o.owner_conv_id
         |       FROM p JOIN g USING (pref) JOIN own o USING (pref)),
         |v AS (SELECT conv_id, CAST(max(len) AS INT) AS prefix_len,
         |        arg_max(n_sharing, len) AS n_sharing,
         |        arg_max(owner_conv_id, len) AS owner_conv_id,
         |        arg_max(owner_conv_id, len) = conv_id AS is_owner,
         |        CAST(coalesce(max(CASE WHEN owner_conv_id <> conv_id THEN len END), 0) AS INT) AS cut_len,
         |        CAST(coalesce(max(CASE WHEN owner_conv_id <> conv_id THEN turn_idx END), -1) AS INT) AS cut_idx
         |      FROM sh GROUP BY conv_id)""".stripMargin
    if (!cut) base + "\nSELECT * FROM v"
    else base + "\n" +
      """SELECT tt.conv_id, tt.turn_idx, tt.role, tt.text
        |FROM tt LEFT JOIN (SELECT conv_id, cut_idx FROM v WHERE cut_len >= 2) x
        |  USING (conv_id)
        |WHERE x.cut_idx IS NULL OR tt.turn_idx > x.cut_idx""".stripMargin
  }

  private def lineDedupOracleSql(boilerplate: Boolean): String = {
    val cutCond =
      if (boilerplate) "own.n_docs >= 2 AND (k.doc_id <> own.owner OR own.n_docs >= 4)"
      else "own.n_docs >= 2 AND k.doc_id <> own.owner"
    s"""WITH d AS ($multiLineDocsSql),
       |l AS (SELECT doc_id,
       |        generate_subscripts(string_split(text, chr(10)), 1) - 1 AS line_idx,
       |        unnest(string_split(text, chr(10))) AS line
       |      FROM d),
       |k AS (SELECT doc_id, line_idx,
       |        trim(regexp_replace(lower(line), '\\s+', ' ', 'g')) AS norm
       |      FROM l),
       |own AS (SELECT norm, min(doc_id) AS owner, count(DISTINCT doc_id) AS n_docs
       |        FROM k WHERE norm <> '' GROUP BY norm),
       |cuts AS (SELECT k.doc_id, k.line_idx
       |         FROM k JOIN own USING (norm)
       |         WHERE $cutCond),
       |agg AS (SELECT doc_id, count(*) AS n_cut FROM cuts GROUP BY doc_id),
       |kept AS (SELECT l.doc_id, l.line_idx, l.line
       |         FROM l LEFT JOIN cuts c
       |           ON l.doc_id = c.doc_id AND l.line_idx = c.line_idx
       |         WHERE c.doc_id IS NULL)
       |SELECT d.doc_id,
       |  coalesce(kk.cut_text, '') AS cut_text,
       |  CAST(coalesce(agg.n_cut, 0) AS BIGINT) AS n_cut_lines
       |FROM d
       |LEFT JOIN (SELECT doc_id, string_agg(line, chr(10) ORDER BY line_idx) AS cut_text
       |           FROM kept GROUP BY doc_id) kk USING (doc_id)
       |LEFT JOIN agg USING (doc_id)""".stripMargin
  }

  /** DuckDB rendering of [[plantedPiiDocuments]]. Kept single-line so
    * embedding it inside another stripMargin'd SQL string can't eat a
    * line-leading `||` operator's first pipe. */
  private val piiDocsSql: String =
    "SELECT doc_id, CASE WHEN doc_id % 10 = 3 THEN text || ' contact u' || " +
      "CAST(doc_id AS VARCHAR) || '@mail.example.org or 555-867-5309 from 10.1.2.9' " +
      "ELSE text END AS text FROM documents"

  /** ANN contract checker shared by every ANN family (RHP-LSH, IVF),
    * fully DuckDB-oracled (q_restore_equality pattern: Spark computes
    * the violation counts, DuckDB pins their exact expected values).
    * The ANN result is a deterministic function of the seeded model —
    * reproducible in Spark but not SQL-expressible — so the oracle pins
    * the INVARIANTS that hold for any correct run over the
    * [[plantedEmbeddings]] corpus:
    *   - every emitted pair's cos_x10000 equals an independently
    *     re-joined exact-cosine recompute (cosineCol itself is
    *     DuckDB-anchored by q_embed_top1's full hash match against
    *     list_cosine_similarity) → cos_mismatches = 0
    *   - per query, ranks are exactly 1..m with non-increasing cosine
    *     → rank_violations = 0; no self pairs, no duplicate pairs
    *   - recall floor: every planted identical copy is found at rank 1,
    *     cos ≥ 0.999, in BOTH directions → planted_found_rank1 =
    *     n_planted = 2·|sel|
    * Non-vacuity is structural: n_planted > 0, and an empty ANN result
    * would fail the recall row. */
  private def annInvariants(
      s: SparkSession, corpus: DataFrame,
      ann: DataFrame => DataFrame, k: Int): DataFrame = {
    import s.implicits._
    val topk = ann(corpus)
    val embD = corpus.select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val w = Window.partitionBy($"query_id").orderBy($"rank")
    val checked = topk
      .join(embD.withColumnsRenamed(Map("vec_id" -> "query_id", "embedding" -> "q_emb")),
        Seq("query_id"))
      .join(embD.withColumnsRenamed(Map("vec_id" -> "neighbor_id")), Seq("neighbor_id"))
      .withColumn("cos2_x10000",
        floor(EmbeddingSim.cosineCol($"q_emb", $"embedding") * 10000).cast("bigint"))
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_cos", lag($"cos_x10000", 1).over(w))
      .withColumn("is_planted",
        ($"query_id" % 100 === 3 && $"neighbor_id" === $"query_id" + 10000000L) ||
        ($"query_id" >= 10000000L && $"neighbor_id" === $"query_id" - 10000000L))
    val agg = checked.agg(
      coalesce(sum(when($"is_planted" && $"rank" === 1 && $"cos_x10000" >= 9990, 1L)
        .otherwise(0L)), lit(0L)).as("planted_found_rank1"),
      coalesce(sum(when($"cos2_x10000" =!= $"cos_x10000", 1L).otherwise(0L)), lit(0L))
        .as("cos_mismatches"),
      coalesce(sum(when($"rn" =!= $"rank" || $"rank" > k ||
        ($"prev_cos".isNotNull && $"prev_cos" < $"cos_x10000"), 1L).otherwise(0L)), lit(0L))
        .as("rank_violations"),
      coalesce(sum(when($"query_id" === $"neighbor_id", 1L).otherwise(0L)), lit(0L))
        .as("self_pairs"),
      (count(lit(1)) - countDistinct($"query_id", $"neighbor_id")).as("dup_pairs"))
    val nPlanted = corpus.filter($"vec_id" >= 10000000L)
      .agg((count(lit(1)) * 2).as("n_planted"))
    agg.crossJoin(nPlanted)
      .select($"n_planted", $"planted_found_rank1", $"cos_mismatches",
        $"rank_violations", $"self_pairs", $"dup_pairs")
  }

  /** Empty (doc_a, doc_b, detector) result — the expected output of
    * every detector over the raw (dup-free) sf corpora. */
  private val emptyPairsSql: String =
    """SELECT CAST(NULL AS VARCHAR) AS doc_a, CAST(NULL AS VARCHAR) AS doc_b,
      |  CAST(NULL AS VARCHAR) AS detector WHERE 1 = 0""".stripMargin

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
    // role-filtered assembly: the near-dup document built from
    // user+assistant turns only (tool turns — machine noise — counted
    // but excluded from the text); full row-level doc_text compare
    "q_doc_assembly_roles" -> ((s, dir) => {
      import s.implicits._
      DocAssembly.assembleRoles(s, transcriptsView(s, dir), Seq("user", "assistant"))
        .select($"conv_id", $"doc_text", $"n_turns", $"n_kept_turns",
          unix_micros($"ts_min".cast("timestamp")).as("ts_min_us"))
    }),
    "q_doc_exact_pairs" -> ((s, dir) => {
      import s.implicits._
      val docs = DocAssembly.assemble(s, transcriptsView(s, dir)).toDF
      ExactDedup.docDupPairs(s, docs).select($"doc_a", $"doc_b", $"detector")
    }),
    // shared-conversation-prefix detection over the planted-prefix
    // transcripts (system-prompt/few-shot duplication): per conv the
    // longest head shared with anyone + its group size/first writer +
    // the non-owner cut extent; DuckDB recomputes every prefix group
    // from the normalized (role:text) STRINGS
    "q_prefix_dup" -> ((s, dir) =>
      PrefixDedup.sharedPrefixes(s, prefixPlantedTranscriptsView(s, dir))),
    // prefix remediation: full row-level compare of the cut transcripts
    // (first writer keeps its head, every later copy loses exactly the
    // shared turns; an exact replay loses all its rows)
    "q_prefix_cut" -> ((s, dir) => {
      import s.implicits._
      PrefixDedup.cutSharedPrefixes(s, prefixPlantedTranscriptsView(s, dir), minTurns = 2)
        .select($"conv_id", $"turn_idx", $"role", $"text")
    }),
    // turn-template mining over the RAW transcripts (digit-masked
    // parametric duplicates — naturally non-vacuous: the events corpus
    // masks to a handful of hub templates); DuckDB recomputes every
    // template string, its counts, and the first-writer representative
    "q_template_mining" -> ((s, dir) =>
      TemplateMining.mineTemplates(s, transcriptsView(s, dir))),
    // corpus duplication profile over the span-dup corpus (planted
    // copies give a real df>=2 tail); DuckDB recomputes every gram's
    // document frequency from the gram STRINGS
    "q_dup_profile" -> ((s, dir) =>
      SpanDedup.duplicationProfile(s, spanDupDocuments(s, dir), n = 13)),
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
    // ---- detectors over the RAW corpus: a no-false-positive check.
    // The sf corpora contain no near-duplicate conversations, so the
    // contract is an EMPTY result — the oracle asserts emptiness (the
    // recall direction is covered by the *_planted twins below, whose
    // expected output is the exact planted pair set).
    "q_minhash_pairs" -> ((s, dir) => {
      val docs = DocAssembly.assemble(s, transcriptsView(s, dir))
      MinHashLSH.dupPairs(s, docs, DedupConfig.default).toDF
        .select("doc_a", "doc_b", "detector")
    }),
    "q_simhash_pairs" -> ((s, dir) => {
      val docs = DocAssembly.assemble(s, transcriptsView(s, dir))
      SimHashDetector.dupPairs(s, docs, DedupConfig.default).toDF
        .select("doc_a", "doc_b", "detector")
    }),
    "q_substring_pairs" -> ((s, dir) => {
      val docs = DocAssembly.assemble(s, transcriptsView(s, dir))
      SubstringDetector.dupPairs(s, docs, DedupConfig.default).toDF
        .select("doc_a", "doc_b", "detector")
    }),
    "q_suffixarray_pairs" -> ((s, dir) => {
      // exact pass: STRONGER emptiness than q_substring_pairs — the
      // winnowed detector could miss a short shared run its sampling
      // skipped; the suffix-array pass provably cannot
      val docs = DocAssembly.assemble(s, transcriptsView(s, dir))
      SuffixArrayDetector.dupPairs(s, docs, DedupConfig.default).toDF
        .select("doc_a", "doc_b", "detector")
    }),
    // ---- planted-dup detector checks (full DuckDB oracle: expected
    // output is exactly the planted pair set; see plantedTranscriptsView)
    "q_minhash_planted" -> ((s, dir) => {
      val docs = DocAssembly.assemble(s, plantedTranscriptsView(s, dir))
      MinHashLSH.dupPairs(s, docs, DedupConfig.default).toDF
        .select("doc_a", "doc_b")
    }),
    "q_simhash_planted" -> ((s, dir) => {
      val docs = DocAssembly.assemble(s, plantedTranscriptsView(s, dir))
      SimHashDetector.dupPairs(s, docs, DedupConfig.default).toDF
        .select("doc_a", "doc_b")
    }),
    "q_substring_planted" -> ((s, dir) => {
      val docs = DocAssembly.assemble(s, plantedTranscriptsView(s, dir))
      SubstringDetector.dupPairs(s, docs, DedupConfig.default).toDF
        .select("doc_a", "doc_b")
    }),
    // the production pairs-stage path: ALL THREE detectors in ONE
    // tokenization pass + ONE tagged key exchange. Each detector must
    // find exactly the planted pairs (the fused sweep is row-identical
    // to the standalone detectors — DetectorSpec), so the full expected
    // output is the planted pair set × the three detector names.
    "q_fused3_planted" -> ((s, dir) => {
      val docs = DocAssembly.assemble(s, plantedTranscriptsView(s, dir))
      FusedDetectors.dupPairs(s, docs, DedupConfig.default, withSubstring = true).toDF
        .select("doc_a", "doc_b", "detector")
    }),
    "q_suffixarray_planted" -> ((s, dir) => {
      val docs = DocAssembly.assemble(s, plantedTranscriptsView(s, dir))
      SuffixArrayDetector.dupPairs(s, docs, DedupConfig.default).toDF
        .select("doc_a", "doc_b")
    }),
    "q_detector_audit" -> ((s, dir) => {
      // sampled (winnowed) vs exact (suffix-array) on the planted
      // corpus: both find exactly the planted pair set (their planted
      // queries prove it), so the audit row is closed-form — n_truth =
      // n_detected = n_hit = |planted|, recall = 1.0
      val docs = DocAssembly.assemble(s, plantedTranscriptsView(s, dir))
      val cfg = DedupConfig.default
      DetectorAudit.pairRecall(s,
        SubstringDetector.dupPairs(s, docs, cfg).toDF,
        SuffixArrayDetector.dupPairs(s, docs, cfg).toDF)
    }),
    "q_cluster_planted_stats" -> ((s, dir) => {
      import s.implicits._
      val docs = DocAssembly.assemble(s, plantedTranscriptsView(s, dir))
      val pairs = ExactDedup.docDupPairs(s, docs.toDF).as[DupPair]
        .unionByName(FusedDetectors.dupPairs(s, docs, DedupConfig.default))
      Clustering.assign(s, docs, pairs, DedupConfig.default).toDF
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct($"cluster_id").as("n_clusters"))
    }),
    // full cluster-membership oracle over the planted corpus: every
    // conversation's (cluster_id, representative, is_representative) is
    // exactly predictable — planted copies join their original's
    // cluster (cluster_id = lexicographic min member = the original;
    // representative = first occurrence by (ts_min, conv_id) = the
    // original, whose copy is ts-shifted +1h), everyone else is a
    // singleton.
    "q_incremental_cluster" -> ((s, dir) => {
      // corpus-growth path: previous run = full pipeline over the RAW
      // corpus; increment = the planted copies, ingested from signature
      // tables only (no old text). The warm-started clustering must
      // equal the full planted clustering — same oracle as
      // q_cluster_planted_members.
      import s.implicits._
      val cfg = DedupConfig.default
      val oldDocs = DocAssembly.assemble(s, transcriptsView(s, dir))
      val newDocs = DocAssembly.assemble(s, plantedTranscriptsView(s, dir))
        .filter($"conv_id".endsWith("d"))
      val prevPairs = ExactDedup.docDupPairs(s, oldDocs.toDF).as[DupPair]
        .unionByName(FusedDetectors.dupPairs(s, oldDocs, cfg))
      val prev = Clustering.assign(s, oldDocs, prevPairs, cfg).toDF.cache()
      prev.count() // materialize before updateLabels' CC run retires blocks
      val stored = IncrementalNearDup.signatureTable(s, oldDocs, cfg)
      val freshT = IncrementalNearDup.signatureTable(s, newDocs, cfg)
      val tsMin = stored.select($"conv_id", $"ts_min")
        .unionByName(freshT.select($"conv_id", $"ts_min"))
      val incPairs = IncrementalNearDup.newTouchingPairs(s, stored, freshT, cfg)
      IncrementalNearDup.updateLabels(s, prev, incPairs, tsMin, cfg).toDF
        .select($"conv_id", $"cluster_id", $"representative", $"is_representative")
    }),
    "q_cluster_planted_members" -> ((s, dir) => {
      import s.implicits._
      val docs = DocAssembly.assemble(s, plantedTranscriptsView(s, dir))
      val pairs = ExactDedup.docDupPairs(s, docs.toDF).as[DupPair]
        .unionByName(FusedDetectors.dupPairs(s, docs, DedupConfig.default))
      Clustering.assign(s, docs, pairs, DedupConfig.default).toDF
        .select($"conv_id", $"cluster_id", $"representative", $"is_representative")
    }),
    // score-ranked representative re-election over the planted
    // clusters: rep = argmax(score, tiebreak min conv_id) per cluster.
    // Fixture score = token count (longest-copy-wins, a standard
    // curation rule) — the planted copy appends one token, so it MUST
    // win every planted cluster's election while the first-writer rule
    // (q_cluster_planted_members) keeps the original: the two queries
    // together pin that the election actually re-ranks. The oracle
    // recomputes every assembled doc's token count from scratch and
    // replays the argmax.
    "q_cluster_rep_quality" -> ((s, dir) => {
      import s.implicits._
      val docs = DocAssembly.assemble(s, plantedTranscriptsView(s, dir))
      val pairs = ExactDedup.docDupPairs(s, docs.toDF).as[DupPair]
        .unionByName(FusedDetectors.dupPairs(s, docs, DedupConfig.default))
      val assigns = Clustering.assign(s, docs, pairs, DedupConfig.default)
      val scores = docs.toDF.select($"conv_id",
        TextAnalysis.tokenCount($"doc_text").cast("long").as("score"))
      Clustering.electRepresentative(s, assigns, scores, scoreCol = "score").toDF
        .select($"conv_id", $"cluster_id", $"representative", $"is_representative")
    }),
    // full-oracle over the RAW corpus: the sf data is dup-free, so the
    // exact expected output is "every conversation is its own singleton
    // cluster and representative" — the same SQL as
    // q_cluster_planted_members minus the planted union.
    "q_clusters" -> ((s, dir) => {
      import s.implicits._
      val docs = DocAssembly.assemble(s, transcriptsView(s, dir))
      val pairs = ExactDedup.docDupPairs(s, docs.toDF).as[DupPair]
        .unionByName(FusedDetectors.dupPairs(s, docs, DedupConfig.default))
      Clustering.assign(s, docs, pairs, DedupConfig.default).toDF
        .select($"conv_id", $"cluster_id", $"representative", $"is_representative")
    }),
    // ---- text analysis over the documents table ----
    "q_token_count" -> ((s, dir) => {
      import s.implicits._
      readT(s, dir, "documents")
        .select($"doc_id", TextAnalysis.tokenCount($"text").cast("bigint").as("n_tokens"))
    }),
    "q_subword_tokens" -> ((s, dir) => {
      import s.implicits._
      readT(s, dir, "documents")
        .select($"doc_id", TextAnalysis.subwordTokenCount($"text").as("n_subtokens"))
    }),
    "q_quality" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.qualityScore(readT(s, dir, "documents"))
        .select($"doc_id", $"n_tokens", $"n_punct",
          $"mean_tok_len_x10000", $"punct_ratio_x10000", $"quality_score")
    }),
    "q_lang_dist" -> ((s, dir) => {
      import s.implicits._
      readT(s, dir, "documents")
        .groupBy(TextAnalysis.langId($"text").as("pred_lang"))
        .agg(count(lit(1)).as("n"))
    }),
    // Gopher-style repetition signals + keep decision, full row-level
    // oracle (DuckDB recomputes every ratio from the token lists).
    "q_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionFilter(readT(s, dir, "documents"))),
    // fingerprint invariant oracle: doc_fp = hash(normalized text), so
    // the fp is injective on the corpus exactly when distinct-fp count
    // equals distinct-normalized-text count (also pins the
    // normalization granularity: lowercase + whitespace collapse).
    "q_doc_fingerprint" -> ((s, dir) => {
      import s.implicits._
      TextAnalysis.fingerprint(readT(s, dir, "documents"))
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct($"doc_fp").as("n_distinct_fp"))
    }),
    // deduped-corpus export: kept doc per distinct normalized text +
    // reference count — DuckDB re-derives it by grouping on the
    // normalized text itself (the engine groups on the 128-bit fp so
    // only 16 B/doc shuffle; same groups absent collisions)
    "q_dedup_keep" -> ((s, dir) =>
      TextAnalysis.keepCorpus(readT(s, dir, "documents"))),
    // deterministic stratified sample: per-language permille quotas on
    // pmod(doc_id, 1000) — reproducible in any engine, exactly
    "q_sample_stratified" -> ((s, dir) => {
      import s.implicits._
      Sampling.stratified(readT(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> 200, "zh" -> 500), defaultPermille = 50)
        .select($"doc_id", $"lang")
    }),
    // temperature (T=2) mixture rebalancing: per-language keep rate
    // floor(400 * sqrt(n_min/n_s)) ‰ on pmod(doc_id, 1000) — α = 1/2
    // keeps the rate IEEE-correctly-rounded (sqrt + division only), so
    // DuckDB re-derives the subset bit-for-bit
    "q_sample_temperature" -> ((s, dir) => {
      import s.implicits._
      Sampling.temperatureT2(readT(s, dir, "documents"), "doc_id", "lang",
        basePermille = 400)
        .select($"doc_id", $"lang")
    }),
    // reproducible global corpus shuffle: order key md5("s1:" || id),
    // realized as range partitioning + in-partition sort (no global
    // rank column); the oracle recomputes the identical key
    "q_shuffle_seeded" -> ((s, dir) => {
      import s.implicits._
      CorpusOrder.seeded(readT(s, dir, "documents").select($"doc_id"),
        "doc_id", seed = "s1", numPartitions = Some(8))
        .select($"doc_id", $"shuffle_key")
    }),
    // percentile gate: keep the top 200‰ of documents by quality
    // score (ties at the cut all kept — threshold semantics). The
    // engine computes the cut from a driver-sized score histogram;
    // the oracle re-derives it with a window cumsum and replays the
    // filter.
    "q_top_fraction" -> ((s, dir) => {
      import s.implicits._
      val q = TextAnalysis.qualityScore(readT(s, dir, "documents"))
        .select($"doc_id", $"quality_score")
      TopFraction.keep(s, q, "quality_score", keepPermille = 200)
    }),
    // model-based quality filtering: linear term-weight model applied
    // via broadcast vocab join + partial-agg mean. The fixture model's
    // weight is a pure function of the term ((len-5)×1000, bias 0), so
    // the oracle recomputes every doc's logit from the token strings
    // while the engine exercises the real weight-TABLE join path.
    "q_quality_model" -> ((s, dir) => {
      import s.implicits._
      val docs = readT(s, dir, "documents")
      val weights = QualityModel.vocabulary(docs, "text")
        .withColumn("weight_x10000", (length($"term") - 5).cast("long") * 1000L)
      QualityModel.score(s, docs, "doc_id", "text", weights, biasX10000 = 0L)
        .select($"doc_id", $"n_tokens", $"logit_x10000", $"keep")
    }),
    // train/eval decontamination: bench set = every doc_id ≡ 0
    // (mod 97) of the SAME corpus (deterministic, SQL-expressible) —
    // bench docs are their own guaranteed hits; DuckDB recomputes every
    // doc's distinct-13-gram count and benchmark-hit count from the
    // gram STRINGS, pinning that the engine's hashed broadcast plan
    // equals exact-string semantics.
    "q_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val docs = readT(s, dir, "documents")
      Decontaminate.contamination(s, docs,
        docs.filter($"doc_id" % 97 === 0), n = 13)
    }),
    // span-level remediation: cut every token covered by a
    // bench-shared 13-gram window; bench docs (their own hits) come
    // back fully cut, clean docs come back normalized-intact. Full
    // row-level oracle: DuckDB recomputes positions from gram STRINGS
    // and replays the window cut with nested list lambdas.
    "q_decon_cut" -> ((s, dir) => {
      import s.implicits._
      val docs = readT(s, dir, "documents")
      Decontaminate.cutSpans(s, docs, docs.filter($"doc_id" % 97 === 0), n = 13)
    }),
    // corpus-internal ExactSubstr remediation: cut every token covered
    // by a 13-gram occurring in >= 2 docs, EXCEPT in the gram's
    // first-writer (min doc_id) — over the span-dup corpus (exact later
    // copies come back fully cut, shared-prefix docs lose exactly the
    // prefix, owners come back intact). Full row-level oracle: DuckDB
    // recomputes ownership from the gram STRINGS and replays the cut.
    "q_substr_cut" -> ((s, dir) =>
      SpanDedup.cutDuplicateSpans(s, spanDupDocuments(s, dir), n = 13)),
    // line-level dedup (C4/RefinedWeb family): over the multi-line
    // corpus — exact later copies come back fully cut (every line owned
    // by the base doc), shared boilerplate lines stay with their first
    // writer, owners come back verbatim. Full row-level oracle: DuckDB
    // recomputes line ownership from the line STRINGS and replays the
    // index cut (pins hashed keying = exact-string semantics).
    "q_line_dedup" -> ((s, dir) =>
      LineDedup.cutDuplicateLines(s, multiLineDocuments(s, dir))),
    // same with the RefinedWeb boilerplate rule: a line in >= 4
    // distinct docs is removed EVERYWHERE (owner included) — the
    // planted boilerplate lines cross that threshold, the df=2
    // copy-owned lines stay first-writer-kept
    "q_line_boilerplate" -> ((s, dir) =>
      LineDedup.cutDuplicateLines(s, multiLineDocuments(s, dir), boilerplateDf = 4L)),
    // PII counts over the planted-PII corpus (planted rows non-vacuous,
    // untouched rows assert zero false positives); DuckDB runs the
    // IDENTICAL RE2-safe regexes.
    "q_pii" -> ((s, dir) =>
      TextAnalysis.piiStats(plantedPiiDocuments(s, dir))),
    // PII redaction: full scrubbed-text row compare (strongest oracle —
    // every output string must match DuckDB's regexp_replace chain).
    "q_pii_scrub" -> ((s, dir) => {
      import s.implicits._
      plantedPiiDocuments(s, dir)
        .select($"doc_id", TextAnalysis.piiScrub($"text").as("scrubbed"))
    }),
    // greedy sequence packing (training-batch assembly): NEXT-FIT in
    // doc_id order within 8 groups, 500-token bins. The oracle replays
    // the identical streaming discipline as a recursive CTE.
    "q_packing" -> ((s, dir) =>
      Packing.pack(s, readT(s, dir, "documents"), budgetTokens = 500L, nGroups = 8)),
    // end-to-end curation verdict over the planted curation corpus —
    // every axis exercised (see plantedCurationDocuments), every axis
    // recomputed by the oracle from scratch
    "q_curate" -> ((s, dir) => {
      import s.implicits._
      val d = plantedCurationDocuments(s, dir)
      Curate.report(s, d, d.filter($"doc_id" % 97 === 0))
    }),
    // same verdict with the model-scored sixth gate: the engine runs
    // the real broadcast weight-table join (fixture weight
    // (len(term)−5)×1000, bias 0), the oracle recomputes every logit
    // from the token strings
    "q_curate_model" -> ((s, dir) => {
      import s.implicits._
      val d = plantedCurationDocuments(s, dir)
      val weights = QualityModel.vocabulary(d, "text")
        .withColumn("weight_x10000", (length($"term") - 5).cast("long") * 1000L)
      Curate.report(s, d, d.filter($"doc_id" % 97 === 0),
        model = Some((weights, 0L)))
    }),
    "q_token_jaccard" -> ((s, dir) => {
      NgramJaccard.pairs(s, readT(s, dir, "documents"),
        "doc_id", "text", n = 1, threshold = 0.5)
    }),
    "q_ngram_jaccard_2" -> ((s, dir) => {
      NgramJaccard.pairs(s, readT(s, dir, "documents"),
        "doc_id", "text", n = 2, threshold = 0.4)
    }),
    // ---- embedding similarity ----
    "q_embed_top1" -> ((s, dir) => {
      import s.implicits._
      EmbeddingSim.bruteForceTopK(s, readT(s, dir, "embeddings"),
        (0L until 20L).toSeq, k = 1)
        .select($"query_id", $"neighbor_id", $"rank")
    }),
    // ANN contract check, fully DuckDB-oracled (q_restore_equality
    // pattern: Spark computes the violation counts, DuckDB pins their
    // exact expected values). The ANN result itself is a deterministic
    // function of the seeded hyperplanes — reproducible in Spark but
    // not SQL-expressible — so the oracle pins the INVARIANTS that hold
    // for any correct run over raw ∪ planted-copies:
    //   - every emitted pair's cos_x10000 equals an independently
    //     re-joined exact-cosine recompute (cosineCol itself is
    //     DuckDB-anchored by q_embed_top1's full hash match against
    //     list_cosine_similarity) → cos_mismatches = 0
    //   - per query, ranks are exactly 1..m with non-increasing cosine
    //     → rank_violations = 0; no self pairs, no duplicate pairs
    //   - recall floor: every planted identical copy (vec_id + 10^7 of
    //     each vec_id ≡ 3 mod 100) is found at rank 1, cos ≥ 0.999, in
    //     BOTH directions → planted_found_rank1 = n_planted = 2·|sel|
    // Non-vacuity is structural: n_planted > 0, and an empty ANN result
    // would fail the recall row.
    "q_embed_ann" -> ((s, dir) =>
      annInvariants(s, plantedEmbeddings(s, dir),
        c => EmbeddingSim.rhpBucketTopK(s, c, k = 5), k = 5)),
    // IVF ANN under the same invariant oracle — the data-adaptive
    // (k-means cells) counterpart of the data-oblivious RHP path.
    // Planted twins share a cell under ANY quantizer (identical
    // vectors, deterministic argmin), so the same recall floor binds.
    "q_ivf_ann" -> ((s, dir) =>
      annInvariants(s, plantedEmbeddings(s, dir),
        c => IvfIndex.ivfTopK(s, c, k = 5), k = 5)),
    // IVF-PQ (IVFADC + exact re-rank) under the same invariant oracle —
    // the compressed-candidate scale path (members ship m BYTES, not
    // d floats). A planted twin shares the query's argmin cell AND
    // argmin codes, so its ADC distance is the global minimum — the
    // same recall floor binds.
    "q_pq_ann" -> ((s, dir) =>
      annInvariants(s, plantedEmbeddings(s, dir),
        c => IvfIndex.pqTopK(s, c, k = 5), k = 5)),
    // PQ recall oracle (q_embed_ann_planted twin)
    "q_pq_planted" -> ((s, dir) => {
      import s.implicits._
      IvfIndex.pqTopK(s, plantedEmbeddings(s, dir), k = 5)
        .filter($"cos_x10000" >= 9990)
        .select($"query_id", $"neighbor_id")
    }),
    // ANN recall oracle: plant an EXACT copy (vec_id + 10^7) of every
    // vec_id ≡ 3 (mod 100). Identical vectors share every RHP bucket
    // (same sign bits in all tables), so the detector must emit each
    // planted pair in both directions at rank 1 (cos = 1.0); the raw
    // corpus is near-orthogonal (top-1 cos ≈ 0.35), so nothing else
    // reaches cos ≥ 0.999.
    "q_embed_ann_planted" -> ((s, dir) => {
      import s.implicits._
      EmbeddingSim.rhpBucketTopK(s, plantedEmbeddings(s, dir), k = 5)
        .filter($"cos_x10000" >= 9990)
        .select($"query_id", $"neighbor_id")
    }),
    // IVF recall oracle (q_embed_ann_planted twin): identical planted
    // vectors share the L2-argmin cell, so IVF must emit each planted
    // pair in both directions at cos = 1.0; the raw corpus is
    // near-orthogonal so nothing else reaches cos ≥ 0.999.
    "q_ivf_planted" -> ((s, dir) => {
      import s.implicits._
      IvfIndex.ivfTopK(s, plantedEmbeddings(s, dir), k = 5)
        .filter($"cos_x10000" >= 9990)
        .select($"query_id", $"neighbor_id")
    }),
    // ANN recall audits over the deterministic clustered corpus at
    // noise = 0: in-cluster vectors are IDENTICAL, so any correct ANN
    // has recall EXACTLY 1 vs brute-force truth (candidates ⊇ the
    // cluster, exact re-rank picks the identical tie-broken top-5) —
    // closed-form oracle. Noisy-corpus recall is asserted in
    // TrainingOpsSpec (the measured-recall direction).
    "q_ann_recall_rhp" -> ((s, _) => {
      val corpus = EmbeddingAudit.clusteredEmbeddings(s, 2000, 32, 40, 0.0)
      EmbeddingAudit.recallAtK(s, corpus,
        EmbeddingSim.rhpBucketTopK(s, corpus, k = 5), 5, (0L until 2000L by 97L))
    }),
    "q_ann_recall_ivf" -> ((s, _) => {
      val corpus = EmbeddingAudit.clusteredEmbeddings(s, 2000, 32, 40, 0.0)
      EmbeddingAudit.recallAtK(s, corpus,
        IvfIndex.ivfTopK(s, corpus, k = 5), 5, (0L until 2000L by 97L))
    }),
    // PQ at noise = 0: in-cluster vectors are identical ⇒ identical
    // codes ⇒ tied minimal ADC; the (adc, vec_id) tie-break keeps the
    // lowest ids — exactly the brute-force truth's tie order — so
    // recall is EXACTLY 1 (rerank = 64 ≥ the 50-member cluster size).
    "q_ann_recall_pq" -> ((s, _) => {
      val corpus = EmbeddingAudit.clusteredEmbeddings(s, 2000, 32, 40, 0.0)
      EmbeddingAudit.recallAtK(s, corpus,
        IvfIndex.pqTopK(s, corpus, k = 5), 5, (0L until 2000L by 97L))
    }),
    // SemDeDup-style semantic dedup, full closed-form oracle: the only
    // cos ≥ 0.95 intra-cell pairs are the planted identical twins, so
    // every original is kept (the twin has the HIGHER id) and every
    // copy maps to its original.
    "q_semantic_dedup" -> ((s, dir) =>
      IvfIndex.semanticDedup(s, plantedEmbeddings(s, dir), threshold = 0.95)),
    // ---- multimodal: full oracle — the synthetic corpus's dup
    // structure (id ≡ 7 mod 8 duplicates id-3) is closed-form, so
    // rep/is_unique/n_refs are exactly predictable without engine-side
    // fingerprints (content_fp itself is engine hash, excluded).
    "q_media_dedup" -> ((s, _) => {
      import s.implicits._
      val feats = Multimodal.extractFeatures(s, Multimodal.syntheticMedia(s, 512))
      Multimodal.dedupMedia(s, feats)
        .select($"media_id", $"kind", $"rep_media_id", $"is_unique", $"n_refs")
    }),
    "q_incremental_dedup" -> ((s, dir) => {
      import s.implicits._
      // corpus = users with even id; batch = odd — the append path
      val t = transcriptsView(s, dir)
      val corpus = t.filter(substring($"conv_id", 2, 10).cast("long") % 2 === 0)
      val batch = t.filter(substring($"conv_id", 2, 10).cast("long") % 2 === 1)
      val corpusFps = operators.ExactDedup.uniqueTurns(s, corpus).select($"fp")
      operators.IncrementalDedup.dedupeAgainst(s, corpusFps, batch, expectedFps = 100000L)
        .agg(
          count(lit(1)).as("batch_rows"),
          sum(when($"is_known", 1L).otherwise(0L)).as("known_rows"))
    }),
    // ---- relational breadth over the TPC-H-ish tables ----
    "q_agg_lineitem" -> ((s, dir) => {
      import s.implicits._
      readT(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity").cast("bigint").as("sum_qty"),
          count(lit(1)).as("n_rows"),
          countDistinct($"l_partkey").as("n_parts"))
    }),
    "q_join_customer_orders" -> ((s, dir) => {
      import s.implicits._
      val c = readT(s, dir, "customer")
      val o = readT(s, dir, "orders")
      o.join(broadcast(c), $"o_custkey" === $"c_custkey")
        .groupBy($"c_nationkey")
        .agg(
          count(lit(1)).as("n_orders"),
          floor(max($"o_totalprice") * 100).cast("bigint").as("max_price_c"))
    }),
    "q_window_latest_order" -> ((s, dir) => {
      import s.implicits._
      // top-1-per-group as max(struct(o_orderdate, o_orderkey)): the
      // lexicographic struct max IS the first row of the rn=1 window
      // (both sort keys descending, no nulls in either column), but it
      // partial-aggregates map-side — the exchange carries one row per
      // customer instead of every order, and there is no window sort
      // (guide §2.3 "aggregate before you shuffle"). Oracle unchanged;
      // result row-identical.
      readT(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(max(struct($"o_orderdate", $"o_orderkey")).as("m"))
        .select($"o_custkey", $"m.o_orderkey".as("latest_orderkey"))
    }),
    "q_anti_customers_no_orders" -> ((s, dir) => {
      import s.implicits._
      val c = readT(s, dir, "customer")
      val o = readT(s, dir, "orders")
      c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey")
    }),
    "q_topk_parts_by_qty" -> ((s, dir) => {
      import s.implicits._
      readT(s, dir, "lineitem")
        .groupBy($"l_partkey")
        .agg(sum($"l_quantity").cast("bigint").as("qty"))
        .orderBy($"qty".desc, $"l_partkey")
        .limit(100)
    }),
  )

  /** Per-axis recompute of the whole curation verdict (repetition,
    * PII, quality, first-writer dedup, 13-gram decon — each CTE is the
    * corresponding single-axis oracle adapted to the curation corpus).
    * With `withModel`, adds the fixture linear model ((len(term)−5)
    * ×1000, bias 0 — the q_quality_model oracle's recompute) as the
    * sixth gate: model_ok = mean token weight > 0, keep ANDs it in. */
  private def curateOracleSql(withModel: Boolean): String = {
    val pii = TextAnalysis.piiPatterns.toMap
    val (email, ip, phone) = (pii("email"), pii("ip"), pii("phone"))
    val modelCtes = if (!withModel) "" else
      s""",
         |mtok AS (SELECT doc_id,
         |    unnest(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS term
         |  FROM d WHERE length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) > 0),
         |magg AS (SELECT doc_id, sum((length(term) - 5) * 1000) AS w_sum, count(*) AS n
         |  FROM mtok GROUP BY doc_id),
         |ml AS (SELECT d.doc_id,
         |    ((CASE WHEN magg.n IS NULL THEN 0
         |       ELSE floor(CAST(magg.w_sum AS DOUBLE) / magg.n) END) > 0) AS model_ok
         |  FROM d LEFT JOIN magg ON magg.doc_id = d.doc_id)""".stripMargin
    val modelCol = if (withModel) " ml.model_ok," else ""
    val modelAnd = if (withModel) " AND ml.model_ok" else ""
    val modelJoin = if (withModel) "\nJOIN ml ON ml.doc_id = d.doc_id" else ""
    s"""WITH base AS ($piiDocsSql),
       |d AS (SELECT * FROM base UNION ALL
       |      SELECT doc_id + 1000000 AS doc_id, text FROM base WHERE doc_id % 25 = 1),
       |t AS (SELECT doc_id,
       |    string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks,
       |    length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS nlen
       |  FROM d),
       |tok AS (SELECT doc_id, unnest(toks) AS tk FROM t WHERE nlen > 0),
       |freq AS (SELECT doc_id, tk, count(*) AS c FROM tok GROUP BY 1, 2),
       |top AS (SELECT doc_id, max(c) AS topc, sum(c) AS nt, count(*) AS nd FROM freq GROUP BY 1),
       |gr AS (SELECT doc_id, len(gl) AS ng, len(list_distinct(gl)) AS ngd
       |      FROM (SELECT doc_id,
       |              list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]) AS gl
       |            FROM t WHERE nlen > 0 AND len(toks) >= 2)),
       |rep AS (SELECT t.doc_id,
       |    ((CASE WHEN coalesce(top.nt, 0) = 0 THEN 0
       |       ELSE floor(10000.0 * (top.nt - top.nd) / top.nt) END) <= 3000
       |     AND (CASE WHEN coalesce(top.nt, 0) = 0 THEN 0
       |       ELSE floor(10000.0 * top.topc / top.nt) END) <= 2500
       |     AND (CASE WHEN coalesce(gr.ng, 0) = 0 THEN 0
       |       ELSE floor(10000.0 * (gr.ng - gr.ngd) / gr.ng) END) <= 2000) AS rep_ok
       |  FROM t LEFT JOIN top USING (doc_id) LEFT JOIN gr USING (doc_id)),
       |pii AS (SELECT doc_id,
       |    (coalesce(len(regexp_extract_all(text, '$email')), 0) = 0
       |     AND coalesce(len(regexp_extract_all(text, '$ip')), 0) = 0
       |     AND coalesce(len(regexp_extract_all(text, '$phone')), 0) = 0) AS pii_ok
       |  FROM d),
       |qf AS (SELECT doc_id,
       |    CAST($tokenCountSql AS BIGINT) AS n_tokens,
       |    CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
       |    length(text) AS len,
       |    length(regexp_replace(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ', '', 'g')) AS nonsp
       |  FROM d),
       |qual AS (SELECT doc_id,
       |    (least(n_tokens, 100) // 2
       |     + (CASE WHEN (CASE WHEN n_tokens = 0 THEN 0 ELSE floor(10000.0 * nonsp / n_tokens) END)
       |            BETWEEN 30000 AND 90000 THEN 30 ELSE 0 END)
       |     + (CASE WHEN (CASE WHEN len = 0 THEN 0 ELSE floor(10000.0 * n_punct / len) END)
       |            <= 1500 THEN 20 ELSE 0 END)) >= 60 AS quality_ok
       |  FROM qf),
       |canon AS (SELECT min(doc_id) AS doc_id
       |  FROM (SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS ntext FROM d)
       |  GROUP BY ntext),
       |dt AS (SELECT doc_id,
       |    string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
       |  FROM d),
       |dg AS (SELECT doc_id, unnest(list_distinct(
       |    list_transform(range(1, len(toks) - 11),
       |      i -> array_to_string(toks[i:i+12], ' ')))) AS gram
       |  FROM dt WHERE len(toks) >= 13),
       |bg AS (SELECT DISTINCT gram FROM dg WHERE doc_id % 97 = 0),
       |hits AS (SELECT DISTINCT dg.doc_id FROM dg JOIN bg USING (gram))$modelCtes
       |SELECT d.doc_id,
       |  (canon.doc_id IS NOT NULL) AS is_canonical,
       |  rep.rep_ok, pii.pii_ok,
       |  (hits.doc_id IS NULL) AS decon_ok,
       |  qual.quality_ok,$modelCol
       |  (canon.doc_id IS NOT NULL AND rep.rep_ok AND pii.pii_ok
       |   AND hits.doc_id IS NULL AND qual.quality_ok$modelAnd) AS keep
       |FROM d
       |LEFT JOIN canon ON canon.doc_id = d.doc_id
       |JOIN rep ON rep.doc_id = d.doc_id
       |JOIN pii ON pii.doc_id = d.doc_id
       |JOIN qual ON qual.doc_id = d.doc_id
       |LEFT JOIN hits ON hits.doc_id = d.doc_id$modelJoin""".stripMargin
  }

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
    "q_doc_assembly_roles" ->
      s"""WITH t AS ($transcriptsViewSql)
         |SELECT conv_id,
         |  coalesce(string_agg(CASE WHEN role IN ('user', 'assistant') THEN text END,
         |                      chr(30) ORDER BY turn_idx), '') AS doc_text,
         |  CAST(count(*) AS INT) AS n_turns,
         |  CAST(count(CASE WHEN role IN ('user', 'assistant') THEN 1 END) AS INT) AS n_kept_turns,
         |  epoch_us(min(ts)) AS ts_min_us
         |FROM t GROUP BY conv_id""".stripMargin,
    // template groups recomputed from the digit-masked normalized
    // STRINGS; representative = row_number() = 1 by (ts, conv_id,
    // turn_idx) — the engine's min-struct election
    "q_template_mining" ->
      s"""WITH t AS ($transcriptsViewSql),
         |m AS (SELECT conv_id, turn_idx, ts,
         |        trim(regexp_replace(lower(regexp_replace(text, '[0-9]+', '0', 'g')),
         |          '\\s+', ' ', 'g')) AS template
         |      FROM t),
         |r AS (SELECT template, conv_id, turn_idx,
         |        row_number() OVER (PARTITION BY template
         |          ORDER BY ts, conv_id, turn_idx) AS rn
         |      FROM m)
         |SELECT m.template,
         |  CAST(count(*) AS BIGINT) AS n_occurrences,
         |  CAST(count(DISTINCT m.conv_id) AS BIGINT) AS n_convs,
         |  min(r.conv_id) AS rep_conv_id,
         |  CAST(min(r.turn_idx) AS INT) AS rep_turn_idx
         |FROM m JOIN (SELECT * FROM r WHERE rn = 1) r USING (template)
         |GROUP BY m.template HAVING count(*) >= 2""".stripMargin,
    // prefix groups recomputed from the normalized (role:text)
    // STRINGS: cumulative string_agg window = the engine's 128-bit
    // rolling chain, row_number by (ts_min, conv_id) = the first-writer
    // rule — pins hashed plan == exact-string semantics
    "q_prefix_dup" -> prefixOracleSql(cut = false),
    // remediation replay: drop each non-owner's head through its
    // cut_idx (>= 2 shared turns), full row-level text compare
    "q_prefix_cut" -> prefixOracleSql(cut = true),
    // duplication profile: per document-frequency bucket, how many
    // DISTINCT 13-grams occur in exactly that many docs — recomputed
    // from the gram strings
    "q_dup_profile" ->
      s"""WITH d AS ($spanDupDocsSql),
         |t AS (
         |  SELECT doc_id, string_split(
         |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
         |  FROM d),
         |gi AS (SELECT doc_id, unnest(range(1, len(toks) - 11)) AS i
         |       FROM t WHERE len(toks) >= 13),
         |g AS (SELECT DISTINCT gi.doc_id,
         |        array_to_string(t.toks[gi.i:gi.i+12], ' ') AS gram
         |      FROM gi JOIN t USING (doc_id)),
         |f AS (SELECT gram, count(*) AS df FROM g GROUP BY gram)
         |SELECT df, CAST(count(*) AS BIGINT) AS n_grams FROM f GROUP BY df""".stripMargin,
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
    "q_incremental_dedup" ->
      s"""WITH t AS ($transcriptsViewSql),
         |corpus AS (SELECT * FROM t WHERE CAST(substring(conv_id, 2) AS BIGINT) % 2 = 0),
         |batch AS (SELECT * FROM t WHERE CAST(substring(conv_id, 2) AS BIGINT) % 2 = 1)
         |SELECT count(*) AS batch_rows,
         |  CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM corpus WHERE corpus.text = batch.text)
         |      THEN 1 ELSE 0 END) AS BIGINT) AS known_rows
         |FROM batch""".stripMargin,
    "q_fused3_planted" ->
      s"""WITH t AS ($transcriptsViewSql),
         |sel AS (SELECT DISTINCT conv_id FROM t
         |        WHERE CAST(substring(conv_id, 2) AS BIGINT) % 10 = 3),
         |d AS (SELECT 'minhash' AS detector
         |      UNION ALL SELECT 'simhash' UNION ALL SELECT 'substring')
         |SELECT conv_id AS doc_a, conv_id || 'd' AS doc_b, detector
         |FROM sel CROSS JOIN d""".stripMargin,
    "q_minhash_planted" -> plantedSelSql,
    "q_simhash_planted" -> plantedSelSql,
    "q_substring_planted" -> plantedSelSql,
    "q_suffixarray_planted" -> plantedSelSql,
    "q_detector_audit" ->
      s"""WITH t AS ($transcriptsViewSql),
         |sel AS (SELECT DISTINCT conv_id FROM t
         |        WHERE CAST(substring(conv_id, 2) AS BIGINT) % 10 = 3)
         |SELECT CAST(count(*) AS BIGINT) AS n_truth,
         |  CAST(count(*) AS BIGINT) AS n_detected,
         |  CAST(count(*) AS BIGINT) AS n_hit,
         |  CAST(10000 AS BIGINT) AS recall_x10000
         |FROM sel""".stripMargin,
    // raw-corpus detector runs must emit NOTHING (no-false-positive
    // guard: the sf corpora contain no near-duplicate conversations)
    "q_minhash_pairs" -> emptyPairsSql,
    "q_simhash_pairs" -> emptyPairsSql,
    "q_substring_pairs" -> emptyPairsSql,
    "q_suffixarray_pairs" -> emptyPairsSql,
    // raw corpus is dup-free ⇒ all-singletons is the exact expected
    // clustering (recall direction covered by q_cluster_planted_members)
    "q_clusters" ->
      s"""WITH t AS ($transcriptsViewSql),
         |ids AS (SELECT DISTINCT conv_id FROM t)
         |SELECT conv_id, conv_id AS cluster_id, conv_id AS representative,
         |       true AS is_representative
         |FROM ids""".stripMargin,
    // incremental warm-start must land on the identical clustering
    "q_incremental_cluster" ->
      s"""WITH t AS ($transcriptsViewSql),
         |ids AS (SELECT DISTINCT conv_id FROM t),
         |sel AS (SELECT conv_id FROM ids
         |        WHERE CAST(substring(conv_id, 2) AS BIGINT) % 10 = 3)
         |SELECT conv_id, conv_id AS cluster_id, conv_id AS representative,
         |       true AS is_representative
         |FROM ids
         |UNION ALL
         |SELECT conv_id || 'd' AS conv_id, conv_id AS cluster_id,
         |       conv_id AS representative, false AS is_representative
         |FROM sel""".stripMargin,
    "q_cluster_planted_members" ->
      s"""WITH t AS ($transcriptsViewSql),
         |ids AS (SELECT DISTINCT conv_id FROM t),
         |sel AS (SELECT conv_id FROM ids
         |        WHERE CAST(substring(conv_id, 2) AS BIGINT) % 10 = 3)
         |SELECT conv_id, conv_id AS cluster_id, conv_id AS representative,
         |       true AS is_representative
         |FROM ids
         |UNION ALL
         |SELECT conv_id || 'd' AS conv_id, conv_id AS cluster_id,
         |       conv_id AS representative, false AS is_representative
         |FROM sel""".stripMargin,
    // score-ranked re-election: rebuild the planted docs (original +
    // 'd'-copy with ' zqxv' appended to turn 0), recompute every doc's
    // token count from scratch, and replay argmax(score, min conv_id)
    // within each planted cluster — every 'd'-copy is one token longer
    // than its original, so it MUST win its cluster's election
    "q_cluster_rep_quality" ->
      s"""WITH t AS ($transcriptsViewSql),
         |ids AS (SELECT DISTINCT conv_id FROM t),
         |sel AS (SELECT conv_id FROM ids
         |        WHERE CAST(substring(conv_id, 2) AS BIGINT) % 10 = 3),
         |pt AS (
         |  SELECT conv_id, turn_idx, text FROM t
         |  UNION ALL
         |  SELECT conv_id || 'd' AS conv_id, turn_idx,
         |         CASE WHEN turn_idx = 0 THEN text || ' zqxv' ELSE text END AS text
         |  FROM t WHERE CAST(substring(conv_id, 2) AS BIGINT) % 10 = 3),
         |docs AS (SELECT conv_id, string_agg(text, chr(30) ORDER BY turn_idx) AS text
         |         FROM pt GROUP BY conv_id),
         |-- the chr(30) turn separator IS whitespace to the engine's
         |-- javaWhitespace frame (U+001C..1F are Java whitespace)
         |-- but NOT to RE2 \\s — collapse both here so turn boundaries
         |-- are token boundaries in both engines
         |dn AS (SELECT conv_id,
         |         trim(regexp_replace(text, '[\\s\\x1e]+', ' ', 'g')) AS ct
         |       FROM docs),
         |q AS (SELECT conv_id,
         |    CAST(CASE WHEN length(ct) = 0 THEN 0
         |         ELSE length(ct) - length(regexp_replace(ct, ' ', '', 'g')) + 1
         |         END AS BIGINT) AS qs
         |  FROM dn),
         |assign AS (
         |  SELECT conv_id, conv_id AS cluster_id FROM ids
         |  UNION ALL
         |  SELECT conv_id || 'd' AS conv_id, conv_id AS cluster_id FROM sel),
         |ranked AS (
         |  SELECT a.conv_id, a.cluster_id, q.qs,
         |    row_number() OVER (PARTITION BY a.cluster_id ORDER BY q.qs DESC, a.conv_id) AS rn
         |  FROM assign a JOIN q USING (conv_id)),
         |reps AS (SELECT cluster_id, conv_id AS representative FROM ranked WHERE rn = 1)
         |SELECT r.conv_id, r.cluster_id, reps.representative,
         |  (r.conv_id = reps.representative) AS is_representative
         |FROM ranked r JOIN reps USING (cluster_id)""".stripMargin,
    "q_doc_fingerprint" ->
      """SELECT count(*) AS n_docs,
        |  count(DISTINCT lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS n_distinct_fp
        |FROM documents""".stripMargin,
    "q_dedup_keep" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_refs
        |FROM (SELECT doc_id,
        |        lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS nt
        |      FROM documents)
        |GROUP BY nt""".stripMargin,
    "q_sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE doc_id % 1000 < CASE lang WHEN 'en' THEN 200
        |                                WHEN 'zh' THEN 500 ELSE 50 END""".stripMargin,
    // α = 1/2 rate: sqrt and division are IEEE correctly-rounded in
    // both engines, so the floor()ed permille rate is bit-identical
    "q_sample_temperature" ->
      """WITH c AS (SELECT lang, count(*) AS n_s FROM documents
        |           WHERE lang IS NOT NULL GROUP BY lang),
        |m AS (SELECT min(n_s) AS n_min FROM c),
        |r AS (SELECT c.lang,
        |        CAST(floor(400.0 * sqrt(CAST(m.n_min AS DOUBLE) / CAST(c.n_s AS DOUBLE))) AS BIGINT) AS rate
        |      FROM c, m)
        |SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
        |WHERE d.doc_id % 1000 < r.rate""".stripMargin,
    // percentile-gate oracle: recompute every doc's quality score,
    // re-derive the cut (smallest score whose top-down cumulative count
    // reaches ceil(200·N/1000)) with a window cumsum, replay the filter
    "q_top_fraction" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    CAST($tokenCountSql AS BIGINT) AS n_tokens,
         |    CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
         |    length(text) AS len,
         |    length(regexp_replace(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ', '', 'g')) AS nonsp
         |  FROM documents),
         |q AS (SELECT doc_id,
         |  CAST(least(n_tokens, 100) // 2
         |    + (CASE WHEN (CASE WHEN n_tokens = 0 THEN 0 ELSE floor(10000.0 * nonsp / n_tokens) END)
         |            BETWEEN 30000 AND 90000 THEN 30 ELSE 0 END)
         |    + (CASE WHEN (CASE WHEN len = 0 THEN 0 ELSE floor(10000.0 * n_punct / len) END)
         |            <= 1500 THEN 20 ELSE 0 END) AS BIGINT) AS quality_score
         |  FROM f),
         |h AS (SELECT quality_score AS s, count(*) AS cnt FROM q GROUP BY 1),
         |t AS (SELECT greatest(1, (200 * sum(cnt) + 999) // 1000) AS target FROM h),
         |c AS (SELECT max(s) AS cutv
         |      FROM (SELECT s, sum(cnt) OVER (ORDER BY s DESC) AS cum FROM h), t
         |      WHERE cum >= t.target)
         |SELECT doc_id, quality_score FROM q
         |WHERE quality_score >= (SELECT cutv FROM c)""".stripMargin,
    // both engines compute the identical lowercase-hex MD5 of the
    // identical "seed:id" string — the order key is engine-portable
    "q_shuffle_seeded" ->
      """SELECT doc_id, md5('s1:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        |FROM documents""".stripMargin,
    // full logit recompute from the token strings: the fixture weight
    // is (length(term)-5)*1000, so the oracle needs no weight table —
    // it pins that the engine's broadcast vocab-join + partial-agg
    // mean equals per-token exact semantics
    "q_quality_model" ->
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS nt
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(string_split(nt, ' ')) AS term
        |  FROM norm WHERE length(nt) > 0),
        |agg AS (
        |  SELECT doc_id, sum((length(term) - 5) * 1000) AS w_sum,
        |         count(*) AS n
        |  FROM toks GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(a.n, 0) AS BIGINT) AS n_tokens,
        |  CAST(CASE WHEN a.n IS NULL THEN 0
        |       ELSE floor(CAST(a.w_sum AS DOUBLE) / a.n) END AS BIGINT) AS logit_x10000,
        |  (CASE WHEN a.n IS NULL THEN 0
        |        ELSE floor(CAST(a.w_sum AS DOUBLE) / a.n) END) > 0 AS keep
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,
    "q_embed_ann" ->
      """WITH sel AS (SELECT vec_id FROM embeddings WHERE vec_id % 100 = 3)
        |SELECT CAST(2 * (SELECT count(*) FROM sel) AS BIGINT) AS n_planted,
        |  CAST(2 * (SELECT count(*) FROM sel) AS BIGINT) AS planted_found_rank1,
        |  CAST(0 AS BIGINT) AS cos_mismatches,
        |  CAST(0 AS BIGINT) AS rank_violations,
        |  CAST(0 AS BIGINT) AS self_pairs,
        |  CAST(0 AS BIGINT) AS dup_pairs""".stripMargin,
    "q_embed_ann_planted" ->
      """WITH sel AS (SELECT vec_id FROM embeddings WHERE vec_id % 100 = 3)
        |SELECT vec_id AS query_id, vec_id + 10000000 AS neighbor_id FROM sel
        |UNION ALL
        |SELECT vec_id + 10000000 AS query_id, vec_id AS neighbor_id FROM sel""".stripMargin,
    "q_ivf_ann" ->
      """WITH sel AS (SELECT vec_id FROM embeddings WHERE vec_id % 100 = 3)
        |SELECT CAST(2 * (SELECT count(*) FROM sel) AS BIGINT) AS n_planted,
        |  CAST(2 * (SELECT count(*) FROM sel) AS BIGINT) AS planted_found_rank1,
        |  CAST(0 AS BIGINT) AS cos_mismatches,
        |  CAST(0 AS BIGINT) AS rank_violations,
        |  CAST(0 AS BIGINT) AS self_pairs,
        |  CAST(0 AS BIGINT) AS dup_pairs""".stripMargin,
    "q_ivf_planted" ->
      """WITH sel AS (SELECT vec_id FROM embeddings WHERE vec_id % 100 = 3)
        |SELECT vec_id AS query_id, vec_id + 10000000 AS neighbor_id FROM sel
        |UNION ALL
        |SELECT vec_id + 10000000 AS query_id, vec_id AS neighbor_id FROM sel""".stripMargin,
    "q_pq_ann" ->
      """WITH sel AS (SELECT vec_id FROM embeddings WHERE vec_id % 100 = 3)
        |SELECT CAST(2 * (SELECT count(*) FROM sel) AS BIGINT) AS n_planted,
        |  CAST(2 * (SELECT count(*) FROM sel) AS BIGINT) AS planted_found_rank1,
        |  CAST(0 AS BIGINT) AS cos_mismatches,
        |  CAST(0 AS BIGINT) AS rank_violations,
        |  CAST(0 AS BIGINT) AS self_pairs,
        |  CAST(0 AS BIGINT) AS dup_pairs""".stripMargin,
    "q_pq_planted" ->
      """WITH sel AS (SELECT vec_id FROM embeddings WHERE vec_id % 100 = 3)
        |SELECT vec_id AS query_id, vec_id + 10000000 AS neighbor_id FROM sel
        |UNION ALL
        |SELECT vec_id + 10000000 AS query_id, vec_id AS neighbor_id FROM sel""".stripMargin,
    "q_ann_recall_pq" ->
      """WITH sel AS (SELECT unnest(range(0, 2000)) AS id) , q AS (SELECT id FROM sel WHERE id % 97 = 0)
        |SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(5 * count(*) AS BIGINT) AS n_truth,
        |  CAST(5 * count(*) AS BIGINT) AS n_hit,
        |  CAST(10000 AS BIGINT) AS recall_x10000
        |FROM q""".stripMargin,
    "q_ann_recall_rhp" ->
      """WITH sel AS (SELECT unnest(range(0, 2000)) AS id) , q AS (SELECT id FROM sel WHERE id % 97 = 0)
        |SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(5 * count(*) AS BIGINT) AS n_truth,
        |  CAST(5 * count(*) AS BIGINT) AS n_hit,
        |  CAST(10000 AS BIGINT) AS recall_x10000
        |FROM q""".stripMargin,
    "q_ann_recall_ivf" ->
      """WITH sel AS (SELECT unnest(range(0, 2000)) AS id) , q AS (SELECT id FROM sel WHERE id % 97 = 0)
        |SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(5 * count(*) AS BIGINT) AS n_truth,
        |  CAST(5 * count(*) AS BIGINT) AS n_hit,
        |  CAST(10000 AS BIGINT) AS recall_x10000
        |FROM q""".stripMargin,
    "q_semantic_dedup" ->
      """WITH sel AS (SELECT vec_id FROM embeddings WHERE vec_id % 100 = 3)
        |SELECT vec_id, vec_id AS rep_id, true AS is_kept FROM embeddings
        |UNION ALL
        |SELECT vec_id + 10000000 AS vec_id, vec_id AS rep_id, false AS is_kept
        |FROM sel""".stripMargin,
    "q_media_dedup" ->
      """WITH m AS (SELECT unnest(range(0, 512)) AS id)
        |SELECT id AS media_id,
        |  CASE CAST(id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |       ELSE 'video' END AS kind,
        |  CASE WHEN id % 8 = 7 THEN id - 3 ELSE id END AS rep_media_id,
        |  (id % 8 <> 7) AS is_unique,
        |  CASE WHEN id % 8 IN (4, 7) THEN 2 ELSE 1 END AS n_refs
        |FROM m""".stripMargin,
    "q_ngram_jaccard_2" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(
        |    regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]))) AS gram
        |  FROM toks WHERE len(t) >= 2),
        |sizes AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id),
        |df AS (SELECT gram, count(*) AS d FROM grams GROUP BY gram),
        |rare AS (SELECT grams.doc_id, grams.gram FROM grams JOIN df USING (gram) WHERE df.d <= 1000),
        |shared AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |  FROM rare a JOIN rare b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT shared.doc_a, shared.doc_b, shared.inter,
        |  sa.n_grams AS na, sb.n_grams AS nb,
        |  CAST(floor(10000.0 * shared.inter / (sa.n_grams + sb.n_grams - shared.inter)) AS BIGINT) AS jaccard_x10000
        |FROM shared
        |JOIN sizes sa ON sa.doc_id = shared.doc_a
        |JOIN sizes sb ON sb.doc_id = shared.doc_b
        |WHERE 1.0 * shared.inter / (sa.n_grams + sb.n_grams - shared.inter) >= 0.4""".stripMargin,
    "q_cluster_planted_stats" ->
      s"""WITH t AS ($transcriptsViewSql),
         |sel AS (SELECT DISTINCT conv_id FROM t
         |        WHERE CAST(substring(conv_id, 2) AS BIGINT) % 10 = 3)
         |SELECT (SELECT count(DISTINCT conv_id) FROM t) + (SELECT count(*) FROM sel) AS n_docs,
         |       (SELECT count(DISTINCT conv_id) FROM t) AS n_clusters""".stripMargin,
    "q_token_count" ->
      s"""SELECT doc_id, CAST($tokenCountSql AS BIGINT) AS n_tokens FROM documents""",
    // identical RE2-safe regex on both sides (see subwordTokenCount)
    "q_subword_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+| +')) AS BIGINT) AS n_subtokens
        |FROM documents""".stripMargin,
    // full row-level recompute of every repetition ratio: the top-token
    // share via unnest+groupBy (set-based), bigrams via the same
    // list_transform(range(...)) shape as q_ngram_jaccard_2
    "q_repetition" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks,
        |    length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS nlen
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(toks) AS tk FROM t WHERE nlen > 0),
        |freq AS (SELECT doc_id, tk, count(*) AS c FROM tok GROUP BY 1, 2),
        |top AS (SELECT doc_id, max(c) AS topc, sum(c) AS n, count(*) AS nd
        |        FROM freq GROUP BY 1),
        |g AS (SELECT doc_id, len(gl) AS ng, len(list_distinct(gl)) AS ngd
        |      FROM (SELECT doc_id,
        |              list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]) AS gl
        |            FROM t WHERE nlen > 0 AND len(toks) >= 2)),
        |r AS (
        |  SELECT t.doc_id,
        |    CAST(coalesce(top.n, 0) AS BIGINT) AS n_tokens,
        |    CAST(CASE WHEN coalesce(top.n, 0) = 0 THEN 0
        |         ELSE floor(10000.0 * (top.n - top.nd) / top.n) END AS BIGINT) AS dup_token_ratio_x10000,
        |    CAST(CASE WHEN coalesce(top.n, 0) = 0 THEN 0
        |         ELSE floor(10000.0 * top.topc / top.n) END AS BIGINT) AS top_token_ratio_x10000,
        |    CAST(CASE WHEN coalesce(g.ng, 0) = 0 THEN 0
        |         ELSE floor(10000.0 * (g.ng - g.ngd) / g.ng) END AS BIGINT) AS dup_2gram_ratio_x10000
        |  FROM t LEFT JOIN top USING (doc_id) LEFT JOIN g USING (doc_id))
        |SELECT doc_id, n_tokens, dup_token_ratio_x10000, top_token_ratio_x10000,
        |  dup_2gram_ratio_x10000,
        |  (dup_token_ratio_x10000 <= 3000 AND top_token_ratio_x10000 <= 2500
        |   AND dup_2gram_ratio_x10000 <= 2000) AS keep
        |FROM r""".stripMargin,
    "q_quality" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    CAST($tokenCountSql AS BIGINT) AS n_tokens,
         |    CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
         |    length(text) AS len,
         |    length(regexp_replace(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ', '', 'g')) AS nonsp
         |  FROM documents)
         |SELECT doc_id, n_tokens, n_punct,
         |  CAST(CASE WHEN n_tokens = 0 THEN 0
         |       ELSE floor(10000.0 * nonsp / n_tokens) END AS BIGINT) AS mean_tok_len_x10000,
         |  CAST(CASE WHEN len = 0 THEN 0
         |       ELSE floor(10000.0 * n_punct / len) END AS BIGINT) AS punct_ratio_x10000,
         |  CAST(least(n_tokens, 100) // 2
         |    + (CASE WHEN (CASE WHEN n_tokens = 0 THEN 0 ELSE floor(10000.0 * nonsp / n_tokens) END)
         |            BETWEEN 30000 AND 90000 THEN 30 ELSE 0 END)
         |    + (CASE WHEN (CASE WHEN len = 0 THEN 0 ELSE floor(10000.0 * n_punct / len) END)
         |            <= 1500 THEN 20 ELSE 0 END) AS BIGINT) AS quality_score
         |FROM f""".stripMargin,
    "q_lang_dist" ->
      s"""SELECT $langIdSql AS pred_lang, count(*) AS n
         |FROM documents GROUP BY 1""".stripMargin,
    // full recompute from the gram STRINGS (the engine joins 128-bit
    // gram hashes; equality here pins hashed = exact semantics).
    // \s+ before trim: the engine tokenizer splits on ANY whitespace
    // (Hashing.tokenHashes), not just ASCII spaces
    "q_decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, len(toks) - 11),
        |      i -> array_to_string(toks[i:i+12], ' ')))) AS gram
        |  FROM t WHERE len(toks) >= 13),
        |sizes AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY 1),
        |bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
        |hits AS (SELECT g.doc_id, count(*) AS n_hits
        |         FROM g JOIN bg USING (gram) GROUP BY 1)
        |SELECT t.doc_id,
        |  CAST(coalesce(sizes.n_grams, 0) AS BIGINT) AS n_grams,
        |  CAST(coalesce(hits.n_hits, 0) AS BIGINT) AS n_hits,
        |  coalesce(hits.n_hits, 0) > 0 AS contaminated
        |FROM t LEFT JOIN sizes USING (doc_id) LEFT JOIN hits USING (doc_id)""".stripMargin,
    "q_decon_cut" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents),
        |gi AS (SELECT doc_id, unnest(range(1, len(toks) - 11)) AS i
        |       FROM t WHERE len(toks) >= 13),
        |g AS (SELECT gi.doc_id, gi.i - 1 AS pos,
        |        array_to_string(t.toks[gi.i:gi.i+12], ' ') AS gram
        |      FROM gi JOIN t USING (doc_id)),
        |bg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
        |hits AS (SELECT doc_id, list_sort(list(pos)) AS hp
        |         FROM g JOIN bg USING (gram) GROUP BY doc_id)
        |SELECT t.doc_id,
        |  coalesce(array_to_string(list_filter(list_transform(range(1, len(toks) + 1),
        |    i -> CASE WHEN len(list_filter(coalesce(hits.hp, []::BIGINT[]),
        |                     p -> p <= i - 1 AND i - 1 < p + 13)) = 0
        |         THEN toks[i] END),
        |    x -> x IS NOT NULL), ' '), '') AS cut_text,
        |  CAST(coalesce(len(hits.hp), 0) AS BIGINT) AS n_hit_grams
        |FROM t LEFT JOIN hits USING (doc_id)""".stripMargin,
    // corpus-internal span dedup: ownership recomputed from the gram
    // STRINGS (min doc_id over distinct docs per gram; only grams in
    // >= 2 docs cut), then the q_decon_cut window-cut replay
    "q_substr_cut" ->
      s"""WITH d AS ($spanDupDocsSql),
         |t AS (
         |  SELECT doc_id, string_split(
         |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
         |  FROM d),
         |gi AS (SELECT doc_id, unnest(range(1, len(toks) - 11)) AS i
         |       FROM t WHERE len(toks) >= 13),
         |g AS (SELECT gi.doc_id, gi.i - 1 AS pos,
         |        array_to_string(t.toks[gi.i:gi.i+12], ' ') AS gram
         |      FROM gi JOIN t USING (doc_id)),
         |own AS (SELECT gram, min(doc_id) AS owner, count(DISTINCT doc_id) AS n_docs
         |        FROM g GROUP BY gram),
         |hits AS (SELECT g.doc_id, list_sort(list(pos)) AS hp
         |         FROM g JOIN own USING (gram)
         |         WHERE own.n_docs >= 2 AND g.doc_id <> own.owner
         |         GROUP BY g.doc_id)
         |SELECT t.doc_id,
         |  coalesce(array_to_string(list_filter(list_transform(range(1, len(toks) + 1),
         |    i -> CASE WHEN len(list_filter(coalesce(hits.hp, []::BIGINT[]),
         |                     p -> p <= i - 1 AND i - 1 < p + 13)) = 0
         |         THEN toks[i] END),
         |    x -> x IS NOT NULL), ' '), '') AS cut_text,
         |  CAST(coalesce(len(hits.hp), 0) AS BIGINT) AS n_hit_grams
         |FROM t LEFT JOIN hits USING (doc_id)""".stripMargin,
    // line-level dedup: ownership recomputed from the line STRINGS
    // (min doc_id over distinct docs per normalized line; only lines in
    // >= 2 docs cut, whitespace-only lines never keys), then the cut
    // replayed by index and the text reassembled line by line
    "q_line_dedup" -> lineDedupOracleSql(boilerplate = false),
    "q_line_boilerplate" -> lineDedupOracleSql(boilerplate = true),
    "q_pii" -> {
      val pii = TextAnalysis.piiPatterns.toMap
      val (email, ip, phone) = (pii("email"), pii("ip"), pii("phone"))
      // coalesce: NULL text ≡ clean, matching piiStats (len(regexp_
      // extract_all(NULL, ..)) is NULL in DuckDB, not 0)
      s"""WITH d AS ($piiDocsSql)
         |SELECT doc_id,
         |  CAST(coalesce(len(regexp_extract_all(text, '$email')), 0) AS BIGINT) AS n_emails,
         |  CAST(coalesce(len(regexp_extract_all(text, '$ip')), 0) AS BIGINT) AS n_ips,
         |  CAST(coalesce(len(regexp_extract_all(text, '$phone')), 0) AS BIGINT) AS n_phones,
         |  (coalesce(len(regexp_extract_all(text, '$email')), 0) > 0
         |   OR coalesce(len(regexp_extract_all(text, '$ip')), 0) > 0
         |   OR coalesce(len(regexp_extract_all(text, '$phone')), 0) > 0) AS has_pii
         |FROM d""".stripMargin
    },
    // NEXT-FIT replay: the recursion carries (bin, fill) down each
    // group's doc_id-ordered stream — the exact operator semantics
    "q_packing" ->
      s"""WITH RECURSIVE t AS (
         |  SELECT doc_id % 8 AS g, doc_id,
         |    CAST(coalesce($tokenCountSql, 0) AS BIGINT) AS n_tokens,
         |    CAST(row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS BIGINT) AS rn
         |  FROM documents),
         |rec AS (
         |  SELECT g, rn, doc_id, n_tokens, CAST(0 AS BIGINT) AS bin, n_tokens AS fill
         |  FROM t WHERE rn = 1
         |  UNION ALL
         |  SELECT t.g, t.rn, t.doc_id, t.n_tokens,
         |    CASE WHEN rec.fill + t.n_tokens <= 500 THEN rec.bin ELSE rec.bin + 1 END,
         |    CASE WHEN rec.fill + t.n_tokens <= 500 THEN rec.fill + t.n_tokens ELSE t.n_tokens END
         |  FROM rec JOIN t ON t.g = rec.g AND t.rn = rec.rn + 1)
         |SELECT g AS pack_group, doc_id, bin AS bin_seq, n_tokens FROM rec""".stripMargin,
    // per-axis recompute of the whole curation verdict — see
    // [[curateOracleSql]]; the _model variant adds the fixture linear
    // model as the sixth gate
    "q_curate" -> curateOracleSql(withModel = false),
    "q_curate_model" -> curateOracleSql(withModel = true),
    "q_pii_scrub" -> {
      val pii = TextAnalysis.piiPatterns.toMap
      val (email, ip, phone) = (pii("email"), pii("ip"), pii("phone"))
      s"""WITH d AS ($piiDocsSql)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(text,
         |    '$email', '<EMAIL>', 'g'),
         |    '$ip', '<IP>', 'g'),
         |    '$phone', '<PHONE>', 'g') AS scrubbed
         |FROM d""".stripMargin
    },
    "q_token_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(
        |    regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' '))) AS gram
        |  FROM documents),
        |sizes AS (SELECT doc_id, count(*) AS n_grams FROM toks GROUP BY doc_id),
        |df AS (SELECT gram, count(*) AS d FROM toks GROUP BY gram),
        |rare AS (SELECT toks.doc_id, toks.gram FROM toks JOIN df USING (gram) WHERE df.d <= 1000),
        |shared AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        |  FROM rare a JOIN rare b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT shared.doc_a, shared.doc_b, shared.inter,
        |  sa.n_grams AS na, sb.n_grams AS nb,
        |  CAST(floor(10000.0 * shared.inter / (sa.n_grams + sb.n_grams - shared.inter)) AS BIGINT) AS jaccard_x10000
        |FROM shared
        |JOIN sizes sa ON sa.doc_id = shared.doc_a
        |JOIN sizes sb ON sb.doc_id = shared.doc_b
        |WHERE 1.0 * shared.inter / (sa.n_grams + sb.n_grams - shared.inter) >= 0.5""".stripMargin,
    "q_embed_top1" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM e WHERE vec_id < 20),
        |scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cos
        |  FROM q JOIN e ON e.vec_id <> q.query_id),
        |r AS (SELECT query_id, vec_id,
        |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
        |      FROM scored)
        |SELECT query_id, vec_id AS neighbor_id, CAST(rank AS INT) AS rank
        |FROM r WHERE rank <= 1""".stripMargin,
    "q_agg_lineitem" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  count(*) AS n_rows,
        |  count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q_join_customer_orders" ->
      """SELECT c_nationkey,
        |  count(*) AS n_orders,
        |  CAST(floor(max(o_totalprice) * 100) AS BIGINT) AS max_price_c
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,
    "q_window_latest_order" ->
      """SELECT o_custkey, o_orderkey AS latest_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin,
    "q_anti_customers_no_orders" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q_topk_parts_by_qty" ->
      """SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS qty
        |FROM lineitem GROUP BY 1
        |ORDER BY qty DESC, l_partkey LIMIT 100""".stripMargin,
  )

  /** Portable token count (engine-agnostic SQL; 'g' flag — DuckDB
    * regexp_replace is first-match-only by default, Spark is global).
    * Frame = collapse ALL whitespace then trim — lockstep with
    * [[graft.operators.TextAnalysis.collapseWs]] (DuckDB RE2 \s covers
    * the ASCII subset of javaWhitespace; the corpora are ASCII-spaced,
    * so the two frames agree on every oracle input). */
  private val tokenCountSql: String =
    """(CASE WHEN length(trim(regexp_replace(text, '\s+', ' ', 'g'))) = 0 THEN 0
      | ELSE length(trim(regexp_replace(text, '\s+', ' ', 'g')))
      |    - length(regexp_replace(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ', '', 'g')) + 1
      | END)""".stripMargin.replace("\n", "")

  /** DuckDB rendering of [[TextAnalysis.langId]] (documents table has
    * no CJK, but the branch is kept for parity). */
  private val langIdSql: String =
    """(CASE
      | WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
      | WHEN len(list_filter(['der','die','und','nicht','ist','das'],
      |   w -> position(' ' || w || ' ' IN ' ' || lower(text) || ' ') > 0)) > 0 THEN 'de'
      | WHEN len(list_filter(['el','la','los','las','es','una','que'],
      |   w -> position(' ' || w || ' ' IN ' ' || lower(text) || ' ') > 0)) > 0 THEN 'es'
      | WHEN len(list_filter(['le','les','est','une','des','dans'],
      |   w -> position(' ' || w || ' ' IN ' ' || lower(text) || ' ') > 0)) > 0 THEN 'fr'
      | WHEN len(list_filter(['the','is','and','of','to','in'],
      |   w -> position(' ' || w || ' ' IN ' ' || lower(text) || ' ') > 0)) > 0 THEN 'en'
      | ELSE 'und' END)""".stripMargin.replace("\n", "")
}
