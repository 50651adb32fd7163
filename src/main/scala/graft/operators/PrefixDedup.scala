package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared-conversation-PREFIX dedup — the duplication mode specific to
  * agent/conversation transcripts: many conversations open with the
  * same turns verbatim (system prompt, few-shot examples, canned
  * greeting, replayed session head) and only then diverge. Document-
  * level near-dup detectors under-weight a shared 5-turn head glued to
  * a long unique tail (Jaccard stays high only for short tails), and
  * turn-level exact dedup finds the turns but not the STRUCTURE — that
  * the duplicated region is a contiguous prefix with one first writer.
  * This operator detects maximal shared prefixes and (optionally) cuts
  * every non-first-writer copy, the [[SpanDedup]]/[[LineDedup]]
  * remediation contract at turn granularity.
  *
  * Reference analog: the within-stream first-occurrence rule over
  * content-defined chunks (/root/reference/src/dedup.c:105-175) —
  * here the "chunk" is a turn and the dup region is constrained to the
  * conversation head, which is what makes total copy elimination
  * provable (see below).
  *
  * Semantics. Turn identity = 128-bit fp of normalize(role ‖ ":" ‖
  * text) (two seeded FNV states — the [[ExactDedup.fp]] width
  * argument; role is part of identity so a user turn never matches an
  * assistant turn). Conversation C's L-prefix key is the ordered
  * combine-chain over its first L turn fps ([[graft.plans.GraftKernels
  * .prefixChain]]). For every prefix group (same chain key) with >= 2
  * conversations, the owner is the first writer by (min ts, conv_id).
  * Per conversation:
  *   - `prefix_len`  = max L whose group has >= 2 members (the longest
  *     head shared with ANY other conversation);
  *   - `cut_len`     = max L whose group has >= 2 members AND whose
  *     owner is someone else. Ownership is monotone: the L-group
  *     shrinks as L grows, so a conversation that owns its L-group
  *     owns every longer subgroup it belongs to, and a non-owner at L
  *     is a non-owner at every shorter L. Hence the non-owner region
  *     is always a contiguous head [0, cut_len) — cutting exactly it
  *     from every conversation leaves EXACTLY ONE copy of every shared
  *     prefix position corpus-wide (each position's group keeps its
  *     owner, everyone else cuts through it), with no coordination
  *     beyond the per-group min.
  * A conversation that is a full prefix of an older one (e.g. an exact
  * replay) gets cut_len = its entire length — full-conversation exact
  * dedup falls out as the degenerate case.
  *
  * Scale shape (the 100 TB path):
  *  - text NEVER enters the detection shuffles: each turn reduces to a
  *    24-byte (turn_idx, h1, h2) struct in the scan projection, the
  *    per-conversation groupBy collects those (the [[DocAssembly]]
  *    contract: one conversation fits one task), and the chain kernel
  *    emits 24-byte (len, idx, pk1, pk2) rows — so the explode +
  *    groupBy(pk) + join-back sweep moves O(total turns) × 24 B;
  *  - the prefix-group aggregate is partial-aggregated (count + min
  *    struct), so a hub prefix (one system prompt shared by 10^8
  *    conversations) combines map-side;
  *  - the join back from dup groups to per-conversation rows is a
  *    shuffle equi-join on the 128-bit key (the dup-group side is
  *    corpus-dependent, NOT broadcastable); AQE's skew split handles
  *    hub keys — same shape as [[LineDedup]]'s ownership join;
  *  - the cut joins per-conversation verdict rows (16 B + key) to the
  *    transcript rows on conv_id — the one join that touches text, and
  *    the price any rewrite of those conversations pays.
  */
object PrefixDedup {

  /** Independent FNV initial state for the turn fp's second half
    * (distinct from [[LineDedup]]'s and [[TextAnalysis.keepCorpus]]'s
    * seeds so the key spaces never alias). */
  private val TurnFpSeed = 0xD1B54A32D192ED03L

  /** Per-conversation rolling prefix keys: (conv_id, ts_min, pks)
    * where pks(i) = (len = i+1, idx = turn_idx of that turn, pk1, pk2).
    * ONE shuffle of 24 B/turn rows. */
  private def chains(spark: SparkSession, transcripts: DataFrame): DataFrame = {
    graft.plans.GraftFunctions.register(spark)
    import spark.implicits._
    val rt = concat_ws(":", $"role", $"text")
    transcripts
      .select($"conv_id", $"ts",
        struct(
          $"turn_idx".cast("int").as("turn_idx"),
          call_function("graft_doc_fp", rt).as("h1"),
          call_function("graft_doc_fp", rt, lit(TurnFpSeed)).as("h2")).as("tfp"))
      .groupBy($"conv_id")
      .agg(
        min($"ts").as("ts_min"),
        call_function("graft_prefix_chain", array_sort(collect_list($"tfp"))).as("pks"))
  }

  /** Full per-conversation verdict (unfiltered): conv_id, prefix_len,
    * n_sharing + owner_conv_id + is_owner (all at prefix_len), cut_len,
    * cut_idx (the original turn_idx of the last cut turn; -1 when
    * nothing cuts). Conversations sharing no prefix with anyone do not
    * appear. */
  private def verdicts(spark: SparkSession, transcripts: DataFrame): DataFrame = {
    import spark.implicits._
    // Plan boundary: `ex` feeds BOTH the group aggregate and the join
    // back, so without it Catalyst would carry (and analyze) the whole
    // scan→window→chain subtree twice and run two separate conv_id
    // shuffles. The boundary pins ONE physical subtree — the heavy
    // map side (text hashing, turn windowing) shuffles once and both
    // consumers read that shuffle. The downstream pk exchanges stay
    // UNpinned on purpose: hub prefixes (one system prompt shared by
    // 10^8 conversations) are the expected skew, and leaving the
    // ownership join behind real exchanges keeps it AQE-skew-splittable
    // (pre-partitioning both sides would weld the hub into one task).
    val ex = org.apache.spark.sql.GraftPlanBridge.planBoundary(
      chains(spark, transcripts)
        .select($"conv_id", $"ts_min", explode($"pks").as("p"))
        .select($"conv_id", $"ts_min",
          $"p.len".as("len"), $"p.idx".as("idx"), $"p.pk1".as("pk1"), $"p.pk2".as("pk2")))
    // one row per shared prefix group: membership count + first writer
    val groups = ex
      .groupBy($"pk1", $"pk2")
      .agg(
        count(lit(1)).as("n_sharing"),
        min(struct($"ts_min", $"conv_id")).as("own"))
      .filter($"n_sharing" >= 2)
      .select($"pk1", $"pk2", $"n_sharing", $"own.conv_id".as("owner_conv_id"))
    ex.join(groups, Seq("pk1", "pk2"))
      .groupBy($"conv_id")
      .agg(
        max(struct($"len", $"n_sharing", $"owner_conv_id")).as("top"),
        coalesce(max(when($"owner_conv_id" =!= $"conv_id", $"len")), lit(0))
          .cast("int").as("cut_len"),
        coalesce(max(when($"owner_conv_id" =!= $"conv_id", $"idx")), lit(-1))
          .cast("int").as("cut_idx"))
      .select($"conv_id",
        $"top.len".as("prefix_len"),
        $"top.n_sharing".as("n_sharing"),
        $"top.owner_conv_id".as("owner_conv_id"),
        ($"top.owner_conv_id" === $"conv_id").as("is_owner"),
        $"cut_len", $"cut_idx")
  }

  /** Detection: one row per conversation whose longest shared prefix
    * has >= `minTurns` turns. Columns: conv_id, prefix_len, n_sharing,
    * owner_conv_id, is_owner, cut_len, cut_idx. Note is_owner can be
    * true with cut_len > 0: owning the LONGEST shared group does not
    * imply owning every shorter (larger) group — see the class doc's
    * monotonicity argument. */
  def sharedPrefixes(
      spark: SparkSession, transcripts: DataFrame, minTurns: Int = 1): DataFrame = {
    require(minTurns >= 1, s"prefixDedup: minTurns must be >= 1, got $minTurns")
    verdicts(spark, transcripts).filter(col("prefix_len") >= minTurns)
  }

  /** Remediation: the transcripts with every non-first-writer shared
    * prefix of >= `minTurns` turns removed (rows with turn_idx <= that
    * conversation's cut_idx drop; everything else passes through
    * verbatim, original columns preserved). An exact replay of an older
    * conversation loses all its rows. */
  def cutSharedPrefixes(
      spark: SparkSession, transcripts: DataFrame, minTurns: Int = 1): DataFrame = {
    require(minTurns >= 1, s"prefixDedup: minTurns must be >= 1, got $minTurns")
    import spark.implicits._
    val cuts = verdicts(spark, transcripts)
      .filter($"cut_len" >= minTurns)
      .select($"conv_id", $"cut_idx")
    transcripts
      .join(cuts, Seq("conv_id"), "left")
      .filter($"cut_idx".isNull || $"turn_idx" > $"cut_idx")
      .select(transcripts.columns.map(col): _*)
  }
}
