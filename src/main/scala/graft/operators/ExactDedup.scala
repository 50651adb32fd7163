package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact duplicate detection with first-occurrence-wins representative
  * assignment — the reference's central semantic
  * (/root/reference/src/dedup.c:105-175: fingerprint-index probe, hit ⇒
  * dup inherits the first occurrence's identity; miss ⇒ chunk becomes
  * the canonical copy).
  *
  * Spark-first design: the reference's global fingerprint index
  * (Bloom filter + disk hash, dedup.c:120-134) is replaced by a single
  * hash-partitioned `groupBy(fp)` exchange — Spark's shuffle IS the
  * index probe, partial aggregation gives the map-side combine, and no
  * driver-side state exists, so the same plan runs at 10^12 rows.
  *
  * Determinism: the canonical member of a fingerprint group is the
  * minimum under the total order (ts, conv_id, turn_idx) — matching the
  * reference's "first writer wins" under stream order (dedup.c:150-173).
  */
object ExactDedup {

  /** Independent-salt constant for the second fingerprint half (the
    * 64-bit golden-ratio mix constant — public splitmix64 material). */
  private val FpSalt = 0x9E3779B97F4A7C15L

  /** 128-bit fingerprint of a text column as struct(h1, h2) — two
    * independently-seeded xxhash64 halves, both whole-stage-codegen'd.
    *
    * Width matters: fp alone keys the DESTRUCTIVE paths (uniqueTurns
    * collapses fp groups; Restore joins lineage⋈unique on fp). At the
    * 10^12-turn design scale a 64-bit fp expects ~27k birthday
    * collisions ((10^12)²/2^65), each silently swapping a turn's text;
    * at 128 bits the expectation is ~10^-15 — negligible, matching the
    * reference's decision to pay for wide fingerprints
    * (17-byte SHA-1 prefix, /root/reference/include/config.h:42,
    * /root/reference/src/dedup.c:84). */
  def fp(c: Column): Column =
    struct(xxhash64(c).as("h1"), xxhash64(lit(FpSalt), c).as("h2"))

  /** The 64-bit half used where a flat Long key is structurally needed
    * (Bloom-filter bits, approximate stats). Never keys a destructive
    * collapse on its own. */
  def fp64(c: Column): Column = xxhash64(c)

  /** Turn-level dedup: every turn mapped to its fingerprint plus the
    * canonical (first-occurrence) location of that fingerprint.
    *
    * Output: conv_id, turn_idx, fp, rep_conv_id, rep_turn_idx, is_unique.
    * `is_unique` marks the canonical row (the reference would store this
    * chunk; all others reference it).
    */
  def dedupTurns(spark: SparkSession, transcripts: DataFrame): DataFrame =
    dedupTurnsBy(spark, transcripts, fp(col("text")))

  /** [[dedupTurns]] with an injectable fingerprint column — lets tests
    * prove the grouping honors the FULL fingerprint (e.g. a deliberately
    * h1-colliding fp must still keep distinct texts apart via h2). */
  private[graft] def dedupTurnsBy(
      spark: SparkSession, transcripts: DataFrame, fpCol: Column): DataFrame = {
    import spark.implicits._
    val withFp = transcripts.withColumn("fp", fpCol)
    // First occurrence and reference count as WINDOW aggregates over the
    // fp partition: ONE exchange of the turn rows, then both values are
    // computed in a single WindowExec pass (shared window spec). The
    // previous groupBy(fp) + join-back shape paid the canonical
    // aggregation exchange PLUS a join that re-shuffles (or broadcasts)
    // against the full turn table — and because every output row keeps
    // its turn identity anyway, the join carried the whole input a
    // second time. At design scale the canonical table is ~#distinct
    // fingerprints (not broadcastable), so this is strictly one wide
    // exchange instead of two plus a sort-merge join; callers that only
    // need (conv_id, turn_idx, fp) — Restore's lineage — let column
    // pruning drop the Window node entirely.
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"fp")
    withFp
      .select($"conv_id", $"turn_idx", $"ts", $"fp")
      .withColumn("first_occ", min(struct($"ts", $"conv_id", $"turn_idx")).over(w))
      .withColumn("n_refs", count(lit(1)).over(w))
      .select(
        $"conv_id",
        $"turn_idx",
        $"fp",
        $"first_occ.conv_id".as("rep_conv_id"),
        $"first_occ.turn_idx".as("rep_turn_idx"),
        ($"conv_id" === $"first_occ.conv_id" && $"turn_idx" === $"first_occ.turn_idx")
          .as("is_unique"),
        $"n_refs")
  }

  /** The unique-turn store: one row per distinct fingerprint carrying
    * the canonical text. Reference analog: the container store of unique
    * chunks (/root/reference/src/container.c:435-483). */
  def uniqueTurns(spark: SparkSession, transcripts: DataFrame): DataFrame = {
    import spark.implicits._
    transcripts
      .withColumn("fp", fp($"text"))
      .groupBy($"fp")
      .agg(
        min(struct($"ts", $"conv_id", $"turn_idx", $"text")).as("first_occ"))
      .select($"fp", $"first_occ.text".as("text"))
  }

  /** Doc-level exact dup pairs: (first occurrence, later copy) for every
    * pair of conversations with identical assembled text. Emitted as
    * star edges around the canonical doc — linear in group size, so a
    * pathological all-identical corpus cannot go quadratic. */
  def docDupPairs(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    // canonical member as a window aggregate over the fp partition (the
    // dedupTurnsBy shape): ONE narrow 24 B/doc projection — fp is
    // computed BEFORE the exchange so doc_text never shuffles — then a
    // single exchange+window instead of groupBy + join-back (which
    // shuffled the id rows twice at scale, where the canonical table is
    // not broadcastable).
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"fp")
    docs
      .select($"conv_id", $"ts_min", fp($"doc_text").as("fp"))
      .withColumn("first_occ", min(struct($"ts_min", $"conv_id")).over(w))
      .filter($"conv_id" =!= $"first_occ.conv_id")
      .select(
        $"first_occ.conv_id".as("doc_a"),
        $"conv_id".as("doc_b"),
        lit("exact").as("detector"),
        lit(1.0).as("score"))
  }

  /** Dedup-ratio stats (reference analog: the running counters printed
    * every 10k chunks, /root/reference/src/dedup.c:113-116 and final
    * totals /root/reference/src/optsmr.c:316-332). */
  def stats(spark: SparkSession, transcripts: DataFrame): DataFrame = {
    import spark.implicits._
    transcripts
      .select(fp($"text").as("fp"))
      .agg(
        count(lit(1)).as("total_turns"),
        countDistinct($"fp").as("unique_turns"))
      .select(
        $"total_turns",
        $"unique_turns",
        ($"total_turns" - $"unique_turns").as("dup_turns"),
        ($"total_turns".cast("double") / $"unique_turns").as("dedup_ratio"))
  }
}
