package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-internal EXACT-SUBSTRING remediation: cut the duplicated
  * span BETWEEN training documents, keep the documents — the headline
  * ExactSubstr result of Lee et al. ACL'22 (arXiv:2107.06499: removing
  * repeated substrings beats removing whole near-dup documents), and
  * the span-granularity form of the reference engine's within-stream
  * dedup semantic (/root/reference/src/dedup.c:105-175 deduplicates
  * repeated chunks inside the stream; here the "chunk" is an n-token
  * window and exactly one copy survives).
  *
  * Semantics (first-writer-wins at gram granularity):
  *  - tokenize every doc on the corpus-wide normalization frame
  *    (lowercase + all-whitespace collapse — the same frame as the
  *    `graft_gram_fps_pos` kernel and benchmark decontamination);
  *  - a token n-gram is DUPLICATED iff it occurs in >= 2 distinct docs;
  *    its OWNER is the minimum doc id containing it;
  *  - the owner keeps every occurrence (including internal repeats — a
  *    doc never dedups against itself here; that is a chunk-level
  *    within-doc concern, not cross-doc leakage);
  *  - every other doc drops all tokens covered by any duplicated-gram
  *    window [p, p+n), via the same interval-merged cut as
  *    decontamination ([[Decontaminate.applyCut]]).
  * A maximal shared run of L >= n tokens is covered by ALL its L-n+1
  * windows, so the whole run is cut from later docs with no fencepost
  * slack — and runs shorter than n are never touched (below the
  * duplication threshold, exactly ExactSubstr's contract). As in the
  * published remediation, the cut can make previously-separated tokens
  * adjacent; the output is training text, not a reversible transform.
  *
  * Scale shape (the 100 TB path):
  *  - ONE tokenization pass per consumer: the positional 128-bit gram
  *    kernel (`graft_gram_fps_pos`, native codegen) emits (pos, hi, lo)
  *    per window — gram STRINGS never materialize and doc text never
  *    shuffles (the heaviest exchange carries 32-byte key rows);
  *  - ownership = distinct (gram, doc) then one partial-aggregated
  *    groupBy(gram) — min(doc) and the >= 2-docs filter drop the
  *    (overwhelmingly most common) unique grams before the join back;
  *  - the hit join is a shuffle equi-join on the 128-bit key (the
  *    duplicated-gram side is corpus-dependent, NOT broadcastable —
  *    unlike decontamination's MB-scale benchmark side);
  *  - per-doc positions aggregate to one interval-merged array, so a
  *    heavily duplicated doc costs O(intervals), not O(hits), in the
  *    cut (see the interval-merge note in [[Decontaminate.applyCut]]).
  * False cuts need a 128-bit collision (two independently-seeded
  * rolling hashes — Hashing.substringAnchors128), negligible at any
  * realistic corpus size. The DuckDB oracle (q_substr_cut) recomputes
  * ownership and replays the cut from the gram STRINGS, pinning that
  * the hashed plan equals exact-string semantics row by row.
  */
object SpanDedup {

  /** One row per input doc: (doc_id, cut_text, n_hit_grams) where
    * n_hit_grams counts this doc's cut window occurrences (0 for
    * owners and docs sharing nothing — their text comes back
    * normalized but intact). `passthrough` columns of `docs` are
    * carried to the output unchanged (no join-back needed). */
  def cutDuplicateSpans(
      spark: SparkSession, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 13, passthrough: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    require(n >= 2, s"spanDedup: n must be >= 2, got $n")
    graft.plans.GraftFunctions.register(spark)
    val g = docs
      .select(col(idCol).as("doc_id"),
        explode(call_function("graft_gram_fps_pos", col(textCol), lit(n))).as("g"))
      .select($"doc_id", $"g.pos".as("pos"),
        struct($"g.hi".as("hi"), $"g.lo".as("lo")).as("gfp"))
    // first-writer ownership over DISTINCT (gram, doc): an internal
    // repeat counts once, so n_docs >= 2 means genuinely cross-doc
    val owners = g.select($"gfp", $"doc_id").distinct()
      .groupBy($"gfp")
      .agg(min($"doc_id").as("owner"), count(lit(1)).as("n_docs"))
      .filter($"n_docs" >= 2)
      .select($"gfp", $"owner")
    val hits = g.join(owners, Seq("gfp"))
      .filter($"doc_id" =!= $"owner")
      .groupBy($"doc_id")
      .agg(sort_array(collect_list($"pos")).as("hit_pos"))
    Decontaminate.applyCut(spark, docs, hits, idCol, textCol, n, passthrough)
  }

  /** Corpus duplication profile — the diagnostic histogram behind the
    * ExactSubstr paper's corpus analysis (Lee et al. ACL'22 fig. 2
    * family): for each document frequency `df`, how many DISTINCT
    * token n-grams occur in exactly `df` documents. df=1 is the unique
    * mass; the df>=2 tail is what [[cutDuplicateSpans]] would remove;
    * a heavy high-df tail means boilerplate. Run it before committing
    * to a cut threshold.
    *
    * Scale shape: one tokenization pass (same 128-bit positional gram
    * kernel — gram strings never materialize), distinct (gram, doc),
    * then two partial-aggregated groupBys over 16-byte keys. The
    * result is driver-sized (distinct df values ≤ max df, practically
    * a few hundred rows at any corpus size). */
  def duplicationProfile(
      spark: SparkSession, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 13): DataFrame = {
    import spark.implicits._
    require(n >= 2, s"duplicationProfile: n must be >= 2, got $n")
    graft.plans.GraftFunctions.register(spark)
    docs
      .select(col(idCol).as("doc_id"),
        explode(call_function("graft_gram_fps_pos", col(textCol), lit(n))).as("g"))
      .select($"doc_id", struct($"g.hi".as("hi"), $"g.lo".as("lo")).as("gfp"))
      .distinct()
      .groupBy($"gfp").agg(count(lit(1)).as("df"))
      .groupBy($"df").agg(count(lit(1)).as("n_grams"))
  }
}
