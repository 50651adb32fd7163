package graft.corpus

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.Turn
import graft.functions.Hashing.mix64

/** Deterministic synthetic transcript corpus — the executable form of
  * FIXTURES.md §2. Every row is a pure function of (seed, conv index),
  * generated with `spark.range(n).flatMap` so the corpus is produced in
  * parallel with no driver-side materialization and no shared RNG state:
  * the same (seed, n) yields byte-identical tables at any parallelism.
  *
  * Duplicate families by conversation slot b = i % 100:
  *   0..59, 92..99  base unique conversations
  *   60..69         exact copy of slot b-60 in the same group   (10%)
  *   70..79         near-dup (token substitutions) of slot b-60 (10%)
  *   80..84         fuzzy copy (char edits) of slot b-60        (5%)
  *   85..89         unique + shared global boilerplate block    (5%)
  *   90..91         near-dup of one global mega-template (skew) (2%)
  * Plus ~15% of turns drawn from a shared boilerplate-turn pool
  * (turn-level exact dups) and conversation 0 with 10× turn count
  * (skewed doc length).
  */
object CorpusGen {

  val Words: Array[String] = Array(
    "the", "of", "and", "to", "in", "for", "is", "on", "that", "by",
    "this", "with", "you", "it", "not", "or", "be", "are", "from", "at",
    "as", "your", "all", "have", "new", "more", "an", "was", "we", "will",
    "can", "about", "if", "my", "has", "search", "free", "but", "our",
    "one", "other", "do", "no", "information", "time", "they", "site",
    "he", "up", "may", "what", "which", "their", "news", "out", "use",
    "any", "there", "see", "only", "so", "his", "when", "contact", "here",
    "business", "who", "web", "also", "now", "help", "get", "view",
    "online", "first", "am", "been", "would", "how", "were", "me",
    "services", "some", "these", "click", "its", "like", "service",
    "than", "find", "price", "date", "back", "top", "people", "had",
    "list", "name", "just", "over", "state", "year", "day", "into",
    "email", "two", "health", "world", "next", "used", "go", "work",
    "last", "most", "products", "music", "buy", "data", "make", "them")

  val BoilerplateTurns: Array[String] = Array.tabulate(20) { i =>
    val r = mix64(0xB01E7000L + i)
    s"hello how can i help you today variant ${(r & 0x7).toInt} please " +
      s"confirm your ${Words(((r >>> 8) % Words.length).toInt).trim} request"
  }

  /** ~80-token boilerplate blocks shared across distinct conversations
    * (long-substring detector target, FIXTURES.md family 5). */
  val BoilerplateBlocks: Array[String] = Array.tabulate(5) { i =>
    wordsFrom(mix64(0xB10C0000L + i), 80).mkString(" ")
  }

  val MegaTemplate: Array[String] =
    Array.tabulate(8)(t => wordsFrom(mix64(0x3E6A0000L + t), 20).mkString(" "))

  private def wordsFrom(seed0: Long, n: Int): Array[String] = {
    var s = seed0
    Array.fill(n) { s = mix64(s); Words(((s >>> 16) % Words.length).toInt) }
  }

  private val BaseEpochMs = 1704067200000L // 2024-01-01T00:00:00Z

  def convId(i: Long): String = f"conv_$i%06d"

  private def slot(i: Long): Int = (i % 100).toInt

  /** index of the conversation this one duplicates, or -1 if base. */
  def sourceIndex(i: Long): Long = slot(i) match {
    case b if b >= 60 && b <= 84 => i - b + (b - 60)
    case _                       => -1L
  }

  def family(i: Long): String = slot(i) match {
    case b if b >= 60 && b <= 69 => "exact"
    case b if b >= 70 && b <= 79 => "near"
    case b if b >= 80 && b <= 84 => "fuzzy"
    case b if b >= 85 && b <= 89 => "block"
    case b if b >= 90 && b <= 91 => "mega"
    case _                       => "base"
  }

  private def nTurns(i: Long, seed: Long): Int = {
    val base = 4 + (mix64(seed ^ mix64(0x7117 + contentKey(i, seed))) >>> 8) % 13
    if (i == 0) base.toInt * 10 else base.toInt
  }

  /** The content key: duplicates share their source's key so copied text
    * is generated identically without reading the source row. */
  private def contentKey(i: Long, seed: Long): Long = family(i) match {
    case "exact" | "near" | "fuzzy" => mix64(seed ^ (sourceIndex(i) * 0x5851F42DL))
    case "mega"                     => mix64(seed ^ 0x3E6AL)
    case _                          => mix64(seed ^ (i * 0x5851F42DL))
  }

  private def baseTurnText(key: Long, turnIdx: Int): String = {
    val r = mix64(key ^ mix64(turnIdx.toLong * 0x9E37L))
    // ~15% of turns are shared boilerplate (turn-level exact dups)
    if ((r & 0xFF) < 38) BoilerplateTurns(((r >>> 32) % BoilerplateTurns.length).toInt)
    else {
      val n = 8 + ((r >>> 12) % 23).toInt
      wordsFrom(r, n).mkString(" ")
    }
  }

  private def perturbNear(text: String, key: Long, turnIdx: Int): String = {
    val toks = text.split(' ')
    var r = mix64(key ^ 0x4EA4 ^ turnIdx.toLong)
    // ~1.6% token substitution rate → doc Jaccard ≈ 0.85-0.9 at k=5
    // shingles (FIXTURES.md family 3 targets 0.8-0.95)
    var j = 0
    while (j < toks.length) {
      r = mix64(r)
      if ((r & 0x3F) == 0) toks(j) = Words(((r >>> 20) % Words.length).toInt)
      j += 1
    }
    toks.mkString(" ")
  }

  /** One single-character edit. Fuzzy convs get this on only TWO of
    * their turns (selected in turnsOf), so the whole-doc shingle-set
    * difference stays ≈ 2k/|tokens| ≈ 5% and the 64-bit SimHash lands
    * within Hamming radius 3 of the source (FIXTURES.md family 4). */
  private def perturbFuzzy(text: String, key: Long, turnIdx: Int): String = {
    val sb = new java.lang.StringBuilder(text)
    val r = mix64(key ^ 0xF022 ^ turnIdx.toLong)
    if (sb.length > 4) {
      val pos = ((r >>> 8) % sb.length).toInt
      sb.setCharAt(pos, ('a' + ((r >>> 40) % 26)).toChar)
    }
    sb.toString
  }

  /** All turns of conversation i — a pure function, callable inside
    * executors. */
  def turnsOf(i: Long, seed: Long): Seq[Turn] = {
    val fam = family(i)
    val key = contentKey(i, seed)
    val cid = convId(i)
    val nt = fam match {
      case "exact" | "near" => nTurns(sourceIndex(i), seed)
      case "fuzzy"          => nTurns(sourceIndex(i), seed)
      case "mega"           => MegaTemplate.length
      case _                => nTurns(i, seed)
    }
    (0 until nt).map { t =>
      val baseText = fam match {
        case "mega" => MegaTemplate(t)
        case _      => baseTurnText(key, t)
      }
      // fuzzy: edit exactly two turns of the conversation
      val fz = mix64(seed ^ i ^ 0xFA22L)
      val fuzzyTurn1 = ((fz >>> 4) % nt).toInt
      val fuzzyTurn2 = ((fz >>> 36) % nt).toInt
      val text = fam match {
        case "near" => perturbNear(baseText, mix64(seed ^ i), t)
        case "fuzzy" if t == fuzzyTurn1 || t == fuzzyTurn2 =>
          perturbFuzzy(baseText, mix64(seed ^ i), t)
        case "fuzzy" => baseText
        case "mega"  => perturbNear(baseText, mix64(seed ^ i), t)
        case "block" if t == 1 =>
          // embed the shared boilerplate block as (part of) turn 1
          BoilerplateBlocks(((i / 100) % BoilerplateBlocks.length).toInt) + " " + baseText
        case _ => baseText
      }
      val role = (t % 3) match {
        case 0 => "user"
        case 1 => "assistant"
        case _ => "tool"
      }
      val tool =
        if (role == "tool") "tool_" + (mix64(key ^ t) & 0x7).toString else ""
      val ts = new Timestamp(BaseEpochMs + i * 60000L + t * 1000L)
      Turn(cid, t, role, text, tool, ts)
    }
  }

  /** The transcripts table: exactly the input_hint shape. */
  def transcripts(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[Turn] = {
    import spark.implicits._
    spark.range(0, n).flatMap(i => turnsOf(i, seed))
  }

  // ---------------------------------------------------------------------
  // Ground truth (FIXTURES.md §2): derivable from the index alone.
  // ---------------------------------------------------------------------

  final case class TruthPair(doc_a: String, doc_b: String, kind: String)
  final case class TruthCluster(conv_id: String, cluster_id: String)

  /** Direct (source, copy) duplicate pairs. Block-family pairs link each
    * block conv to the previous conv sharing the same global block;
    * mega-family convs all link to the first mega conv. */
  def truthPairs(spark: SparkSession, n: Long): Dataset[TruthPair] = {
    import spark.implicits._
    spark.range(0, n).flatMap { i =>
      family(i) match {
        case f @ ("exact" | "near" | "fuzzy") =>
          Seq(TruthPair(convId(sourceIndex(i)), convId(i), f))
        case "block" =>
          val prev = i - 100 * BoilerplateBlocks.length
          if (prev >= 0) Seq(TruthPair(convId(prev), convId(i), "block")) else Nil
        case "mega" =>
          // first mega conv overall = slot 90 of group 0
          val firstIdx = 90L
          if (i != firstIdx) Seq(TruthPair(convId(firstIdx), convId(i), "mega")) else Nil
        case _ => Nil
      }
    }
  }

  /** Expected cluster id (= id of the cluster's first-occurrence member)
    * for every conversation, counting exact/near/fuzzy/mega memberships.
    * Block-sharing is NOT a whole-doc duplicate (docs differ), so block
    * convs cluster alone here; the substring detector has its own truth
    * in truthPairs(kind="block"). */
  def truthClusters(spark: SparkSession, n: Long): Dataset[TruthCluster] = {
    import spark.implicits._
    spark.range(0, n).map { i0 =>
      val i = i0.longValue
      val root = family(i) match {
        case "exact" | "near" | "fuzzy" => sourceIndex(i)
        case "mega"                     => 90L
        case _                          => i
      }
      TruthCluster(convId(i), convId(root))
    }
  }
}
