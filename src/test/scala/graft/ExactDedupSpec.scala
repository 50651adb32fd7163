package graft

import graft.corpus.CorpusGen
import graft.operators.{DocAssembly, ExactDedup, Restore}
import org.apache.spark.sql.functions._

class ExactDedupSpec extends SparkSpec {

  lazy val transcripts = CorpusGen.transcripts(spark, 300).toDF.cache()

  test("turn dedup: every fp group has exactly one unique row; dup refs point at it") {
    import spark.implicits._
    val d = ExactDedup.dedupTurns(spark, transcripts).cache()
    val perFp = d.groupBy($"fp")
      .agg(sum(when($"is_unique", 1).otherwise(0)).as("uniq"), count(lit(1)).as("n"))
    assert(perFp.filter($"uniq" =!= 1).count() == 0)
    // representative really is the min (ts, conv_id, turn_idx) of the group
    val joined = d.join(
      transcripts.select($"conv_id", $"turn_idx", $"ts"), Seq("conv_id", "turn_idx"))
    val firstByFp = joined.groupBy($"fp")
      .agg(min(struct($"ts", $"conv_id", $"turn_idx")).as("f"))
      .select($"fp", $"f.conv_id".as("c"), $"f.turn_idx".as("t"))
    val bad = d.filter($"is_unique")
      .join(firstByFp, Seq("fp"))
      .filter($"conv_id" =!= $"c" || $"turn_idx" =!= $"t")
    assert(bad.count() == 0)
  }

  test("first-occurrence-wins oracle parity (in-memory reference, dedup.c:105-175 semantics)") {
    import spark.implicits._
    // tiny in-memory oracle: stream turns in (ts, conv_id, turn_idx)
    // order through a hash map — first writer wins
    val rows = transcripts.select($"conv_id", $"turn_idx", $"text", $"ts")
      .as[(String, Int, String, java.sql.Timestamp)].collect()
      .sortBy(r => (r._4.getTime, r._1, r._2))
    val index = scala.collection.mutable.HashMap.empty[String, (String, Int)]
    val oracle = rows.map { case (c, t, text, _) =>
      val rep = index.getOrElseUpdate(text, (c, t))
      ((c, t), rep)
    }.toMap
    val got = ExactDedup.dedupTurns(spark, transcripts)
      .select($"conv_id", $"turn_idx", $"rep_conv_id", $"rep_turn_idx")
      .as[(String, Int, String, Int)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4))).toMap
    assert(got.size == oracle.size)
    val mismatches = oracle.collect { case (k, v) if got(k) != v => (k, v, got(k)) }
    assert(mismatches.isEmpty, s"first ${mismatches.take(3)}")
  }

  test("restore: rebuilt corpus equals input per turn (look_ahead.c:438-443 invariant)") {
    import spark.implicits._
    val lineage = ExactDedup.dedupTurns(spark, transcripts)
      .select($"conv_id", $"turn_idx", $"fp")
    val uniq = ExactDedup.uniqueTurns(spark, transcripts)
    // the unique store is smaller than the input (dups exist)
    assert(uniq.count() < transcripts.count())
    val restored = Restore.restore(spark, lineage, uniq)
    assert(Restore.mismatchCount(spark, transcripts, restored) == 0)
  }

  test("doc-level exact pairs find the planted exact-dup conversations") {
    import spark.implicits._
    val docs = DocAssembly.assemble(spark, transcripts).toDF
    val pairs = ExactDedup.docDupPairs(spark, docs)
      .select($"doc_a", $"doc_b").as[(String, String)].collect().toSet
    val expected = CorpusGen.truthPairs(spark, 300)
      .filter($"kind" === "exact")
      .select($"doc_a", $"doc_b").as[(String, String)].collect().toSet
    assert(expected.subsetOf(pairs), s"missing: ${expected.diff(pairs).take(5)}")
  }

  test("fingerprint is 128-bit: grouping honors BOTH halves (collision safety)") {
    import spark.implicits._
    // two distinct texts with a FORCED h1 collision (h1 ≡ 0): were the
    // pipeline keying on h1 alone, they would merge and restore would
    // silently swap texts — the 10^12-scale birthday failure mode. The
    // injectable-fp hook simulates the collision (finding a real
    // xxhash64 collision needs ~2^32 work).
    val collidingFp = struct(lit(0L).as("h1"), xxhash64($"text").as("h2"))
    val two = transcripts.limit(0).unionByName(
      Seq(
        ("cA", 0, "user", "text one", "", java.sql.Timestamp.valueOf("2026-01-01 00:00:00")),
        ("cB", 0, "user", "text two", "", java.sql.Timestamp.valueOf("2026-01-01 00:00:01")))
        .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts"))
    val d = ExactDedup.dedupTurnsBy(spark, two, collidingFp)
    assert(d.filter($"is_unique").count() == 2, "h1 collision must NOT merge distinct texts")
    // and the production fp really carries two distinct halves
    val parts = two.select(ExactDedup.fp($"text").as("fp"))
      .select($"fp.h1", $"fp.h2").as[(Long, Long)].collect()
    assert(parts.forall { case (h1, h2) => h1 != h2 })
    assert(parts.map(_._1).distinct.length == 2 && parts.map(_._2).distinct.length == 2)
  }

  test("dedup stats are consistent (optsmr.c:316-322 totals invariant)") {
    import spark.implicits._
    val s = ExactDedup.stats(spark, transcripts).collect()(0)
    val total = s.getAs[Long]("total_turns")
    val uniq = s.getAs[Long]("unique_turns")
    val dups = s.getAs[Long]("dup_turns")
    assert(total == uniq + dups)
    assert(total == transcripts.count())
    assert(dups > 0)
  }
}
