package graft

import graft.operators.MinHashLSH
import graft.streaming.StreamingNearDup
import graft.functions.Hashing
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

/** Streaming MinHash near-dup detection: batch parity on a planted
  * corpus, horizon semantics, and bounded state. */
class StreamingNearDupSpec extends SparkSpec {

  private val cfg = DedupConfig.default

  /** Deterministic ~60-token doc; unrelated docs share no vocabulary
    * window (token ids drawn per (doc, slot) from a 100k space). */
  private def mkText(i: Int): String =
    (0 until 60).map(t => "w" + math.floorMod(Hashing.mix64(i * 1000L + t), 100000L)).mkString(" ")

  /** One-token perturbation — Jaccard over 5-shingles ≈ 0.85 ≥ 0.7. */
  private def perturb(text: String): String = {
    val toks = text.split(" ")
    toks.update(toks.length / 2, "zqxv")
    toks.mkString(" ")
  }

  private val t0 = Timestamp.valueOf("2026-01-01 00:00:00")

  /** 24 originals + a near-copy of every 5th: planted pair set
    * {(d00x, d00xc)}. */
  private def fixture: Seq[(String, String, Timestamp)] = {
    val base = (0 until 24).map(i => (f"d$i%03d", mkText(i), t0))
    val copies = (0 until 24 by 5).map(i => (f"d$i%03dc", perturb(mkText(i)), t0))
    base ++ copies
  }

  test("streaming near-dup pairs match the batch MinHash detector") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = fixture
    val docsDs = rows.map { case (id, text, ts) => Doc(id, text, 1, ts) }.toDS()
    val batch = MinHashLSH.dupPairs(spark, docsDs, cfg)
      .select($"doc_a", $"doc_b").distinct()
      .as[(String, String)].collect().toSet
    assert(batch.size == 5, s"fixture must plant 5 batch pairs, got $batch")

    val mem = MemoryStream[(String, String, Timestamp)]
    val stream = StreamingNearDup.nearDupPairsStream(
      spark, mem.toDF().toDF("conv_id", "doc_text", "ts"), cfg, "1 hour")
    mem.addData(rows)
    val q = stream.writeStream.format("memory").queryName("snd_parity")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("snd_parity")
      .select($"doc_a", $"doc_b").distinct()
      .as[(String, String)].collect().toSet
    assert(got == batch, s"stream=$got batch=$batch")
  }

  test("pairs split across micro-batches are still found (state carries members)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t1 = Timestamp.valueOf("2026-01-01 00:10:00")
    val mem = MemoryStream[(String, String, Timestamp)]
    val stream = StreamingNearDup.nearDupPairsStream(
      spark, mem.toDF().toDF("conv_id", "doc_text", "ts"), cfg, "1 hour")
    val q = stream.writeStream.format("memory").queryName("snd_split")
      .outputMode("append").start()
    mem.addData(Seq(("orig", mkText(7), t0)))
    q.processAllAvailable()
    mem.addData(Seq(("copy", perturb(mkText(7)), t1)))
    q.processAllAvailable(); q.stop()
    val got = spark.table("snd_split")
      .select($"doc_a", $"doc_b").distinct()
      .as[(String, String)].collect().toSet
    assert(got == Set(("copy", "orig")), got.toString)
  }

  test("state is bounded: members past the watermark horizon are evicted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(hour: Int) = Timestamp.valueOf(f"2026-01-01 $hour%02d:00:00")
    val mem = MemoryStream[(String, String, Timestamp)]
    val stream = StreamingNearDup.nearDupPairsStream(
      spark, mem.toDF().toDF("conv_id", "doc_text", "ts"), cfg, "10 minutes")
    val q = stream.writeStream.format("memory").queryName("snd_evict")
      .outputMode("append").start()
    def stateRows: Long = q.recentProgress.reverse.iterator
      .flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
      .nextOption().getOrElse(-1L)
    // hour-spaced waves of 40 unrelated docs each. NOTE the watermark
    // lags one batch (it is derived from the PREVIOUS batch's max event
    // time), so a member is only guaranteed evicted two batches after
    // its horizon passes.
    mem.addData((0 until 40).map(i => (s"a$i", mkText(1000 + i), at(0))))
    q.processAllAvailable()
    mem.addData((0 until 40).map(i => (s"b$i", mkText(2000 + i), at(1))))
    q.processAllAvailable()
    val afterB = stateRows
    mem.addData((0 until 40).map(i => (s"c$i", mkText(3000 + i), at(2))))
    q.processAllAvailable()
    // a near-copy of the hour-1 doc arrives with the watermark now at
    // 01:50: its original's bucket state is gone → no pair
    mem.addData(Seq(("late_copy", perturb(mkText(2000)), at(3))))
    q.processAllAvailable()
    val afterD = stateRows
    q.stop()
    assert(spark.table("snd_evict").count() == 0,
      "no pair may form across an expired horizon")
    // bucket state must not accumulate across the waves (expired
    // buckets are removed by their event-time timeout)
    assert(afterD <= afterB * 2, s"state grew without bound: $afterB -> $afterD")
  }
}
