package graft

import graft.corpus.CorpusGen
import graft.operators.{ExactDedup, IncrementalDedup, Skew}
import graft.streaming.StreamingDedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class IncrementalSkewStreamSpec extends SparkSpec {

  test("incremental dedup: bf-miss => definitely new; is_known exact") {
    import spark.implicits._
    val corpus = CorpusGen.transcripts(spark, 100).toDF
    val corpusFps = ExactDedup.uniqueTurns(spark, corpus).select($"fp")
    // batch = convs 50..149: first half overlaps the corpus (known
    // boilerplate + exact-dup turns), second half is new
    val batch = CorpusGen.transcripts(spark, 150).toDF
      .filter($"conv_id" >= "conv_000050")
    val out = IncrementalDedup.dedupeAgainst(spark, corpusFps, batch, expectedFps = 10000L)
      .cache()
    // no false negatives: every known row must be a bf hit
    assert(out.filter($"is_known" && !$"bf_hit").count() == 0)
    // is_known matches a plain exact join
    val expectKnown = batch.withColumn("fp", ExactDedup.fp($"text"))
      .join(corpusFps.distinct(), Seq("fp"), "left_semi")
      .select($"conv_id", $"turn_idx").as[(String, Int)].collect().toSet
    val gotKnown = out.filter($"is_known")
      .select($"conv_id", $"turn_idx").as[(String, Int)].collect().toSet
    assert(gotKnown == expectKnown)
    assert(gotKnown.nonEmpty)
    // prefilter selectivity: some rows skipped the probe entirely
    assert(out.filter(!$"bf_hit").count() > 0)
    out.unpersist()
  }

  test("salted many-to-one join equals plain join on skewed data") {
    import spark.implicits._
    val probe = (1 to 5000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 50}", i))
      .toDF("key", "v")
    val build = (Seq("hot") ++ (0 until 50).map(i => s"k$i")).zipWithIndex
      .toDF("key", "payload")
    val plain = probe.join(build, Seq("key")).select($"v", $"payload")
      .as[(Int, Int)].collect().toSet
    val salted = Skew.saltedJoinManyToOne(spark, probe, build, "key", buckets = 4)
      .select($"v", $"payload").as[(Int, Int)].collect().toSet
    assert(salted == plain)
  }

  test("hotKeys surfaces the planted mega-template skew") {
    import spark.implicits._
    val t = CorpusGen.transcripts(spark, 300).toDF
      .withColumn("fp", ExactDedup.fp($"text"))
    val hot = Skew.hotKeys(t, "fp", topN = 5).collect()
    assert(hot.head.getLong(1) > 10) // boilerplate turns repeat heavily
  }

  test("streaming dedup drops duplicate fingerprints within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Turn]
    val unique = StreamingDedup.uniqueTurnsStream(spark, mem.toDF(), "1 hour")
    val turns = CorpusGen.turnsOf(0, 42) ++ CorpusGen.turnsOf(60, 42) // conv 60 = exact copy of conv 0
    mem.addData(turns) // AvailableNow only sees data added before start
    val q = unique.writeStream.format("memory").queryName("uniq")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("uniq").count()
    val expected = turns.map(_.text).distinct.size
    assert(got == expected, s"got $got expected $expected")
  }

  test("streaming dedup state EXPIRES past the watermark (bounded state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def mkTurns(prefix: String, hour: Int, n: Int): Seq[Turn] =
      (0 until n).map(i => Turn(s"c$prefix$i", 0, "user", s"text $prefix $i", "",
        java.sql.Timestamp.valueOf(f"2026-01-01 $hour%02d:00:00")))
    val mem = MemoryStream[Turn]
    val unique = StreamingDedup.uniqueTurnsStream(spark, mem.toDF(), "10 minutes")
    val q = unique.writeStream.format("memory").queryName("uniq_evict")
      .outputMode("append").start()
    def stateRows: Long = q.recentProgress.reverse.iterator
      .flatMap(_.stateOperators.headOption).map(_.numRowsTotal)
      .nextOption().getOrElse(-1L)
    mem.addData(mkTurns("a", 0, 100)); q.processAllAvailable()
    mem.addData(mkTurns("b", 1, 100)); q.processAllAvailable()
    val afterB = stateRows
    mem.addData(mkTurns("c", 2, 100)); q.processAllAvailable()
    val afterC = stateRows
    q.stop()
    // 300 distinct fps seen; with a 10-minute horizon and hour-spaced
    // batches, old entries MUST be evicted — an fp-keyed dropDuplicates
    // (the bug this guards against) would hold all 300 forever
    assert(afterC <= 110, s"state grew without bound: $afterC rows after 300 fps")
    assert(afterC <= afterB, s"state must not accumulate: $afterB -> $afterC")
    // all 300 first occurrences were emitted
    assert(spark.table("uniq_evict").count() == 300)
  }

  test("streaming windowed dedup stats emit per-window counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Turn]
    val stats = StreamingDedup.dedupStatsStream(spark, mem.toDF(), "1 minute", "1 hour")
    val turns = CorpusGen.turnsOf(0, 42)
    mem.addData(turns)
    val q = stats.writeStream.format("memory").queryName("stats")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("stats").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("total_turns")).sum == turns.size)
    rows.foreach(r =>
      assert(r.getAs[Long]("approx_unique_turns") <= r.getAs[Long]("total_turns") + 1))
  }
}
