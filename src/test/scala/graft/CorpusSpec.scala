package graft

import graft.corpus.CorpusGen

class CorpusSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("corpus is deterministic and order-independent") {
    val a = CorpusGen.transcripts(spark, 300).collect().sortBy(t => (t.conv_id, t.turn_idx))
    val b = CorpusGen.transcripts(spark, 300)
      .repartition(7).collect().sortBy(t => (t.conv_id, t.turn_idx))
    assert(a.length == b.length)
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("exact-dup family: copy text equals source text") {
    val ts = CorpusGen.transcripts(spark, 200).collect()
      .groupBy(_.conv_id).view.mapValues(_.sortBy(_.turn_idx).map(_.text).toSeq).toMap
    // slot 60 copies slot 0 within each group
    assert(ts("conv_000060") == ts("conv_000000"))
    assert(ts("conv_000165") == ts("conv_000105"))
    // near-dup differs but mostly equal tokens
    val src = ts("conv_000010").mkString(" ").split(" ")
    val near = ts("conv_000070").mkString(" ").split(" ")
    assert(src.length == near.length)
    val sameFrac = src.zip(near).count { case (x, y) => x == y }.toDouble / src.length
    assert(sameFrac > 0.9 && sameFrac < 1.0, s"sameFrac=$sameFrac")
  }

  test("planted families have the advertised shares") {
    import spark.implicits._
    val n = 1000L
    val fams = spark.range(0, n).map(i => CorpusGen.family(i)).groupBy("value").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fams("exact") == 100)
    assert(fams("near") == 100)
    assert(fams("fuzzy") == 50)
    assert(fams("block") == 50)
    assert(fams("mega") == 20)
  }

  test("ts increases with conv index: first occurrence = min ts") {
    val t = CorpusGen.transcripts(spark, 200)
    import spark.implicits._
    val mins = t.groupBy($"conv_id").agg(min($"ts").as("m")).orderBy($"conv_id")
      .select($"m").as[java.sql.Timestamp].collect()
    assert(mins.sliding(2).forall(p => !p(1).before(p(0))))
  }
}
