package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Incremental growth contract: one batch's signatures + the previous
  * labels reproduce a full recompute over the grown corpus — without
  * touching the old corpus text. */
class IncrementalNearDupSpec extends SparkSpec {
  import org.apache.spark.sql.SparkSession

  private lazy val cfg = DedupConfig.default

  private def fullPairs(docs: Dataset[Doc]) = {
    import spark.implicits._
    ExactDedup.docDupPairs(spark, docs.toDF).as[DupPair]
      .unionByName(FusedDetectors.dupPairs(spark, docs, cfg))
  }

  /** cluster partitions as a canonical set of member-sets */
  private def partitions(a: Dataset[ClusterAssign]): Set[Set[String]] = {
    import spark.implicits._
    a.toDF.select($"cluster_id", $"conv_id").as[(String, String)]
      .collect().groupBy(_._1).values.map(_.map(_._2).toSet).toSet
  }

  test("signature table carries the exact batch kernels' outputs") {
    import spark.implicits._
    val docs = DocAssembly.assemble(spark, corpus.CorpusGen.transcripts(spark, 100L).toDF).cache()
    docs.count()
    val sigT = IncrementalNearDup.signatureTable(spark, docs, cfg)
    val ref = FusedDetectors.signatures(spark, docs, cfg)
      .join(docs.toDF.select($"conv_id", ExactDedup.fp($"doc_text").as("fp")), Seq("conv_id"))
      .select($"conv_id", $"fp.h1".as("fp_h1"), $"fp.h2".as("fp_h2"), $"sig", $"simhash")
    val diff = sigT.select("conv_id", "fp_h1", "fp_h2", "sig", "simhash")
      .exceptAll(ref).count() + ref.exceptAll(sigT.select("conv_id", "fp_h1", "fp_h2", "sig", "simhash")).count()
    assert(diff == 0)
    docs.unpersist()
  }

  test("incremental mh/sh pairs = full-run pairs restricted to new-touching (no overflow)") {
    import spark.implicits._
    val docs = DocAssembly.assemble(spark, corpus.CorpusGen.transcripts(spark, 300L).toDF).cache()
    docs.count()
    val isNew = (c: org.apache.spark.sql.Column) => abs(hash(c)) % 5 === 0
    val oldDocs = docs.filter(!isNew($"conv_id")).cache()
    val newDocs = docs.filter(isNew($"conv_id")).cache()
    assert(newDocs.count() > 0 && oldDocs.count() > 0)
    val stored = IncrementalNearDup.signatureTable(spark, oldDocs, cfg)
    val freshT = IncrementalNearDup.signatureTable(spark, newDocs, cfg)
    val inc = IncrementalNearDup.newTouchingPairs(spark, stored, freshT, cfg).toDF
      .filter($"detector" =!= "exact")
      .select(least($"doc_a", $"doc_b"), greatest($"doc_a", $"doc_b"), $"detector")
      .as[(String, String, String)].collect().toSet
    val newIds = newDocs.select($"conv_id").as[String].collect().toSet
    val full = FusedDetectors.dupPairs(spark, docs, cfg).toDF
      .select(least($"doc_a", $"doc_b"), greatest($"doc_a", $"doc_b"), $"detector")
      .as[(String, String, String)].collect().toSet
      .filter(p => newIds(p._1) || newIds(p._2))
    assert(inc == full, s"only-inc=${inc.diff(full).take(5)} only-full=${full.diff(inc).take(5)}")
    Seq(docs, oldDocs, newDocs).foreach(_.unpersist())
  }

  test("warm-started clustering equals full recompute on the grown corpus") {
    import spark.implicits._
    val docs = DocAssembly.assemble(spark, corpus.CorpusGen.transcripts(spark, 300L).toDF).cache()
    docs.count()
    val isNew = (c: org.apache.spark.sql.Column) => abs(hash(c)) % 5 === 0
    val oldDocs = docs.filter(!isNew($"conv_id")).cache()
    val newDocs = docs.filter(isNew($"conv_id")).cache()

    // previous run: full pipeline over the OLD corpus only (materialize
    // before the next CC invocation retires its blocks)
    val prev = Clustering.assign(spark, oldDocs, fullPairs(oldDocs), cfg)
      .toDF.cache()
    prev.count()

    // increment: signatures only, no old text
    val stored = IncrementalNearDup.signatureTable(spark, oldDocs, cfg).cache()
    val freshT = IncrementalNearDup.signatureTable(spark, newDocs, cfg).cache()
    stored.count(); freshT.count()
    val incPairs = IncrementalNearDup.newTouchingPairs(spark, stored, freshT, cfg)
    val tsMin = stored.select($"conv_id", $"ts_min")
      .unionByName(freshT.select($"conv_id", $"ts_min"))
    val incremental = IncrementalNearDup
      .updateLabels(spark, prev, incPairs, tsMin, cfg)
    val incRows = incremental.collect().toSet

    // fresh full recompute over the grown corpus
    val full = Clustering.assign(spark, docs, fullPairs(docs), cfg)
    val fullRows = full.collect().toSet

    assert(incRows == fullRows,
      s"only-inc=${incRows.diff(fullRows).take(3)} only-full=${fullRows.diff(incRows).take(3)}")
    Seq(docs, oldDocs, newDocs, prev, stored, freshT).foreach(_.unpersist())
  }

  test("three chained increments equal one full recompute (induction case)") {
    import spark.implicits._
    val docs = DocAssembly.assemble(spark, corpus.CorpusGen.transcripts(spark, 300L).toDF).cache()
    docs.count()
    // 4 deterministic waves: batch k = convs with hash%4 == k
    val wave = (c: org.apache.spark.sql.Column) => pmod(hash(c), lit(4))
    def docsOf(ws: Seq[Int]) = docs.filter(wave($"conv_id").isin(ws.map(Integer.valueOf): _*))

    var assign = Clustering.assign(spark, docsOf(Seq(0)), fullPairs(docsOf(Seq(0))), cfg)
      .toDF.cache()
    assign.count()
    var storedSigs = IncrementalNearDup.signatureTable(spark, docsOf(Seq(0)), cfg).cache()
    storedSigs.count()
    for (k <- 1 to 3) {
      val fresh = IncrementalNearDup.signatureTable(spark, docsOf(Seq(k)), cfg).cache()
      fresh.count()
      val pairs = IncrementalNearDup.newTouchingPairs(spark, storedSigs, fresh, cfg)
      val tsMin = storedSigs.select($"conv_id", $"ts_min")
        .unionByName(fresh.select($"conv_id", $"ts_min"))
      val next = IncrementalNearDup.updateLabels(spark, assign, pairs, tsMin, cfg)
        .toDF.cache()
      next.count() // materialize before the next wave's CC retires blocks
      assign.unpersist()
      val grown = storedSigs.unionByName(fresh).cache()
      grown.count()
      storedSigs.unpersist(); fresh.unpersist()
      assign = next
      storedSigs = grown
    }
    val full = Clustering.assign(spark, docs, fullPairs(docs), cfg)
    assert(assign.as[ClusterAssign].collect().toSet == full.collect().toSet)
    Seq(docs, assign, storedSigs).foreach(_.unpersist())
  }

  test("mega-bucket growth: overflow star edges keep the cluster whole incrementally") {
    import spark.implicits._
    val n = cfg.bucketCap * 2
    val text = (1 to 120).map(i => s"tok$i").mkString(" ")
    def doc(i: Int) = Doc(f"m$i%04d", text, 1, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
    val oldDocs = spark.createDataset((0 until n / 2).map(doc))
    val newDocs = spark.createDataset((n / 2 until n).map(doc))
    val prev = Clustering.assign(spark, oldDocs, fullPairs(oldDocs), cfg).toDF.cache()
    prev.count()
    val stored = IncrementalNearDup.signatureTable(spark, oldDocs, cfg)
    val freshT = IncrementalNearDup.signatureTable(spark, newDocs, cfg)
    val incPairs = IncrementalNearDup.newTouchingPairs(spark, stored, freshT, cfg)
    val tsMin = stored.select($"conv_id", $"ts_min")
      .unionByName(freshT.select($"conv_id", $"ts_min"))
    val incremental = IncrementalNearDup
      .updateLabels(spark, prev, incPairs, tsMin, cfg)
    assert(partitions(incremental) == Set((0 until n).map(i => f"m$i%04d").toSet))
    prev.unpersist()
  }
}
