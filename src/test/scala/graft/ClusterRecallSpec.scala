package graft

import graft.corpus.CorpusGen
import graft.operators._
import graft.functions.Hashing
import org.apache.spark.sql.functions._

/** The north_rule criterion: dup-pair recall ≥ 0.99 of the pipeline's
  * clusters vs the reference-semantics oracle at identical
  * shingle/signature config.
  *
  * Oracle = (a) planted ground-truth clusters from the generator, and
  * (b) a brute-force O(n²) oracle (exact text equality ∪ exact-Jaccard
  * ≥ threshold ∪ Hamming ≤ radius over full simhash) computed in-memory
  * with the SAME normalization/shingle/signature code (SURVEY.md §5.3).
  */
class ClusterRecallSpec extends SparkSpec {

  val N = 400L
  lazy val transcripts = CorpusGen.transcripts(spark, N).toDF.cache()

  private def pipelineCoMembership(): Set[(String, String)] = {
    import spark.implicits._
    val store = tmpDir("recall_store")
    val res = Pipeline.run(spark, transcripts, store)
    val assign = res.clusters.select($"conv_id", $"cluster_id")
      .as[(String, String)].collect()
    coMembership(assign)
  }

  private def coMembership(assign: Seq[(String, String)]): Set[(String, String)] =
    assign.groupBy(_._2).values.flatMap { members =>
      val ids = members.map(_._1).sorted
      for (i <- ids.indices; j <- (i + 1) until ids.length) yield (ids(i), ids(j))
    }.toSet

  test("cluster co-membership recall >= 0.99 vs planted truth") {
    import spark.implicits._
    val got = pipelineCoMembership()
    val truthAssign = CorpusGen.truthClusters(spark, N)
      .as[(String, String)].collect().toSeq
    val expected = coMembership(truthAssign)
    val missing = expected.diff(got)
    val recall = 1.0 - missing.size.toDouble / expected.size
    assert(expected.nonEmpty)
    assert(recall >= 0.99, s"recall=$recall missing=${missing.take(10)}")
  }

  test("dup-pair recall >= 0.99 vs brute-force oracle at identical config") {
    import spark.implicits._
    val cfg = DedupConfig.default
    val docs = DocAssembly.assemble(spark, transcripts).collect()
    // brute-force oracle with the same shingle/signature code
    val sh = docs.map(d => d.conv_id -> Hashing.shingleHashes(d.doc_text, cfg.shingleK)).toMap
    val sim = docs.map(d =>
      d.conv_id -> Hashing.simhash(Hashing.shingleHashes(d.doc_text, cfg.simhashShingleK))).toMap
    val texts = docs.map(d => d.conv_id -> d.doc_text).toMap
    val ids = docs.map(_.conv_id).sorted
    val oracle = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      if texts(a) == texts(b) ||
        Hashing.exactJaccard(sh(a), sh(b)) >= cfg.jaccardThreshold ||
        Hashing.hammingDistance(sim(a), sim(b)) <= cfg.hammingRadius
    } yield (a, b)).toSet

    val got = pipelineCoMembership()
    val missing = oracle.diff(got)
    val recall = 1.0 - missing.size.toDouble / oracle.size
    assert(oracle.nonEmpty)
    assert(recall >= 0.99, s"oracle=${oracle.size} recall=$recall missing=${missing.take(10)}")
  }

  test("cluster precision: no merges across planted truth clusters") {
    import spark.implicits._
    val got = pipelineCoMembership()
    val truthAssign = CorpusGen.truthClusters(spark, N)
      .as[(String, String)].collect().toSeq
    val expected = coMembership(truthAssign)
    val spurious = got.diff(expected)
    val precision = 1.0 - spurious.size.toDouble / got.size
    assert(precision >= 0.99, s"precision=$precision spurious=${spurious.take(10)}")
  }

  test("permutation invariance: shuffled input order yields identical clusters") {
    import spark.implicits._
    val store1 = tmpDir("perm1")
    val store2 = tmpDir("perm2")
    val shuffled = transcripts.orderBy(rand(123)).repartition(7)
    val c1 = Pipeline.run(spark, transcripts, store1).clusters
      .select($"conv_id", $"cluster_id").as[(String, String)].collect().toMap
    val c2 = Pipeline.run(spark, shuffled, store2).clusters
      .select($"conv_id", $"cluster_id").as[(String, String)].collect().toMap
    assert(c1 == c2)
  }
}
