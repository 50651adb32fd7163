package graft

import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._

/** The RELIABLE-checkpoint branch of the CC loop (cluster-safe
  * truncation: persist → count → checkpoint so the checkpoint-write job
  * reads cache, files survive executor loss). Pipeline.run wires a
  * store-relative checkpoint dir, so this branch is the production path
  * on any deployment; here it is exercised directly. */
class CcCheckpointSpec extends SparkSpec {

  test("reliable branch writes checkpoint files, result correct and reusable") {
    import spark.implicits._
    val sc = spark.sparkContext
    val dir = tmpDir("cc_ck")
    sc.setCheckpointDir(dir)
    assert(sc.getCheckpointDir.isDefined)
    // a 10-node path graph (worst-case diameter for its size) plus two
    // disjoint pairs; checkpointEvery=1 forces a reliable truncation on
    // EVERY iteration
    val edges = ((0 until 9).map(i => (s"n$i", s"n${i + 1}")) ++
      Seq(("p0", "p1"), ("q0", "q1"))).toDF("doc_a", "doc_b")
    val out = ConnectedComponents.run(spark, edges, maxIters = 25, checkpointEvery = 1)
    val got = out.as[(String, String)].collect().toMap
    assert(got.size == 14)
    assert((0 to 9).forall(i => got(s"n$i") == "n0"))
    assert(got("p0") == "p0" && got("p1") == "p0")
    assert(got("q0") == "q0" && got("q1") == "q0")

    // checkpoint files actually landed under the configured dir
    val ckFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => p.getFileName.toString.startsWith("part-"))
      .count()
    assert(ckFiles > 0, s"no checkpoint part files under $dir")

    // label-table reuse: the returned frame is materialized and usable
    // for further jobs (self-join) after the loop's internals were
    // unpersisted
    assert(out.count() == 14)
    val sizes = out.groupBy($"cluster_id").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(sizes("n0") == 10 && sizes("p0") == 2 && sizes("q0") == 2)
  }

  test("repeated CC runs do not accumulate cached blocks") {
    import spark.implicits._
    val edges = ((0 until 9).map(i => (s"n$i", s"n${i + 1}")) ++
      Seq(("p0", "p1"), ("q0", "q1"))).toDF("doc_a", "doc_b")
    // settle: one run whose output stays live (the retire-previous
    // policy keeps exactly one label table alive)
    ConnectedComponents.run(spark, edges).count()
    val baseline = spark.sparkContext.getPersistentRDDs.size
    (1 to 3).foreach { _ =>
      assert(ConnectedComponents.run(spark, edges).count() == 14)
      // each run retires the previous output before registering its
      // own, so the live-block census must not grow with invocations
      assert(spark.sparkContext.getPersistentRDDs.size <= baseline,
        s"CC leaked cached blocks: ${spark.sparkContext.getPersistentRDDs.size} > $baseline")
    }
  }
}
