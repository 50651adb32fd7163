package graft

import graft.functions.Hashing
import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

/** Native graft_* expressions: SQL-callable, parity with the pure
  * Scala kernels, codegen path exercised (whole-stage codegen is on by
  * default — a projection through these expressions runs generated
  * code, falling back to eval only if Janino failed). */
class ExpressionSpec extends SparkSpec {

  override def beforeAll(): Unit = { super.beforeAll(); GraftFunctions.register(spark) }

  val texts = Seq(
    "the quick brown fox jumps over the lazy dog again and again",
    "completely different content with other words entirely here",
    "")

  test("graft_minhash_sig matches Hashing.minhashSignature") {
    import spark.implicits._
    val got = texts.toDF("t")
      .selectExpr("graft_minhash_sig(t, 5, 128, 42) AS sig")
      .as[Array[Long]].collect()
    val want = texts.map(t =>
      Hashing.minhashSignature(Hashing.shingleHashes(t, 5), 128, 42))
    got.zip(want).foreach { case (g, w) => assert(g.sameElements(w)) }
  }

  test("graft_simhash64 / band_hashes / substr_anchors / ball_keys parity") {
    import spark.implicits._
    val row = texts.take(1).toDF("t").selectExpr(
      "graft_simhash64(t, 2) AS sh",
      "graft_band_hashes(graft_minhash_sig(t, 5, 128, 42), 32, 4) AS bands",
      "graft_substr_anchors(t, 3, 2) AS anchors",
      "graft_ball_keys(graft_simhash64(t, 2), 4) AS balls").collect()(0)
    val t = texts.head
    assert(row.getLong(0) == Hashing.simhash(Hashing.shingleHashes(t, 2)))
    val sig = Hashing.minhashSignature(Hashing.shingleHashes(t, 5), 128, 42)
    assert(row.getSeq[Long](1).toArray.sameElements(
      Array.tabulate(32)(b => Hashing.bandHash(sig, b, 4))))
    assert(row.getSeq[Long](2).toArray.sorted.sameElements(
      Hashing.substringAnchors(t, 3, 2).sorted))
    assert(row.getSeq[Long](3).toArray.sameElements(
      Hashing.simhashBallKeys(Hashing.simhash(Hashing.shingleHashes(t, 2)), 4)))
  }

  test("graft_sig_jaccard on identical and disjoint signatures") {
    import spark.implicits._
    val df = Seq((texts(0), texts(0)), (texts(0), texts(1))).toDF("a", "b")
      .selectExpr(
        "graft_sig_jaccard(graft_minhash_sig(a, 5, 128, 42), graft_minhash_sig(b, 5, 128, 42)) AS j")
      .as[Double].collect()
    assert(df(0) == 1.0)
    assert(df(1) < 0.2)
  }

  test("null propagation: null text yields null signature") {
    import spark.implicits._
    val got = Seq[Option[String]](None, Some("a b c")).toDF("t")
      .selectExpr("graft_minhash_sig(t, 5, 128, 42) AS sig")
      .collect()
    assert(got(0).isNullAt(0))
    assert(!got(1).isNullAt(0))
  }

  test("non-literal config argument is rejected") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(("x", 3)).toDF("t", "k").selectExpr("graft_minhash_sig(t, k, 128, 42)").collect()
    }
    assert(e.getMessage.contains("literal") || e.getMessage.contains("foldable"),
      e.getMessage.take(200))
  }
}
