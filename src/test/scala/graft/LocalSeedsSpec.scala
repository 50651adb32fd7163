package graft

import graft.operators.ConnectedComponents
import org.scalatest.funsuite.AnyFunSuite

/** The partition-local union-find contraction that seeds the CC loop
  * (ConnectedComponents.localSeeds): a pure function of the partition's
  * edge SET, exercised directly — star output around the local min,
  * input-order independence (the retry-determinism contract), and the
  * all-or-nothing overflow rule. */
class LocalSeedsSpec extends AnyFunSuite {

  private def sym(edges: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (edges ++ edges.map(e => (e._2, e._1))).distinct

  private def run(edges: Seq[(Long, Long)], cap: Int = 1 << 10): Map[Long, Long] =
    ConnectedComponents.localSeeds(edges.iterator, cap).toMap

  test("path collapses to a star around the local min; min itself not emitted") {
    val out = run(sym(Seq((0L, 1L), (1L, 2L), (2L, 3L))))
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("two components each star to their own min") {
    val out = run(sym(Seq((5L, 9L), (9L, 7L), (20L, 30L))))
    assert(out == Map(9L -> 5L, 7L -> 5L, 30L -> 20L))
  }

  test("output is a pure function of the edge set: any order, same seeds") {
    val edges = sym(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L)))
    val base = run(edges)
    val rng = new scala.util.Random(7)
    (1 to 10).foreach { _ =>
      assert(run(rng.shuffle(edges)) == base)
    }
  }

  test("overflow is all-or-nothing: over-cap partition emits nothing") {
    // cap=4 nodes; a 6-node path exceeds it regardless of edge order
    val edges = sym((0L until 5L).map(i => (i, i + 1)))
    assert(run(edges, cap = 4).isEmpty)
    // exactly at cap: full output
    val under = sym(Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    assert(run(under, cap = 4) == Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("dense ids near the 2^40 partition-code boundary keep exact mins") {
    val a = (7L << 40) | 3L
    val b = (7L << 40) | 9L
    val c = (2L << 40) | 1L
    val out = run(sym(Seq((a, b), (b, c))))
    assert(out == Map(a -> c, b -> c))
  }
}
