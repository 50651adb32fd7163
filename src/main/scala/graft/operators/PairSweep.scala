package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The one streaming candidate-pair pass every detector shares.
  *
  * Input: rows (k1: Long, k2: Long, k3: Long, conv_id: String) — a
  * bucket is a distinct (k1, k2, k3) triple. k2/k3 double as whatever
  * the caller needs them to be: (low half of a 128-bit anchor, detector
  * tag) for the fused three-detector sweep, (constant, constant) for
  * plain LSH bands. The tag column keeps different detectors' bucket
  * spaces STRUCTURALLY disjoint inside one exchange — no reliance on
  * 64-bit keys never colliding across spaces.
  *
  * Shape: ONE pinned exchange (repartition on (k1, k2, k3) at the
  * session shuffle width — pinned because AQE coalescing would starve
  * the pair generation, the heaviest stage downstream), in-partition
  * sort by (k1, k2, k3, conv_id), then a single streaming pass. Because
  * groups arrive sorted, the FIRST member of a bucket is its global-min
  * conv_id, so every emitted row is a pure function of the bucket's
  * full membership — task retries reproduce byte-identical output.
  *
  * Memory: buffers at most cap+1 members; buckets that overflow switch
  * to streaming STAR edges around the deterministic hub (sorted-first
  * member) — linear in bucket size, so a mega-template bucket cannot go
  * quadratic (north_rule skew handling).
  *
  * Output: (doc_a, doc_b, k2, k3) with doc_a < doc_b... for all-pairs
  * buckets; star edges are (hub, member) with hub = bucket min, so the
  * ordering invariant holds there too. NOT deduplicated — callers
  * dropDuplicates over the columns that define their pair identity.
  */
object PairSweep {

  /** The batch sweep: exactly [[pairsIncremental]] with every member
    * flagged new — all pairs in under-cap buckets, hub stars on
    * overflow. ONE implementation of the streaming bucket scan keeps
    * the two paths' cap/hub/ordering guarantees identical by
    * construction (FusedSpec asserts the batch path's row identity). */
  def pairs(spark: SparkSession, keyed: DataFrame, cap: Int,
      keysEstimate: Long = -1L): DataFrame =
    pairsIncremental(spark, keyed.withColumn("is_new", lit(true)), cap, keysEstimate)

  /** Key-volume-adaptive exchange width: ~[[KeysPerPartition]] key rows
    * per partition, capped at the session shuffle width — the same
    * sizing rule as [[ConnectedComponents]]' dictionary. The sweep's
    * exchange is PINNED (a plain repartition — AQE must not coalesce it
    * below the pair-generation parallelism, and must never skew-SPLIT
    * it: the streaming pass requires every bucket wholly inside one
    * partition), so the width has to be right at plan time. A fixed
    * session-width exchange is wrong at both ends: at bench scale it
    * schedules hundreds of near-empty tasks (each paying shuffle-file
    * create/commit syscalls — measured as the dominant cost of the
    * sweep at sf0.1), and at corpus scale the estimate exceeds the cap
    * so the width stays the session setting. Callers that cannot
    * estimate their key volume pass a negative estimate and keep the
    * session width. */
  private[operators] val KeysPerPartition = 32768L
  private[operators] def sweepParts(spark: SparkSession, keysEstimate: Long): Int = {
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    if (keysEstimate <= 0) sessionParts
    else math.max(1L, math.min(sessionParts.toLong,
      (keysEstimate + KeysPerPartition - 1) / KeysPerPartition)).toInt
  }

  final case class KeyedRowN(k1: Long, k2: Long, k3: Long, conv_id: String, is_new: Boolean)

  /** Incremental variant for corpus growth: rows carry an `is_new` flag
    * (true = member of the just-ingested batch) and the sweep emits
    * only the edges a previous full run over the OLD members cannot
    * already have established:
    *
    *  - a bucket within `cap`: all pairs with ≥ 1 new member (the
    *    old-old all-pairs of this bucket were emitted verbatim by the
    *    previous run — buckets only grow, so a bucket under the cap
    *    now was under it before);
    *  - an overflow bucket: star edges around the deterministic hub
    *    for ALL members, old and new. Re-emitting the old star edges
    *    is linear and makes incremental connectivity equal the full
    *    fresh run's even when growth moved the hub or newly pushed the
    *    bucket over the cap (the one corner where new-touching-only
    *    edges can under-merge: old members connected in a fresh run
    *    only THROUGH the hub).
    *
    * Component-level contract (IncrementalSpec): clustering from
    * (previous labels as star edges) ∪ (this output) equals a full
    * recompute over the grown corpus, except buckets that crossed the
    * cap between runs, where incremental additionally KEEPS previously
    * verified old-old links a capped fresh run would not regenerate —
    * strictly higher recall at equal precision.
    *
    * Same exchange/ordering/cap/hub guarantees as [[pairs]]. */
  def pairsIncremental(spark: SparkSession, keyed: DataFrame, cap: Int,
      keysEstimate: Long = -1L): DataFrame = {
    import spark.implicits._
    val parts = sweepParts(spark, keysEstimate)
    keyed
      .repartition(parts, col("k1"), col("k2"), col("k3"))
      .sortWithinPartitions(col("k1"), col("k2"), col("k3"), col("conv_id"))
      .as[KeyedRowN]
      .mapPartitions { it =>
        val in = it.buffered
        new scala.collection.AbstractIterator[(String, String, Long, Long)] {
          private var pending: Iterator[(String, String, Long, Long)] = Iterator.empty
          private def newTouchingPairs(
              arr: scala.collection.IndexedSeq[(String, Boolean)], k2: Long, k3: Long): Iterator[(String, String, Long, Long)] =
            for {
              i <- arr.indices.iterator
              j <- (i + 1 until arr.length).iterator
              if arr(i)._1 != arr(j)._1 && (arr(i)._2 || arr(j)._2)
            } yield (arr(i)._1, arr(j)._1, k2, k3)
          private def advance(): Unit = {
            if (!in.hasNext) return
            val k1 = in.head.k1
            val k2 = in.head.k2
            val k3 = in.head.k3
            val hub = in.head.conv_id // sorted ⇒ bucket min, same hub as pairs()
            val buf = new scala.collection.mutable.ArrayBuffer[(String, Boolean)](16)
            var overflow = false
            while (in.hasNext && in.head.k1 == k1 && in.head.k2 == k2 && in.head.k3 == k3 && !overflow) {
              val r = in.next()
              buf += ((r.conv_id, r.is_new))
              if (buf.length > cap) overflow = true
            }
            if (!overflow) pending = newTouchingPairs(buf, k2, k3)
            else {
              // overflow: full star (old members included — see scaladoc)
              val bufEdges = buf.iterator.filter(_._1 != hub).map(c => (hub, c._1, k2, k3))
              val restEdges = new scala.collection.AbstractIterator[(String, String, Long, Long)] {
                def hasNext: Boolean = in.hasNext && in.head.k1 == k1 && in.head.k2 == k2 && in.head.k3 == k3
                def next(): (String, String, Long, Long) = (hub, in.next().conv_id, k2, k3)
              }.filter(_._2 != hub)
              pending = bufEdges ++ restEdges
            }
          }
          def hasNext: Boolean = {
            while (!pending.hasNext && in.hasNext) advance()
            pending.hasNext
          }
          def next(): (String, String, Long, Long) = {
            if (!hasNext) throw new NoSuchElementException
            pending.next()
          }
        }
      }
      .toDF("doc_a", "doc_b", "k2", "k3")
  }
}
