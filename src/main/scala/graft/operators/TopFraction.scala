package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Percentile gating: keep the best `keepPermille`‰ of a corpus by an
  * integer score — the selection step that follows model-based scoring
  * (take the top-k% by classifier logit, the GPT-3/CCNet recipe).
  *
  * Semantics: cut = the smallest score c such that |{score ≥ c}| ≥
  * ceil(keepPermille × N / 1000); keep every row with score ≥ c. Ties
  * AT the cut are all kept (threshold semantics — the kept count can
  * exceed the target by the tie mass, never undershoot). Fully
  * deterministic, no RNG, engine-portable.
  *
  * Scale shape: one partial-aggregated groupBy(score) histogram whose
  * key cardinality is the number of DISTINCT scores — the score must
  * be an integer fixed-point column with driver-sized cardinality
  * (quality_score has 101 values; a ×10000 logit a few 100k), the same
  * driver-sized-model contract as the Bloom filter and IVF codebook
  * collects. The cut is then a scan-pushable `score >= c` predicate —
  * at 100 TB: one histogram pass + one filtered scan, no corpus-wide
  * shuffle, no global sort, no single-partition window.
  */
object TopFraction {

  /** Histogram-cardinality cap: 2^20 (score, count) pairs ≈ 16 MB on
    * the driver — far above any sane fixed-point score range (a ×10000
    * logit has a few 100k distinct values) and far below driver-OOM
    * territory. */
  val MaxHistRows: Int = 1 << 20

  /** @param keepPermille target keep fraction in 1/1000ths, in [1, 1000].
    * @return rows of `df` with score ≥ the computed cut. */
  def keep(
      spark: SparkSession,
      df: DataFrame,
      scoreCol: String,
      keepPermille: Int): DataFrame = {
    require(keepPermille >= 1 && keepPermille <= 1000,
      "keepPermille must be in [1, 1000]")
    // fail fast on a non-integral score (the Packing.pack contract):
    // the histogram casts to long but the final predicate compares the
    // RAW column, so a double score would silently truncate the cut
    // and can undershoot the documented never-undershoot guarantee
    locally {
      import org.apache.spark.sql.types._
      val dt = df.schema(scoreCol).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"topFraction: score column '$scoreCol' must be integral fixed-point, got $dt")
    }
    val sc = col(scoreCol)
    // driver-sized histogram: (distinct score, count) — ONE pass. The
    // collect is BOUNDED: limit(MaxHistRows + 1) caps what can ever
    // reach the driver inside the same job, and one extra row proves a
    // contract violation (a caller feeding raw byte lengths / token
    // counts over a huge corpus) — fail fast with the fix spelled out
    // instead of an unbounded driver array (guide §5: the driver does
    // no data work).
    // NULL scores are excluded up front: they can never satisfy the
    // final `score >= cut` predicate anyway, and a null-keyed histogram
    // group would NPE the driver-side decode below.
    val histRaw = df.filter(sc.isNotNull)
      .groupBy(sc.cast("long").as("s")).agg(count(lit(1)).as("n"))
      .limit(MaxHistRows + 1)
      .collect()
    require(histRaw.length <= MaxHistRows,
      s"topFraction: score column '$scoreCol' has more than $MaxHistRows distinct values — " +
        "not a driver-sized fixed-point score. Bucket it first (e.g. floor(score/k)*k) " +
        "or rescale to a bounded fixed-point range.")
    val hist = histRaw.map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    if (hist.isEmpty) return df.filter(sc.isNotNull) // empty or all-NULL input
    val total = hist.map(_._2).sum
    val target = math.max(1L, (keepPermille * total + 999L) / 1000L)
    // walk the histogram from the top score down to the cut
    var kept = 0L
    var cut = hist.head._1
    var i = 0
    while (i < hist.length && kept < target) {
      cut = hist(i)._1
      kept += hist(i)._2
      i += 1
    }
    df.filter(sc >= cut)
  }
}
