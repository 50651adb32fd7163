package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reproducible global corpus ordering for training-data releases.
  *
  * Training runs need the corpus SHUFFLED (no source/time locality in
  * a batch) but REPRODUCIBLY so a run can be repeated and a release
  * re-verified byte-for-byte. Engine RNG shuffles (`ORDER BY random()`)
  * change with partitioning and run; this operator orders by a pure
  * function of (seed, id) — the same seed yields the same global order
  * in any engine, at any parallelism.
  *
  * Scale shape: the key is a narrow per-row expression; the total
  * order is realized as range partitioning + in-partition sort — the
  * standard distributed total order (file k's rows all precede file
  * k+1's), with NO global rank column (a global row_number would
  * serialize into one partition). At 100 TB this is exactly one
  * shuffle — the one any global reorder must pay.
  *
  * The key is MD5 of `"seed:id"` — chosen over the engine's native
  * 64-bit hash because every engine computes the identical MD5 (the
  * DuckDB oracle re-derives the order bit-for-bit), and 128 bits make
  * key collisions (which would leave sibling order partition-dependent)
  * never happen in practice. MD5 here is an ordering key, not a
  * security boundary.
  */
object CorpusOrder {

  /** Append `shuffle_key` and return the frame in reproducible
    * shuffled order (range-partitioned by key, sorted within).
    *
    * @param numPartitions output files/partitions; defaults to the
    *                      session's shuffle parallelism.
    */
  def seeded(
      df: DataFrame,
      idCol: String,
      seed: String,
      numPartitions: Option[Int] = None): DataFrame = {
    val keyed = df.withColumn(
      "shuffle_key", md5(concat_ws(":", lit(seed), col(idCol).cast("string"))))
    val parted = numPartitions match {
      case Some(n) => keyed.repartitionByRange(n, col("shuffle_key"))
      case None    => keyed.repartitionByRange(col("shuffle_key"))
    }
    parted.sortWithinPartitions(col("shuffle_key"))
  }
}
