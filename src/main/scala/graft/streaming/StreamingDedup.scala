package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-Streaming turn dedup — the streaming form of the batch
  * engine's T4 semantic (first occurrence wins within the watermark
  * horizon).
  *
  * The reference is strictly batch replay (SURVEY.md §2.4), so this is
  * an EXTENSION, not parity: continuous transcript ingestion where
  * exact-duplicate turns are dropped as they arrive.
  *
  * Semantics: `dropDuplicatesWithinWatermark(fp)` with a watermark on
  * `ts` — state stores one entry per fingerprint and EXPIRES it once
  * the watermark passes its event time (plain `dropDuplicates` on a
  * non-event-time key never evicts; state would grow without bound at
  * 10^12-turn scale; exact global dedup needs the batch path). First
  * occurrence within the watermark horizon wins — the streaming analog
  * of dedup.c:150-173's first-writer-wins.
  */
object StreamingDedup {

  /** transcripts stream → stream of first-occurrence turns only.
    * @param watermark e.g. "10 minutes": how late a duplicate may
    *        arrive and still be recognized as one; also the state
    *        retention horizon. */
  def uniqueTurnsStream(
      spark: SparkSession,
      transcripts: DataFrame,
      watermark: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    transcripts
      .withColumn("fp", graft.operators.ExactDedup.fp($"text"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
  }

  /** Windowed dedup-ratio metrics stream (reference analog: the
    * per-10k-chunk running counters, optsmr.c:316-332): per event-time
    * window, total turns and distinct fingerprints. */
  def dedupStatsStream(
      spark: SparkSession,
      transcripts: DataFrame,
      windowLen: String = "1 minute",
      watermark: String = "10 minutes"): DataFrame = {
    import spark.implicits._
    transcripts
      .withColumn("fp", graft.operators.ExactDedup.fp64($"text"))
      .withWatermark("ts", watermark)
      .groupBy(window($"ts", windowLen))
      .agg(
        count(lit(1)).as("total_turns"),
        approx_count_distinct($"fp").as("approx_unique_turns"))
      .select(
        $"window.start".as("window_start"),
        $"total_turns",
        $"approx_unique_turns")
  }
}
