package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Restore: rebuild the corpus from (lineage ⋈ unique-turn store) and
  * verify per-turn text equality against the input under stable
  * (conv_id, turn_idx) ordering — the input_hint invariant.
  *
  * Reference analog: recipe replay + forward assembly, output must be
  * byte-identical (/root/reference/src/look_ahead.c:438-443,798-840).
  * The reference's one-read-per-container batching (R3) is exactly what
  * the shuffle join on fp does: all references to a fingerprint meet its
  * single stored copy once.
  */
object Restore {

  /** lineage: (conv_id, turn_idx, fp); uniqueTurns: (fp, text).
    * @return restored (conv_id, turn_idx, text). */
  def restore(spark: SparkSession, lineage: DataFrame, uniqueTurns: DataFrame): DataFrame = {
    import spark.implicits._
    lineage
      .select($"conv_id", $"turn_idx", $"fp")
      .join(uniqueTurns.select($"fp", $"text"), Seq("fp"))
      .select($"conv_id", $"turn_idx", $"text")
  }

  /** Zero-mismatch verification: count of turns whose restored text
    * differs from (or is missing vs) the input. Full outer join so both
    * lost and phantom turns count as mismatches. */
  def mismatchCount(spark: SparkSession, input: DataFrame, restored: DataFrame): Long = {
    import spark.implicits._
    input
      .select($"conv_id", $"turn_idx", $"text".as("text_in"))
      .join(
        restored.select($"conv_id", $"turn_idx", $"text".as("text_out")),
        Seq("conv_id", "turn_idx"),
        "full_outer")
      .filter($"text_in".isNull || $"text_out".isNull || $"text_in" =!= $"text_out")
      .count()
  }
}
