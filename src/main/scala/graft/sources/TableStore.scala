package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Thin table-store facade: Parquet-backed tables with a manifest-based
  * atomic "snapshot commit" and stage checkpoints — the subset of
  * Iceberg semantics the pipeline needs (atomic per-stage commits +
  * resume from the last committed stage). Swapping the backend for real
  * Iceberg is a config change (catalog + `writeTo(...)`); no Iceberg
  * runtime jar ships in this sandbox (SURVEY.md §7 constraints).
  *
  * Commit protocol: write the stage's tables under
  * `<root>/<stage>/<table>/`, then atomically move
  * `_manifest.<stage>.tmp` → `_manifest.<stage>.json` (ATOMIC_MOVE on a
  * posix fs). A stage is committed iff its manifest file exists; a
  * killed run leaves at most uncommitted data files which the rerun
  * overwrites. Reference analog: the recipe/metadata segment store +
  * replay-from-offset resume (/root/reference/src/storagemanager.c:11-34,
  * /root/reference/src/trace_work.c:169-186).
  */
final class TableStore(val root: String) {

  private def manifestPath(stage: String): Path =
    Paths.get(root, s"_manifest.$stage.json")

  def isCommitted(stage: String): Boolean = Files.exists(manifestPath(stage))

  def tablePath(stage: String, table: String): String =
    Paths.get(root, stage, table).toString

  /** Write one table of a stage (not yet committed). */
  def write(df: DataFrame, stage: String, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(tablePath(stage, table))

  /** Atomically mark a stage committed. `tables` is recorded for
    * inspection/debugging. */
  def commit(stage: String, tables: Seq[String]): Unit = {
    val tmp = Paths.get(root, s"_manifest.$stage.tmp")
    val json = tables.map(t => "\"" + t + "\"").mkString(
      s"""{"stage":"$stage","committed_at_ms":${System.currentTimeMillis()},"tables":[""",
      ",",
      "]}")
    Files.createDirectories(Paths.get(root))
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(stage), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def read(spark: SparkSession, stage: String, table: String): DataFrame =
    spark.read.parquet(tablePath(stage, table))

  /** Run `body` only if the stage isn't committed yet; always return the
    * stage's tables (from disk if resuming). Per-stage resumability. */
  def stage(spark: SparkSession, name: String, tables: Seq[String])(
      body: => Map[String, DataFrame]): Map[String, DataFrame] = {
    if (!isCommitted(name)) {
      val out = body
      require(tables.forall(out.contains), s"stage $name must produce $tables")
      tables.foreach(t => write(out(t), name, t))
      commit(name, tables)
    }
    tables.map(t => t -> read(spark, name, t)).toMap
  }
}
