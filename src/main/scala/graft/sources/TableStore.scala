package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Physical layout of one stored table: hash-partition directories +
  * in-file ordering.
  *
  * `partitionBy` columns become directory-level partitions (enables
  * partition pruning on read and partition-scoped point writes);
  * `sortWithin` orders rows inside each written file (restore output
  * sorted by (conv_id, turn_idx) reads back sequentially — the
  * reference's forward-assembly-area ordering,
  * /root/reference/src/look_ahead.c:798-840). When both are given the
  * partition columns lead the sort so the file-writer's own
  * partition-clustering pass cannot destroy the secondary order. */
final case class Layout(
    partitionBy: Seq[String] = Nil,
    sortWithin: Seq[String] = Nil)

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
  *
  * All writes use zstd parquet compression (T9: the reference compresses
  * container payloads; here the column codec is the declarative
  * equivalent and zstd dominates snappy on text at similar CPU).
  */
final class TableStore(val root: String) {

  private def manifestPath(stage: String): Path =
    Paths.get(root, s"_manifest.$stage.json")

  def isCommitted(stage: String): Boolean = Files.exists(manifestPath(stage))

  def tablePath(stage: String, table: String): String =
    Paths.get(root, stage, table).toString

  /** Write one table of a stage (not yet committed). */
  def write(df: DataFrame, stage: String, table: String, layout: Layout = Layout()): Unit = {
    val ordered =
      if (layout.sortWithin.isEmpty) df
      else df.sortWithinPartitions((layout.partitionBy ++ layout.sortWithin).map(col): _*)
    val writer = ordered.write.mode(SaveMode.Overwrite).option("compression", "zstd")
    val withParts =
      if (layout.partitionBy.isEmpty) writer else writer.partitionBy(layout.partitionBy: _*)
    withParts.parquet(tablePath(stage, table))
  }

  /** Direct point write (R10): replace the rows whose `keyCols` appear
    * in `patch`, rewriting ONLY the hash-partition directories the patch
    * touches — every other partition's files stay physically untouched
    * (Spark dynamic partition overwrite). Reference analog: patching a
    * chunk range in place without rewriting the container set
    * (/root/reference/src/direct_rw.c:221-307).
    *
    * Mechanics: statically prune to the affected partitions, keep their
    * rows whose key is NOT being patched (left-anti), union the patch,
    * detach the result from the about-to-be-replaced files
    * (localCheckpoint), then dynamic-overwrite. Work is proportional to
    * the touched partitions, not the table. */
  def patchPartitions(
      spark: SparkSession,
      patch: DataFrame,
      stage: String,
      table: String,
      layout: Layout,
      keyCols: Seq[String]): Unit = {
    require(layout.partitionBy.size == 1, "point write requires a single partition column")
    val pcol = layout.partitionBy.head
    val path = tablePath(stage, table)
    val touched = patch.select(col(pcol)).distinct().collect().map(_.get(0))
    val existing = spark.read.parquet(path).filter(col(pcol).isin(touched: _*))
    val keep = existing.join(
      patch.select(keyCols.map(col): _*).distinct(), keyCols, "left_anti")
    val full = keep.unionByName(patch.select(existing.columns.map(col): _*))
      .localCheckpoint(true)
    val ordered =
      if (layout.sortWithin.isEmpty) full
      else full.sortWithinPartitions((layout.partitionBy ++ layout.sortWithin).map(col): _*)
    ordered.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "zstd")
      .partitionBy(layout.partitionBy: _*)
      .parquet(path)
  }

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
  def stage(
      spark: SparkSession,
      name: String,
      tables: Seq[String],
      layouts: Map[String, Layout] = Map.empty)(
      body: => Map[String, DataFrame]): Map[String, DataFrame] = {
    if (!isCommitted(name)) {
      val out = body
      require(tables.forall(out.contains), s"stage $name must produce $tables")
      tables.foreach(t => write(out(t), name, t, layouts.getOrElse(t, Layout())))
      commit(name, tables)
    }
    tables.map(t => t -> read(spark, name, t)).toMap
  }
}
