package graft

import graft.corpus.CorpusGen
import graft.sources.TableStore
import java.nio.file.{Files, Paths}

/** North-rule resumability: a run killed after stage k, rerun, produces
  * byte-identical final tables. */
class ResumeSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  val N = 200L
  lazy val transcripts = CorpusGen.transcripts(spark, N).toDF.cache()

  private def clustersOf(store: String): Map[String, String] = {
    import spark.implicits._
    Pipeline.run(spark, transcripts, store).clusters
      .select($"conv_id", $"cluster_id").as[(String, String)].collect().toMap
  }

  test("rerun after deleting later-stage manifests reproduces identical outputs") {
    val store = tmpDir("resume")
    val full = clustersOf(store)
    // simulate a crash after the 'pairs' stage: later stages uncommitted
    for (s <- Seq("clusters", "lineage", "restore", "metrics"))
      Files.deleteIfExists(Paths.get(store, s"_manifest.$s.json"))
    val resumed = clustersOf(store)
    assert(resumed == full)
    // restored corpus still byte-identical
    import spark.implicits._
    val restored = new TableStore(store).read(spark, "restore", "restored")
    assert(operators.Restore.mismatchCount(spark, transcripts, restored) == 0)
    // the run's reliable-checkpoint files are dead once every stage is
    // committed — both runs must have deleted their per-run subdirs
    val ckRoot = Paths.get(store, "_checkpoints")
    assert(!Files.exists(ckRoot) ||
      !Files.list(ckRoot).iterator().hasNext,
      "pipeline left reliable-checkpoint files behind after commit")
  }

  test("failed run leaves no checkpoint dir; stale run_* dirs from crashes are swept") {
    val store = tmpDir("resume7")
    // a previous hard-killed run (no finally ran) left its dir behind
    val stale = Paths.get(store, "_checkpoints", "run_12345")
    Files.createDirectories(stale)
    Files.writeString(stale.resolve("leftover.bin"), "x")
    // this run FAILS mid-stage (input lacks the text column) — the
    // finally must still delete its own per-run dir, and the startup
    // sweep must have removed the stale one
    val broken = transcripts.drop("text")
    intercept[Exception] { Pipeline.run(spark, broken, store) }
    val ckRoot = Paths.get(store, "_checkpoints")
    val residue =
      if (!Files.exists(ckRoot)) Nil
      else { import scala.jdk.CollectionConverters._
        Files.list(ckRoot).iterator().asScala.toList }
    assert(residue.isEmpty, s"checkpoint residue after failed run: $residue")
    // and a good run against the same store still works end-to-end
    assert(clustersOf(store).size == N)
  }

  test("committed stages are not recomputed on resume (manifest mtime unchanged)") {
    val store = tmpDir("resume2")
    clustersOf(store)
    val m = Paths.get(store, "_manifest.docs.json")
    val mtime = Files.getLastModifiedTime(m)
    clustersOf(store)
    assert(Files.getLastModifiedTime(m) == mtime)
  }

  test("partial (uncommitted) stage data is overwritten cleanly") {
    val store = tmpDir("resume3")
    // plant garbage where the docs stage will write, with no manifest
    val dir = Paths.get(store, "docs", "docs")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("part-garbage.parquet"), "not parquet")
    val got = clustersOf(store)
    assert(got.size == N)
  }

  test("lineage rows carry the cluster_id of their conversation; identical after resume") {
    import spark.implicits._
    val store = tmpDir("resume4")
    val res = Pipeline.run(spark, transcripts, store)
    assert(res.lineage.filter($"cluster_id".isNull).count() == 0)
    val bad = res.lineage.select($"conv_id", $"cluster_id")
      .join(res.clusters.select($"conv_id", $"cluster_id".as("expect")), Seq("conv_id"))
      .filter($"cluster_id" =!= $"expect")
    assert(bad.count() == 0)
    // every turn has exactly one lineage row
    assert(res.lineage.count() == transcripts.count())
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"conv_id", $"turn_idx", $"cluster_id")
        .as[(String, Int, String)].collect().toSet
    val first = rows(res.lineage) // materialize BEFORE the rerun overwrites files
    // crash between lineage and restore: rerun rebuilds identical lineage
    for (s <- Seq("lineage", "restore", "metrics"))
      Files.deleteIfExists(Paths.get(store, s"_manifest.$s.json"))
    val res2 = Pipeline.run(spark, transcripts, store)
    assert(first == rows(res2.lineage))
  }

  test("stage metrics carry real counters; consistent across fresh and resumed runs") {
    import spark.implicits._
    val store = tmpDir("resume6")
    val res = Pipeline.run(spark, transcripts, store)
    def byStage(df: org.apache.spark.sql.DataFrame): Map[String, StageMetrics] =
      df.as[StageMetrics].collect().map(x => x.stage -> x).toMap
    val m = byStage(res.metrics)
    val turns = transcripts.count()
    val uniq = transcripts.select($"text").distinct().count()
    assert(m("docs").rows_in == turns && m("docs").rows_out == N)
    assert(m("exact").rows_in == turns)
    assert(m("exact").rows_out == uniq, "exact rows_out = unique turns stored")
    assert(m("exact").dup_pairs == turns - uniq, "exact dup_pairs = turns deduped away")
    assert(m("pairs").rows_out == res.dupPairs.count())
    assert(m("pairs").dup_pairs == m("pairs").rows_out)
    // clusters rows_in = edges actually FED to CC (substring edges are
    // lineage-only and filtered out before clustering)
    assert(m("clusters").rows_in ==
      res.dupPairs.filter($"detector" =!= "substring").count())
    assert(m("clusters").rows_out == N)
    assert(m("lineage").rows_out == turns)
    assert(m("restore").rows_out == turns)
    // resumed run (only metrics uncommitted): counters re-derived from
    // the committed tables, not placeholders
    Files.deleteIfExists(Paths.get(store, "_manifest.metrics.json"))
    val m2 = byStage(Pipeline.run(spark, transcripts, store).metrics)
    assert(m2("docs").rows_out == N)
    assert(m2("exact").rows_in == turns && m2("exact").rows_out == uniq)
    assert(m2("exact").dup_pairs == turns - uniq)
    assert(m2("restore").rows_out == turns)
  }

  test("point write patches one conversation's partition; all other files untouched (direct_rw.c analog)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.upper
    val store = tmpDir("resume5")
    Pipeline.run(spark, transcripts, store)
    val ts = new TableStore(store)
    val conv = transcripts.select($"conv_id").orderBy($"conv_id").as[String].head()
    // patch derived from the INPUT (not a self-read of the target table)
    val patch = transcripts.filter($"conv_id" === conv)
      .select($"conv_id", $"turn_idx", upper($"text").as("text"))
      .withColumn("pbucket", Pipeline.pbucket($"conv_id"))
    def files(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      Files.walk(Paths.get(ts.tablePath("restore", "restored"))).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toMap
    }
    val bucket = patch.select($"pbucket").distinct().as[Int].collect()
    assert(bucket.length == 1)
    val before = files()
    ts.patchPartitions(spark, patch, "restore", "restored",
      Pipeline.RestoredLayout, Seq("conv_id"))
    val after = files()
    val part = s"pbucket=${bucket.head}"
    assert(before.filterNot(_._1.contains(part)) == after.filterNot(_._1.contains(part)),
      "files outside the patched partition must be byte-identical (same paths, same mtimes)")
    // reread: patched conversation uppercased, everything else still
    // byte-equal to the input corpus
    val rr = ts.read(spark, "restore", "restored")
    assert(rr.filter($"conv_id" === conv).filter($"text" =!= upper($"text")).count() == 0)
    assert(operators.Restore.mismatchCount(
      spark,
      transcripts.filter($"conv_id" =!= conv),
      rr.filter($"conv_id" =!= conv).drop("pbucket")) == 0)
  }
}
