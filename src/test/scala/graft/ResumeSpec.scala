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
    for (s <- Seq("clusters", "restore", "metrics"))
      Files.deleteIfExists(Paths.get(store, s"_manifest.$s.json"))
    val resumed = clustersOf(store)
    assert(resumed == full)
    // restored corpus still byte-identical
    import spark.implicits._
    val restored = new TableStore(store).read(spark, "restore", "restored")
    assert(operators.Restore.mismatchCount(spark, transcripts, restored) == 0)
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
}
