package graft.tools

import org.apache.spark.sql.SparkSession
import graft.CurationPipeline

/** End-to-end committed curation run over a testdata documents table:
  *
  *   sbt "runMain graft.tools.RunCuration /root/testdata/sf0.01 /tmp/graft_cur_store 8"
  *
  * bench = every doc_id ≡ 0 (mod 97) of the same corpus (the driver
  * oracle's deterministic eval-set convention). Rerunning against the
  * same store resumes from the last committed stage — identical counts,
  * committed manifests untouched.
  */
object RunCuration {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val store = if (args.length > 1) args(1) else "/tmp/graft_cur_store"
    val cpus = if (args.length > 2) args(2) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // optional: line-dedup boilerplate document frequency (off when absent)
    val lineDf = if (args.length > 3) Some(args(3).toLong) else None
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-curation")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.shuffle.sort.bypassMergeThreshold", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val t0 = System.nanoTime()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text")
    val res = CurationPipeline.run(spark, docs,
      docs.filter($"doc_id" % 97 === 0), store, lineBoilerplateDf = lineDf)
    val nDocs = docs.count()
    val nKept = res.curated.count()
    val nCut = res.curated.filter($"n_hit_grams" > 0).count()
    val secs = (System.nanoTime() - t0) / 1e9
    val lineNote =
      if (lineDf.isDefined)
        f" line_cut_docs=${res.curated.filter($"n_cut_lines" > 0).count()}"
      else ""
    println(f"curation: docs=$nDocs kept=$nKept span_cut_docs=$nCut$lineNote " +
      f"wall=$secs%.1fs docs_per_sec=${nDocs / secs}%.0f")
    res.metrics.orderBy("stage").show(10, false)
    spark.stop()
  }
}
