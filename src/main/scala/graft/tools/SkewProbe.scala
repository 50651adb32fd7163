package graft.tools

import org.apache.spark.sql.functions._
import graft.{Bench, DedupConfig}
import graft.operators.{DocAssembly, MinHashLSH, SimHashDetector}

/** Bucket-size distribution of the detectors' candidate keys — the
  * skew diagnostic behind the hot-bucket handling. */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val input = if (args.length > 0) args(0) else "/tmp/graft_scaling_corpus_100000"
    val spark = Bench.buildSession("16")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val cfg = DedupConfig.default
    val docs = DocAssembly.assemble(spark, spark.read.parquet(input)).cache()
    val mhKeys = MinHashLSH.bandKeys(spark, MinHashLSH.signatures(spark, docs, cfg), cfg)
    val shSigs = SimHashDetector.signatures(spark, docs, cfg)
    graft.plans.GraftFunctions.register(spark)
    val shKeys = shSigs.toDF.select(
      explode(call_function("graft_ball_keys", $"simhash", lit(cfg.simhashBlocks))).as("band_key"),
      $"conv_id")
    for ((name, keys) <- Seq("minhash" -> mhKeys.toDF, "simhash" -> shKeys)) {
      val counts = keys.groupBy($"band_key").count()
      val top = counts.orderBy(desc("count")).limit(10).collect().map(_.getLong(1))
      val stats = counts.agg(
        count(lit(1)), sum($"count"), max($"count"),
        sum(when($"count" > cfg.bucketCap, $"count").otherwise(0L))).collect()(0)
      System.err.println(s"[skew] $name buckets=${stats.getLong(0)} rows=${stats.getLong(1)} " +
        s"max=${stats.getLong(2)} rowsInHotBuckets=${stats.getLong(3)} top10=${top.mkString(",")}")
    }
    spark.stop()
  }
}
