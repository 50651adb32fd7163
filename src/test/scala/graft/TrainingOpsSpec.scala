package graft

import graft.operators._
import graft.functions.Hashing
import org.apache.spark.sql.functions._

/** Training-data pipeline operators: text analysis, n-gram Jaccard,
  * embedding similarity, multimodal plumbing. */
class TrainingOpsSpec extends SparkSpec {

  lazy val documents = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").cache()
  lazy val embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("tokenCount handles empties, padding, multi-space") {
    import spark.implicits._
    val df = Seq("", "  ", "one", " a  b   c ", "x y").toDF("text")
      .withColumn("n", TextAnalysis.tokenCount($"text"))
    assert(df.select("n").as[Int].collect().toSeq == Seq(0, 0, 1, 3, 2))
  }

  test("langId classifies marker-bearing texts; documents table all English-ish") {
    import spark.implicits._
    // the sf documents table's `lang` column is an independent label —
    // its text is English-vocabulary regardless — so langId is tested
    // on texts that actually carry language signal
    val df = Seq(
      ("en", "the cat is on the roof and the dog is not"),
      ("de", "der hund ist nicht die katze und das haus"),
      ("es", "la casa es una maravilla que los gatos aman"),
      ("fr", "le chat est dans une maison des amis"),
      ("zh", "你好 世界 猫 在 屋顶"),
      ("und", "xxqq zzkk wwpp")).toDF("expected", "text")
      .withColumn("pred", TextAnalysis.langId($"text"))
    assert(df.filter($"pred" =!= $"expected").count() == 0)
    // on the documents table everything should classify en/und (its
    // vocabulary is English SQL-ish words)
    val preds = documents.withColumn("pred", TextAnalysis.langId($"text"))
      .groupBy($"pred").count().collect().map(r => r.getString(0)).toSet
    assert(preds.subsetOf(Set("en", "und")), preds.toString)
  }

  test("quality score: garbage scores lower than prose") {
    import spark.implicits._
    val df = Seq(
      ("good", "The quick brown fox jumps over the lazy dog and keeps running through the field"),
      ("short", "hi"),
      ("punct", "!!! ... ??? !!! ,,, ;;; !!!")).toDF("id", "text")
    val scores = TextAnalysis.qualityScore(df).select($"id", $"quality_score")
      .as[(String, Long)].collect().toMap
    assert(scores("good") > scores("short"))
    assert(scores("good") > scores("punct"))
  }

  test("fingerprint is normalization-invariant") {
    import spark.implicits._
    val df = Seq("Hello  World", "hello world").toDF("text")
    val fps = TextAnalysis.fingerprint(df).select("doc_fp").as[Long].collect()
    assert(fps(0) == fps(1))
  }

  test("ngram jaccard: identical docs score 10000, disjoint absent") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "totally different words here now"),
      (4L, "alpha beta gamma delta zeta")).toDF("doc_id", "text")
    val p = NgramJaccard.pairs(spark, df, "doc_id", "text", n = 1, threshold = 0.3)
      .select($"doc_a", $"doc_b", $"jaccard_x10000").as[(Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(p((1L, 2L)) == 10000L)
    assert(p.contains((1L, 4L)) && p((1L, 4L)) == 6666L) // 4/6
    assert(!p.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("ngram jaccard bigrams on documents finds the shared-prefix near-dups") {
    val p = NgramJaccard.pairs(spark, documents, "doc_id", "text", n = 2, threshold = 0.4)
    assert(p.count() > 0)
  }

  test("brute-force cosine top-k: self excluded, ranks ordered, k respected") {
    import spark.implicits._
    val topk = EmbeddingSim.bruteForceTopK(spark, embeddings, Seq(0L, 1L, 2L), k = 5)
      .collect()
    assert(topk.length == 15)
    val byQ = topk.groupBy(_.getLong(0))
    for ((q, rows) <- byQ) {
      val ranked = rows.sortBy(_.getInt(2))
      assert(ranked.map(_.getInt(2)).toSeq == (1 to 5))
      assert(!ranked.exists(_.getLong(1) == q))
      val sims = ranked.map(_.getLong(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("rhp-bucketed ANN finds planted high-cosine near-duplicates") {
    import spark.implicits._
    // the raw sf embeddings are near-orthogonal (top-1 cos ≈ 0.35) —
    // not an ANN regime. The dedup use-case is cos ≥ 0.95: plant
    // perturbed copies and require the detector to pair them up.
    val base = embeddings.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect()
    val planted = base.take(60).map { case (id, v) =>
      val r = new scala.util.Random(id)
      (id + 100000L, v.map(x => x * 1.01f + 0.002f * r.nextFloat()))
    }
    val corpus = (base ++ planted).toSeq.toDS().toDF("vec_id", "embedding")
      .repartition(4)
    val pairs = EmbeddingSim.cosineDupPairs(spark, corpus, threshold = 0.95)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val expected = (0L until 60L).map(i => (i, i + 100000L)).toSet
    val recall = expected.intersect(pairs).size.toDouble / expected.size
    assert(recall >= 0.95, s"embedding dup recall $recall")
    // precision: nothing else in this corpus is cos>=0.95
    assert(pairs.forall { case (a, b) => b == a + 100000L }, pairs.take(5).toString)
  }

  test("ANN bucket cap bounds hot-bucket candidate fan-out (no quadratic blowup)") {
    import spark.implicits._
    // 2000 IDENTICAL embeddings — every table hashes them all to ONE
    // bucket. Uncapped, the candidate self-join would emit ~2000² = 4M
    // rows; with cap=32 it must stay ≤ tables × cap × (cap-1).
    val v = Seq.tabulate(16)(i => (i + 1).toFloat)
    val corpus = (0L until 2000L).map(id => (id, v)).toDS().toDF("vec_id", "embedding")
      .repartition(8)
    val tables = 4
    val keys = EmbeddingSim.bucketKeys(spark, corpus, bits = 12, tables = tables, seed = 42L)
    assert(keys.select($"bucket").distinct().count() == tables)
    val cap = 32
    val topk = EmbeddingSim.rhpBucketTopK(spark, corpus, k = 5, bits = 12,
      tables = tables, seed = 42L, bucketCap = cap)
    // each query sees at most k results
    val perQuery = topk.groupBy($"query_id").count().agg(org.apache.spark.sql.functions.max("count"))
      .collect()(0).getLong(0)
    assert(perQuery <= 5)
    // the query side streams UNCAPPED: every vector still probes its hot
    // bucket, so ALL 2000 queries produce results (under the old
    // both-sides cap, capped-out vectors had zero candidates anywhere —
    // recall 0 exactly where dedup matters most)
    assert(topk.select($"query_id").distinct().count() == 2000L)
    // the MEMBER side is capped: candidate volume is n·tables·cap, not
    // n² — every neighbor anywhere in the output comes from a capped
    // bucket membership
    assert(topk.select($"neighbor_id").distinct().count() <= (tables * cap).toLong)
  }

  test("ANN bucket keys are correct on mixed-dimension partitions") {
    import spark.implicits._
    // one partition holding 8-dim and 16-dim vectors interleaved: the
    // per-partition plane cache must key by dimension — a shared cache
    // would either throw (short vector) or silently truncate (long one)
    val rows = (0L until 40L).map { id =>
      val dim = if (id % 2 == 0) 8 else 16
      (id, Seq.tabulate(dim)(d => (Hashing.mix64(id * 31 + d) % 1000).toFloat / 1000f))
    }
    val corpus = rows.toDS().toDF("vec_id", "embedding").coalesce(1)
    val got = EmbeddingSim.bucketKeys(spark, corpus, bits = 12, tables = 3, seed = 42L)
      .as[(Long, Long)].collect().groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // oracle: the single-shot rhpBits form, per vector
    for ((id, v) <- rows; t <- 0 until 3) {
      val planes = EmbeddingSim.rhpPlanes(v.length, 12, Hashing.mix64(42L * 31 + t))
      val expected = Hashing.mix64(42L + t) ^
        ((0 until 12).foldLeft(0L) { (sig, p) =>
          val dot = v.indices.map(d => v(d) * planes(p)(d)).sum
          if (dot >= 0) sig | (1L << p) else sig
        } | (t.toLong << 56))
      assert(got(id).contains(expected), s"vec $id table $t")
    }
  }

  test("multimodal: features deterministic, planted dups found, frame sampling shape") {
    import spark.implicits._
    val media = Multimodal.syntheticMedia(spark, 64)
    val f1 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(spark, media.repartition(5)).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq.map(identity))
    assert(f1.filter(_.kind == "video").forall(_.frame_fps.length == 4))
    assert(f1.filter(_.kind != "video").forall(_.frame_fps.length == 1))
    val dedup = Multimodal.dedupMedia(spark, Multimodal.extractFeatures(spark, media))
    val dups = dedup.filter(!$"is_unique").select($"media_id", $"rep_media_id")
      .as[(Long, Long)].collect().toMap
    // planted: id % 8 == 7 duplicates id-3
    for (id <- 0L until 64L if id % 8 == 7) assert(dups.get(id).contains(id - 3))
    assert(dups.size == 8)
    // both fingerprint halves are populated and independent
    val anyFeat = f1.head
    assert(anyFeat.content_fp_hi != anyFeat.content_fp_lo)
  }

  test("media fingerprint is 128-bit: dedup honors BOTH halves (collision safety)") {
    import spark.implicits._
    // two DISTINCT media with a forced hi collision: keyed on hi alone
    // they would merge and one payload would silently vanish — the
    // 10^9–10^12-media birthday failure mode dedupMedia must survive.
    // (Injected directly at the MediaFeatures layer, like ExactDedupSpec's
    // forced-h1 turn collision: finding a real FNV collision is ~2^32.)
    val forced = Seq(
      Multimodal.MediaFeatures(0L, "image", 10, 42L, 111L, 50L, Seq(1L)),
      Multimodal.MediaFeatures(1L, "image", 10, 42L, 222L, 50L, Seq(2L)))
      .toDS()
    val d = Multimodal.dedupMedia(spark, forced)
    assert(d.filter($"is_unique").count() == 2,
      "hi collision must NOT merge distinct media")
    // and a true duplicate (both halves equal) still collapses
    val dup = Seq(
      Multimodal.MediaFeatures(0L, "image", 10, 42L, 111L, 50L, Seq(1L)),
      Multimodal.MediaFeatures(1L, "image", 10, 42L, 111L, 50L, Seq(1L)))
      .toDS()
    val d2 = Multimodal.dedupMedia(spark, dup)
    assert(d2.filter(!$"is_unique").select($"rep_media_id").as[Long].collect().toSeq == Seq(0L))
  }

  test("resizeImages: real rescale to target dims, dup structure preserved, non-images untouched") {
    import spark.implicits._
    val media = Multimodal.syntheticMedia(spark, 64)
    val resized = Multimodal.resizeImages(spark, media, 16, 16).cache()
    // every image payload decodes to exactly 16x16
    val dims = resized.filter($"kind" === "image").collect().map { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      (img.getWidth, img.getHeight, r.meta_width, r.meta_height)
    }
    assert(dims.nonEmpty && dims.forall(_ == ((16, 16, 16, 16))))
    // non-images pass through byte-identical
    val origBytes = media.filter($"kind" =!= "image").collect()
      .map(r => r.media_id -> r.payload.toSeq).toMap
    resized.filter($"kind" =!= "image").collect().foreach { r =>
      assert(r.payload.toSeq == origBytes(r.media_id))
    }
    // resize is deterministic and preserves the planted dup structure:
    // identical source pixels → identical resized payloads
    val feats = Multimodal.extractFeatures(spark, resized)
    val dups = Multimodal.dedupMedia(spark, feats)
      .filter($"kind" === "image" && !$"is_unique").collect()
    assert(dups.nonEmpty)
    dups.foreach(r => assert(r.getAs[Long]("rep_media_id") == r.getAs[Long]("media_id") - 3))
    resized.unpersist()
  }

  test("keepCorpus keeps lowest doc_id per normalized text with reference counts") {
    import spark.implicits._
    val docs = Seq(
      (0L, "Hello  world"),
      (1L, " hello WORLD "), // same normalized text as 0
      (2L, "hello world!"),  // different (punctuation survives)
      (3L, "other doc"),
      (4L, "hello\tworld")    // same normalized text as 0
    ).toDF("doc_id", "text")
    val kept = operators.TextAnalysis.keepCorpus(docs)
      .as[(Long, Long)].collect().toMap
    assert(kept == Map(0L -> 3L, 2L -> 1L, 3L -> 1L))
  }

  test("stratified sample is the exact deterministic id-mod subset") {
    import spark.implicits._
    val rows = (0L until 4000L).map(i => (i, if (i % 3 == 0) "en" else "fr"))
    val df = rows.toDF("doc_id", "lang")
    val got = operators.Sampling
      .stratified(df, "doc_id", "lang", Map("en" -> 250), defaultPermille = 100)
      .as[(Long, String)].collect().toSet
    val want = rows.filter { case (id, lang) =>
      id % 1000 < (if (lang == "en") 250 else 100)
    }.toSet
    assert(got == want)
    assert(got.nonEmpty && got.size < rows.size)
    // permutation invariance: repartitioned input yields the same subset
    val got2 = operators.Sampling
      .stratified(df.repartition(13), "doc_id", "lang", Map("en" -> 250), 100)
      .as[(Long, String)].collect().toSet
    assert(got2 == got)
  }

  test("subwordTokenCount: GPT-2-ish pre-token segmentation") {
    import spark.implicits._
    val df = Seq(
      ("", 0L),
      ("hello world", 2L),             // "hello", " world"
      ("hello world 42!", 4L),         // + " 42", "!"
      ("it's a test", 5L),             // "it", "'", "s", " a", " test"
      ("  padded  ", 3L)               // "  ", "padded", "  "
    ).toDF("text", "expected")
    val got = df.withColumn("n", TextAnalysis.subwordTokenCount($"text"))
    assert(got.filter($"n" =!= $"expected").count() == 0,
      got.collect().mkString(";"))
  }

  test("repetitionStats matches hand-computed ratios") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a a"),     // n=4 nd=1 top=4 | grams: 3x "a a", 1 distinct
      (2L, "a b c d"),     // all distinct
      (3L, "a b a b a"),   // n=5 nd=2 top=3 | grams: ab,ba,ab,ba → 4/2
      (4L, ""),            // empty → all zero
      (5L, "solo")         // single token → top=10000, no grams
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(df).orderBy($"doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq(
      (1L, 4L, 7500L, 10000L, 6666L),
      (2L, 4L, 0L, 2500L, 0L),
      (3L, 5L, 6000L, 6000L, 5000L),
      (4L, 0L, 0L, 0L, 0L),
      (5L, 1L, 0L, 10000L, 0L)))
  }

  test("repetitionFilter keeps prose, drops repetitive docs") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumped over one lazy dog again today"),
      (2L, "spam spam spam spam spam spam spam spam")).toDF("doc_id", "text")
    val keeps = TextAnalysis.repetitionFilter(df)
      .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    assert(keeps(1L) && !keeps(2L))
  }

  test("IVF: deterministic centroids; planted twin found at rank 1") {
    import spark.implicits._
    val e = embeddings.select($"vec_id", $"embedding")
    val twins = e.filter($"vec_id" % 100 === 3)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    val corpus = e.unionByName(twins)
    val c1 = IvfIndex.fitCentroids(spark, corpus, nCells = 16)
    val c2 = IvfIndex.fitCentroids(spark, corpus, nCells = 16)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    val top = IvfIndex.ivfTopK(spark, corpus, k = 3, nCells = 16)
    val nTwins = twins.count()
    assert(nTwins > 0)
    // every planted pair surfaces at rank 1 with cos ≈ 1, both directions
    val found = top.filter($"rank" === 1 && $"cos_x10000" >= 9990 &&
      (($"neighbor_id" === $"query_id" + 1000000L) ||
       ($"neighbor_id" === $"query_id" - 1000000L))).count()
    assert(found == 2 * nTwins, s"found=$found expected=${2 * nTwins}")
    // ranks are 1..k, no self pairs
    assert(top.filter($"query_id" === $"neighbor_id").count() == 0)
    assert(top.filter($"rank" < 1 || $"rank" > 3).count() == 0)
  }

  test("hierarchical IVF: fit past the 2^16 flat-cell boundary, twins found at rank 1") {
    import spark.implicits._
    // 240k deterministic hash-spread vectors, dim 4 — big enough that a
    // two-level fit materializes > 2^16 leaf cells (the flat driver fit
    // is explicitly capped there)
    val base = spark.range(240000).select($"id".as("vec_id"),
      array((0 until 4).map(d =>
        (pmod(xxhash64($"id", lit(d)), lit(1000)).cast("float") / 500f - 1f)
          .cast("float")): _*)
        .as("embedding"))
    val model = IvfIndex.fitCentroidsHier(spark, base, nCells = 70016,
      seed = 42L, superCells = 64)
    assert(model.nCells > 65536, s"hier fit produced ${model.nCells} cells")
    assert(model.offsets.length == model.superCents.length)
    // identical vectors always share a leaf (two-level ties break to the
    // lowest index at both levels)
    val twins = base.filter($"vec_id" % 800 === 3)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    val corpus = base.unionByName(twins)
    val assigned = IvfIndex.assignCellsHier(spark, corpus, model)
    assert(assigned.agg(org.apache.spark.sql.functions.max($"cell")).as[Long].head() < model.nCells)
    val twinCells = assigned
      .withColumn("orig", when($"vec_id" >= 1000000L, $"vec_id" - 1000000L).otherwise($"vec_id"))
      .filter($"orig" % 800 === 3)
      .groupBy($"orig").agg(countDistinct($"cell").as("nc"))
    assert(twinCells.filter($"nc" =!= 1).count() == 0, "identical vectors split across leaves")
    // end-to-end: every planted identical twin at rank 1, both directions
    val top1 = IvfIndex.ivfTopKHier(spark, corpus, k = 1, nCells = 70016,
      nProbe = 2, superCells = 64)
      .filter($"rank" === 1)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    for (id <- 3L until 240000L by 800L) {
      assert(top1.get(id).contains(id + 1000000L), s"twin of $id not at rank 1")
      assert(top1.get(id + 1000000L).contains(id), s"twin of ${id + 1000000L} not at rank 1")
    }
  }

  test("hier assignment degrades a NaN embedding to cell 0 instead of killing the job") {
    import spark.implicits._
    val base = spark.range(2000).select($"id".as("vec_id"),
      array((0 until 4).map(d =>
        (pmod(xxhash64($"id", lit(d)), lit(1000)).cast("float") / 500f - 1f)
          .cast("float")): _*)
        .as("embedding"))
    val bad = Seq((9999999L, Seq(Float.NaN, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val model = IvfIndex.fitCentroidsHier(spark, base, nCells = 64,
      seed = 42L, superCells = 8)
    val assigned = IvfIndex.assignCellsHier(spark, base.unionByName(bad), model)
    // the job completes, every row (incl. the NaN one) gets a cell,
    // and the NaN row lands in the degrade cell 0
    assert(assigned.count() == 2001)
    assert(assigned.filter($"vec_id" === 9999999L)
      .select($"cell").as[Long].head() == 0L)
  }

  test("ANN recall audit: both indexes near-perfect on a noisy clustered corpus") {
    import spark.implicits._
    // 1% per-dim noise around 40 cluster centers: truth top-5 are
    // cluster-mates; the audit measures whether the bucketed indexes
    // surface them (exact re-rank then reproduces the exact top-5)
    val corpus = EmbeddingAudit.clusteredEmbeddings(spark, 1000, 32, 40, noise = 0.01)
    val qids = (0L until 1000L by 53L)
    for (ann <- Seq(
        EmbeddingSim.rhpBucketTopK(spark, corpus, k = 5),
        IvfIndex.ivfTopK(spark, corpus, k = 5),
        IvfIndex.pqTopK(spark, corpus, k = 5))) {
      val r = EmbeddingAudit.recallAtK(spark, corpus, ann, 5, qids).collect().head
      assert(r.getAs[Long]("n_queries") == qids.size)
      assert(r.getAs[Long]("recall_x10000") >= 9500L, r.toString)
    }
  }

  test("pqTopK finds planted identical twins at rank 1, cos = 1, both directions") {
    import spark.implicits._
    val e = embeddings.select($"vec_id", $"embedding")
    val twins = e.filter($"vec_id" % 100 === 3)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    val out = IvfIndex.pqTopK(spark, e.unionByName(twins), k = 5)
    val found = out.filter($"cos_x10000" >= 9990)
      .select($"query_id", $"neighbor_id", $"rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sel = e.filter($"vec_id" % 100 === 3).select($"vec_id").as[Long].collect()
    assert(sel.nonEmpty)
    val expected = sel.flatMap(i =>
      Seq((i, i + 1000000L, 1), (i + 1000000L, i, 1))).toSet
    assert(found == expected, s"missing=${expected -- found} extra=${found -- expected}")
  }

  test("PQ codebooks: m subspaces of ceil(dim/m) width, byte-safe code range, deterministic encode") {
    import spark.implicits._
    val books = IvfIndex.fitPqCodebooks(spark, embeddings, m = 8, ksub = 16)
    assert(books.length == 8)
    val dim = embeddings.select(size($"embedding")).as[Int].head()
    assert(books(0)(0).length == (dim + 7) / 8)
    assert(books.forall(_.length <= 16))
    // the fit is a pure function of (corpus, seed)
    val again = IvfIndex.fitPqCodebooks(spark, embeddings, m = 8, ksub = 16)
    assert(books.zip(again).forall { case (a, b) =>
      a.zip(b).forall { case (x, y) => x.sameElements(y) } })
  }

  test("semanticDedup dedups past the per-cell member cap (mega-cluster)") {
    import spark.implicits._
    // 100 identical vectors in one cell, cap 8: only the member ('b')
    // side is capped, so every vector still probes and all but the
    // global-min are dropped with rep = the lowest member
    val v = Seq.fill(8)(1.0f)
    val df = (0L until 100L).map(i => (i, v)).toDF("vec_id", "embedding")
    val out = IvfIndex.semanticDedup(spark, df, threshold = 0.95, nCells = 4, cellCap = 8)
    assert(out.filter($"is_kept").count() == 1)
    assert(out.filter(!$"is_kept" && $"rep_id" =!= 0L).count() == 0)
    assert(out.count() == 100)
  }

  test("semanticDedup drops planted copies (rep = original), keeps originals") {
    import spark.implicits._
    val e = embeddings.select($"vec_id", $"embedding")
    val twins = e.filter($"vec_id" % 100 === 3)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    val corpus = e.unionByName(twins)
    val out = IvfIndex.semanticDedup(spark, corpus, threshold = 0.95, nCells = 16)
    assert(out.count() == corpus.count()) // one row per vector
    // all originals kept and self-representing
    assert(out.filter($"vec_id" < 1000000L &&
      (!$"is_kept" || $"rep_id" =!= $"vec_id")).count() == 0)
    // every copy dropped with rep = its original
    val copies = out.filter($"vec_id" >= 1000000L)
    assert(copies.count() > 0)
    assert(copies.filter($"is_kept" || $"rep_id" =!= $"vec_id" - 1000000L).count() == 0)
  }

  test("packing: next-fit discipline, oversized docs isolated, budget respected") {
    import spark.implicits._
    def toks(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      (1L, toks(5)), (2L, toks(5)), (3L, toks(5)),
      (4L, toks(100)), (5L, toks(3)), (6L, toks(8))).toDF("doc_id", "text")
    val out = Packing.pack(spark, docs, budgetTokens = 10L, nGroups = 1)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 2L, 5L -> 3L, 6L -> 4L))
    // invariant on the real corpus: every bin's total <= budget unless
    // it is a singleton (an oversized doc alone); one row per doc
    val budget = 500L
    val packed = Packing.pack(spark, documents, budget, nGroups = 8)
    assert(packed.count() == documents.count())
    val bad = packed.groupBy($"pack_group", $"bin_seq")
      .agg(sum($"n_tokens").as("tot"), count(lit(1)).as("n"))
      .filter($"tot" > budget && $"n" > 1)
    assert(bad.count() == 0)
  }

  test("curation verdict: each axis fails exactly its planted offender") {
    import spark.implicits._
    val good = (1 to 60).map(i => s"tok$i").mkString(" ") + ". Fine text here?"
    val benchDoc = (100 to 125).map(i => s"bw$i").mkString(" ")
    val docs = Seq(
      (0L, good),                                   // keeper
      (1L, good),                                   // exact dup of 0 → not canonical
      (2L, good + " mail me x@y.io now"),           // PII
      (3L, "short doc"),                            // quality floor
      (4L, Seq.fill(50)("spam").mkString(" ")),     // repetition
      (5L, s"prefix $benchDoc suffix " + (1 to 40).map(i => s"u$i").mkString(" ")), // contaminated
      (97L, benchDoc + " " + (200 to 240).map(i => s"bx$i").mkString(" "))) // the bench doc itself
      .toDF("doc_id", "text")
    val out = Curate.report(spark, docs, docs.filter($"doc_id" === 97L))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))).toMap
    // (is_canonical, rep_ok, pii_ok, decon_ok, quality_ok, keep)
    assert(out(0L) == ((true, true, true, true, true, true)))
    assert(out(1L) == ((false, true, true, true, true, false)))
    assert(out(2L)._3 == false && out(2L)._6 == false && out(2L)._1)
    assert(out(3L)._5 == false && out(3L)._6 == false)
    assert(out(4L)._2 == false && out(4L)._6 == false)
    assert(out(5L)._4 == false && out(5L)._6 == false)
    assert(out(97L)._4 == false)                    // bench self-hit
    assert(out.size == 7)                           // one verdict per doc
  }

  test("narrow text ops run unchanged as a streaming query (stateless scan ops)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the per-row curation axes (PII scrub/stats, quality, repetition)
    // are stateless column exprs, so the SAME code must work on a
    // stream — this pins that none of them smuggles in a batch-only
    // construct (global window/sort/groupBy)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val df = mem.toDS().toDF("doc_id", "text")
    val q = TextAnalysis.qualityScore(df)
      .withColumn("scrubbed", TextAnalysis.piiScrub($"text"))
      .select($"doc_id", $"quality_score", $"scrubbed")
      .writeStream.format("memory").queryName("txt_stream")
      .outputMode("append").start()
    mem.addData((1L, "call 555-867-5309 now please"), (2L, "plain words only"))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("txt_stream")
      .select($"doc_id", $"scrubbed").as[(Long, String)].collect().toMap
    assert(rows(1L) == "call <PHONE> now please")
    assert(rows(2L) == "plain words only")
    // the other per-row axes analyze as streaming frames too
    assert(TextAnalysis.repetitionFilter(df).isStreaming)
    assert(TextAnalysis.piiStats(df).isStreaming)
  }

  test("decontamination flags exactly the docs sharing a bench n-gram") {
    import spark.implicits._
    val w = (1 to 20).map(i => s"w$i").mkString(" ")           // 20 tokens
    val train = Seq(
      (0L, s"$w tail tokens here"),                            // contains bench doc 100's grams
      (1L, "short doc"),                                       // < n tokens → 0 grams
      (2L, (21 to 45).map(i => s"v$i").mkString(" ")),         // disjoint vocab
      (3L, s"prefix stuff $w"),                                // contains the bench grams too
      (100L, w)).toDF("doc_id", "text")                        // the bench doc itself
    val bench = train.filter($"doc_id" === 100L)
    val out = Decontaminate.contamination(spark, train, bench, n = 13)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 100L))            // every doc reported once
    assert(out(1L) == ((0L, 0L, false)))                       // gram-less doc present, clean
    assert(out(2L)._3 == false && out(2L)._1 == 25 - 12)       // disjoint: right gram count, clean
    assert(out(100L)._1 == 20 - 12 && out(100L)._2 == 20 - 12 && out(100L)._3) // self-hit on all grams
    assert(out(0L)._3 && out(3L)._3)                           // supersets flagged
    assert(out(0L)._2 == 20 - 12 && out(3L)._2 == 20 - 12)     // hits = exactly the shared grams
  }

  test("span cut: only the contaminated window is removed, clean text survives") {
    import spark.implicits._
    val b = (1 to 13).map(i => s"b$i").mkString(" ")     // the bench 13-gram
    val train = Seq(
      (0L, s"x1 x2 x3 x4 x5 $b y1 y2 y3 y4 y5"),         // B embedded mid-doc
      (1L, s"$b $b"),                                    // two full copies → all covered
      (2L, "totally unrelated words only"),              // clean, < n tokens
      (9L, b)).toDF("doc_id", "text")                    // the bench doc itself
    val bench = train.filter($"doc_id" === 9L)
    val out = Decontaminate.cutSpans(spark, train, bench, n = 13)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(0L) == (("x1 x2 x3 x4 x5 y1 y2 y3 y4 y5", 1L)))
    assert(out(1L) == (("", 2L)))                        // hits at 0 and 13 cover all 26
    assert(out(2L) == (("totally unrelated words only", 0L)))
    assert(out(9L) == (("", 1L)))                        // bench self-hit, fully cut
    assert(out.size == 4)
  }

  test("span cut aligns across Unicode whitespace (kernel and cut share one token frame)") {
    import spark.implicits._
    val b = (1 to 13).map(i => s"b$i").mkString(" ")
    // U+3000 ideographic space before the leaked span: isWhitespace but
    // NOT Java-regex \s — a \s-split cut frame would shift every hit
    // index and leave leaked tokens in
    val train = Seq((0L, s"aa　bb $b tail"), (9L, b)).toDF("doc_id", "text")
    val out = Decontaminate.cutSpans(spark, train, train.filter($"doc_id" === 9L), n = 13)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "aa bb tail")
    assert(out(9L) == "")
  }

  test("corpus-internal span dedup: first writer keeps, later docs lose exactly the shared windows") {
    import spark.implicits._
    val s13 = (1 to 13).map(i => s"s$i").mkString(" ")   // the shared 13-gram
    val t13 = (1 to 13).map(i => s"t$i").mkString(" ")   // repeated WITHIN one doc only
    val docs = Seq(
      (0L, s"a1 a2 $s13 b1 b2"),                         // owner (min doc_id) of every shared gram
      (1L, s"c1 c2 $s13 d1 d2"),                         // shares exactly the one s-window
      (2L, s"a1 a2 $s13 b1 b2"),                         // exact later copy of doc 0
      (3L, s"$t13 z1 $t13"),                             // internal repeat, no cross-doc sharing
      (4L, "q1 a1 a2 " + (1 to 10).map(i => s"s$i").mkString(" ") + " q2") // 12-token overlap < n
    ).toDF("doc_id", "text")
    val out = SpanDedup.cutDuplicateSpans(spark, docs, n = 13)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // first writer comes back intact (normalized)
    assert(out(0L) == ((s"a1 a2 $s13 b1 b2", 0L)))
    // later doc loses exactly the shared window's 13 tokens, context survives
    assert(out(1L) == (("c1 c2 d1 d2", 1L)))
    // an exact later copy is fully cut: all 5 windows of its 17 tokens hit
    assert(out(2L) == (("", 5L)))
    // a gram repeated inside ONE doc is not cross-doc duplication
    assert(out(3L) == ((s"$t13 z1 $t13", 0L)))
    // runs shorter than n are below the duplication threshold
    assert(out(4L)._2 == 0L)
    assert(out.size == 5)
  }

  test("packing treats NULL text as zero tokens (no encoder crash)") {
    import spark.implicits._
    val docs = Seq((0L, "a b c"), (1L, null.asInstanceOf[String]), (2L, "d e"))
      .toDF("doc_id", "text")
    val byDoc = Packing.pack(spark, docs, budgetTokens = 4L, nGroups = 1)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(byDoc(0L) == ((0L, 3L)))
    assert(byDoc(1L) == ((0L, 0L)))   // NULL ≡ empty: fits anywhere
    assert(byDoc(2L) == ((1L, 2L)))   // 3 + 0 + 2 > 4 → new bin
    assert(byDoc.size == 3)
  }

  test("self-decontamination invariant: every doc with >= n tokens flags against itself") {
    import spark.implicits._
    val out = Decontaminate.contamination(spark, documents, documents, n = 13)
    val withGrams = documents
      .filter(TextAnalysis.tokenCount($"text") >= 13).count()
    assert(out.filter($"contaminated").count() == withGrams)
    // and every contaminated doc's hits == its own gram count (bench is
    // a superset of self, so n_hits >= n_grams is impossible to violate
    // downward only via a hashing/join bug)
    assert(out.filter($"contaminated" && $"n_hits" =!= $"n_grams").count() == 0)
    assert(out.count() == documents.count())
  }

  test("decontamination normalizes case and whitespace before gram matching") {
    import spark.implicits._
    val w = (1 to 13).map(i => s"W$i").mkString("  ")          // mixed case, double spaces
    val train = Seq((0L, w.toLowerCase), (1L, "unrelated words only")).toDF("doc_id", "text")
    val bench = Seq((9L, s"  $w  ")).toDF("doc_id", "text")
    val out = Decontaminate.contamination(spark, train, bench, n = 13)
      .filter($"contaminated").select($"doc_id").as[Long].collect().toSeq
    assert(out == Seq(0L))
  }

  test("decontamination plan: broadcast join, no cartesian, text never shuffles") {
    import spark.implicits._
    val plan = Decontaminate.contamination(spark, documents,
      documents.filter($"doc_id" % 97 === 0)).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("span dedup plan: equi-joins only, doc text never enters an exchange") {
    import spark.implicits._
    val plan = SpanDedup.cutDuplicateSpans(spark, documents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"), plan)
    // the duplicated-gram side is corpus-dependent — unlike decon's
    // MB-scale benchmark side it must NOT be planned broadcast-able by
    // assumption; the shuffles carry (doc_id, pos, gfp) key rows and
    // the text column stays out of every exchange
    for (l <- plan.linesIterator if l.contains("Exchange hashpartitioning"))
      assert(!l.contains("text"), l)
  }

  test("piiStats counts and piiScrub redacts each pattern family") {
    import spark.implicits._
    val df = Seq(
      (0L, "mail me at a.b-c%d@sub.example.co or x@y.io thanks"),
      (1L, "server 192.168.0.1 and 10.0.0.255 up"),
      (2L, "call 555-867-5309 now"),
      (3L, "clean text with no personal data"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val stats = TextAnalysis.piiStats(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(stats(0L) == ((2L, 0L, 0L, true)))
    assert(stats(1L) == ((0L, 2L, 0L, true)))
    assert(stats(2L) == ((0L, 0L, 1L, true)))
    assert(stats(3L) == ((0L, 0L, 0L, false)))
    assert(stats(4L) == ((0L, 0L, 0L, false)))                 // NULL text ≡ clean
    val scrubbed = df.filter($"text".isNotNull)
      .select($"doc_id", TextAnalysis.piiScrub($"text").as("t"))
      .as[(Long, String)].collect().toMap
    assert(scrubbed(0L) == "mail me at <EMAIL> or <EMAIL> thanks")
    assert(scrubbed(1L) == "server <IP> and <IP> up")
    assert(scrubbed(2L) == "call <PHONE> now")
    assert(scrubbed(3L) == "clean text with no personal data")
  }

  test("assembleRoles keeps only selected roles' text in turn order; counts both frames") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val t = Seq(
      ("c1", 2, "assistant", "a-two", "", ts0),
      ("c1", 0, "user", "u-zero", "", ts0),
      ("c1", 1, "tool", "noisy tool dump", "grep", ts0),
      ("c1", 3, "tool", "more noise", "ls", ts0),
      ("c2", 0, "tool", "only tools here", "cat", ts0))
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val out = operators.DocAssembly.assembleRoles(spark, t, Seq("user", "assistant"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out("c1") === (("u-zeroa-two", 4, 2)))
    // a conversation with no kept turns still appears, with empty text
    assert(out("c2") === (("", 1, 0)))
  }

  test("duplicationProfile: df histogram matches hand-computed gram frequencies") {
    import spark.implicits._
    // 4-token docs, n=2 → 3 grams per doc. doc1 and doc2 identical
    // (each gram df=2); doc3 shares doc1's first bigram only (that
    // gram df=3), contributing 2 unique grams of its own.
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c d"),
      (3L, "a b x y")).toDF("doc_id", "text")
    val prof = operators.SpanDedup.duplicationProfile(spark, docs, n = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // grams: "a b"(df3), "b c"(df2), "c d"(df2), "b x"(df1), "x y"(df1)
    assert(prof === Map(3L -> 1L, 2L -> 2L, 1L -> 2L))
  }
}
