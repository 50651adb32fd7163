package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) vector index and embedding-level semantic dedup
  * over an `(vec_id: long, embedding: array<float>)` corpus.
  *
  * The coarse quantizer is a deterministic k-means fit on a
  * hash-selected driver sample — the standard IVF training shape
  * (FAISS trains its coarse quantizer on a sample too): the model is
  * `nCells × dim` doubles — kilobytes — so fitting it on the driver is
  * not a scale concern; only the single narrow ASSIGNMENT pass touches
  * the corpus, with the centroid matrix broadcast. Everything is a
  * pure function of (corpus, seed): no stored model, no RNG.
  *
  * Two consumers:
  *  - [[ivfTopK]]: ANN top-k — each query probes its `nProbe` nearest
  *    cells, candidates are the (capped) cell members, exact cosine
  *    re-ranks. Complements [[EmbeddingSim.rhpBucketTopK]]: IVF adapts
  *    to the data distribution (cells follow density) where RHP-LSH is
  *    data-oblivious; both share the capped-bucket join + re-rank tail.
  *  - [[semanticDedup]]: SemDeDup-style pruning (Abbas et al. 2023,
  *    arXiv:2303.09540) — within each cell, a vector is dropped when a
  *    LOWER-ID cell-mate has cosine ≥ threshold (deterministic
  *    first-writer-wins, the embedding-space analog of the exact-dedup
  *    T6 rule, /root/reference/src/dedup.c:150-173). Per the paper the
  *    pair test is intra-cell only and reps are not chased
  *    transitively: rep(v) is v's minimum qualifying cell-mate.
  *
  * Scale shape: one TakeOrdered sample (top-N by hash, per-partition
  * then merged — never a full sort), one broadcast, one narrow
  * assignment pass, then the same capped-bucket self-join every other
  * detector uses. No all-pairs anywhere; a mega-cell costs cap² like
  * any other hot bucket.
  */
object IvfIndex {

  /** Deterministic k-means centroids: sample = the `sampleN` corpus
    * vectors minimizing xxhash64(vec_id ^ seed) (a seeded but
    * data-independent choice), init = first `nCells` content-distinct
    * sample vectors, then `iters` Lloyd rounds on the driver sample.
    * Empty cells keep their previous centroid. L2 metric (the IVF
    * convention; identical vectors land in identical cells under any
    * metric, which is what [[semanticDedup]]'s contract needs). */
  def fitCentroids(
      spark: SparkSession,
      corpus: DataFrame,
      nCells: Int,
      seed: Long = 42L,
      sampleN: Int = 4096,
      iters: Int = 8): Array[Array[Double]] = {
    val sample = driverSample(spark, corpus, seed, sampleN)
    require(sample.nonEmpty, "fitCentroids: empty corpus")
    lloyd(sample, nCells, iters)
  }

  /** The `sampleN` corpus vectors minimizing xxhash64(vec_id ^ seed) —
    * a seeded but data-independent choice; TakeOrdered (per-partition
    * top-N then merge), never a full sort. */
  private def driverSample(
      spark: SparkSession, corpus: DataFrame,
      seed: Long, sampleN: Int): Array[Array[Double]] = {
    import spark.implicits._
    corpus
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
      .orderBy(xxhash64($"vec_id", lit(seed)), $"vec_id")
      .limit(sampleN)
      .select($"embedding")
      .as[Seq[Double]]
      .collect()
      .map(_.toArray)
  }

  /** Deterministic Lloyd rounds on a driver sample: init = first `k`
    * content-distinct sample vectors (duplicate contents would yield
    * coincident centroids and dead cells), empty cells keep their
    * previous centroid. */
  private def lloyd(
      sample: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    val init = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val seen = scala.collection.mutable.HashSet.empty[Seq[Double]]
    var i = 0
    while (i < sample.length && init.length < k) {
      val v = sample(i)
      if (seen.add(v.toSeq)) init += v.clone()
      i += 1
    }
    var cents = init.toArray

    var it = 0
    while (it < iters) {
      val kk = cents.length
      val dim = cents(0).length
      val sums = Array.ofDim[Double](kk, dim)
      val counts = new Array[Long](kk)
      var s = 0
      while (s < sample.length) {
        val v = sample(s)
        val c = nearestCell(v, cents)
        var d = 0
        // bound by BOTH widths: mixed-dimension corpora are supported
        // everywhere else (see EmbeddingSim.bucketKeys) and must not
        // crash the fit — a short vector contributes its prefix
        while (d < dim && d < v.length) { sums(c)(d) += v(d); d += 1 }
        counts(c) += 1
        s += 1
      }
      cents = Array.tabulate(kk) { c =>
        if (counts(c) == 0) cents(c)
        else {
          val m = new Array[Double](dim)
          var d = 0
          while (d < dim) { m(d) = sums(c)(d) / counts(c); d += 1 }
          m
        }
      }
      it += 1
    }
    cents
  }

  /** Index of the L2-nearest centroid; ties break to the lowest cell
    * index (scan order), so identical vectors always share a cell. */
  private def nearestCell(v: Array[Double], cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var d2 = 0.0
      var d = 0
      while (d < cent.length && d < v.length) {
        val diff = v(d) - cent(d)
        d2 += diff * diff
        d += 1
      }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }

  /** `nProbe` nearest cell indices, ascending by (distance, cell) —
    * bounded insertion into a fixed top-k (O(C·nProbe), zero
    * allocation beyond the two small result arrays; a full C log C
    * tuple sort per corpus row was the hot-path cost before). Strict
    * `<` keeps the lower cell index on distance ties, matching
    * [[nearestCell]]'s scan-order rule. */
  private def nearestCells(v: Array[Double], cents: Array[Array[Double]], nProbe: Int): Array[Int] = {
    val k = math.min(nProbe, cents.length)
    val bestD = Array.fill(k)(Double.MaxValue)
    val bestC = Array.fill(k)(-1)
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var d2 = 0.0
      var d = 0
      while (d < cent.length && d < v.length) {
        val diff = v(d) - cent(d)
        d2 += diff * diff
        d += 1
      }
      if (d2 < bestD(k - 1)) {
        var i = k - 1
        while (i > 0 && d2 < bestD(i - 1)) {
          bestD(i) = bestD(i - 1); bestC(i) = bestC(i - 1); i -= 1
        }
        bestD(i) = d2; bestC(i) = c
      }
      c += 1
    }
    bestC.filter(_ >= 0)
  }

  /** (cell: long, vec_id: long) assignment — ONE narrow pass with the
    * centroid matrix broadcast; nothing shuffles. */
  def assignCells(
      spark: SparkSession,
      corpus: DataFrame,
      cents: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    corpus.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .mapPartitions { rows =>
        val cs = bc.value
        rows.map { case (id, v) =>
          val vd = new Array[Double](v.length)
          var d = 0
          while (d < v.length) { vd(d) = v(d); d += 1 }
          (nearestCell(vd, cs).toLong, id)
        }
      }
      .toDF("cell", "vec_id")
  }

  /** √N auto cell count (the standard IVF sizing rule: expected cell
    * population = candidates re-ranked per probe = √N), floored at 16,
    * capped at 2^16 — past that a driver-sample fit stops being the
    * right trainer: use the hierarchical quantizer
    * ([[fitCentroidsHier]] / [[ivfTopKHier]]), whose leaf fits run
    * distributed and whose assignment costs S + nCells/S distance
    * evals per row instead of nCells. */
  private def autoCells(nRows: Long, nCells: Int): Int =
    if (nCells > 0) nCells
    else math.min(65536,
      math.max(16, math.ceil(math.sqrt(nRows.toDouble)).toInt))

  /** Row count for cell auto-sizing AND the probe exchange width: exact
    * (one count job, which autoCells always paid) when the cell count
    * is auto-derived; the plan-stats estimate when cells are explicit
    * (sizing the exchange never needs exactness). */
  private def corpusRows(corpus: DataFrame, nCells: Int): Long =
    if (nCells > 0) EmbeddingSim.rowsFromStats(corpus) else corpus.count()

  /** IVF ANN top-k: probe `nProbe` nearest cells per query (every
    * corpus vector is a query), candidates = capped cell members,
    * exact cosine re-rank. Same output schema as
    * [[EmbeddingSim.rhpBucketTopK]]:
    * (query_id, neighbor_id, rank, cos_x10000).
    *
    * nCells ≤ 0 (default) auto-sizes to √N so per-query re-rank work
    * stays Θ(nProbe·√N). ONE keying pass computes centroid distances
    * (rank-0 probe = the vector's own cell = its membership) and lands
    * in ONE hash exchange on `cell` that both consumers — the capped
    * member list and the probe stream — read via ReuseExchange, so the
    * coarse-quantization compute is never repeated. */
  def ivfTopK(
      spark: SparkSession,
      corpus: DataFrame,
      k: Int = 10,
      nCells: Int = 0,
      nProbe: Int = 2,
      seed: Long = 42L,
      cellCap: Int = 4096): DataFrame = {
    val nRows = corpusRows(corpus, nCells)
    val cells = autoCells(nRows, nCells)
    val cents = fitCentroids(spark, corpus, cells, seed,
      sampleN = math.max(4096, 8 * cells))
    val keys = probeKeys(spark, corpus, cents, nProbe, nRows * nProbe)
    val cands = ivfCandidates(spark, keys, cellCap, None)
    EmbeddingSim.rerankTopK(spark, corpus, cands, k)
  }

  /** Shared IVF candidate generation (ivfTopK, pqTopK, ivfTopKHier)
    * over pre-built probe keys ((cell, vec_id, probe_rank) rows,
    * hash-partitioned on `cell` — [[probeKeys]] / [[probeKeysHier]]
    * shape): rank-0 capped cell members (optionally decorated with
    * per-member columns, e.g. PQ codes — joined on the SMALL capped
    * member list, never the candidate stream), self excluded, distinct
    * (query_id, vec_id [, extras]). */
  private def ivfCandidates(
      spark: SparkSession,
      keys: DataFrame,
      cellCap: Int,
      memberExtra: Option[DataFrame]): DataFrame = {
    import spark.implicits._
    val members0 = EmbeddingSim.capSortedByKey(spark,
      keys.filter($"probe_rank" === 0).select($"cell".as("bucket"), $"vec_id"), cellCap)
      .withColumnsRenamed(Map("bucket" -> "cell"))
    val members = memberExtra.fold(members0)(x => members0.join(x, Seq("vec_id")))
    val extraCols = memberExtra.toSeq
      .flatMap(_.columns.filterNot(_ == "vec_id")).map(col)
    keys.select($"cell", $"vec_id".as("query_id"))
      .join(members, Seq("cell"))
      .filter($"query_id" =!= $"vec_id")
      .select(($"query_id" +: $"vec_id" +: extraCols): _*)
      .distinct() // multi-probe may hit the same member through 2 cells
  }

  /** (cell, vec_id, probe_rank 0..nProbe-1) keys, hash-partitioned on
    * `cell` — the single distance pass every IVF consumer shares (both
    * downstream branches need a `cell` shuffle anyway; pinning it here
    * lets ReuseExchange compute the pass once). */
  private def probeKeys(
      spark: SparkSession,
      corpus: DataFrame,
      cents: Array[Array[Double]],
      nProbe: Int,
      keysEstimate: Long = -1L): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cents)
    val parts = PairSweep.sweepParts(spark, keysEstimate)
    corpus.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .mapPartitions { rows =>
        val cs = bc.value
        rows.flatMap { case (id, v) =>
          val vd = new Array[Double](v.length)
          var d = 0
          while (d < v.length) { vd(d) = v(d); d += 1 }
          val near = nearestCells(vd, cs, nProbe)
          Iterator.tabulate(near.length)(r => (near(r).toLong, id, r))
        }
      }
      .toDF("cell", "vec_id", "probe_rank")
      .repartition(parts, $"cell")
  }

  // ------------- hierarchical coarse quantizer (nCells > 2^16) -------------

  /** Two-level coarse quantizer: `superCents(s)` routes to a super-cell,
    * `subCents(s)` holds that super-cell's leaf centroids; leaf cell id
    * = offsets(s) + sub-index (dense, stable under the fit's
    * deterministic ordering). Lifts the flat fit's documented 2^16
    * boundary ([[autoCells]]): the driver never holds more than the
    * super-cell sample — every leaf fit runs ON EXECUTORS — so nCells
    * scales to the √N ≈ 10^6 cells a 10^12-vector corpus wants.
    *
    * `flatten` interops with the flat-model consumers while the full
    * matrix is broadcast-sized; past that, use the two-level paths
    * ([[assignCellsHier]] / [[ivfTopKHier]]), which also cut per-row
    * assignment cost from nCells to S + nCells/S distance evals.
    *
    * Two-level assignment is the standard hierarchical trade-off (the
    * FAISS IMI shape): a vector near a super-cell boundary may land in
    * a non-global-argmin leaf. Determinism is unconditional — both
    * levels tie-break to the lowest index — so identical vectors always
    * share a leaf, which is the contract [[semanticDedup]] and the
    * recall-floor oracles rely on. */
  final case class HierCentroids(
      superCents: Array[Array[Double]],
      subCents: Array[Array[Array[Double]]]) {
    val offsets: Array[Int] = subCents.scanLeft(0)(_ + _.length).init
    def nCells: Int = offsets.last + subCents.last.length
    def flatten: Array[Array[Double]] = subCents.flatten
  }

  /** Fit cost (the boundary this lifts): level 1 is the flat driver fit
    * at S = `superCells`; level 2 routes a deterministic hash-threshold
    * corpus sample to super-cells in ONE narrow pass and runs an
    * independent Lloyd per super-cell inside `mapGroups` — per-task
    * memory is the group's bounded sample (≤ 8·(nCells/S) vectors, kept
    * by a worst-first heap on (xxhash64(vec_id, seed), vec_id) so the
    * retained sample is a pure function of the data, not of iterator
    * order). Only the fitted centroids return to the driver
    * (nCells·dim doubles — the model itself, unavoidable). Super-cells
    * the sample never reaches keep their super-centroid as a single
    * leaf, so routing never drops a region of the space. */
  def fitCentroidsHier(
      spark: SparkSession,
      corpus: DataFrame,
      nCells: Int,
      seed: Long = 42L,
      superCells: Int = 256,
      samplePerCell: Int = 8,
      iters: Int = 8): HierCentroids = {
    import spark.implicits._
    require(nCells >= superCells, s"fitCentroidsHier: nCells $nCells < superCells $superCells")
    val superC = fitCentroids(spark, corpus, superCells, seed,
      sampleN = math.max(4096, 8 * superCells), iters)
    val s = superC.length
    val kSub = (nCells + s - 1) / s
    val groupCap = math.max(64, samplePerCell * kSub)
    // deterministic hash-threshold sample sized to samplePerCell·nCells
    // total vectors (one cheap count; frac = 1 keeps everything)
    val n = math.max(corpus.count(), 1L)
    val permille = math.min(1000L,
      (samplePerCell.toLong * nCells * 1000 + n - 1) / n)
    val bc = spark.sparkContext.broadcast(superC)
    val heapOrd = Ordering.Tuple2(Ordering.Long, Ordering.Long)
    val fitted = corpus
      .select($"vec_id", $"embedding",
        pmod(xxhash64($"vec_id", lit(seed)), lit(1000L)).as("hsel"))
      .filter($"hsel" < permille)
      .select($"vec_id", $"embedding", xxhash64($"vec_id", lit(seed + 1)).as("hord"))
      .as[(Long, Seq[Float], Long)]
      .map { case (id, v, hord) =>
        val vd = new Array[Double](v.length)
        var d = 0
        while (d < v.length) { vd(d) = v(d); d += 1 }
        (nearestCell(vd, bc.value), id, hord, vd)
      }
      .groupByKey(_._1)
      .mapGroups { (sup, it) =>
        // bounded deterministic per-group sample: keep the groupCap rows
        // minimizing (hord, vec_id) — iterator order cannot matter
        val heap = scala.collection.mutable.PriorityQueue
          .empty[(Long, Long)](heapOrd) // worst-first
        val kept = scala.collection.mutable.HashMap.empty[(Long, Long), Array[Double]]
        for ((_, id, hord, vd) <- it) {
          val key = (hord, id)
          if (heap.size < groupCap) { heap.enqueue(key); kept(key) = vd }
          else if (heapOrd.lt(key, heap.head)) {
            kept.remove(heap.dequeue()); heap.enqueue(key); kept(key) = vd
          }
        }
        val sample = kept.toArray.sortBy(_._1)(heapOrd).map(_._2)
        (sup, lloyd(sample, kSub, iters))
      }
      .collect()
      .toMap
    // unreached super-cells keep their super-centroid as one leaf
    HierCentroids(superC,
      Array.tabulate(s)(i => fitted.getOrElse(i, Array(superC(i)))))
  }

  /** Two-level nearest leaf = the rank-0 probe ([[nearestCellsHier]]
    * with nProbe = 1), so cell MEMBERSHIP and PROBING agree by
    * construction even for a vector on a super-cell boundary whose
    * globally nearest leaf lives in its second-nearest super-cell —
    * a greedy commit-to-one-super assignment would put it in a cell
    * its own rank-0 probe never visits. Cost: leaves of the 2 nearest
    * super-cells, still ≪ nCells. */
  private def nearestCellHier(v: Array[Double], m: HierCentroids): Long = {
    val c = nearestCellsHier(v, m, 1)
    // a NaN embedding makes every distance comparison false, so no
    // candidate survives — degrade to cell 0 like the flat nearestCell
    // (probeKeysHier emits no keys for it, so it is never a candidate)
    // instead of crashing the assignment job on one bad row
    if (c.isEmpty) 0L else c(0)
  }

  /** `nProbe` nearest leaves drawn from the TWO nearest super-cells
    * (multi-probe across the super boundary — a vector sitting on a
    * super-cell edge still probes its true neighbors' region), ascending
    * by (distance, leaf id); distance ties go to the LOWER leaf id,
    * regardless of which super-cell it came from. */
  private def nearestCellsHier(
      v: Array[Double], m: HierCentroids, nProbe: Int): Array[Long] = {
    val sups = nearestCells(v, m.superCents, math.min(2, m.superCents.length))
    var total = 0
    for (sup <- sups) total += m.subCents(sup).length
    val k = math.min(nProbe, total)
    val bestD = Array.fill(k)(Double.MaxValue)
    val bestC = Array.fill(k)(-1L)
    // (d2, leaf) strictly better than slot i? — lexicographic, so equal
    // distances keep the lower leaf id whatever the scan order
    def better(d2: Double, leaf: Long, i: Int): Boolean =
      d2 < bestD(i) || (d2 == bestD(i) && (bestC(i) < 0 || leaf < bestC(i)))
    for (sup <- sups) {
      val subs = m.subCents(sup)
      val off = m.offsets(sup)
      var c = 0
      while (c < subs.length) {
        val cent = subs(c)
        var d2 = 0.0
        var d = 0
        while (d < cent.length && d < v.length) {
          val diff = v(d) - cent(d)
          d2 += diff * diff
          d += 1
        }
        val leaf = off + c
        if (better(d2, leaf, k - 1)) {
          var i = k - 1
          while (i > 0 && better(d2, leaf, i - 1)) {
            bestD(i) = bestD(i - 1); bestC(i) = bestC(i - 1); i -= 1
          }
          bestD(i) = d2; bestC(i) = leaf
        }
        c += 1
      }
    }
    bestC.filter(_ >= 0)
  }

  /** (cell: long, vec_id: long) two-level assignment — same narrow
    * one-pass shape as [[assignCells]] with the hierarchical model
    * broadcast. */
  def assignCellsHier(
      spark: SparkSession,
      corpus: DataFrame,
      model: HierCentroids): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    corpus.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .mapPartitions { rows =>
        val m = bc.value
        rows.map { case (id, v) =>
          val vd = new Array[Double](v.length)
          var d = 0
          while (d < v.length) { vd(d) = v(d); d += 1 }
          (nearestCellHier(vd, m), id)
        }
      }
      .toDF("cell", "vec_id")
  }

  /** [[probeKeys]] over the hierarchical model: same
    * (cell, vec_id, probe_rank) schema and pinned `cell` exchange, so
    * [[ivfCandidates]] consumes it unchanged. */
  private def probeKeysHier(
      spark: SparkSession,
      corpus: DataFrame,
      model: HierCentroids,
      nProbe: Int,
      keysEstimate: Long = -1L): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val parts = PairSweep.sweepParts(spark, keysEstimate)
    corpus.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .mapPartitions { rows =>
        val m = bc.value
        rows.flatMap { case (id, v) =>
          val vd = new Array[Double](v.length)
          var d = 0
          while (d < v.length) { vd(d) = v(d); d += 1 }
          val near = nearestCellsHier(vd, m, nProbe)
          Iterator.tabulate(near.length)(r => (near(r), id, r))
        }
      }
      .toDF("cell", "vec_id", "probe_rank")
      .repartition(parts, $"cell")
  }

  /** IVF ANN top-k through the hierarchical quantizer — the nCells >
    * 2^16 path ([[ivfTopK]]'s plan shape otherwise: one keying pass,
    * one pinned `cell` exchange, capped members, exact re-rank).
    * probe_rank 0 is the vector's own leaf under two-level assignment,
    * so membership and probing agree by construction. */
  def ivfTopKHier(
      spark: SparkSession,
      corpus: DataFrame,
      k: Int = 10,
      nCells: Int = 0,
      nProbe: Int = 2,
      seed: Long = 42L,
      cellCap: Int = 4096,
      superCells: Int = 256): DataFrame = {
    // NO 2^16 clamp here (unlike the flat autoCells): the flat cap
    // exists because that fit is driver-resident; the hierarchical fit
    // runs on executors, so the auto size follows √N all the way up —
    // the whole point of this path
    val nRows = corpusRows(corpus, nCells)
    val cells = math.max(
      if (nCells > 0) nCells
      else math.max(16, math.ceil(math.sqrt(nRows.toDouble)).toInt),
      superCells)
    val model = fitCentroidsHier(spark, corpus, cells, seed, superCells)
    val keys = probeKeysHier(spark, corpus, model, nProbe, nRows * nProbe)
    val cands = ivfCandidates(spark, keys, cellCap, None)
    EmbeddingSim.rerankTopK(spark, corpus, cands, k)
  }

  /** SemDeDup-style semantic dedup: drop a vector when a lower-id
    * member of its OWN cell is cosine-≥-threshold close. Output one
    * row per corpus vector: (vec_id, rep_id, is_kept) where rep_id is
    * the minimum qualifying lower-id cell-mate (itself when kept).
    *
    * Skew: only the MEMBER ('b') side of the intra-cell join is capped
    * — every vector still probes its cell as a query, so a mega-cell
    * (10k near-identical spam embeddings — the exact workload this
    * operator targets) costs |cell|·cap compares, never |cell|², and
    * every capped-out duplicate still finds a lower-id member (the cap
    * keeps the cell's LOWEST vec_ids, which are exactly the candidates
    * the lower-id-wins rule needs). Residual cap loss is only a dup
    * group none of whose members made the cap AND whose cell holds >
    * cellCap lower-id non-duplicates — log the cap if tightening it.
    * The keep rule is a single partial-aggregating groupBy(vec_id) —
    * no CC loop needed because the paper's rule is per-pair, not
    * transitive. */
  def semanticDedup(
      spark: SparkSession,
      corpus: DataFrame,
      threshold: Double = 0.95,
      nCells: Int = 0,
      seed: Long = 42L,
      cellCap: Int = 4096): DataFrame = {
    import spark.implicits._
    val nRows = corpusRows(corpus, nCells)
    val cells = autoCells(nRows, nCells)
    val cents = fitCentroids(spark, corpus, cells, seed,
      sampleN = math.max(4096, 8 * cells))
    val keys = probeKeys(spark, corpus, cents, 1, nRows)
    val members = EmbeddingSim.capSortedByKey(spark,
      keys.select($"cell".as("bucket"), $"vec_id"), cellCap)
      .withColumnsRenamed(Map("bucket" -> "cell"))
    val embD = corpus.select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
    val thrX = (threshold * 10000).toLong
    val reps = keys.as("a")
      .join(members.as("b"), $"a.cell" === $"b.cell" && $"b.vec_id" < $"a.vec_id")
      .select($"a.vec_id".as("vec_id"), $"b.vec_id".as("cand_rep"))
      .join(embD, Seq("vec_id"))
      .join(embD.withColumnsRenamed(Map("vec_id" -> "cand_rep", "embedding" -> "r_emb")),
        Seq("cand_rep"))
      .filter(floor(EmbeddingSim.cosineCol($"embedding", $"r_emb") * 10000)
        .cast("bigint") >= thrX)
      .groupBy($"vec_id")
      .agg(min($"cand_rep").as("dup_of"))
    corpus.select($"vec_id")
      .join(reps, Seq("vec_id"), "left")
      .select($"vec_id",
        coalesce($"dup_of", $"vec_id").as("rep_id"),
        $"dup_of".isNull.as("is_kept"))
  }

  // ------------- product quantization (IVFADC + re-rank) -------------

  /** PQ codebooks: `m` independent per-subspace Lloyd quantizers
    * (Jégou/Douze/Schmid 2011, "Product Quantization for Nearest
    * Neighbor Search" — the IVFADC family). `codebooks(s)(code)` is a
    * dsub-dim sub-centroid with dsub = ceil(dim/m); the last subspace
    * covers the remainder, and short vectors contribute zero-padded
    * prefixes (the mixed-dim convention the rest of the file uses).
    * Fit on the same hash-selected driver sample as the coarse
    * quantizer — the model is m·ksub·dsub doubles (≈128 KB at m=8,
    * ksub=256, d=64), broadcast-sized by construction. */
  def fitPqCodebooks(
      spark: SparkSession,
      corpus: DataFrame,
      m: Int,
      ksub: Int = 256,
      seed: Long = 42L,
      sampleN: Int = 4096,
      iters: Int = 8): Array[Array[Array[Double]]] = {
    val sample = driverSample(spark, corpus, seed, sampleN)
    fitPqFromSample(sample, m, ksub, iters)
  }

  /** [[fitPqCodebooks]] body over an already-collected sample — lets
    * [[pqTopK]] fit coarse + PQ quantizers from ONE corpus sample pass
    * (both samples order by the identical hash, so a prefix slice of
    * the coarse sample IS the PQ sample). */
  private def fitPqFromSample(
      sample: Array[Array[Double]], m: Int, ksub: Int,
      iters: Int): Array[Array[Array[Double]]] = {
    require(m >= 1 && ksub >= 1 && ksub <= 256, "fitPqCodebooks: need 1 <= ksub <= 256 (codes are byte-packed)")
    require(sample.nonEmpty, "fitPqCodebooks: empty corpus")
    val dim = sample.iterator.map(_.length).max
    val dsub = (dim + m - 1) / m
    Array.tabulate(m) { s =>
      val lo = s * dsub
      val hi = math.min(lo + dsub, dim)
      val sub = sample.map { v =>
        Array.tabulate(math.max(hi - lo, 1))(d =>
          if (lo + d < v.length && lo + d < hi) v(lo + d) else 0.0)
      }
      lloyd(sub, ksub, iters)
    }
  }

  /** PQ code of one vector: per-subspace L2-argmin sub-centroid, ties
    * to the lowest code (identical vectors ⇒ identical codes — the
    * recall-floor contract). One byte per subspace. */
  private def pqEncodeVec(
      v: Array[Double], books: Array[Array[Array[Double]]], dsub: Int): Array[Byte] = {
    val m = books.length
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val book = books(s)
      val lo = s * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d2 = 0.0
        var d = 0
        while (d < cent.length) {
          val x = if (lo + d < v.length) v(lo + d) else 0.0
          val diff = x - cent(d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  /** IVF-PQ ANN top-k (IVFADC + exact re-rank): coarse-probe `nProbe`
    * cells per query, score candidates by ASYMMETRIC-distance (query
    * sub-vector → candidate's sub-centroid, via the candidate's m-byte
    * PQ code), keep the `rerank` best per query, exact-cosine re-rank
    * those to top-k. Output schema matches [[ivfTopK]] /
    * [[EmbeddingSim.rhpBucketTopK]].
    *
    * Why this exists at 100 TB: [[ivfTopK]]'s candidate join ships the
    * full embedding of every cell member to every probing query —
    * d·4 B each (256 B at d=64). Here the member side carries m BYTES
    * (32× smaller at m=8), the ADC pass needs only those codes plus
    * ONE copy of each query's embedding, and the full-width vectors are
    * fetched just for the `rerank` survivors — the standard IVFADC
    * memory/bandwidth story, which is exactly what binds when the
    * vector table no longer fits executor RAM.
    *
    * Plan shape: the candidate stream is repartitioned on query_id and
    * sorted within partitions, then ONE streaming pass scores each
    * query group — the per-query subspace distance table (m·ksub
    * entries) fills LAZILY (only codes actually seen pay the fill), so
    * small groups cost ~m adds/candidate and big groups amortize to
    * table lookups. Bounded top-`rerank` heap per group; tie-break on
    * (adc, vec_id) so identical-code candidates keep the LOWEST ids —
    * aligned with the brute-force truth's own tie order (recall-audit
    * contract at noise = 0).
    *
    * Recall floor (what the planted oracle pins): an identical twin
    * shares the query's argmin cell AND argmin codes, so its ADC
    * distance is the global minimum over all code vectors — it cannot
    * be displaced except by equal-code ties, which the vec_id
    * tie-break admits before any farther candidate. */
  def pqTopK(
      spark: SparkSession,
      corpus: DataFrame,
      k: Int = 10,
      m: Int = 8,
      ksub: Int = 256,
      nCells: Int = 0,
      nProbe: Int = 2,
      seed: Long = 42L,
      cellCap: Int = 4096,
      rerank: Int = 64): DataFrame = {
    import spark.implicits._
    require(rerank >= k, "pqTopK: rerank must be >= k")
    val nRows = corpusRows(corpus, nCells)
    val cells = autoCells(nRows, nCells)
    // ONE corpus sample pass trains both quantizers (coarse on the full
    // sample, PQ on its 4096-prefix — identical to fitPqCodebooks'
    // default, since both samples order by the same hash)
    val sample = driverSample(spark, corpus, seed, math.max(4096, 8 * cells))
    require(sample.nonEmpty, "pqTopK: empty corpus")
    val cents = lloyd(sample, cells, iters = 8)
    val books = fitPqFromSample(sample.take(4096), m, ksub, iters = 8)
    val bcBooks = spark.sparkContext.broadcast(books)

    // narrow encode pass: (vec_id, m-byte code) — the only per-vector
    // state the candidate side ever ships
    val codes = corpus.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .mapPartitions { rows =>
        val bk = bcBooks.value
        val ds = bk(0)(0).length // subspace 0 is always full-width
        rows.map { case (id, v) =>
          val vd = new Array[Double](v.length)
          var d = 0
          while (d < v.length) { vd(d) = v(d); d += 1 }
          (id, pqEncodeVec(vd, bk, ds))
        }
      }
      .toDF("vec_id", "codes")

    val qEmb = corpus.select($"vec_id".as("query_id"),
      $"embedding".cast("array<double>").as("q_emb"))
    val parts = PairSweep.sweepParts(spark, nRows)
    val cands = ivfCandidates(spark, probeKeys(spark, corpus, cents, nProbe, nRows * nProbe),
      cellCap, Some(codes))

    // join the query embedding AFTER the candidate exchange, with both
    // sides co-partitioned on query_id: the per-candidate shuffle ships
    // (query_id, vec_id, m-byte code) only, and each query's d-float
    // embedding crosses the wire ONCE (the qEmb side) — the IVFADC
    // bandwidth story this operator exists for. The group scorer needs
    // contiguous query groups, which the query_id sort provides (vec_id
    // order within a group is irrelevant — the heap tie-breaks).
    val adcTop = cands
      .repartition(parts, $"query_id")
      .join(qEmb.repartition(parts, $"query_id"), Seq("query_id"))
      .sortWithinPartitions($"query_id")
      .as[(Long, Long, Array[Byte], Seq[Double])]
      .mapPartitions { it =>
        val bk = bcBooks.value
        val mm = bk.length
        val ds = bk(0)(0).length // subspace 0 is always full-width
        val buf = it.buffered
        new Iterator[(Long, Long)] {
          private var pending: Iterator[(Long, Long)] = Iterator.empty
          def hasNext: Boolean = {
            while (!pending.hasNext && buf.hasNext) pending = group()
            pending.hasNext
          }
          def next(): (Long, Long) = pending.next()
          private def group(): Iterator[(Long, Long)] = {
            val qid = buf.head._1
            val qv = buf.head._4.toArray
            // lazy ADC table: tbl(s)(c) = ||q_sub(s) - book(s)(c)||²,
            // filled on first reference (d2 >= 0, so -1 is a safe hole)
            val tbl = Array.tabulate(mm)(s => Array.fill(bk(s).length)(-1.0))
            // bounded worst-first heap of (adc, vec_id), size <= rerank
            val heap = scala.collection.mutable.PriorityQueue
              .empty[(Double, Long)](Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
            while (buf.hasNext && buf.head._1 == qid) {
              val (_, vid, code, _) = buf.next()
              var adc = 0.0
              var s = 0
              while (s < mm) {
                val c = code(s) & 0xFF
                var e = tbl(s)(c)
                if (e < 0) {
                  val cent = bk(s)(c)
                  val lo = s * ds
                  var d2 = 0.0
                  var d = 0
                  while (d < cent.length) {
                    val x = if (lo + d < qv.length) qv(lo + d) else 0.0
                    val diff = x - cent(d)
                    d2 += diff * diff
                    d += 1
                  }
                  tbl(s)(c) = d2
                  e = d2
                }
                adc += e
                s += 1
              }
              if (heap.size < rerank) heap.enqueue((adc, vid))
              else if (Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)
                  .lt((adc, vid), heap.head)) {
                heap.dequeue(); heap.enqueue((adc, vid))
              }
            }
            heap.iterator.map(t => (qid, t._2)).toArray.iterator
          }
        }
      }
      .toDF("query_id", "vec_id")
    EmbeddingSim.rerankTopK(spark, corpus, adcTop, k)
  }
}
