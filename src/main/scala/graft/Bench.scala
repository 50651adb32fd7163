package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main — driver contract: ONE JSON line on stdout,
  * {"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Headline = the full dedup pipeline over the events-derived
  * transcripts at the given SF (the north_rule workload; reported both
  * as seconds and turns/sec), plus representative operator queries.
  * Heavyweight all-pairs queries (token Jaccard at n² candidate scale)
  * are deliberately not in the headline set — they are correctness
  * operators, not the scale path (the LSH detectors are).
  */
object Bench {

  /** The headline query set: name → action to force (count). */
  def headline(s: SparkSession, dir: String): Seq[(String, () => Long)] = {
    import graft.operators._
    import s.implicits._
    val cfg = DedupConfig.default
    def docs() = DocAssembly.assemble(s, SparkEntry.transcriptsView(s, dir))
    Seq(
      "doc_assembly" -> (() => docs().count()),
      "turn_dedup" -> (() =>
        ExactDedup.dedupTurns(s, SparkEntry.transcriptsView(s, dir)).count()),
      "minhash_lsh_pairs" -> (() => MinHashLSH.dupPairs(s, docs(), cfg).count()),
      "simhash_pairs" -> (() => SimHashDetector.dupPairs(s, docs(), cfg).count()),
      "substring_pairs" -> (() => SubstringDetector.dupPairs(s, docs(), cfg).count()),
      "cluster_assign" -> (() => {
        // docs feeds the detectors + the final assignment join: cache
        // it once (parity with runDedupWorkload) or assembly re-executes
        // inside this one query; repartition first — see
        // runDedupWorkload's note on AQE-coalesced cache parallelism.
        // Detection is the FUSED sweep (one tokenization pass, one key
        // exchange for minhash+simhash) — the production clustering path.
        val d = docs().repartition(s.sparkContext.defaultParallelism * 4).cache()
        d.count() // eager: concurrent AQE branches must read cache, not re-assemble
        try {
          val pairs = ExactDedup.docDupPairs(s, d.toDF).as[DupPair]
            .unionByName(FusedDetectors.dupPairs(s, d, cfg))
          Clustering.assign(s, d, pairs, cfg).count()
        } finally d.unpersist(false)
      }),
      "restore" -> (() => {
        val t = SparkEntry.transcriptsView(s, dir)
        val lineage = ExactDedup.dedupTurns(s, t).select($"conv_id", $"turn_idx", $"fp")
        Restore.restore(s, lineage, ExactDedup.uniqueTurns(s, t)).count()
      }),
      "text_quality" -> (() =>
        TextAnalysis.qualityScore(
          s.read.parquet(s"$dir/documents.parquet")).count()),
      "embed_ann_top5" -> (() =>
        EmbeddingSim.rhpBucketTopK(s, s.read.parquet(s"$dir/embeddings.parquet"), k = 5).count()),
      "agg_lineitem" -> (() =>
        s.read.parquet(s"$dir/lineitem.parquet")
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(sum($"l_quantity"), count(lit(1)), countDistinct($"l_partkey")).count()),
      "window_latest_order" -> (() => SparkEntry.queries("q_window_latest_order")(s, dir).count()),
    )
  }

  /** Shuffle + spill on tmpfs when available: a single local disk is
    * not representative of a cluster's per-executor disks and its fs
    * metadata ops serialize under 32 writers. */
  def shuffleDir: String =
    if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark"
    else System.getProperty("java.io.tmpdir")

  /** Fresh-page write throughput (MB/s) where shuffle files land. On a
    * healthy machine this is RAM/disk speed (hundreds of MB/s); on this
    * sandbox's Firecracker VM with virtio-balloon FREE PAGE REPORTING
    * active, every new page is a ~180 µs VMM fault and this measures
    * ~5 MB/s — a serial tax on all shuffle writes that swamps any
    * engine measurement (see BASELINE.md round-3 notes). */
  def pageFaultProbeMbps(dir: String = shuffleDir): Double = {
    val d = new java.io.File(dir); d.mkdirs()
    val f = java.io.File.createTempFile("graft_pf_probe", ".bin", d)
    try {
      val buf = new Array[Byte](1 << 20)
      java.util.Arrays.fill(buf, 0x5a.toByte)
      val mb = 64
      val t0 = System.nanoTime()
      val out = new java.io.FileOutputStream(f)
      try { var i = 0; while (i < mb) { out.write(buf); i += 1 } }
      finally out.close()
      mb / ((System.nanoTime() - t0) / 1e9)
    } finally f.delete()
  }

  /** MACHINE-LEVEL benchmark-environment normalization (disclosed in
    * BASELINE.md + scripts/envprep.sh): stop the guest kernel's free
    * page reporting so freed pages stay faulted. Mutates kernel/device
    * state, so it runs ONLY under an explicit GRAFT_ENV_PREP=1/true
    * opt-in (never inferred from a kernel-name heuristic: other
    * Firecracker guests may genuinely need their balloon, and the
    * unbind oopses this kernel's buggy driver). The sysfs writes run in
    * SACRIFICIAL child processes — the oops kills the writing process,
    * which must not be this JVM. No-op without root. */
  def tryEnvPrep(): Boolean = {
    def sacrificialWrite(path: String, value: String): Unit =
      try {
        val p = new ProcessBuilder("sh", "-c", s"echo $value > $path")
          .redirectErrorStream(true).start()
        p.waitFor(10, java.util.concurrent.TimeUnit.SECONDS)
      } catch { case _: Throwable => () }
    val order = new java.io.File("/sys/module/page_reporting/parameters/page_reporting_order")
    if (!order.exists()) return false
    sacrificialWrite(order.getPath, "10")
    sacrificialWrite("/sys/bus/virtio/drivers/virtio_balloon/unbind", "virtio0")
    true
  }

  /** Process-local pre-fault of the shuffle pool (plain file writes —
    * no kernel state touched, safe to auto-run): with reporting already
    * stopped the pool stays warm; with reporting active it still front-
    * loads the first-touch faults out of the measured passes. */
  def prefaultPool(prefaultGb: Int = 24): Unit = {
    val d = new java.io.File(shuffleDir); d.mkdirs()
    val threads = (1 to 8).map { t =>
      val th = new Thread(() => {
        val f = new java.io.File(d, s"graft_prefault_$t")
        val buf = new Array[Byte](1 << 20)
        java.util.Arrays.fill(buf, 0x5a.toByte)
        val out = new java.io.FileOutputStream(f)
        try { var i = 0; while (i < prefaultGb * 128) { out.write(buf); i += 1 } }
        finally { out.close(); f.delete() }
      })
      th.setDaemon(true); th.start(); th
    }
    threads.foreach(_.join())
  }

  def buildSession(cpus: String): SparkSession = {
    val localDir = shuffleDir
    // "N,C,M" requests a local-cluster master: N REAL executor JVMs of
    // C cores and M MiB each — the faithful emulation of a
    // multi-executor cluster (separate heaps, GCs, shuffle services;
    // no shared-JVM contention). Plain "K" = in-process local[K].
    val isCluster = cpus.contains(",")
    val totalCores =
      if (isCluster) { val a = cpus.split(","); a(0).toInt * a(1).toInt }
      else cpus.toInt
    val builder0 = SparkSession.builder()
      .master(if (isCluster) s"local-cluster[$cpus]" else s"local[$cpus]")
    val builder =
      if (!isCluster) builder0
      else builder0
        .config("spark.executor.memory", s"${cpus.split(",")(2).toInt}m")
        .config("spark.executor.extraClassPath",
          sys.props("java.class.path"))
        .config("spark.executor.extraJavaOptions",
          org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions())
        // all "hosts" are this machine: a 3s locality wait per stage
        // only idles executor cores (standard prod tuning for
        // evenly-sized stages; HDFS-style data locality doesn't exist
        // on parquet-over-local-fs here)
        .config("spark.locality.wait", "0s")
    builder
      .appName("graft-bench")
      // 4× cores: straggler smoothing for skewed stages; AQE coalesces
      // the small ones back
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUFFLE_PARTS", (totalCores * 4).toString))
      // test corpora are tens of MB across ~32 small files — default
      // 128 MB split sizing gives a handful of scan tasks and the fused
      // signature stages inherit that, starving >4-core runs. 8 MB
      // restores full scan parallelism; at real scale files are bigger
      // and this simply yields more, still-well-sized tasks.
      .config("spark.sql.files.maxPartitionBytes", "8388608")
      .config("spark.sql.adaptive.enabled", "true")
      // sort-based shuffle writer ALWAYS: the default bypass-merge
      // writer (numPartitions <= 200) opens one file PER REDUCER PER
      // MAP TASK — at 128 partitions x hundreds of map tasks that is
      // tens of thousands of create/merge/delete syscalls per stage,
      // measured (thread-sampled) as the dominant "CPU" of the fused
      // detector sweep on this VM's slow mmap/file path. The sort
      // writer emits ONE file per map task at any width — also the only
      // writer that survives wide shuffles on a real cluster.
      .config("spark.shuffle.sort.bypassMergeThreshold", "2")
      // reliable-checkpoint files (CC loop truncation) are reclaimed by
      // the ContextCleaner once their RDD is GC'd
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  /** Run the headline set once; returns (name, seconds, rows). */
  def runOnce(spark: SparkSession, sfDir: String): Seq[(String, Double, Long)] =
    headline(spark, sfDir).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = try fn() catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1L }
      (name, (System.nanoTime() - t0) / 1e9, n)
    }

  /** Stage names whose sum defines dedup-pipeline wall time.
    * cluster_assign internally re-runs every detector (each bench query
    * is standalone), so the standalone detector timings are NOT added
    * again here. */
  val DedupStages: Set[String] = Set(
    "doc_assembly", "turn_dedup", "cluster_assign", "restore")

  /** The full dedup workload over an arbitrary transcripts DataFrame,
    * timed as one unit (docs → turn dedup → detectors → clustering →
    * restore). Used by the Scaling harness on the synthetic corpus. */
  def runDedupWorkload(s: SparkSession, transcripts: DataFrame): Double = {
    import graft.operators._
    import s.implicits._
    val cfg = DedupConfig.default
    val t0 = System.nanoTime()
    var tPrev = t0
    def lap(stage: String): Unit = {
      val now = System.nanoTime()
      System.err.println(f"[workload] $stage ${(now - tPrev) / 1e9}%.2fs")
      tPrev = now
    }
    // stage outputs that later stages consume are cached once — the
    // same role the TableStore stage commits play in Pipeline.run —
    // and explicitly unpersisted when done (repeated bench runs must
    // not accumulate stale blocks). The docs cache is REPARTITIONED to
    // cores×4 first: AQE coalesces the assembly shuffle to barely
    // defaultParallelism partitions, and every signature kernel
    // downstream would inherit that wave-quantized parallelism.
    val docs = DocAssembly.assemble(s, transcripts)
      .repartition(s.sparkContext.defaultParallelism * 4).cache()
    docs.count(); lap("doc_assembly")
    val turnMap = ExactDedup.dedupTurns(s, transcripts).cache()
    turnMap.count(); lap("turn_dedup")
    // ALL THREE detectors in one fused sweep (one tokenization pass,
    // one tagged key exchange) — the same pairs-stage shape Pipeline
    // commits; substring edges are produced here but filtered out of
    // whole-doc clustering below (duplication lineage, not whole-doc
    // duplicates — Pipeline's clusters stage does the same).
    val fused = FusedDetectors.dupPairs(s, docs, cfg, withSubstring = true)
    val exact = ExactDedup.docDupPairs(s, docs.toDF).as[DupPair]
    val nPairs = exact.toDF
      .unionByName(fused.toDF)
      .cache()
    nPairs.count(); lap("detectors")
    val wholeDocPairs = nPairs.filter($"detector" =!= "substring").as[DupPair]
    Clustering.assign(s, docs, wholeDocPairs, cfg).count(); lap("clustering")
    nPairs.unpersist(false)
    val lineage = turnMap.select($"conv_id", $"turn_idx", $"fp")
    Restore.restore(s, lineage, ExactDedup.uniqueTurns(s, transcripts)).count(); lap("restore")
    docs.unpersist(false); turnMap.unpersist(false)
    s.sharedState.cacheManager.clearCache()
    (System.nanoTime() - t0) / 1e9
  }

  /** Noise-robust protocol: one FULL warm pass of the whole headline
    * set (JIT + Janino codegen + shuffle-file warmup for every query,
    * not just the first), then `measuredPasses` timed passes; report
    * min per query and every sample. On this shared VM the same plan
    * swings up to 3.6× between windows — a single-shot number is a
    * sample of the host, not the engine. Reference analog: the
    * reference's own evidence is repeated sweep runs
    * (/root/reference/faa.sh:8-15, /root/reference/cs_faa.sh:7-17). */
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val measuredPasses = sys.env.getOrElse("GRAFT_BENCH_PASSES", "3").toInt
    // environment health gate: if fresh pages cost VMM faults (this
    // sandbox's free-page-reporting tax, BASELINE.md round 3), every
    // number below measures the hypervisor, not the engine — the probe
    // pair (before/after) always rides the artifact so it self-documents
    // whether the tax was active. Machine-level prep (sysfs writes)
    // requires an EXPLICIT GRAFT_ENV_PREP=1 or true — strictly parsed;
    // "false"/"0"/typos all DISABLE (a benchmark must never mutate
    // kernel/device state as a side effect of an ambiguous flag). The
    // read-only probe and the file-write pre-fault still auto-run.
    val pfBefore = pageFaultProbeMbps()
    val prepAllowed = sys.env.get("GRAFT_ENV_PREP")
      .exists(v => v == "1" || v == "true")
    val prepped = if (pfBefore < 50.0 && prepAllowed) tryEnvPrep() else false
    if (pfBefore < 50.0) prefaultPool()
    val pfAfter = if (prepped || pfBefore < 50.0) pageFaultProbeMbps() else pfBefore
    System.err.println(
      f"[bench] page-fault probe: ${pfBefore}%.0f MB/s before, ${pfAfter}%.0f after (env_prep=$prepped)")
    val spark = buildSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val nTurns = spark.read.parquet(s"$sfDir/events.parquet").count()

    runOnce(spark, sfDir) // full warm pass, untimed
    // cluster_assign builds FRESH plans every CC iteration (self-joins
    // on new cache scans), so one generic pass under-warms it — its
    // first measured sample historically ran ~1.6× its steady state
    // while every other query was warm after one pass. Warm it once
    // more, alone, so the measured passes start at steady state.
    headline(spark, sfDir).find(_._1 == "cluster_assign").foreach { case (_, fn) =>
      try { fn(); () } catch { case _: Throwable => () }
    }

    val passes = (1 to measuredPasses).map { p =>
      val r = runOnce(spark, sfDir)
      System.err.println(f"[bench] pass $p total ${r.map(_._2).sum}%.1fs")
      r
    }
    val names = passes.head.map(_._1)
    val samples: Map[String, Seq[Double]] = names.map { n =>
      n -> passes.map(_.find(_._1 == n).get._2)
    }.toMap
    val best: Map[String, Double] = samples.map { case (n, xs) => n -> xs.min }
    val qs = names.map(n => "\"" + n + "\":" + f"${best(n)}%.3f")
      .mkString("{", ",", "}")
    val samplesJson = names.map(n =>
      "\"" + n + "\":" + samples(n).map(x => f"$x%.3f").mkString("[", ",", "]"))
      .mkString("{", ",", "}")
    val total = names.map(best).sum
    val dedupSecs = names.filter(DedupStages.contains).map(best).sum
    val tps = if (dedupSecs > 0) nTurns / dedupSecs else 0.0
    val json =
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"samples":$samplesJson,"passes":$measuredPasses,"sf":"$sfDir","turns":$nTurns,"dedup_pipeline_sec":${f"$dedupSecs%.3f"},"dedup_turns_per_sec":${f"$tps%.1f"},"cpus":"$cpus","page_fault_mbps_before":${f"$pfBefore%.1f"},"page_fault_mbps_after":${f"$pfAfter%.1f"},"env_prep":$prepped}"""
    println(json)
    // ALSO a file: sbt prefixes stdout with "[info] ", which breaks any
    // structured parse of the printed line (every round's driver
    // artifact had "parsed": null) — the file is always clean JSON
    val outFile = sys.env.getOrElse("GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
