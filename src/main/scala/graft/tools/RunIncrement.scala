package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{DedupConfig, DupPair}
import graft.corpus.CorpusGen
import graft.operators._
import graft.sources.TableStore

/** CLI: incremental ingest end-to-end, with a full-recompute
  * equivalence check and a wall-clock comparison (the reference
  * engine's whole workflow is incremental backup — increments must
  * cost proportional to the BATCH, not the corpus).
  *
  *   sbt "runMain graft.tools.RunIncrement <nConvs> <storeDir> [cpus] [newPct]"
  *
  * What the increment SAVES vs a fresh run: the old corpus' text sweep
  * (tokenize + signature kernels), all old-old candidate verification,
  * and the CC loop beyond the touched components. What it still PAYS:
  * the candidate-key exchange over old + new signature keys — on this
  * synthetic corpus (short docs, key exchange ≫ text sweep) that term
  * dominates, so measured wall is near parity with a full recompute;
  * the saving grows with document length and corpus size, and a
  * deployment removes the stored-key reshuffle entirely by bucketing
  * the signature store on key range (documented in
  * [[graft.operators.IncrementalNearDup]]). The equivalence check
  * (row_diff = 0) is the contract this CLI exists to demonstrate.
  *
  * Phase A (baseline store, only if absent): a deterministic
  * hash-selected (100-newPct)% of conversations runs the batch path;
  * signatures + labels land in TableStore ("sigs", "labels" stages).
  * (The split is by conv_id hash, not by age — the increment is a
  * random slice of the corpus, which exercises representative
  * takeover in both directions.)
  * Phase B (the increment): the remaining newPct% are ingested from
  * the STORED tables only — one text sweep over the new batch, no old
  * text — and the updated signature/label tables are committed back.
  * Phase C (audit): a fresh full recompute over the whole corpus must
  * produce the identical clustering; prints increment vs full wall.
  */
object RunIncrement {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000L
    val storeDir = if (args.length > 1) args(1) else "/tmp/graft_incr_store"
    val cpus = if (args.length > 2) args(2) else sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val newPct = if (args.length > 3) args(3).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-increment")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.shuffle.sort.bypassMergeThreshold", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val cfg = DedupConfig.default
    val store = new TableStore(storeDir)

    val transcripts = CorpusGen.transcripts(spark, n).toDF.cache()
    transcripts.count()
    val docs = DocAssembly.assemble(spark, transcripts).cache()
    docs.count()
    // deterministic split: the "new" batch is the newPct% of convs with
    // the largest hash — a pure function of the data
    val isNew = pmod(hash($"conv_id"), lit(100)) >= lit(100 - newPct)
    val oldDocs = docs.filter(!isNew).cache()
    val newDocs = docs.filter(isNew).cache()

    def fullPairs(d: org.apache.spark.sql.Dataset[graft.Doc]) =
      ExactDedup.docDupPairs(spark, d.toDF).as[DupPair]
        .unionByName(FusedDetectors.dupPairs(spark, d, cfg))

    // ---- phase A: baseline store (resumable — skipped only when BOTH
    // stages committed: a crash between the two must re-enter, and each
    // stage() call is individually idempotent) ----
    if (!store.isCommitted("sigs") || !store.isCommitted("labels")) {
      val tA = System.nanoTime()
      store.stage(spark, "sigs", Seq("signatures")) {
        Map("signatures" -> IncrementalNearDup.signatureTable(spark, oldDocs, cfg))
      }
      val prev = Clustering.assign(spark, oldDocs, fullPairs(oldDocs), cfg).toDF.cache()
      prev.count()
      store.stage(spark, "labels", Seq("labels")) {
        Map("labels" -> prev)
      }
      prev.unpersist()
      println(f"[increment] baseline: convs=${oldDocs.count()} wall=${(System.nanoTime() - tA) / 1e9}%.1fs")
    }

    // ---- phase B: ingest the increment from STORED tables only ----
    val tB = System.nanoTime()
    val stored = store.read(spark, "sigs", "signatures")
    val prevLabels = store.read(spark, "labels", "labels")
    val freshT = IncrementalNearDup.signatureTable(spark, newDocs, cfg).cache()
    freshT.count()
    val incPairs = IncrementalNearDup.newTouchingPairs(spark, stored, freshT, cfg)
    val tsMin = stored.select($"conv_id", $"ts_min")
      .unionByName(freshT.select($"conv_id", $"ts_min"))
    val updated = IncrementalNearDup
      .updateLabels(spark, prevLabels, incPairs, tsMin, cfg).toDF.cache()
    val nUpdated = updated.count()
    // the signature store grows by DELTA — the increment never rewrites
    // the old table (readers union base + deltas)
    store.stage(spark, "sigs_delta", Seq("signatures")) {
      Map("signatures" -> freshT)
    }
    store.stage(spark, "labels2", Seq("labels")) {
      Map("labels" -> updated)
    }
    val incSecs = (System.nanoTime() - tB) / 1e9
    println(f"[increment] ingest: new=${newDocs.count()} pairs=${incPairs.count()} " +
      f"labels=$nUpdated wall=$incSecs%.1fs")

    // ---- phase C: equivalence + speedup vs full recompute ----
    val tC = System.nanoTime()
    val full = Clustering.assign(spark, docs, fullPairs(docs), cfg).toDF.cache()
    val nFull = full.count()
    val fullSecs = (System.nanoTime() - tC) / 1e9
    val diff = updated.exceptAll(full).count() + full.exceptAll(updated).count()
    println(f"[increment] full_recompute: labels=$nFull wall=$fullSecs%.1fs")
    println(f"[increment] equivalence: row_diff=$diff " +
      f"speedup=${fullSecs / incSecs}%.2fx (increment=${newPct}%% of corpus)")
    if (diff != 0) {
      // the ONE documented legitimate divergence: a bucket crossed the
      // star cap between runs, and incremental kept previously verified
      // links a capped fresh run would not regenerate — then incremental
      // clusters are a strict COARSENING of the full run's (higher
      // recall, equal precision). Benign requires ALL of:
      //   (a) no full cluster is split across incremental clusters,
      //   (b) some incremental cluster actually merges >1 full cluster
      //       (pure column divergence with identical partitions is NOT
      //       coarsening — e.g. a representative-rule regression),
      //   (c) every doc OUTSIDE a merged cluster matches the full run
      //       on every column. Anything else is a real mismatch.
      val j = full.select($"conv_id", $"cluster_id".as("fc"),
          $"representative".as("fr"), $"is_representative".as("fir"))
        .join(updated.select($"conv_id", $"cluster_id".as("ic"),
          $"representative".as("ir"), $"is_representative".as("iir")), Seq("conv_id"))
        .cache()
      val splits = j.groupBy($"fc").agg(countDistinct($"ic").as("n"))
        .filter($"n" > 1).count()
      val merged = j.groupBy($"ic").agg(countDistinct($"fc").as("n"))
        .filter($"n" > 1).select($"ic")
      val nMerged = merged.count()
      val cleanDiffs = j.join(merged, Seq("ic"), "left_anti")
        .filter($"fc" =!= $"ic" || $"fr" =!= $"ir" || $"fir" =!= $"iir")
        .count()
      //   (d) WITHIN each merged cluster, the incremental representative
      //       must be one of the merged full clusters' representatives —
      //       a representative-rule regression confined to merged
      //       clusters would otherwise still print 'benign'
      val repDrift = j.join(merged, Seq("ic"))
        .join(j.select($"ic", $"fr".as("ir")).distinct(), Seq("ic", "ir"), "left_anti")
        .count()
      j.unpersist()
      if (splits == 0 && nMerged > 0 && cleanDiffs == 0 && repDrift == 0)
        println("[increment] divergence is the documented overflow-transition " +
          "coarsening (incremental keeps previously verified links) — benign")
      else {
        System.err.println(s"[increment] MISMATCH between incremental and full " +
          s"clustering (splits=$splits merged=$nMerged clean_diffs=$cleanDiffs " +
          s"rep_drift=$repDrift)")
        sys.exit(1)
      }
    }
    spark.stop()
  }
}
