package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus subsetting for training-data pipelines.
  *
  * `TABLESAMPLE`/`df.sample` draw from a per-partition RNG: the subset
  * changes with partitioning, engine and run — useless for reproducible
  * dataset releases or cross-engine verification. This sampler keys the
  * keep-decision on a pure function of each row's id, so the same input
  * yields the same subset in any engine (the DuckDB oracle re-derives
  * it exactly), any partitioning, any run.
  *
  * Scale: a narrow per-row predicate — no shuffle, no state; Catalyst
  * pushes it into the scan, so at 100 TB the sample costs one read of
  * the id/strata columns.
  *
  * Reference analog: the reference subsets work deterministically by
  * chunk-count prefix per trace (/root/reference/src/optsmr.c:253-283,
  * config lines `<trace> <chunk_count>`); this is the per-stratum
  * generalization.
  */
object Sampling {

  /** Keep rows whose `pmod(idCol, 1000)` falls under their stratum's
    * permille quota: per-stratum reproducible downsampling (e.g.
    * rebalancing languages in a training mix).
    *
    * @param permille        keep-rate per stratum value, in 1/1000ths
    * @param defaultPermille keep-rate for strata not listed
    */
  def stratified(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      permille: Map[String, Int],
      defaultPermille: Int): DataFrame = {
    require((permille.values ++ Seq(defaultPermille)).forall(p => p >= 0 && p <= 1000),
      "permille rates must be in [0, 1000]")
    val quota: Column = permille.foldLeft(lit(defaultPermille)) {
      case (acc, (stratum, p)) => when(col(strataCol) === stratum, lit(p)).otherwise(acc)
    }
    df.filter(pmod(col(idCol), lit(1000)) < quota)
  }

  /** Temperature-based mixture rebalancing at T = 2 (α = 1/2): the
    * standard multilingual-corpus upsampling rule (sample stratum s
    * with probability ∝ n_s^α), expressed as a deterministic per-item
    * keep rate so the subset is reproducible and oracle-verifiable.
    *
    * Per-item keep rate for stratum s:
    * {{{ rate_s ‰ = floor(basePermille × sqrt(n_min / n_s)) }}}
    * — the smallest stratum keeps `basePermille`‰ of its rows, a
    * stratum 100× larger keeps 10× the rows (not 100×), flattening the
    * mix exactly as n^(1/2) prescribes. α is fixed at 1/2 because
    * sqrt and division are IEEE-754 correctly-rounded in every engine
    * — the rate, and hence the subset, is bit-reproducible across
    * engines; a general n^(α−1) via pow() is not (libm vs JVM pow may
    * differ in the last ulp and flip a floor()).
    *
    * Scale: one partial-agg count per stratum (the stratum key space —
    * languages, sources — is driver-sized, the same contract as
    * [[TopFraction]]'s histogram), then the rates become a LITERAL
    * when-chain so the returned frame is a pure scan + narrow filter —
    * no join, no second shuffle, text untouched. Rows with a NULL
    * stratum are dropped (rate 0).
    */
  def temperatureT2(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      basePermille: Int): DataFrame = {
    require(basePermille >= 1 && basePermille <= 1000,
      "basePermille must be in [1, 1000]")
    // driver-sized: one row per stratum
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n_s"))
      .collect().flatMap(r => Option(r.get(0)).map(_ -> r.getLong(1)))
    if (counts.isEmpty) return df.filter(lit(false))
    val nMin = counts.map(_._2).min.toDouble
    // floor(base · sqrt(n_min / n_s)): division, sqrt and multiply are
    // all IEEE correctly-rounded — bit-identical in any engine
    val rate: Column = counts.foldLeft(lit(0L): Column) { case (acc, (stratum, nS)) =>
      when(col(strataCol) === lit(stratum),
        lit(math.floor(basePermille * math.sqrt(nMin / nS)).toLong)).otherwise(acc)
    }
    df.filter(pmod(col(idCol), lit(1000)) < rate)
  }
}
