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
}
