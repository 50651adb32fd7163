package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, slot) retirement of materialized operator outputs.
  *
  * Operators that return a localCheckpoint'd frame (CC labels, the
  * suffix-array pass, incremental pair batches) hand the caller blocks
  * the cache manager does not track — without retirement they linger
  * until the GC-async ContextCleaner notices the RDD is unreachable.
  * Each `swap(spark, slot, out)` frees the PREVIOUS output registered
  * under the same (session, slot): at most one live frame per slot per
  * session, one session's swap can never invalidate another session's
  * live result, and a dropped session does not pin its last output
  * (weak keys).
  */
private[operators] object Retire {

  private val lastOut =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, DataFrame]]()

  /** Free a frame's blocks NOW. `Dataset.unpersist` only drops cache-
    * manager entries; a (local)checkpoint'd frame's blocks belong to
    * the underlying RDD behind its LogicalRDD scan. Exception-guarded:
    * a frame from a stopped session must not throw out of free() and
    * abort the CURRENT run. */
  def free(df: DataFrame): Unit = {
    try df.unpersist(false) catch { case _: Throwable => () }
    try df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(false)) catch { case _: Throwable => () }
  }

  /** Register `out` under (spark, slot), freeing the previous holder. */
  def swap(spark: SparkSession, slot: String, out: DataFrame): Unit =
    lastOut.synchronized {
      val slots = Option(lastOut.get(spark)).getOrElse {
        val m = scala.collection.mutable.Map.empty[String, DataFrame]
        lastOut.put(spark, m)
        m
      }
      slots.get(slot).foreach(free)
      slots(slot) = out
    }
}
