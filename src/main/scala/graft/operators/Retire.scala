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
  * session, and one session's swap can never invalidate another
  * session's live result.
  *
  * The map stores only the checkpoint RDDs extracted at registration —
  * NOT the DataFrame. A Dataset strongly references its SparkSession;
  * holding it as a WeakHashMap VALUE would pin its own weak KEY
  * forever (the documented WeakHashMap caveat), so a dropped session
  * could never be collected. RDDs reference only the SparkContext, so
  * weak-key collection actually works and a dropped session does not
  * pin its last outputs.
  */
private[operators] object Retire {

  private val lastOut =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, Seq[org.apache.spark.rdd.RDD[_]]]]()

  /** Free a frame's blocks NOW. `Dataset.unpersist` only drops cache-
    * manager entries; a (local)checkpoint'd frame's blocks belong to
    * the underlying RDD behind its LogicalRDD scan. Exception-guarded:
    * a frame from a stopped session must not throw out of free() and
    * abort the CURRENT run. */
  def free(df: DataFrame): Unit = {
    try df.unpersist(false) catch { case _: Throwable => () }
    freeRdds(blockRdds(df))
  }

  private def blockRdds(df: DataFrame): Seq[org.apache.spark.rdd.RDD[_]] =
    try df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    } catch { case _: Throwable => Nil }

  private def freeRdds(rdds: Seq[org.apache.spark.rdd.RDD[_]]): Unit =
    rdds.foreach { r => try r.unpersist(false) catch { case _: Throwable => () } }

  /** Register `out`'s blocks under (spark, slot), freeing the previous
    * holder's. `out` must be a materialized (checkpointed) frame — its
    * LogicalRDD scan IS the data the slot tracks. */
  def swap(spark: SparkSession, slot: String, out: DataFrame): Unit = {
    val rdds = blockRdds(out)
    lastOut.synchronized {
      val slots = Option(lastOut.get(spark)).getOrElse {
        val m = scala.collection.mutable.Map.empty[String, Seq[org.apache.spark.rdd.RDD[_]]]
        lastOut.put(spark, m)
        m
      }
      slots.get(slot).foreach(freeRdds)
      slots(slot) = rdds
    }
  }
}
