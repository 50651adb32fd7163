package org.apache.spark.sql

import org.apache.spark.sql.classic.{Dataset => CDataset}
import org.apache.spark.sql.execution.LogicalRDD

/** Lazy logical-plan boundary for iterative DataFrame algorithms.
  *
  * `planBoundary(df)` compiles `df`'s physical plan NOW (one Catalyst
  * analyze/optimize/plan pass over just this step's tree) and returns a
  * new DataFrame whose logical plan is an opaque [[LogicalRDD]] scan of
  * that physical RDD — exactly the boundary `Dataset.checkpoint` builds
  * (same attribute ids, partitioning and ordering are preserved via
  * [[LogicalRDD.fromDataset]]), minus any materialization: NO job runs,
  * NO blocks are persisted, and the RDD keeps its full shuffle lineage,
  * so fault tolerance is unchanged.
  *
  * Why: chaining self-joining iterations as one logical tree multiplies
  * plan size ~8× per iteration (Catalyst plans are trees — each
  * self-join duplicates the subtree), which makes multi-iteration
  * batches driver-bound on analysis (measured in
  * [[graft.DedupConfig.ccCheckpointEvery]]'s notes). A boundary per
  * iteration keeps driver cost linear in iterations while the batch
  * still executes as ONE job: the final action's stages simply include
  * every boundary RDD's shuffle dependencies.
  *
  * Lives in `org.apache.spark.sql` purely to reach the `private[sql]`
  * constructors (same rationale as [[GraftColumnBridge]]); no Spark
  * internals are modified.
  */
object GraftPlanBridge {
  def planBoundary(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[CDataset[Row]]
    val rdd = cdf.queryExecution.toRdd // lazy — compiles the plan, runs nothing
    CDataset.ofRows(cdf.sparkSession,
      LogicalRDD.fromDataset(rdd, cdf, isStreaming = false))
  }
}
