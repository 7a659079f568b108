package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.LogicalRDD

/** Local checkpoint that KEEPS partitioning metadata — the piece
  * `Dataset.localCheckpoint` drops in Spark 4.1.2.
  *
  * Measured on this build (spark-shell probe, see BENCH.md §29):
  * `df.repartition(8, col("id")).localCheckpoint(true)` yields a
  * `LogicalRDD` whose `output` is a FRESH attribute (`id#1L`) while its
  * stored `outputPartitioning` still references the pre-checkpoint
  * attribute (`hashpartitioning(id#0L, 8)`); under AQE it is
  * `UnknownPartitioning(0)` outright. Either way `EnsureRequirements`
  * can never match the stale expression against the new output, so every
  * join/aggregate downstream of a checkpoint re-shuffles — silently, at
  * full relation size. For an iterative operator that checkpoints per
  * round (connected components), that turns "pre-partition the edges
  * once" into "shuffle the edges every round".
  *
  * This bridge rebuilds what the checkpoint should have produced: the
  * `LogicalRDD` is constructed with the PHYSICAL plan's own output
  * attributes, so its `outputPartitioning`/`outputOrdering` (taken from
  * the same plan) reference exactly the attributes the node emits, and
  * downstream `EnsureRequirements` can elide exchanges and sorts.
  * Callers must run with AQE disabled for the reuse to materialize
  * (`AdaptiveSparkPlanExec` re-plans around leaf partitioning);
  * [[graft.operators.ConnectedComponents.run]] pins that for the scope
  * of its loop.
  *
  * Also returns the persisted RDD handle: `Dataset.localCheckpoint`
  * gives callers no way to release a checkpoint, so an N-round iterative
  * loop accumulates N copies of its working set in the block store (the
  * same accumulation measured as a GC explosion in BENCH.md §25).
  * Iterative callers unpersist round k-1's handle once round k is
  * materialized. A lazy checkpoint materializes on the first action that
  * consumes ALL partitions (a `limit(1).count()` qualifies: `LocalLimit`
  * schedules every partition, and persisted partitions unroll fully on
  * first compute); unpersist the PREVIOUS handle only after such an
  * action, since the truncated lineage cannot recompute dropped blocks.
  */
object CheckpointBridge {

  def localCheckpointKeepPartitioning(df: DataFrame, eager: Boolean)
      : (DataFrame, RDD[InternalRow]) = {
    val ds = df.asInstanceOf[classic.Dataset[_]]
    val spark = ds.sparkSession
    val plan = ds.queryExecution.executedPlan
    // Rows are reused mutable buffers; copy before handing them to the
    // block store (same contract as Dataset.localCheckpoint).
    val internal = plan.execute().map(_.copy())
    internal.localCheckpoint()
    if (eager) internal.count()
    val lr = LogicalRDD(
      plan.output, internal, plan.outputPartitioning, plan.outputOrdering,
      isStreaming = false, stream = None)(spark, None, None)
    (classic.Dataset.ofRows(spark, lr), internal)
  }
}
