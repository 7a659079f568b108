package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning
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
  * of its loop via a cloned session. Under an AQE-planned input the
  * metadata degrades to `UnknownPartitioning` rather than failing —
  * correct, just reuse-free, which is fine for staging checkpoints
  * whose layout is about to be replaced anyway.
  *
  * Also returns the persisted RDD handle and (for eager checkpoints)
  * the materialized row count: `Dataset.localCheckpoint` gives callers
  * no way to release a checkpoint, so an N-round iterative loop
  * accumulates N copies of its working set in the block store (the
  * same accumulation measured as a GC explosion in BENCH.md §25).
  * Iterative callers unpersist round k-1's handle once round k is
  * materialized. A lazy checkpoint materializes on the first action
  * that consumes ALL partitions (a `limit(1).count()` qualifies:
  * `LocalLimit` schedules every partition, and persisted partitions
  * unroll fully on first compute); unpersist the PREVIOUS handle only
  * after such an action, since the truncated lineage cannot recompute
  * dropped blocks.
  */
object CheckpointBridge {

  final case class Checkpointed(
      df: DataFrame, rdd: RDD[InternalRow], rows: Option[Long])

  def localCheckpointKeepPartitioning(df: DataFrame, eager: Boolean)
      : Checkpointed = {
    val ds = df.asInstanceOf[classic.Dataset[_]]
    val spark = ds.sparkSession
    val qe = ds.queryExecution
    // toRdd (not executedPlan.execute()) keeps the SQLExecutionRDD
    // wrapper, so tasks that materialize the checkpoint — including the
    // eager count below and any lazy back-fill job — observe the
    // session's SQLConf, matching Dataset.localCheckpoint. Rows are
    // reused mutable buffers; copy before handing them to the block
    // store (same contract as Dataset.localCheckpoint).
    val internal = qe.toRdd.map(_.copy())
    internal.localCheckpoint()
    val rows = if (eager) Some(internal.count()) else None
    // Accessing toRdd above forced planning (and for AQE, the final
    // plan), so the physical plan's metadata is settled; degrade to
    // Unknown rather than propagate a stale/adaptive expression.
    val plan = qe.executedPlan
    val (part, ord) =
      try (plan.outputPartitioning, plan.outputOrdering)
      catch { case scala.util.control.NonFatal(_) =>
        (UnknownPartitioning(0), Nil) }
    val lr = LogicalRDD(
      plan.output, internal, part, ord,
      isStreaming = false, stream = None)(spark, None, None)
    Checkpointed(classic.Dataset.ofRows(spark, lr), internal, rows)
  }
}
