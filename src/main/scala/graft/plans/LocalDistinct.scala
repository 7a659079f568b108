package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** `LocalDistinct` — exact DISTINCT with NO exchange, for relations whose
  * duplicate rows are provably co-partitioned.
  *
  * The flagship triple build is the motivating case: every duplicate
  * triple of one document derives from that document's single input row
  * (doc → sentences → mentions → links is a narrow lineage — explode,
  * filter, broadcast join, project never move rows across partitions),
  * and (repo, path, commit) is the document table's primary key, so
  * duplicates of a triple can never sit in two partitions. A global
  * `distinct()` still hash-exchanges the full relation — at the bench's
  * 384× replication that is ~9M × ~90-byte rows through the shuffle for
  * information the lineage already guarantees. This operator dedups each
  * partition with an UnsafeRow hash set (byte-wise equality, rows stay
  * in Tungsten format — no object conversion) and preserves the child's
  * partitioning/ordering.
  *
  * CONTRACT (caller-asserted, not Catalyst-provable — which is exactly
  * why this is a custom operator and not an optimizer rewrite): equal
  * rows never occur in different partitions of the child. Violating it
  * silently keeps cross-partition duplicates; `KgPipeline.triples` only
  * uses it under the documented doc-PK assumption and keeps the global
  * `distinct()` as the `assumeUniqueDocs = false` fallback.
  *
  * MEMORY BOUND — why the no-spill hash set is safe exactly where the
  * contract holds: the contract restricts this operator to relations
  * that were NEVER shuffled (a shuffle would scatter duplicates), so its
  * partitions are scan splits carried through narrow ops — their size is
  * set by `spark.sql.files.maxPartitionBytes`, not by any key's
  * frequency. Key-skew blowup is impossible here because there are no
  * keys; the set holds at most the split's own distinct derived rows
  * (for the triple build, ≲ a few × the split bytes including per-entry
  * overhead — size splits accordingly). Post-shuffle relations, where a
  * hot key CAN concentrate rows, are precisely where the contract
  * already fails and the spill-capable global `distinct()` must be used
  * (`Main.run` on committed snapshots, streaming micro-batches with
  * possible replays).
  */
final case class LocalDistinct(child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  // EVERY child column participates in the dedup key: without this,
  // ColumnPruning sees a node with no expressions and prunes the child
  // down to whatever the PARENT needs (for a bare count, nothing) —
  // silently changing what "distinct" means. Claiming the full child
  // output as references pins the row shape.
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet
  override protected def withNewChildInternal(newChild: LogicalPlan): LocalDistinct =
    copy(child = newChild)
}

final case class LocalDistinctExec(child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def outputOrdering = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions { it =>
      // rows may arrive as non-Unsafe (e.g. from a Generate); project to
      // UnsafeRow once so equality/hashCode are byte-wise
      val toUnsafe = UnsafeProjection.create(child.output, child.output)
      val seen = new java.util.HashSet[UnsafeRow]()
      it.flatMap { row =>
        val u = row match {
          case ur: UnsafeRow => ur
          case other => toUnsafe(other)
        }
        if (seen.contains(u)) None
        else {
          val copy = u.copy()
          seen.add(copy)
          Some(copy)
        }
      }
    }

  override protected def withNewChildInternal(newChild: SparkPlan): LocalDistinctExec =
    copy(child = newChild)
}

object LocalDistinct {

  /** Conf key: when `true`, [[of]] eagerly validates the contract by
    * counting both the LocalDistinct result and the global `distinct()`
    * of the same relation and throwing on mismatch. Runs the child twice —
    * for specs and production smoke runs, not the hot path. A violated
    * co-partitioning contract then fails LOUDLY instead of silently
    * under-deduplicating.
    */
  val verifyConfKey = "spark.graft.localDistinct.verify"

  /** Types whose equality under raw UnsafeRow byte comparison diverges
    * from `distinct()` semantics: Spark normalizes floats before hash
    * aggregation (0.0 == -0.0, all NaN bit patterns equal) and compares
    * maps order-insensitively; this operator's byte-wise dedup does
    * neither. Callers hitting this need the global `distinct()` (or must
    * pre-normalize). Checked recursively through arrays/structs/maps.
    */
  private def unsupportedType(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case FloatType | DoubleType => true
      case _: MapType => true
      case ArrayType(et, _) => unsupportedType(et)
      case StructType(fields) => fields.exists(f => unsupportedType(f.dataType))
      case _ => false
    }
  }

  /** Apply to a DataFrame; registers the strategy in the session once.
    * Rejects float/double/map-bearing schemas (see [[unsupportedType]]);
    * with [[verifyConfKey]] set, eagerly cross-checks against the global
    * distinct and throws on a contract violation.
    */
  def of(df: DataFrame): DataFrame = {
    df.schema.fields.filter(f => unsupportedType(f.dataType)) match {
      case bad if bad.nonEmpty =>
        throw new IllegalArgumentException(
          "LocalDistinct: byte-wise row equality diverges from distinct() " +
            "for float/double (NaN/-0.0 normalization) and map (field " +
            "order) types; offending columns: " +
            bad.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ") +
            ". Use distinct() or project these columns away/normalize first.")
      case _ =>
    }
    val spark = df.sparkSession
    register(spark)
    val out = org.apache.spark.sql.graft.ColumnBridge.dataFrame(spark,
      LocalDistinct(org.apache.spark.sql.graft.ColumnBridge.logicalPlan(df)))
    if (spark.conf.getOption(verifyConfKey).exists(_.toBoolean)) {
      val local = out.count()
      val global = df.distinct().count()
      if (local != global)
        throw new IllegalStateException(
          s"LocalDistinct contract violated: $local locally-distinct rows vs " +
            s"$global globally-distinct — equal rows occur in different " +
            "partitions of the child (was it shuffled?). Use distinct().")
    }
    out
  }

  def register(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[Planner.type]))
      spark.experimental.extraStrategies = cur :+ Planner
  }

  /** The actual strategy (uses planLater for the child). */
  object Planner extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case LocalDistinct(child) => LocalDistinctExec(planLater(child)) :: Nil
      case _ => Nil
    }
  }
}
