package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for P1 cleanup (`sentsplitter.py:10-18`) —
  * the three-pass regexp_replace chain (newline → space, collapse
  * whitespace runs, soft hyphen → space) fused into ONE scan of the string
  * ([[graft.functions.Text.cleanupScalar]], the shared scalar twin).
  *
  * Cleanup touches every byte of the corpus before anything else runs, so
  * at 10^12-file scale the three separate regex scans (plus two intermediate
  * string materializations per row) are pure overhead. `doGenCode` emits a
  * static call, keeping the enclosing projection in whole-stage codegen.
  * Parity with the reference-shaped regex chain is pinned by a randomized
  * spec over the full whitespace alphabet (TextSplitSpec).
  */
case class CleanupText(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    CleanupText.clean(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.CleanupText.clean($c)")

  override protected def withNewChildInternal(newChild: Expression): CleanupText =
    copy(child = newChild)

  override def prettyName: String = "cleanup_text"
}

object CleanupText {

  /** Static entry point shared by interpreted eval and generated code. */
  def clean(text: UTF8String): UTF8String =
    UTF8String.fromString(graft.functions.Text.cleanupScalar(text.toString))

  /** Column form. */
  def cleanup_text(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(CleanupText(ColumnBridge.expression(c)))
  }

  /** Register for SQL use: `SELECT cleanup_text(content) ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cleanup_text", exprs => CleanupText(exprs.head), "built-in")
}
