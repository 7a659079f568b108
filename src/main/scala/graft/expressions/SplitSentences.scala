package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for sentence splitting (G1) — the UDF
  * replacement SURVEY.md §4 reserves for when the splitter shows up in the
  * profile (it does: the only non-codegen stage in the headline pipeline).
  *
  * Same semantics as [[graft.operators.Splitter.splitScalar]] (the shared
  * scalar twin is called directly), but as a codegen-capable expression:
  * `doGenCode` emits a static call, so the enclosing projection stays
  * inside whole-stage codegen and rows skip the UDF encoder round-trip.
  */
case class SplitSentences(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SplitSentences.split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.SplitSentences.split($c)")

  override protected def withNewChildInternal(newChild: Expression): SplitSentences =
    copy(child = newChild)

  override def prettyName: String = "split_sentences"
}

object SplitSentences {

  /** Static entry point shared by interpreted eval and generated code. */
  def split(text: UTF8String): ArrayData = {
    val parts = graft.operators.Splitter.splitScalar(text.toString)
    new GenericArrayData(parts.map(UTF8String.fromString).toArray[Any])
  }

  /** Column form. */
  def split_sentences(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(SplitSentences(ColumnBridge.expression(c)))
  }

  /** Register for SQL use: `SELECT split_sentences(content) ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "split_sentences", exprs => SplitSentences(exprs.head), "built-in")
}
