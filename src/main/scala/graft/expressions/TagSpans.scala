package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `tag_spans(text)` — span-true tagging ([[LiteralScanner.scanSpans]]) as
  * a codegen-capable Catalyst expression: the G4 span path's hot kernel.
  *
  * Replaces the `tagWithSpansUdf` Scala-UDF formulation in the `g4_spans`
  * query plan; the UDF stays as the parity twin (same `Matcher.find`
  * semantics via [[graft.operators.Tagger.tagScalar]], randomized
  * row+span+order equality spec in TaggerMiddlewareSpec). A UDF here pays
  * encoder round-trips (UTF8String -> String -> Seq[Entity] -> re-encoded
  * rows via the wrapped ScalaUDF) and blocks whole-stage fusion with the
  * surrounding cleanup/explode projection; the expression emits
  * InternalRow structs directly inside the codegen'd stage — the same
  * UDF-to-kernel move every other hot scalar in this package made.
  *
  * Output element order is the [[graft.model.Entity]] field order
  * (text, label, confidence, begin, end) so downstream `e.field` access is
  * drop-in identical to the UDF's schema. begin/end are Java UTF-16
  * code-unit offsets — `Matcher.start/end` units, what the UDF emitted.
  */
case class TagSpans(child: Expression, scanner: LiteralScanner)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("label", StringType, nullable = false),
    StructField("confidence", DoubleType, nullable = false),
    StructField("begin", IntegerType, nullable = false),
    StructField("end", IntegerType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    scanner.scanSpans(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scanner", scanner,
      classOf[LiteralScanner].getName)
    defineCodeGen(ctx, ev, c => s"$ref.scanSpans($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): TagSpans =
    copy(child = newChild)

  override def prettyName: String = "tag_spans"
}

object TagSpans {
  /** Column form. */
  def tag_spans(c: Column, scanner: LiteralScanner): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(TagSpans(ColumnBridge.expression(c), scanner))
  }
}
