package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the G3 greedy re-chunker — same scalar
  * twin as [[graft.operators.Chunker.chunkScalar]] (quirks included), as a
  * codegen-capable expression so the nosplit path keeps whole-stage fusion
  * instead of paying the UDF encoder round-trip (the same trade measured
  * ~2× end-to-end for [[SplitSentences]]).
  *
  * `chunk_sentences(sentences: array<string>, maxNoSplit: int)`.
  */
case class ChunkSentences(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), IntegerType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(sentences: Any, maxNoSplit: Any): Any =
    ChunkSentences.chunk(sentences.asInstanceOf[ArrayData],
      maxNoSplit.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, m) => s"graft.expressions.ChunkSentences.chunk($s, $m)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ChunkSentences =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "chunk_sentences"
}

object ChunkSentences {

  /** Static entry point shared by interpreted eval and generated code. */
  def chunk(sentences: ArrayData, maxNoSplit: Int): ArrayData = {
    val n = sentences.numElements()
    val in = (0 until n).map(i => sentences.getUTF8String(i).toString)
    val parts = graft.operators.Chunker.chunkScalar(in, maxNoSplit)
    new GenericArrayData(parts.map(UTF8String.fromString).toArray[Any])
  }

  /** Column form. */
  def chunk_sentences(sentences: Column, maxNoSplit: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(ChunkSentences(
      ColumnBridge.expression(sentences), ColumnBridge.expression(maxNoSplit)))
  }
}
