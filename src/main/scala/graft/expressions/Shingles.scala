package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native k-word shingle kernel: token array → the `Dedup.shingleSize`-gram
  * string array, in one codegen-friendly scan.
  *
  * The declarative twin (`Dedup.shingles`: `transform(sequence(...),
  * concat_ws(element_at...))`) is a higher-order function — CodegenFallback,
  * so the n-gram Jaccard verify's shingle-SET sides drop out of whole-stage
  * codegen and pay a lambda dispatch per shingle. This kernel builds the
  * same strings via `UTF8String.concatWs` (byte-level concat, identical
  * null-skip semantics to Spark's concat_ws) in a tight loop.
  *
  * Twin parity (randomized spec): identical element values and order;
  * fewer than k tokens yields the EMPTY array. A null token array returns
  * null here where the twin's `when(size(toks) >= k)` guard folds to the
  * empty array — callers that must preserve the twin's null behaviour
  * guard with `coalesce(..., array())`; the registered queries never see
  * a null token array (split of a non-null text column).
  */
case class Shingles(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Shingles.shingleArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.Shingles.shingleArray($c)")

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)

  override def prettyName: String = "shingle_array"
}

object Shingles {

  private val shingleSize = graft.operators.Dedup.shingleSize

  private val sep = UTF8String.fromString(" ")

  /** Static entry point shared by interpreted eval and generated code. */
  def shingleArray(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < shingleSize) return new GenericArrayData(new Array[Any](0))
    val res = new Array[Any](n - shingleSize + 1)
    val window = new Array[UTF8String](shingleSize)
    var i = 0
    val last = n - shingleSize
    while (i <= last) {
      var j = 0
      while (j < shingleSize) {
        window(j) = toks.getUTF8String(i + j)
        j += 1
      }
      // UTF8String.concatWs skips null inputs — exactly Spark's concat_ws
      res(i) = UTF8String.concatWs(sep, window: _*)
      i += 1
    }
    new GenericArrayData(res)
  }

  /** Column form. */
  def shingle_array(toks: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(Shingles(ColumnBridge.expression(toks)))
  }
}
