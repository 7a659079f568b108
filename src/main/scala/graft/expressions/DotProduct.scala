package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native ordered-fold dot product of two double-array columns — the ANN
  * hot kernel (`Similarity.dot`). The HOF formulation
  * (`aggregate(zip_with(a, b, *), 0.0, +)`) evaluates interpreted with a
  * per-element lambda dispatch and an intermediate product array; the LSH
  * signature runs it 8-16× per row (one per hyperplane) and IVF 16× (one
  * per centroid).
  *
  * Bit-exactness: the loop performs literally the same IEEE-754 operation
  * sequence as the HOF fold (acc = acc + a(i)*b(i), left to right, acc
  * starting at 0.0) and as the DuckDB twin (`list_reduce(list_transform...)`)
  * — pinned by a randomized spec asserting `==` on the raw doubles vs the
  * HOF chain. Defined for equal-length arrays of non-null elements (the
  * embedding tables' shape); length mismatch folds over the shorter prefix
  * HERE ONLY — the HOF twin null-pads via `zip_with` and the DuckDB twin
  * indexes out of range, so the bit-parity contract covers equal lengths.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // analysis-time typing: arbitrary SQL (int arrays, generic arrays) is
  // cast to array<double> or rejected, instead of mis-reading int-backed
  // ArrayData via getDouble at runtime
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.DotProduct.dot($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {

  /** Static entry point shared by interpreted eval and generated code. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Column form. */
  def dot_product(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
