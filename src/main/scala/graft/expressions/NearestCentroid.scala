package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Nearest-centroid assignment for the IVF index build
  * (`Similarity.trainCentroids`): argmax over inner-product scores against
  * a centroid matrix carried as a PER-INSTANCE reference object — plan
  * size and depth are O(1) in nlist (the round-3 review flagged the former
  * reduce-chained `when` comparison, whose nlist-deep tree hits janino
  * limits around nlist ≈ 4096), and unlike a higher-order-function fold
  * (`zip_with`+`aggregate` — CodegenFallback expressions) this kernel
  * stays inside whole-stage codegen.
  *
  * Bit-exactness contract (the `ann_ivf_trained` DuckDB gate replays the
  * whole training): each score is the ordered-fold dot product
  * ([[DotProduct.dot]]'s exact IEEE sequence), and ties keep the EARLIER
  * cell (strict `>` replaces) — first-max-wins, i.e. max score / min cell,
  * matching the HOF parity twin (`Similarity.assignCellHof`) and the
  * oracle's `ORDER BY s DESC, cell` ranking. Pinned by a randomized spec.
  *
  * Prefix-fold contract (same as [[DotProduct]]): each score folds over
  * `min(embedding length, centroid length)` elements — an embedding whose
  * dimension disagrees with the centroids' yields the prefix-truncated
  * score, not an error. NOTE the twins do NOT share this contract:
  * Spark's `zip_with` pads the shorter array with nulls (null-poisoning
  * the HOF score to NULL) and the DuckDB replay indexes a fixed `1..d`
  * range (out-of-range `e[i]` is NULL there too), so bit-parity is
  * guaranteed ONLY for embeddings of exactly the centroid dimension —
  * which every shipped query satisfies (the synthesized embedding column
  * is fixed-width). Callers feeding mixed-dimension data must validate
  * `size(embedding)` upstream, as `Similarity.trainCentroids`' docs note.
  */
case class NearestCentroid(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = IntegerType

  override def nullSafeEval(e: Any): Any =
    NearestCentroid.assign(e.asInstanceOf[ArrayData], cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", cents, "double[][]")
    defineCodeGen(ctx, ev,
      e => s"graft.expressions.NearestCentroid.assign($e, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroid"
}

object NearestCentroid {

  /** Static entry point shared by interpreted eval and generated code.
    * First-max-wins over ordered-fold dots; empty matrix yields -1.
    * The replacement test is SPARK's `>` ordering, not raw Java `>`:
    * Spark SQL (and DuckDB) treat NaN as greater than every other value
    * and equal to itself, while Java's `>` is false for any NaN operand —
    * without the explicit NaN arm, a NaN score (possible from non-finite
    * embedding values) would silently keep the earlier cell here while
    * the HOF parity twin and the DuckDB replay pick the NaN cell.
    * (±0.0 needs no special arm: Java `>` already agrees with Spark's
    * "equal" verdict for 0.0 vs -0.0.)
    */
  def assign(e: ArrayData, cents: Array[Array[Double]]): Int = {
    var best = -1
    var bs = Double.NegativeInfinity
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      val n = math.min(e.numElements(), c.length)
      var s = 0.0
      var j = 0
      while (j < n) {
        s += e.getDouble(j) * c(j)
        j += 1
      }
      if (i == 0 || s > bs ||
          (java.lang.Double.isNaN(s) && !java.lang.Double.isNaN(bs))) {
        bs = s; best = i
      }
      i += 1
    }
    best
  }

  /** Column form. */
  def of(e: Column, cents: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(e), cents))
  }
}
