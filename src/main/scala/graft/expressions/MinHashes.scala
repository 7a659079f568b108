package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash kernel: token array → the `Dedup.numHashes` per-function
  * minima (8-hex-char strings) in ONE fused scan.
  *
  * The declarative chain (`Dedup.shingles` → `Dedup.shingleDigests` →
  * 8 × `Dedup.minhashFromDigests`, kept as the parity twin) evaluates
  * through higher-order-function lambdas, which are CodegenFallback: the
  * whole projection drops out of whole-stage codegen AND materializes,
  * per row, the shingle string array, the 64-hex-char digest array, and
  * eight 8-char substring arrays. This kernel digests the shingle bytes
  * directly off the token array (`MessageDigest.update` per token + the
  * joining space — no shingle string, no hex digest string) and keeps the
  * 8 minima as unsigned ints, formatting hex only for the final 8 values.
  * `dedup_minhash` / `dedup_lsh_pairs` / `dedup_overflow` /
  * `dedup_jaccard` / `dedup_clusters` all run it once per document.
  *
  * Semantics twin rules (pinned by a randomized spec vs the HOF chain):
  *  - shingle i = `concat_ws(" ", t_i, ..., t_i+k-1)` — null tokens are
  *    SKIPPED (no doubled separator), exactly Spark's concat_ws;
  *  - hash h of a shingle = hex digits [8h+1, 8h+8] of sha256(shingle) —
  *    lowercase-hex lexicographic min ≡ unsigned numeric min of digest
  *    bytes [4h, 4h+4), which is what the loop compares;
  *  - fewer than `shingleSize` tokens → ALL-NULL minima (the twin's
  *    array_min over an empty array). A NULL token array propagates to a
  *    null ARRAY here, where the twin's `when(size(toks) >= k)` guard
  *    yields the all-null-element array — downstream-identical through
  *    `element_at`/`concat_ws`/`sha2` (both fold to the empty signature
  *    and the sha256("")-suffixed band keys), pinned by the spec's
  *    null-row case.
  */
case class MinHashes(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullSafeEval(input: Any): Any =
    MinHashes.minhashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.MinHashes.minhashes($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashes =
    copy(child = newChild)

  override def prettyName: String = "min_hashes"
}

object MinHashes {

  private val numHashes = graft.operators.Dedup.numHashes

  private def hex8(v: Long): UTF8String = {
    val cs = new Array[Byte](8)
    var i = 0
    while (i < 8) {
      cs(i) = ShingleHashing.hexDigits(((v >>> ((7 - i) * 4)) & 0xF).toInt)
      i += 1
    }
    UTF8String.fromBytes(cs)
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def minhashes(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    // -1 = "no shingle seen"; real values are unsigned 32-bit in [0, 2^32)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, -1L)
    if (n >= ShingleHashing.shingleSize) {
      val bytes = ShingleHashing.tokenBytes(toks)
      val md = ShingleHashing.sha256()
      val dig = new Array[Byte](32)
      var s = 0
      val last = n - ShingleHashing.shingleSize
      while (s <= last) {
        ShingleHashing.digestShingle(bytes, s, md, dig)
        var h = 0
        while (h < numHashes) {
          val o = 4 * h
          val v = ((dig(o) & 0xFFL) << 24) | ((dig(o + 1) & 0xFFL) << 16) |
            ((dig(o + 2) & 0xFFL) << 8) | (dig(o + 3) & 0xFFL)
          if (mins(h) < 0L || v < mins(h)) mins(h) = v
          h += 1
        }
        s += 1
      }
    }
    val res = new Array[Any](numHashes)
    var h = 0
    while (h < numHashes) {
      res(h) = if (mins(h) < 0L) null else hex8(mins(h))
      h += 1
    }
    new GenericArrayData(res)
  }

  /** Column form. */
  def min_hashes(toks: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(MinHashes(ColumnBridge.expression(toks)))
  }
}
