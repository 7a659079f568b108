package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native document-fingerprint kernel: token array → the minimum sha256
  * (full 64-hex digest) over the document's k-word shingles, fused into
  * one scan — the [[graft.operators.TextAnalysis.fingerprint]] hot path.
  *
  * The declarative twin (`array_min(transform(Dedup.shingles(toks),
  * sha2))`, kept as `TextAnalysis.fingerprintHof`) pays two interpreted
  * HOF passes and materializes the shingle and digest arrays per row.
  * This kernel shares [[MinHashes]]'s digest loop shape but keeps ONE
  * running 32-byte minimum: lowercase-hex lexicographic min over 64
  * chars ≡ byte-wise unsigned min over the raw digests, hex-formatted
  * once at the end.
  *
  * Twin parity (randomized spec): identical digest for ≥k tokens; NULL
  * for under-k docs (array_min of an empty array) and for a null token
  * array (the twin's when-guard folds to the same null); null tokens
  * inside a shingle are skipped exactly like concat_ws.
  *
  * Because an under-k NON-null input yields null, this expression is
  * unconditionally nullable and its codegen must re-check the result —
  * `defineCodeGen` would copy `isNull` from the child alone and NPE
  * downstream (codegen-path spec pins this).
  */
case class MinShingleDigest(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinShingleDigest.minDigest(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.MinShingleDigest.minDigest($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MinShingleDigest =
    copy(child = newChild)

  override def prettyName: String = "min_shingle_digest"
}

object MinShingleDigest {

  /** Byte-wise unsigned compare — the raw-digest equivalent of the
    * lowercase-hex lexicographic order the twin's array_min uses.
    */
  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 32) {
      val x = a(i) & 0xFF
      val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Static entry point shared by interpreted eval and generated code.
    * Returns null when the document has no shingle (< k tokens).
    */
  def minDigest(toks: ArrayData): UTF8String = {
    val n = toks.numElements()
    if (n < ShingleHashing.shingleSize) return null
    val bytes = ShingleHashing.tokenBytes(toks)
    val md = ShingleHashing.sha256()
    var dig = new Array[Byte](32)
    var min: Array[Byte] = null
    var s = 0
    val last = n - ShingleHashing.shingleSize
    while (s <= last) {
      ShingleHashing.digestShingle(bytes, s, md, dig)
      if (min == null || lessThan(dig, min)) {
        val t = min
        min = dig
        dig = if (t == null) new Array[Byte](32) else t
      }
      s += 1
    }
    val hex = new Array[Byte](64)
    var i = 0
    while (i < 32) {
      hex(2 * i) = ShingleHashing.hexDigits((min(i) >> 4) & 0xF)
      hex(2 * i + 1) = ShingleHashing.hexDigits(min(i) & 0xF)
      i += 1
    }
    UTF8String.fromBytes(hex)
  }

  /** Column form. */
  def min_shingle_digest(toks: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(MinShingleDigest(ColumnBridge.expression(toks)))
  }
}
