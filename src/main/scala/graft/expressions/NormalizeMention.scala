package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for G5 mention normalization
  * (`middlewareServer.py:90-131`): lowercase, split on single spaces, drop
  * article tokens, re-join — fused into one scan.
  *
  * The Column formulation (`array_join(filter(split(lower(c))), ...)`)
  * pays three interpreted higher-order-function evaluations plus an array
  * materialization per mention row (HOFs do not codegen — BENCH.md
  * lesson 8); this runs in the linker on every mention occurrence.
  *
  * Semantics twin rules (pinned by randomized spec vs the HOF chain):
  *  - lowercase via UTF8String.toLowerCase — exactly Spark's `lower`;
  *  - split KEEPS empty tokens (Spark `split` has no trailing-empty
  *    trimming, unlike Java's `String.split`), so " x" → ["", "x"] and the
  *    join reproduces interior/edge spaces around non-article tokens;
  *  - article comparison against the lowercased token (input is lowercased
  *    before the split, as in the HOF chain).
  */
case class NormalizeMention(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NormalizeMention.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.NormalizeMention.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeMention =
    copy(child = newChild)

  override def prettyName: String = "normalize_mention"
}

object NormalizeMention {

  private val articles: Set[String] =
    graft.operators.Lemmatizer.articles.toSet

  /** Static entry point shared by interpreted eval and generated code. */
  def normalize(text: UTF8String): UTF8String = {
    val s = text.toLowerCase.toString
    val sb = new java.lang.StringBuilder(s.length)
    var start = 0
    var first = true
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        val tok = s.substring(start, i)
        if (!articles.contains(tok)) {
          if (!first) sb.append(' ')
          sb.append(tok)
          first = false
        }
        start = i + 1
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Column form. */
  def normalize_mention(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(NormalizeMention(ColumnBridge.expression(c)))
  }
}
