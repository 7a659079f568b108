package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Tagger

/** Fast literal-alternation tagger (G4 hot path).
  *
  * Every pattern in the tagger's supported regex subset (see
  * [[graft.operators.Tagger.parseAlts]]) is an alternation of literals with
  * optional `\b` word-boundary anchors (plus the one `\b(LIT)\. [class]`
  * context-group shape). `java.util.regex` matches such an alternation by
  * attempting every alternative at every scan position — O(positions ×
  * alternatives) NFA work, times one full regex pass PER PATTERN in the
  * `regexp_extract_all` formulation. [[LiteralScanner]] replaces all of it
  * with `String.indexOf` occurrence streams (JIT-intrinsified) merged under
  * exactly Java's `Matcher.find` semantics per pattern: leftmost start
  * wins, first listed alternative breaks ties, cursor jumps past the FULL
  * match. Those are the same rules the DuckDB span oracle simulates, so the
  * randomized span twin gate cross-checks this scan against real
  * `java.util.regex` continuously; a dedicated spec also asserts scan ==
  * regex-path tagging on randomized text.
  *
  * Emission order is pattern-major, position-minor — identical to the
  * `flatten(array(per-pattern regexp_extract_all))` formulation it
  * replaces. Matched text always equals the alternative's literal (group 1
  * of shape-B is the literal), so emitted rows are per-alternative
  * constants — zero allocation per match.
  */
final class LiteralScanner private[graft] (alts: Seq[Tagger.SpanAlt])
    extends Serializable {

  private case class Alt(literal: String, leftB: Boolean, rightB: Boolean,
      suffix: Array[Boolean], fullLen: Int, groupLen: Int,
      labelU: UTF8String, mentionU: UTF8String, confidence: Double,
      row: InternalRow)

  /** Parse a char-class body like `a-zäöüA-Z` into a BMP membership table
    * (boolean array up to the max char, all classes in the pattern set are
    * small); mirrors the `[...]` the regex/SQL twins compile.
    */
  private def parseClass(cls: String): Array[Boolean] = {
    val members = scala.collection.mutable.Set.empty[Char]
    var i = 0
    while (i < cls.length) {
      if (i + 2 < cls.length && cls.charAt(i + 1) == '-') {
        (cls.charAt(i) to cls.charAt(i + 2)).foreach(members += _)
        i += 3
      } else { members += cls.charAt(i); i += 1 }
    }
    val arr = new Array[Boolean](members.map(_.toInt).max + 1)
    members.foreach(c => arr(c.toInt) = true)
    arr
  }

  // pattern-major alternative table (listed order preserved within a pattern)
  private val byPattern: Array[Array[Alt]] = {
    val grouped = alts.groupBy(_.pat)
    (0 to (if (alts.isEmpty) -1 else alts.map(_.pat).max)).map { pi =>
      grouped.getOrElse(pi, Seq.empty).sortBy(_.alt).map { a =>
        val labelU = UTF8String.fromString(a.label)
        val mentionU = UTF8String.fromString(a.literal)
        Alt(a.literal, a.leftB, a.rightB,
          a.suffixClass.map(parseClass).orNull,
          a.fullLen, a.groupLen, labelU, mentionU, a.confidence,
          new GenericInternalRow(Array[Any](labelU, a.confidence, mentionU)))
      }.toArray
    }.toArray
  }

  private def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Next start >= from where `a` matches (literal present, boundaries and
    * context suffix hold), or -1. Java-equivalent: a literal occurrence
    * failing the boundary/suffix check is simply not a match at that
    * position, so the scan continues one position later.
    */
  private def findNext(s: String, a: Alt, from: Int): Int = {
    val n = s.length
    var p = s.indexOf(a.literal, from)
    while (p >= 0) {
      val m = a.literal.length
      val ok = (!a.leftB || p == 0 || !isWord(s.charAt(p - 1))) &&
        (!a.rightB || p + m >= n || !isWord(s.charAt(p + m))) &&
        (a.suffix == null ||
          (p + m + 2 < n && s.charAt(p + m) == '.' && s.charAt(p + m + 1) == ' ' && {
            val c = s.charAt(p + m + 2)
            c < a.suffix.length && a.suffix(c)
          }))
      if (ok) return p
      p = s.indexOf(a.literal, p + 1)
    }
    -1
  }

  /** The `Matcher.find`-equivalent merge loop, factored ONCE for the two
    * emission shapes ([[scan]] / [[scanSpans]]): leftmost start wins, first
    * listed alternative breaks ties, cursor jumps past the FULL match.
    * `emit` receives the winning alternative and its match start (UTF-16
    * code-unit offset, Java `String.indexOf` units — the same units
    * `Matcher.start` reports).
    */
  private def scanWith(s: String, emit: (Alt, Int) => Unit): Unit = {
    var pi = 0
    while (pi < byPattern.length) {
      val pa = byPattern(pi)
      val k = pa.length
      val next = new Array[Int](k)
      var i = 0
      while (i < k) { next(i) = findNext(s, pa(i), 0); i += 1 }
      var done = false
      while (!done) {
        var best = -1
        var bestAlt = -1
        i = 0
        while (i < k) {
          if (next(i) >= 0 && (best < 0 || next(i) < best)) {
            best = next(i); bestAlt = i
          }
          i += 1
        }
        if (best < 0) done = true
        else {
          emit(pa(bestAlt), best)
          val pos = best + pa(bestAlt).fullLen
          i = 0
          while (i < k) {
            if (next(i) >= 0 && next(i) < pos) next(i) = findNext(s, pa(i), pos)
            i += 1
          }
        }
      }
      pi += 1
    }
  }

  /** All matches of all patterns over `text`, as
    * `array<struct<label:string, confidence:double, mention:string>>`.
    */
  def scan(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[Any]()
    scanWith(s, (a, _) => out.add(a.row))
    new GenericArrayData(out.toArray)
  }

  /** All matches WITH character spans, as
    * `array<struct<text, label, confidence, begin:int, end:int>>` — the
    * [[graft.model.Entity]] field shape the span UDF
    * ([[graft.operators.Tagger.tagWithSpansUdf]]) emits. begin/end are the
    * GROUP's offsets (`Matcher.start(group)`/`end(group)`): for the
    * shape-B context pattern the group is the leading literal, so both
    * shapes span exactly the emitted mention text. Unlike [[scan]]'s
    * per-alternative constant rows, a span row is allocated per match
    * (positions vary); label/mention strings are still shared per alt.
    */
  def scanSpans(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[Any]()
    scanWith(s, (a, p) => out.add(new GenericInternalRow(Array[Any](
      a.mentionU, a.labelU, a.confidence, p, p + a.groupLen))))
    new GenericArrayData(out.toArray)
  }
}

object LiteralScanner {
  /** A scanner for `ps` when every pattern is in the supported literal
    * subset; None → caller falls back to the regexp formulation.
    */
  def forPatterns(ps: Seq[Tagger.Pattern]): Option[LiteralScanner] =
    scala.util.Try(new LiteralScanner(Tagger.parseAlts(ps))).toOption
}

/** `tag_mentions(text)` — the [[LiteralScanner]] as a codegen-capable
  * Catalyst expression. The scanner is attached to the generated code via
  * `addReferenceObj`, so the plan ships it to executors like any other
  * expression state (cluster-safe; no static registry).
  */
case class TagMentions(child: Expression, scanner: LiteralScanner)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("label", StringType, nullable = false),
    StructField("confidence", DoubleType, nullable = false),
    StructField("mention", StringType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    scanner.scan(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scanner", scanner,
      classOf[LiteralScanner].getName)
    defineCodeGen(ctx, ev, c => s"$ref.scan($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): TagMentions =
    copy(child = newChild)

  override def prettyName: String = "tag_mentions"
}

object TagMentions {
  /** Column form. */
  def tag_mentions(c: Column, scanner: LiteralScanner): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(TagMentions(ColumnBridge.expression(c), scanner))
  }
}
