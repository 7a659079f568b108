package graft.expressions

import java.io.StringReader

import javax.xml.parsers.SAXParserFactory

import org.xml.sax.{Attributes, InputSource, XMLReader}
import org.xml.sax.ext.DefaultHandler2

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass S5 article extraction: raw XML string → 0/1-element
  * `array<struct<body, department>>` — empty when the document is not a
  * `cms-article`, so `explode` drops non-articles with NO re-evaluating
  * filter.
  *
  * The declarative twin (`XmlCorpus.articlesXpathTwin`: Spark's built-in
  * `xpath_string`/`xpath`/`xpath_string` chain) pays a full parse + DTM
  * build PER XPATH CALL — three tree materializations per article row —
  * and a first DOM-based cut of this kernel measured a wash because JAXP's
  * `XPathExpression.evaluate(doc)` rebuilds its internal DTM on every
  * evaluation too (BENCH.md). So the kernel hand-compiles the three XPath
  * constants (`XmlCorpus.categoryXpath` / `bodyTextXpath` /
  * `departmentXpath` — still the single source of truth for the twin and
  * the DuckDB oracle's synthesis-arithmetic prediction) into ONE streaming
  * SAX pass: no DOM, no DTM, no node objects. **Edit the handler and those
  * constants together** — the randomized + real-markup parity specs in
  * TextSplitSpec pin the two paths equal.
  *
  * Hand-compiled semantics, matching the XPath data model the twin's
  * SAX-fed DTM exposes (parsing is namespace-UNAWARE like the twin's
  * `UDFXPathUtil` DocumentBuilder, and name tests match the LOCAL PART —
  * the qName with everything up to the FIRST colon stripped — on both
  * elements and attributes, which is how Xalan's DTM derives localName
  * over a namespace-unaware DOM (all probed empirically and spec-pinned
  * against the twin): `<x:item>` IS an `item` even with `x` undeclared, a
  * default namespace changes nothing, `x:scope="…"` satisfies `@scope`,
  * multi-colon names strip only the first segment (`<a:b:item>` is
  * `b:item`, NOT `item`), and `xmlns`/`xmlns:*` attributes are namespace
  * nodes that attribute tests never match; element depth is unbounded,
  * frames grow):
  *  - `category` = string(`/item/category/@scope`): first `category` child
  *    of the root `item` that carries a `scope` attribute; root element not
  *    named `item` → no match → not an article (after a full parse, like
  *    the twin);
  *  - `body` = the twin's `array_join(xpath(bodyTextXpath), " ")`: every
  *    text node under any `/item/corpus` in document order, space-joined,
  *    EXCLUDING an element-leading text node whose parent is
  *    `location[parent::p.bodytext]` or `em.source[parent::p.bodytext]`
  *    (`not(preceding-sibling::node())` — comments/PIs/elements all count
  *    as preceding siblings, so text after them survives). Text-node
  *    boundaries = contiguous character runs: comments and PIs flush a
  *    run; expanded entities coalesce with adjacent text — matching the
  *    twin's SAX-fed DTM, spec-pinned. CDATA also coalesces here, which
  *    matches the REFERENCE parser (ElementTree/expat merges CDATA into
  *    character data) but NOT the twin: Xalan's DTM types a run by the
  *    state it starts in and its text() node-test skips CDATA_SECTION
  *    runs, silently dropping content — a Xalan artifact we refuse to
  *    replicate. The kernel↔twin parity contract therefore covers
  *    CDATA-free documents; the divergence (and Xalan's behavior, as a
  *    change detector) is spec-pinned in TextSplitSpec;
  *  - `department` = string(`departmentXpath`): the first matching `id`
  *    element's string-value (ALL descendant text, no separators), "" when
  *    absent — exactly `xpath_string`;
  *  - malformed XML THROWS (wrapped SAXParseException) — exactly what
  *    Spark's xpath family does (`UDFXPathUtil.eval` wraps parse errors in
  *    RuntimeException; it does NOT null out), spec-pinned on both paths;
  *  - a null input propagates null; `explode(null)` drops the row like the
  *    twin's null filter condition.
  */
case class XmlArticle(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = XmlArticle.outType

  override def nullSafeEval(input: Any): Any =
    XmlArticle.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.XmlArticle.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): XmlArticle =
    copy(child = newChild)

  override def prettyName: String = "xml_article"
}

object XmlArticle {

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("body", StringType, nullable = false),
    StructField("department", StringType, nullable = false))),
    containsNull = false)

  /** One streaming pass over the document. Frames carry the little
    * ancestor context the three hand-compiled XPaths need:
    * `pathTag` walks the department chain
    * (item→related[@rel=department]→directory→meta), `inCorpus` marks the
    * `/item/corpus` subtree, `excludeLeading` marks a dateline
    * location/em.source under a bodytext p, `hasChild` implements
    * `not(preceding-sibling::node())`.
    */
  private final class Handler extends DefaultHandler2 {
    private var cap = 64
    private var pathTag = new Array[Int](cap)
    private var inCorpus = new Array[Boolean](cap)
    private var excludeLeading = new Array[Boolean](cap)
    private var isBodytextP = new Array[Boolean](cap)
    private var hasChild = new Array[Boolean](cap)
    private var isDeptCapture = new Array[Boolean](cap)
    private var depth = 0

    /** Deep documents grow the frame arrays instead of failing — the twin
      * has no depth limit, so neither may the kernel (parity contract).
      */
    private def ensureCap(): Unit = if (depth >= cap) {
      val nc = cap * 2
      pathTag = java.util.Arrays.copyOf(pathTag, nc)
      inCorpus = java.util.Arrays.copyOf(inCorpus, nc)
      excludeLeading = java.util.Arrays.copyOf(excludeLeading, nc)
      isBodytextP = java.util.Arrays.copyOf(isBodytextP, nc)
      hasChild = java.util.Arrays.copyOf(hasChild, nc)
      isDeptCapture = java.util.Arrays.copyOf(isDeptCapture, nc)
      cap = nc
    }

    private val run = new java.lang.StringBuilder   // pending text node
    private val body = new java.lang.StringBuilder
    private var bodyNodes = 0
    private val dept = new java.lang.StringBuilder
    private var deptCollecting = false
    private var deptDone = false
    var category: String = null

    def reset(): Unit = {
      depth = 0
      run.setLength(0)
      body.setLength(0)
      bodyNodes = 0
      dept.setLength(0)
      deptCollecting = false
      deptDone = false
      category = null
    }

    def bodyText: String = body.toString
    def deptText: String = if (deptDone) dept.toString else ""

    /** XPath name-test key under the twin's namespace-unaware DTM: the
      * qName with everything up to the FIRST colon stripped — Xalan's
      * DOM2DTM localName derivation, probed: `a:b:item` is `b:item` to the
      * twin (first colon), NOT `item` (last colon).
      */
    private def name(local: String, qName: String): String = {
      if (local != null && !local.isEmpty) return local
      val c = qName.indexOf(':')
      if (c >= 0) qName.substring(c + 1) else qName
    }

    /** Attribute lookup by the same first-colon local part, first match in
      * reported order — `atts.getValue(name)` alone would miss a prefixed
      * `x:scope`. `xmlns:*` declarations are EXCLUDED: Xalan classifies
      * them as namespace nodes that `@name` never matches (probed:
      * `xmlns:scope="…"` yields '' from the twin's `@scope`).
      */
    private def attr(atts: Attributes, name: String): String = {
      var i = 0
      val n = atts.getLength
      while (i < n) {
        val q = atts.getQName(i)
        val c = q.indexOf(':')
        val hit =
          if (c < 0) q == name
          else !q.startsWith("xmlns:") &&
            q.length - c - 1 == name.length &&
            q.regionMatches(c + 1, name, 0, name.length)
        if (hit) return atts.getValue(i)
        i += 1
      }
      null
    }

    /** Close the pending text run as one text node of the current element. */
    private def flushText(): Unit = {
      if (run.length() == 0) return
      val p = depth - 1
      if (p >= 0) {
        if (inCorpus(p) && !(excludeLeading(p) && !hasChild(p))) {
          if (bodyNodes > 0) body.append(' ')
          body.append(run)
          bodyNodes += 1
        }
        hasChild(p) = true
      }
      run.setLength(0)
    }

    override def startElement(uri: String, local: String, qName: String,
        atts: Attributes): Unit = {
      flushText()
      val n = name(local, qName)
      val p = depth - 1
      if (p >= 0) hasChild(p) = true
      ensureCap()

      val tag =
        if (depth == 0) { if (n == "item") 1 else 0 }
        else pathTag(p) match {
          case 1 if n == "related" && attr(atts, "rel") == "department" => 2
          case 2 if n == "directory" => 3
          case 3 if n == "meta" => 4
          case _ => 0
        }
      pathTag(depth) = tag
      inCorpus(depth) = (p >= 0 && inCorpus(p)) ||
        (p >= 0 && pathTag(p) == 1 && n == "corpus")
      isBodytextP(depth) = n == "p" && attr(atts, "class") == "bodytext"
      excludeLeading(depth) = p >= 0 && isBodytextP(p) &&
        (n == "location" || (n == "em" && attr(atts, "class") == "source"))
      hasChild(depth) = false
      isDeptCapture(depth) = false

      if (category == null && p >= 0 && pathTag(p) == 1 && n == "category") {
        val s = attr(atts, "scope")
        if (s != null) category = s
      }
      if (!deptDone && !deptCollecting && p >= 0 && pathTag(p) == 4 &&
          n == "id" && attr(atts, "scope") == "url") {
        deptCollecting = true
        isDeptCapture(depth) = true
      }
      depth += 1
    }

    override def endElement(uri: String, local: String, qName: String): Unit = {
      flushText()
      depth -= 1
      if (isDeptCapture(depth)) {
        deptCollecting = false
        deptDone = true
      }
    }

    override def characters(ch: Array[Char], start: Int, len: Int): Unit = {
      if (deptCollecting) dept.append(ch, start, len)
      run.append(ch, start, len)
    }

    override def ignorableWhitespace(ch: Array[Char], start: Int, len: Int): Unit =
      characters(ch, start, len)

    // comments and PIs are nodes: they end the current text node and count
    // as preceding siblings; CDATA boundaries and entity expansion do NOT
    // (DefaultHandler2's startCDATA/startEntity stay no-ops → coalesced,
    // like the DTM)
    override def comment(ch: Array[Char], start: Int, len: Int): Unit = {
      flushText()
      if (depth > 0) hasChild(depth - 1) = true
    }

    override def processingInstruction(target: String, data: String): Unit = {
      flushText()
      if (depth > 0) hasChild(depth - 1) = true
    }
  }

  /** Per-thread reader + handler: XMLReader is reusable across sequential
    * parses but not thread-safe, and building one per row is exactly the
    * cost the kernel exists to remove.
    */
  private final class Compiled {
    val handler = new Handler
    val reader: XMLReader = {
      val f = SAXParserFactory.newInstance()
      // namespace-UNAWARE, like the twin: UDFXPathUtil builds its
      // DocumentBuilder without setNamespaceAware, so the xpath constants
      // match raw qNames (`<x:item>` does NOT match `item`) and undeclared
      // prefixes are not an error — parse the same dialect here
      f.setNamespaceAware(false)
      f.setValidating(false)
      // EXACTLY the twin's entity hardening, no more: UDFXPathUtil sets
      // only these two features (external general/parameter entities off —
      // an external entity reference is SKIPPED, not fetched), NOT
      // FEATURE_SECURE_PROCESSING. An earlier FSP-based cut diverged:
      // JAXP's secure processing denies external DTD access outright, so a
      // DTD-carrying document that the twin parses (entity silently empty)
      // THREW here — spec-pinned ("external general entity") against the
      // twin, probed not assumed.
      f.setFeature("http://xml.org/sax/features/external-general-entities", false)
      f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
      val r = f.newSAXParser().getXMLReader
      r.setContentHandler(handler)
      r.setErrorHandler(handler)
      r.setProperty("http://xml.org/sax/properties/lexical-handler", handler)
      r
    }
  }

  private val compiled = ThreadLocal.withInitial[Compiled](() => new Compiled)

  private val EMPTY = new GenericArrayData(new Array[Any](0))

  /** Static entry point shared by interpreted eval and generated code. */
  def extract(xml: UTF8String): ArrayData = {
    val c = compiled.get()
    c.handler.reset()
    try {
      c.reader.parse(new InputSource(new StringReader(xml.toString)))
    } catch {
      // malformed XML: Spark's xpath family THROWS here too
      // (UDFXPathUtil.eval wraps the SAXParseException) — do the same
      // rather than silently dropping the row
      case e: Exception =>
        throw new RuntimeException("Error parsing XML for xml_article", e)
    }
    if (c.handler.category != "cms-article") return EMPTY
    val row: InternalRow = new GenericInternalRow(Array[Any](
      UTF8String.fromString(c.handler.bodyText),
      UTF8String.fromString(c.handler.deptText)))
    new GenericArrayData(Array[Any](row))
  }

  /** Column form. */
  def xml_article(xml: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(XmlArticle(ColumnBridge.expression(xml)))
  }
}
