package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text
import graft.operators.{Chunker, Splitter}

/** P1-P3/P7 scalar↔Column parity, splitter goldens (reference README.md
  * transcripts), and chunker greedy-packing parity (ner.py:183-192).
  */
class TextSplitSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def columnTwin(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      inputs: Seq[String]): Seq[String] =
    inputs.toDF("s").select(f(col("s"))).as[String].collect().toSeq

  val nasty = Seq(
    "a\nb", "a  b", "a­b", "a­ b", "x\t\ty",
    "plain", "", "  lead and trail  ", "mix\n  of­ all",
    "puakept?", "line|short dateline", "x" * 30 + "|long prefix stays")

  test("P1 cleanup: Column == scalar twin on nasty inputs") {
    val got = columnTwin(Text.cleanup, nasty)
    assert(got == nasty.map(Text.cleanupScalar))
  }

  test("P1 cleanup idempotent without soft hyphens; non-idempotent WITH (faithful)") {
    // The reference's cleanup is genuinely non-idempotent: U+00AD becomes a
    // space AFTER whitespace collapse (sentsplitter.py:10-18), so soft
    // hyphen + space -> two spaces, which a second pass collapses. Pin both.
    val rnd = new scala.util.Random(7)
    val alphabet = "ab \n\t.!?|\u00c4\u00d6\u00fc"
    (1 to 300).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val once = Text.cleanupScalar(s)
      assert(Text.cleanupScalar(once) == once, s"not idempotent on ${s.getBytes.toSeq}")
    }
    val withHyphen = Text.cleanupScalar("a\u00ad b")
    assert(withHyphen == "a  b" && Text.cleanupScalar(withHyphen) == "a b")
  }

  test("P1 wsChars set == WS regex class on every BMP codepoint") {
    // the fused single-pass cleanup decides membership via wsChars; the
    // regex twins (Java + the generated DuckDB fragment) via the WS class
    // literal — assert they can never drift apart.
    val p = java.util.regex.Pattern.compile(Text.WS)
    (0 until 0x10000).filterNot(c => c >= 0xD800 && c <= 0xDFFF).foreach { c =>
      val isMatch = p.matcher(String.valueOf(c.toChar)).matches()
      assert(isMatch == Text.wsChars.contains(c.toChar),
        f"WS/wsChars disagree at U+$c%04X")
    }
  }

  test("P1 fused single-pass cleanup == reference regex chain (randomized, full WS alphabet)") {
    val rnd = new scala.util.Random(11)
    val alphabet: IndexedSeq[Char] =
      Text.wsChars.toIndexedSeq ++ "ab.­x|!" ++ Seq('­', '\n', ' ', ' ')
    (1 to 2000).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(Text.cleanupScalar(s) == Text.cleanupScalarRegex(s),
        s"fused != regex on ${s.map(_.toInt).mkString(",")}")
    }
  }

  test("P1 native cleanup_text expression == regex-chain Column, incl. SQL registration") {
    val rnd = new scala.util.Random(13)
    val alphabet: IndexedSeq[Char] =
      Text.wsChars.toIndexedSeq ++ "ab.­x|!" :+ '­'
    val inputs = nasty ++ (1 to 200).map(_ =>
      Seq.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    assert(columnTwin(Text.cleanup, inputs) == columnTwin(Text.cleanupColRegex, inputs))
    graft.expressions.CleanupText.register(spark)
    val viaSql = inputs.toDF("t").selectExpr("cleanup_text(t)").as[String].collect().toSeq
    assert(viaSql == inputs.map(Text.cleanupScalar))
  }

  test("P1 faithful quirk: soft hyphen AFTER collapse leaves double space") {
    // sentsplitter.py:10-18 order: \n, then \s{2,}, then U+00AD
    assert(Text.cleanupScalar("a­ b") == "a  b")
  }

  test("P1 unicode whitespace: runs of NBSP/ideographic space collapse (re.UNICODE parity)") {
    // the reference collapses with re.UNICODE \s; NBSP runs must collapse,
    // a SINGLE exotic space survives (only runs of 2+ collapse).
    val inputs = Seq("a  b", "a　　b", "a  b", "a b")
    assert(Text.cleanupScalar(inputs(0)) == "a b")
    assert(Text.cleanupScalar(inputs(1)) == "a b")
    assert(Text.cleanupScalar(inputs(2)) == "a b")
    assert(Text.cleanupScalar(inputs(3)) == "a b")
    assert(columnTwin(Text.cleanup, inputs) == inputs.map(Text.cleanupScalar))
  }

  test("P2 PUA strip: Column == scalar; BMP PUA removed") {
    val got = columnTwin(Text.puaStrip, nasty)
    assert(got == nasty.map(Text.puaStripScalar))
    assert(Text.puaStripScalar("xyz") == "xyz")
  }

  test("P3 dateline strip: Column == scalar; <26-char prefix dropped") {
    val got = columnTwin(Text.datelineStrip, nasty)
    assert(got == nasty.map(Text.datelineStripScalar))
    assert(Text.datelineStripScalar("Dresden, 3. Mai|Body text") == "Body text")
    assert(Text.datelineStripScalar("x" * 26 + "|keeps") == "x" * 26 + "|keeps")
  }

  test("P7 sha256: Column sha2 == java twin (row invariant)") {
    val inputs = Seq("", "abc", "ümläut ß", "a\nb")
    val got = columnTwin(c => sha2(c, 256), inputs)
    assert(got == inputs.map(Text.sha256HexScalar))
  }

  // --- Splitter goldens: reference README.md:73-105 -----------------------

  val elisabethQuoted =
    "die Kinder von Elisabeth II. haben in Dresden eine Wohnung. In dem Buch \"Traumwerkstadt\" wird die Wohnung beschrieben."

  test("G1 split golden: /split transcript (README.md:101-105)") {
    assert(Splitter.splitScalar(elisabethQuoted) == Seq(
      "die Kinder von Elisabeth II.",
      "haben in Dresden eine Wohnung.",
      "In dem Buch \"Traumwerkstadt\" wird die Wohnung beschrieben."))
  }

  test("G1 split: two plain sentences (README.md:73-76)") {
    val t = "die Kinder von Anton Schwarz haben in Dresden eine Wohnung. In dem Buch Traumwerkstadt wird die Wohnung beschrieben."
    assert(Splitter.splitScalar(t) == Seq(
      "die Kinder von Anton Schwarz haben in Dresden eine Wohnung.",
      "In dem Buch Traumwerkstadt wird die Wohnung beschrieben."))
  }

  test("G1 split: abbreviations do not split; order preserved") {
    val t = "Dr. Meier kam an. Nr. 7 war frei. Es war ca. 9 Uhr."
    assert(Splitter.splitScalar(t) == Seq(
      "Dr. Meier kam an.", "Nr. 7 war frei.", "Es war ca. 9 Uhr."))
  }

  test("G1 split: non-space chars preserved under split (seeded property)") {
    val rnd = new scala.util.Random(11)
    val words = Seq("Der", "hund", "lief.", "Weit!", "II.", "Dr.", "\"Zitat\"", "Ende?")
    (1 to 200).foreach { _ =>
      val t = Seq.fill(1 + rnd.nextInt(12))(words(rnd.nextInt(words.length))).mkString(" ")
      val joined = Splitter.splitScalar(t).mkString(" ")
      assert(joined.replace(" ", "") == Text.cleanupScalar(t).trim.replace(" ", ""),
        s"chars lost on: $t")
    }
  }

  // --- Chunker: exact greedy parity with ner.py:183-192 -------------------

  test("G3 chunk: faithful quirks — leading space + overshoot allowed") {
    // limit = 20 - 2 = 18; check precedes append so a part may overshoot
    val s = Seq("aaaaaaaaaa", "bbbbbbbbbb", "cc")
    val parts = Chunker.chunkScalar(s, maxNoSplit = 20)
    // first part carries the reference's leading space AND overshoots 20
    // (the length check precedes the append); the next part starts bare.
    assert(parts == Seq(" aaaaaaaaaa bbbbbbbbbb", "cc"))
  }

  test("G3 chunk: no sentence dropped (seeded property)") {
    val rnd = new scala.util.Random(5)
    (1 to 200).foreach { _ =>
      val sents = Seq.fill(1 + rnd.nextInt(10))("s" * (1 + rnd.nextInt(30)))
      val parts = Chunker.chunkScalar(sents, maxNoSplit = 25)
      assert(parts.mkString(" ").split(" +").filter(_.nonEmpty).toSeq ==
        sents, s"sentences lost: $sents")
    }
  }

  test("G1 codegen expression == UDF == scalar on fixtures, incl. SQL registration") {
    import graft.expressions.SplitSentences
    val texts = Fixtures.docs(80).map(_.content) :+ elisabethQuoted
    val df = texts.toDF("t")
    val viaExpr = df.select(SplitSentences.split_sentences(col("t")))
      .as[Seq[String]].collect().toSeq
    val viaUdf = df.select(Splitter.splitUdf(col("t")))
      .as[Seq[String]].collect().toSeq
    assert(viaExpr == viaUdf)
    assert(viaExpr == texts.map(Splitter.splitScalar))
    SplitSentences.register(spark)
    val viaSql = df.selectExpr("split_sentences(t)")
      .as[Seq[String]].collect().toSeq
    assert(viaSql == viaExpr)
  }

  test("U2 splitter registry: rule vs naive fallback differ exactly on abbreviations") {
    val t = "Dr. Meier kam an. Es regnete."
    assert(Splitter.registry("rule")(t) == Seq("Dr. Meier kam an.", "Es regnete."))
    assert(Splitter.registry("naive")(t) ==
      Seq("Dr.", "Meier kam an.", "Es regnete."))
  }

  test("training corpus pipeline: P2 pua -> P3 dateline -> P5 lang -> P6 remap -> O3 split") {
    // mirrors the reference training notebook cells 3-13 end to end
    val spark2 = spark
    import spark2.implicits._
    val raw = Seq(
      (1L, "de", "Dresden, 3. Mai|Der Text über das Werk."),
      (2L, "de", "Einfacher Text ohne Dateline."),
      (3L, "en", "short|english text kept whole? no: dateline dropped"),
      (4L, "zh", "filtered out by language"))
      .toDF("doc_id", "lang", "text")
    val cleaned = raw
      .withColumn("text", Text.puaStrip(col("text")))
      .withColumn("text", Text.datelineStrip(col("text")))
      .filter(col("lang").isin("de", "en"))
      .withColumn("label", when(col("lang") === "zh", "other").otherwise(col("lang")))
      .withColumn("bucket", Text.hexBucket(col("doc_id")))
      .withColumn("split",
        when(col("bucket") < 204, "train")
          .when(col("bucket") < 230, "dev").otherwise("test"))
    val rows = cleaned.select("doc_id", "text", "split")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(rows.length == 3)
    assert(rows(0)._2 == "Der Text über das Werk.") // dateline stripped
    assert(rows(1)._2 == "Einfacher Text ohne Dateline.")
    assert(Set("train", "dev", "test").contains(rows(0)._3))
    // deterministic: same bucket on recompute
    assert(Text.hexBucketSqlDuck("doc_id").nonEmpty)
  }

  test("S5 xml ingest: bodytext extracted, location/em-source dropped, dept label, fasttext line") {
    import graft.sources.XmlCorpus
    val article =
      """<item><category scope="cms-article"/><corpus>
        |<p class="bodytext"><location>HAMBURG taz |</location>Der erste Absatz.</p>
        |<p class="bodytext">Zweiter Absatz <em class="source">dpa</em> geht weiter.</p>
        |</corpus><related rel="department"><directory><meta>
        |<id scope="url">p4616</id></meta></directory></related></item>""".stripMargin
    val nonArticle = """<item><category scope="ad"/><corpus><p class="bodytext">x</p></corpus></item>"""
    val noDept = """<item><category scope="cms-article"/><corpus><p class="bodytext">y</p></corpus></item>"""
    val df = Seq((1L, article), (2L, nonArticle), (3L, noDept)).toDF("doc_id", "xml")
    val got = graft.sources.XmlCorpus.articles(df)
      .select("doc_id", "department", "content")
      .as[(Long, String, String)].collect().toSeq
    assert(got.map(_._1) == Seq(1L), "non-articles and dept-less rows dropped")
    assert(got.head._2 == "p4616")
    // location + source text excluded; whitespace collapsed by cleanup
    assert(got.head._3.contains("Der erste Absatz."))
    assert(got.head._3.contains("Zweiter Absatz") && got.head._3.contains("geht weiter."))
    assert(!got.head._3.contains("HAMBURG") && !got.head._3.contains("dpa"))
    val line = XmlCorpus.fasttextLine(
      graft.sources.XmlCorpus.articles(df)).as[String].collect().head
    assert(line.startsWith("__label__p4616 ") && line.contains("Der erste Absatz."))
  }

  test("S5 xml ingest: nested dateline — only the .text slot is blanked, child/tail text survive") {
    // The notebook blanks `node.text` IN PLACE (cells 2-7): for
    // <location>LEAD<b>CHILD</b>TAIL</location> only LEAD vanishes —
    // CHILD (a child element's text) and TAIL (ElementTree .tail of <b>,
    // an XPath text-node child of <location> with a preceding sibling)
    // survive. The xpath exclusion reproduces exactly that via
    // not(preceding-sibling::node()); this pins the r3-flagged divergence
    // closed for element-bearing datelines.
    import graft.sources.XmlCorpus
    val article =
      """<item><category scope="cms-article"/><corpus>
        |<p class="bodytext"><location>LEAD<b>CHILD</b>TAIL</location>Body text here.</p>
        |<p class="bodytext">More <em class="source">SRCLEAD<i>SRCCHILD</i>SRCTAIL</em> after.</p>
        |</corpus><related rel="department"><directory><meta>
        |<id scope="url">p1</id></meta></directory></related></item>""".stripMargin
    val got = XmlCorpus.articles(Seq((1L, article)).toDF("doc_id", "xml"))
      .select("content").as[String].collect().head
    assert(!got.split("\\s+").contains("LEAD") && !got.split("\\s+").contains("SRCLEAD"),
      s".text slots must be blanked: <$got>")
    assert(got.contains("CHILD") && got.contains("TAIL"),
      s"child-element text and tail text inside <location> must survive: <$got>")
    assert(got.contains("SRCCHILD") && got.contains("SRCTAIL"),
      s"child-element text and tail text inside <em source> must survive: <$got>")
    assert(got.contains("Body text here.") && got.contains("after."))
  }

  test("S5 synthesis: escaping-hostile text round-trips the real XML parser") {
    import graft.sources.XmlCorpus
    // &, <, >, quotes, entity look-alikes, CR/LF, tab, and an XML-invalid
    // control char (U+0001, stripped by sanitize) — the parse must hand
    // back the sanitized original, dateline pair excluded.
    val hostile = "a & b <tag> \"q\" &amp; &#x41; \r\n line2 \r lone\tTab\u0001end"
    val df = Seq((3L, "de", hostile)).toDF("doc_id", "lang", "text")
      .select(col("doc_id"),
        XmlCorpus.syntheticArticleXml(col("doc_id"), col("lang"), col("text")).as("xml"))
    val got = XmlCorpus.articles(df)
      .select("doc_id", "department", "content")
      .as[(Long, String, String)].collect().toSeq
    assert(got.map(_._1) == Seq(3L) && got.head._2 == "dept-de")
    // expected = cleanup(dateline(sanitized)): \r\n and \r normalize to \n
    // pre-embed (parser-mandated), U+0001 stripped, then the P1 chain
    val sanitized = "a & b <tag> \"q\" &amp; &#x41; \n line2 \n lone\tTabend"
    val expected = graft.functions.Text.datelineStripScalar(
      graft.functions.Text.cleanupScalar(sanitized))
    assert(got.head._3 == expected, s"got <${got.head._3}> want <$expected>")
    assert(!got.head._3.contains("Berlin") && !got.head._3.contains("Agentur"))
    // the two drop rules
    val drops = Seq((7L, "en", "x"), (5L, "en", "y"), (4L, "en", "z"))
      .toDF("doc_id", "lang", "text")
      .select(col("doc_id"),
        XmlCorpus.syntheticArticleXml(col("doc_id"), col("lang"), col("text")).as("xml"))
    assert(XmlCorpus.articles(drops).select("doc_id").as[Long].collect().toSeq == Seq(4L))
  }

  test("S5 native XmlArticle == built-in xpath chain twin (randomized + quirks + malformed)") {
    import graft.sources.XmlCorpus
    // the single-parse kernel must reproduce Spark's xpath/xpath_string
    // chain exactly: entity-split text-node coalescing, document-order
    // joins, nested-dateline exclusion, string() semantics for the
    // department, drop rules, and malformed-XML row dropping.
    val rnd = new scala.util.Random(83)
    val frag = Vector("plain", "a & b", "<t>", "&amp;", "&#x41;", "\"q\"",
      "x > y", "δμ", "多字", "", " lead ", "trail ")
    val synth = (0 until 200).map { i =>
      (i.toLong, if (i % 2 == 0) "de" else "en",
        Seq.fill(1 + rnd.nextInt(6))(frag(rnd.nextInt(frag.size))).mkString(" "))
    }.toDF("doc_id", "lang", "text")
      .select(col("doc_id"),
        XmlCorpus.syntheticArticleXml(col("doc_id"), col("lang"), col("text")).as("xml"))
    val handBuilt = Seq(
      (1000L,
        """<item><category scope="cms-article"/><corpus>
          |<p class="bodytext"><location>L<b>C</b>T</location>Body &amp; more.</p>
          |<p class="other"><location>KEPT</location>other para</p>
          |<p class="bodytext">Second <em class="source">S<i>SC</i>ST</em> para.</p>
          |</corpus><related rel="department"><directory><meta>
          |<id scope="url">p1</id><id scope="url">p2-ignored</id></meta></directory></related></item>""".stripMargin),
      (1001L, """<item><category scope="ad"/><corpus><p class="bodytext">x</p></corpus></item>"""),
      (1002L, """<item><category scope="cms-article"/><corpus><p class="bodytext">y</p></corpus></item>"""),
      (1005L,
        """<item><category scope="cms-article"/><corpus><p class="bodytext">
          |multi
          |line   spaced</p></corpus><related rel="department"><directory><meta>
          |<id scope="url">  d spaced  </id></meta></directory></related></item>""".stripMargin)
    ).toDF("doc_id", "xml")
    Seq(synth, handBuilt).foreach { df =>
      val kernel = XmlCorpus.articles(df)
        .select("doc_id", "department", "content")
        .as[(Long, String, String)].collect().sortBy(_._1).toSeq
      val twin = XmlCorpus.articlesXpathTwin(df)
        .select("doc_id", "department", "content")
        .as[(Long, String, String)].collect().sortBy(_._1).toSeq
      assert(kernel == twin)
    }

    // malformed XML: Spark's xpath family THROWS (UDFXPathUtil wraps the
    // SAXParseException — it does not null out), so the kernel must too
    val bad = Seq((1L, """<item><category scope="cms-article"/><corpus>""")).toDF("doc_id", "xml")
    Seq(XmlCorpus.articles(bad), XmlCorpus.articlesXpathTwin(bad)).foreach { d =>
      val e = intercept[Exception](d.collect())
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(_.isInstanceOf[org.xml.sax.SAXParseException]),
        s"expected a wrapped SAXParseException, got $e")
    }
  }

  test("S5 XmlArticle dialect parity: prefix-stripped name tests, undeclared prefixes, unbounded depth") {
    import graft.sources.XmlCorpus
    // The twin's UDFXPathUtil DocumentBuilder is namespace-UNAWARE, and
    // Xalan's DTM derives localName from the raw qName by stripping any
    // prefix — declared or not — so `/item` matches `<x:item>` (probed
    // empirically: all four shapes below return "cms-article" from
    // xpath_string), `@scope` matches `x:scope`, and undeclared prefixes
    // are legal (a namespace-aware parser would fatally reject them). The
    // kernel parses the same dialect with the same prefix-stripped name
    // tests, and grows its frame arrays so deep documents can't fail where
    // the twin succeeds.
    val deep = "<d>" * 600 + "deepest" + "</d>" * 600
    val dept = """<related rel="department"><directory><meta><id scope="url">dd</id></meta></directory></related>"""
    val docs = Seq(
      // prefixed root + children: local parts match → article on BOTH paths
      (1L, s"""<x:item xmlns:x="u"><x:category scope="cms-article"/><x:corpus><p class="bodytext">b</p></x:corpus>$dept</x:item>"""),
      // undeclared prefix inside the body: legal in the twin's dialect
      (2L, s"""<item><category scope="cms-article"/><corpus><p class="bodytext">ok <foo:bar>pfx</foo:bar> tail</p></corpus>$dept</item>"""),
      // element depth far past any fixed frame budget
      (3L, s"""<item><category scope="cms-article"/><corpus><p class="bodytext">$deep</p></corpus>$dept</item>"""),
      // prefixed ATTRIBUTE (undeclared prefix, even): @scope matches it
      (4L, s"""<item><category foo:scope="cms-article"/><corpus><p class="bodytext">attr</p></corpus>$dept</item>"""),
      // default namespace: localName == qName, nothing changes
      (5L, s"""<item xmlns="d"><category scope="cms-article"/><corpus><p class="bodytext">dns</p></corpus>$dept</item>"""),
      // xmlns:* is a NAMESPACE node, not an attribute — @scope must NOT
      // match it (probed: twin yields '') → not an article on either path
      (6L, s"""<item><category xmlns:scope="cms-article"/><corpus><p class="bodytext">ns</p></corpus>$dept</item>"""),
      // multi-colon name: localName strips at the FIRST colon (a:b:item →
      // b:item, probed), so the root is NOT an item → dropped on both
      (7L, s"""<a:b:item><category scope="cms-article"/><corpus><p class="bodytext">mc</p></corpus>$dept</a:b:item>"""),
      // multi-colon ATTRIBUTE local part is b:scope → @scope no match
      (8L, s"""<item><category a:b:scope="cms-article"/><corpus><p class="bodytext">mca</p></corpus>$dept</item>""")
    ).toDF("doc_id", "xml")
    val kernel = XmlCorpus.articles(docs).select("doc_id", "department", "content")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    val twin = XmlCorpus.articlesXpathTwin(docs).select("doc_id", "department", "content")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(kernel == twin, s"kernel=$kernel twin=$twin")
    assert(kernel.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("S5 XmlArticle entity hardening parity: external general entity skipped, not fatal") {
    import graft.sources.XmlCorpus
    // The twin's UDFXPathUtil hardens EXACTLY two SAX features
    // (external-general-entities / external-parameter-entities = false) —
    // NOT FEATURE_SECURE_PROCESSING, which denies external DTD/entity
    // access with a FATAL error. A DTD-carrying document referencing an
    // external general entity must therefore parse on both paths with the
    // entity silently skipped (never fetched — the SYSTEM id below does
    // not exist and must not matter); an earlier FSP-based kernel build
    // threw here where the twin extracted text (r5 ADVICE, fixed).
    val dept = """<related rel="department"><directory><meta><id scope="url">dd</id></meta></directory></related>"""
    val docs = Seq(
      // external general entity: declared, referenced, never fetched
      (1L, "<!DOCTYPE item [<!ENTITY ext SYSTEM \"file:///graft-nonexistent-entity\">]>" +
        s"""<item><category scope="cms-article"/><corpus><p class="bodytext">pre &ext; post</p></corpus>$dept</item>"""),
      // internal parsed entity: expands on both paths, coalesces with
      // adjacent text (entity expansion is not a text-node boundary)
      (2L, "<!DOCTYPE item [<!ENTITY inl \"INLINE\">]>" +
        s"""<item><category scope="cms-article"/><corpus><p class="bodytext">pre &inl; post</p></corpus>$dept</item>"""),
      // external entity reference in the dateline .text slot: the skip
      // must not disturb the leading-text exclusion bookkeeping
      (3L, "<!DOCTYPE item [<!ENTITY ext SYSTEM \"file:///graft-nonexistent-entity\">]>" +
        s"""<item><category scope="cms-article"/><corpus><p class="bodytext"><location>Berlin &ext;</location>body text</p></corpus>$dept</item>""")
    ).toDF("doc_id", "xml")
    val kernel = XmlCorpus.articles(docs).select("doc_id", "department", "content")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    val twin = XmlCorpus.articlesXpathTwin(docs).select("doc_id", "department", "content")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(kernel == twin, s"kernel=$kernel twin=$twin")
    assert(kernel.map(_._1) == Seq(1L, 2L, 3L))
    assert(kernel.find(_._1 == 2L).get._3.contains("INLINE"))
  }

  test("S5 native XmlArticle == twin on real markup: comments/PIs/nesting (raw, pre-cleanup)") {
    import graft.sources.XmlCorpus
    // The synthesis ESCAPES text, so the randomized parity test above can
    // never produce markup structure. This one builds documents with real
    // comments (text-node boundary + counts as preceding-sibling), PIs,
    // nested datelines, multiple corpus/category elements, non-item roots,
    // and nested department ids — and compares the RAW kernel struct
    // against the raw xpath chain (no cleanup — cleanup collapses
    // whitespace and would mask a space-join divergence). CDATA is
    // deliberately absent: the twin's Xalan DTM drops CDATA-typed runs
    // from text() (a Xalan artifact, pinned in the next test), so the
    // kernel↔twin contract covers CDATA-free documents only.
    val rnd = new scala.util.Random(167)
    val pieces = Vector(
      "text one",
      "a &amp; b",
      "<!-- boundary comment -->",
      "<?pi some data?>",
      "tail",
      "<location>LeadDrop<b>child</b>tailKept</location>",
      "<location><!-- c -->afterCommentKept</location>",
      "<location>onlyLead</location>",
      "<location/>",
      "<em class=\"source\">srcLead<i>k</i>t</em>",
      "<em class=\"other\">emOtherKept</em>",
      "mid<!-- x -->split",
      "<span>nested <b>deep</b> text</span>")
    def para(): String = {
      val cls = if (rnd.nextBoolean()) "bodytext" else "plain"
      val inner = Seq.fill(1 + rnd.nextInt(5))(pieces(rnd.nextInt(pieces.size))).mkString("")
      s"""<p class="$cls">$inner</p>"""
    }
    val synthDocs = (0 until 120).map { i =>
      val cat = i % 4 match {
        case 0 => """<category scope="cms-article"/>"""
        case 1 => """<category/><category scope="cms-article"/>""" // first lacks scope
        case 2 => """<category scope="ad"/><category scope="cms-article"/>""" // first wins: ad
        case _ => """<category scope="cms-article"/>"""
      }
      val corpora =
        if (i % 5 == 0) s"<corpus>${para()}</corpus><corpus>${para()}</corpus>"
        else s"<corpus>${para()}${para()}</corpus>"
      val dept = i % 6 match {
        case 0 => ""
        case 1 => """<related rel="department"><directory><meta><id scope="url">d<b>ee</b>p</id></meta></directory></related>"""
        case 2 => """<related rel="other"><directory><meta><id scope="url">wrongrel</id></meta></directory></related>"""
        case _ => """<related rel="department"><directory><meta><id scope="url">plain-dept</id></meta></directory></related>"""
      }
      val root = if (i % 30 == 29) "notitem" else "item"
      (i.toLong, s"<$root>$cat$corpora$dept</$root>")
    }
    val extra = Seq(
      // location directly under corpus (no p.bodytext parent) → kept
      (900L, """<item><category scope="cms-article"/><corpus><location>keptNoP</location>t</corpus></item>"""),
      // p.bodytext nested deeper inside corpus — predicate is unanchored
      (901L, """<item><category scope="cms-article"/><corpus><div><p class="bodytext"><location>drop</location>keep</p></div></corpus></item>"""),
      // comment/PI as the ONLY thing between two text runs inside location
      (902L, """<item><category scope="cms-article"/><corpus><p class="bodytext"><location>lead<?pi x?>afterPi</location></p></corpus></item>"""))
    val docs = (synthDocs ++ extra).toDF("doc_id", "xml")

    val kernel = docs.select(col("doc_id"), explode(
        graft.expressions.XmlArticle.xml_article(col("xml"))).as("x"))
      .select(col("doc_id"), col("x.body"), col("x.department"))
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    val twin = docs.filter(XmlCorpus.isArticle(col("xml")))
      .select(col("doc_id"),
        array_join(call_function("xpath", col("xml"), lit(XmlCorpus.bodyTextXpath)), " "),
        call_function("xpath_string", col("xml"), lit(XmlCorpus.departmentXpath)))
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(kernel.size == twin.size && kernel.nonEmpty)
    kernel.zip(twin).foreach { case (k, t) =>
      assert(k == t, s"kernel=$k twin=$t")
    }
  }

  test("S5 CDATA: kernel coalesces like the reference parser; the xpath twin's Xalan DTM drops it (pinned divergence)") {
    import graft.sources.XmlCorpus
    // Xalan's SAX2DTM types a coalesced character run by the state it
    // STARTS in: a run that begins inside a CDATA section becomes a
    // CDATA_SECTION node, which its text() node-test then skips — so
    // `pre<![CDATA[cd]]>post` yields ["pre"] from Spark's xpath (the
    // CDATA content AND the coalesced trailing text both vanish). The
    // reference parser (ElementTree/expat, notebook cells 2-7) merges
    // CDATA into the surrounding character data, so the KERNEL follows
    // the reference: body = "precdpost". This test pins BOTH behaviors;
    // if Spark/Xalan ever fixes the DTM, the twin assertion flags it and
    // the parity contract above can be widened to include CDATA.
    val doc = Seq((1L,
      """<item><category scope="cms-article"/><corpus><p class="bodytext">pre<![CDATA[cd]]>post</p></corpus></item>"""))
      .toDF("doc_id", "xml")
    val kernelBody = doc.select(explode(
        graft.expressions.XmlArticle.xml_article(col("xml"))).as("x"))
      .select("x.body").as[String].collect().head
    assert(kernelBody == "precdpost")
    val twinBody = doc.select(array_join(
        call_function("xpath", col("xml"), lit(XmlCorpus.bodyTextXpath)), " "))
      .as[String].collect().head
    assert(twinBody == "pre", s"Xalan DTM CDATA behavior changed: <$twinBody> — widen the parity contract")
  }

  test("uuid5 X500 cache-key parity: goldens from Python uuid.uuid5(NAMESPACE_X500, s)") {
    // the reference's on-disk cache key (cacheServer.py:34,66,96) — a
    // migration from a real reference cache file must reproduce its keys
    // exactly. Goldens generated with CPython's uuid module; covers the
    // empty string, ASCII, multi-byte UTF-8, and a 500-char sentence
    // (the reference's maxnosplit bound).
    val goldens = Seq(
      "" -> "b4bdf874-8c03-5bd8-8fd7-5e409dfd82c0",
      "a" -> "54a0a790-c611-5b5b-b50e-ff01490ecdfa",
      "Der Satz eins ist hier." -> "b818ea30-b825-5de8-83c3-2dba27c1271a",
      "hello world" -> "dbd9b896-6d7c-5852-895c-ecc5735cf874",
      "Ümläut — çafé ☕ 漢字" -> "3aa03512-7133-5e8b-b714-c89aa5581ecd",
      ("x" * 500) -> "8e80d98b-f8ed-5f89-b736-c2247c111e5c")
    goldens.foreach { case (s, want) =>
      assert(Text.uuid5X500Scalar(s) == want, s"scalar for <${s.take(20)}>")
    }
    // column form agrees with the scalar (and handles null)
    val got = goldens.map(_._1).zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
      .select(col("id"), Text.uuid5X500(col("s")).as("u"))
      .as[(Long, String)].collect().toMap
    goldens.zipWithIndex.foreach { case ((_, want), i) =>
      assert(got(i.toLong) == want)
    }
    assert(Seq((1L, null: String)).toDF("id", "s")
      .select(Text.uuid5X500(col("s"))).as[String].head() == null)
  }

  test("G3 chunk: short text passes through whole (ner.py:181,204)") {
    val df = Seq((1L, "short text. stays whole.")).toDF("doc_id", "content")
    val out = Chunker.explodeChunks(df, maxNoSplit = 500)
      .select("chunk").as[String].collect()
    assert(out.toSeq == Seq("short text. stays whole."))
  }
}
