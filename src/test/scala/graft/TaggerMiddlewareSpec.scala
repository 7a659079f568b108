package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text
import graft.model.Entity
import graft.operators._

/** G4 tagger semantics, the README golden transcripts end-to-end, A1/A2
  * middleware, and the north-rule P/R (engine triples vs reference-scalar
  * tags) on the synthetic fixture corpus.
  */
class TaggerMiddlewareSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  // Reference-faithful row-scalar /ner path (FIXTURES.md §2): cleanup →
  // split → tag per sentence → threshold → group by label into sorted sets.
  private def nerScalar(text: String): Map[String, Seq[String]] =
    Splitter.splitScalar(text)
      .flatMap(s => Tagger.tagScalar(s))
      .filter(_.confidence >= Tagger.threshold)
      .groupBy(_.label)
      .map { case (l, es) => l -> es.map(_.text).distinct.sorted }

  // /nernosplit path for short text: tag the whole (cleaned) text at once.
  private def nerNoSplitScalar(text: String): Map[String, Seq[String]] =
    Tagger.tagScalar(Text.cleanupScalar(text))
      .filter(_.confidence >= Tagger.threshold)
      .groupBy(_.label)
      .map { case (l, es) => l -> es.map(_.text).distinct.sorted }

  val anton =
    "die Kinder von Anton Schwarz haben in Dresden eine Wohnung. In dem Buch Traumwerkstadt wird die Wohnung beschrieben."
  val elisabeth =
    "die Kinder von Elisabeth II. haben in Dresden eine Wohnung. In dem Buch Traumwerkstadt wird die Wohnung beschrieben."
  val elisabethQuoted =
    "die Kinder von Elisabeth II. haben in Dresden eine Wohnung. In dem Buch \"Traumwerkstadt\" wird die Wohnung beschrieben."

  test("golden /ner: Anton Schwarz paragraph (README.md:73-76)") {
    assert(nerScalar(anton) == Map(
      "PERSON" -> Seq("Anton Schwarz"),
      "GPE" -> Seq("Dresden"),
      "WORK_OF_ART" -> Seq("Traumwerkstadt")))
  }

  test("golden /ner: Elisabeth II. mis-split drops PERSON (README.md:84-90)") {
    assert(nerScalar(elisabeth) == Map(
      "GPE" -> Seq("Dresden"),
      "WORK_OF_ART" -> Seq("Traumwerkstadt")))
  }

  test("golden /nernosplit: PERSON recovered as 'Elisabeth II' (README.md:92-98)") {
    val got = nerNoSplitScalar(elisabeth)
    assert(got("PERSON") == Seq("Elisabeth II"))
    assert(got("GPE") == Seq("Dresden"))
    // Divergence pinned: the reference's flair model missed Traumwerkstadt
    // in this transcript ("a general problem with neural networks",
    // README.md:92); our deterministic tagger finds it.
    assert(got("WORK_OF_ART") == Seq("Traumwerkstadt"))
  }

  test("golden /nernosplit: quoted title tagged WITH quotes (README.md:96-98)") {
    val got = nerNoSplitScalar(elisabethQuoted)
    assert(got("WORK_OF_ART") == Seq("\"Traumwerkstadt\""))
    assert(got("PERSON") == Seq("Elisabeth II"))
  }

  test("G4 spans: begin/end offsets are exact") {
    val es = Tagger.tagScalar("x spark y")
    val e = es.find(_.label == "ORG").get
    assert(e.text == "spark" && e.begin == 2 && e.end == 7)
  }

  test("G4 distributed == scalar: tagMentions matches per-row tagScalar") {
    val docs = Fixtures.docsDf(200)
      .withColumn("cleaned", Text.cleanup(col("content")))
    val dist = Tagger.tagMentions(
        docs.select(col("path"), col("cleaned")), "cleaned")
      .groupBy("path", "label", "mention").count()
      .as[(String, String, String, Long)].collect().toSet
    val local = Fixtures.docs(200).flatMap { d =>
      Tagger.tagScalar(Text.cleanupScalar(d.content))
        .map(e => (d.path, e.label, e.text))
    }.groupBy(identity).map { case (k, v) => (k._1, k._2, k._3, v.size.toLong) }.toSet
    assert(dist == local)
  }

  test("G4 literal-scan path == regexp path on randomized boundary-stress text") {
    // The shipped pattern set takes the LiteralScanner fast path; the
    // regexp_extract_all formulation is the semantics twin (and the shape
    // the DuckDB oracle always runs). Fuzz both over text built from the
    // pattern vocabulary with boundary-hostile glue: missing spaces
    // (word-boundary checks), punctuation runs, overlapping phrases
    // ("the window" vs "window"), the shape-B context ("Elisabeth II. x"),
    // quoted titles, and multi-word literals split across glue.
    val vocab = Seq("customer", "Anton Schwarz", "Elisabeth II.", "spark",
      "hash join", "merge", "stream", "vector", "Dresden", "the window",
      "window", "table scan", "\"Traumwerkstadt\"", "Traumwerkstadt", "dup",
      "sparky", "xspark", "II", "Elisabeth", "wind", "owindow", "foo")
    val glue = Seq(" ", "", ". ", " x", "x ", "? ", "_", "-")
    val rnd = new scala.util.Random(17)
    val texts = (1 to 400).map { _ =>
      (1 to (1 + rnd.nextInt(12))).map(_ =>
        vocab(rnd.nextInt(vocab.length)) + glue(rnd.nextInt(glue.length))
      ).mkString
    } :+ anton :+ elisabeth :+ elisabethQuoted
    val df = texts.zipWithIndex.toDF("t", "id")
    def rows(out: org.apache.spark.sql.DataFrame) =
      out.select("id", "label", "confidence", "mention")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
    val fast = rows(Tagger.tagMentions(df, "t"))
    val regex = rows(Tagger.tagMentionsRegex(Tagger.patterns)(df, "t"))
    assert(fast == regex)
    assert(fast.nonEmpty)
  }

  test("G4 literal-scan: per-row emission order is pattern-major, position-minor") {
    // exact array parity (order included) with the flatten(per-pattern
    // regexp_extract_all) formulation, on the golden paragraphs
    val df = Seq(anton, elisabeth, elisabethQuoted).toDF("t")
    val scanner = graft.expressions.LiteralScanner.forPatterns(Tagger.patterns).get
    val viaScan = df.select(
        graft.expressions.TagMentions.tag_mentions(col("t"), scanner).as("es"))
      .selectExpr("transform(es, e -> concat(e.label, ':', e.mention))")
      .as[Seq[String]].collect().toSeq
    val viaRegex = df.select(flatten(array(Tagger.patterns.map { p =>
        transform(regexp_extract_all(col("t"), lit(p.regex), lit(p.group)),
          m => struct(lit(p.label).as("label"),
            lit(p.confidence).as("confidence"), m.as("mention")))
      }: _*)).as("es"))
      .selectExpr("transform(es, e -> concat(e.label, ':', e.mention))")
      .as[Seq[String]].collect().toSeq
    assert(viaScan == viaRegex)
    assert(viaScan.exists(_.nonEmpty))
  }

  test("G4 span kernel == span UDF: rows, spans, and order on boundary-stress text") {
    // TagSpans (the native literal-scan kernel behind g4_spans since r8)
    // against its parity twin tagWithSpansUdf (= per-row tagScalar, real
    // java.util.regex): EXACT array equality per row — text, label,
    // confidence, begin/end offsets, and emission order. Same
    // boundary-hostile fuzz recipe as the mention-path spec above, plus
    // the span-sensitive edges (shape-B context group, overlap chains,
    // adjacent matches with no glue).
    val vocab = Seq("customer", "Anton Schwarz", "Elisabeth II.", "spark",
      "hash join", "merge", "stream", "vector", "Dresden", "the window",
      "window", "table scan", "\"Traumwerkstadt\"", "Traumwerkstadt", "dup",
      "sparky", "xspark", "II", "Elisabeth", "wind", "owindow", "foo")
    val glue = Seq(" ", "", ". ", " x", "x ", "? ", "_", "-")
    val rnd = new scala.util.Random(29)
    val texts = (1 to 400).map { _ =>
      (1 to (1 + rnd.nextInt(12))).map(_ =>
        vocab(rnd.nextInt(vocab.length)) + glue(rnd.nextInt(glue.length))
      ).mkString
    } ++ Seq(anton, elisabeth, elisabethQuoted, "Elisabeth II. x",
      "Elisabeth II.x", "the window window window", "window", "")
    val df = texts.zipWithIndex.toDF("t", "id")
    val scanner = graft.expressions.LiteralScanner.forPatterns(Tagger.patterns).get
    def dump(c: org.apache.spark.sql.Column): Seq[(Int, Seq[String])] =
      df.select(col("id"), c.as("es"))
        .selectExpr("id", "transform(es, e -> concat_ws('|', e.text, e.label, " +
          "CAST(e.confidence AS STRING), CAST(e.begin AS STRING), " +
          "CAST(e.end AS STRING)))")
        .as[(Int, Seq[String])].collect().sortBy(_._1).toSeq
    val viaKernel = dump(graft.expressions.TagSpans.tag_spans(col("t"), scanner))
    val viaUdf = dump(Tagger.tagWithSpansUdf(spark)(col("t")))
    assert(viaKernel == viaUdf)
    assert(viaKernel.exists(_._2.nonEmpty))
    // null text: kernel yields a null array, UDF an empty one — identical
    // after the explode both call sites apply (zero surviving rows each)
    val nullDf = Seq((1, null: String)).toDF("id", "t")
    def exploded(c: org.apache.spark.sql.Column): Long =
      nullDf.select(explode(c.as("es"))).count()
    assert(exploded(graft.expressions.TagSpans.tag_spans(col("t"), scanner)) == 0L)
    assert(exploded(Tagger.tagWithSpansUdf(spark)(col("t"))) == 0L)
  }

  test("P4 threshold boundary: conf >= 0.95 kept, 0.90 dropped (middleware.py:62)") {
    val rows = Seq(
      ("d1", "A", "x", 0.95), ("d1", "B", "y", 0.9499999), ("d1", "C", "z", 0.90))
      .toDF("doc", "label", "mention", "confidence")
    val kept = Middleware.entityGroups(rows, Seq("doc"))
      .select("label").as[String].collect().toSet
    assert(kept == Set("A"))
  }

  test("A1 set semantics: duplicate mentions collapse; output sorted") {
    val rows = Seq(
      ("d1", "PERSON", "b", 0.99), ("d1", "PERSON", "a", 0.99),
      ("d1", "PERSON", "b", 0.99))
      .toDF("doc", "label", "mention", "confidence")
    val ents = Middleware.entityGroups(rows, Seq("doc"))
      .select("entities").as[Seq[String]].collect().head
    assert(ents == Seq("a", "b"))
  }

  test("A1 invariant: entity map unchanged under sentence permutation") {
    val doc = Fixtures.docs(1, seed = 99).head
    val sents = Splitter.splitScalar(doc.content)
    val perm = new scala.util.Random(3).shuffle(sents)
    def mapOf(ss: Seq[String]) = ss.flatMap(Tagger.tagScalar)
      .filter(_.confidence >= Tagger.threshold)
      .groupBy(_.label).view.mapValues(_.map(_.text).distinct.sorted).toMap
    assert(mapOf(sents) == mapOf(perm))
  }

  test("A2 sentiment: signs, unknown-label exclusion, div-by-zero -> null") {
    val rows = Seq(
      ("d1", "POSITIV", 0.8), ("d1", "NEGATIV", 0.3), ("d1", "UNKNOWN", 1.0),
      ("d2", "OTHER", 1.0), ("d2", "OFFENSE", 0.5),
      ("d3", "UNKNOWN", 1.0))
      .toDF("doc", "label", "confidence")
    val got = Middleware.sentiment(rows, Seq("doc"))
      .as[(String, Option[Double])].collect().toMap
    assert(math.abs(got("d1").get - 0.25) < 1e-12) // (0.8-0.3)/2
    assert(math.abs(got("d2").get - 0.25) < 1e-12) // (1.0-0.5)/2
    assert(got("d3").isEmpty) // reference would div-by-zero (middleware.py:41)
  }

  test("G5 native normalize_mention == HOF chain (randomized, space-edge stress)") {
    // the fused expression must reproduce the HOF chain exactly, INCLUDING
    // Spark split's kept empty tokens: leading/trailing/double spaces
    // around non-article tokens survive the rejoin.
    val words = Seq("the", "The", "a", "an", "der", "DIE", "window", "Anton",
      "Schwarz", "eine", "", "x", "Straße", "ÄÖÜ", "tablescan")
    val rnd = new scala.util.Random(23)
    val inputs = (1 to 500).map { _ =>
      (1 to (1 + rnd.nextInt(6))).map(_ => words(rnd.nextInt(words.length)))
        .mkString(" ")
    } ++ Seq("", " ", "  ", "the ", " the", "a  b", "x ", " x", "the the")
    val df = inputs.toDF("m")
    val viaExpr = df.select(Lemmatizer.normalizeMention(col("m")))
      .as[String].collect().toSeq
    val viaHof = df.select(Lemmatizer.normalizeColHof(col("m")))
      .as[String].collect().toSeq
    assert(viaExpr == viaHof)
  }

  test("G5 lemma: article tokens dropped, lowercased (middlewareServer.py:113-119)") {
    assert(Lemmatizer.normalizeScalar("The Window") == "window")
    assert(Lemmatizer.normalizeScalar("der die das Ende") == "ende")
    assert(Lemmatizer.normalizeScalar("Anton Schwarz") == "anton schwarz")
  }

  test("north rule P/R >= 0.95: engine triples vs reference-scalar tags") {
    val n = 300
    val docs = Fixtures.docsDf(n)
    val engine = graft.pipeline.KgPipeline.triples(spark, docs)
      .select("subj", "pred", "obj").as[(String, String, String)].collect().toSet

    // reference tags, row by row, translated to triple form with the same
    // linking rule (FIXTURES.md §2)
    val aliasByNorm = Tagger.aliasDict.groupBy(_.alias_norm)
    val expected = Fixtures.docs(n).flatMap { d =>
      Tagger.tagScalar(Text.cleanupScalar(d.content))
        .filter(_.confidence >= Tagger.threshold)
        .flatMap { e =>
          val norm = Lemmatizer.normalizeScalar(e.text)
          aliasByNorm.get(norm).map { cands =>
            val best = cands.map { a =>
              (a.prior + (if (a.pref_lang == d.lang) Tagger.langBonus else 0.0), a)
            }.sortBy { case (score, a) => (-score, a.entity_id) }.head._2
            (s"${d.repo}/${d.path}@${d.commit}", s"mentions:${e.label}", best.entity_id)
          }
        }
    }.toSet

    val tp = (engine & expected).size.toDouble
    val precision = tp / engine.size
    val recall = tp / expected.size
    assert(precision >= 0.95 && recall >= 0.95,
      s"P=$precision R=$recall engine=${engine.size} expected=${expected.size}")
    // in fact the deterministic twin should be exact:
    assert(engine == expected)
  }
}
