package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID (n-gram/marker heuristic), quality scoring, token counting
  * (whitespace + BPE-ish regex), and document fingerprinting. Everything
  * has an exact DuckDB twin; lang/quality/token are pure Catalyst, while
  * the fingerprint hot path is the native
  * [[graft.expressions.MinShingleDigest]] kernel with its declarative HOF
  * formulation kept below as [[fingerprintHof]], the spec-pinned parity
  * twin. Every division is double/double with identical operand order in
  * both engines.
  */
object TextAnalysis {

  // ---- language ID ---------------------------------------------------------

  /** Marker words per language, scored by occurrence count; argmax with
    * ties broken by this list's order (first wins).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "la", "les", "et"),
    "es" -> Seq("el", "los", "las", "y"),
    "zh" -> Seq("的", "了", "是"))

  private def markerPattern(ws: Seq[String]): String =
    ws.map(w => "\\b" + w + "\\b").mkString("|")

  def langScores(text: Column): Seq[(String, Column)] =
    langMarkers.map { case (lang, ws) =>
      lang -> size(regexp_extract_all(text, lit(markerPattern(ws)), lit(0)))
    }

  /** Predicted language: argmax of marker counts, first-listed wins ties;
    * "und" (unknown) when no marker fires at all.
    */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    pick
  }

  def langIdSqlDuck(text: String): String = {
    val scores = langMarkers.map { case (lang, ws) =>
      lang -> s"len(regexp_extract_all($text, '${markerPattern(ws)}'))"
    }
    val best = scores.map(_._2).reduceRight((a, b) => s"greatest($a, $b)")
    scores.reverse.foldLeft("'und'") { case (acc, (lang, s)) =>
      s"CASE WHEN $s = $best AND $best > 0 THEN '$lang' ELSE $acc END"
    }
  }

  // ---- token counting ------------------------------------------------------

  /** Whitespace token count. */
  def wsTokens(text: Column): Column = size(split(text, " "))

  /** BPE-ish pre-tokenizer count: letter runs, digit runs, or single
    * non-alphanumeric non-space chars (a GPT-2-style pre-tokenize regex
    * simplified to the Java/RE2-shared subset).
    */
  val bpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  def bpeTokens(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0)))

  def bpeTokensSqlDuck(text: String): String =
    s"len(regexp_extract_all($text, '$bpePattern'))"

  // ---- quality scoring -----------------------------------------------------

  /** Stopword set for the quality ratio (marker-word union). */
  val stopwords: Seq[String] = langMarkers.flatMap(_._2)

  /** Quality features + composite score in [0,1]:
    * 0.4·length-band + 0.3·(1−stopword_ratio) + 0.3·distinct_ratio.
    */
  def quality(df: DataFrame, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val nToks = size(toks).cast("double")
    val stopPat = stopwords.map(w => "\\b" + w + "\\b").mkString("|")
    val nStop = size(regexp_extract_all(col(textCol), lit(stopPat), lit(0))).cast("double")
    val nDistinct = size(array_distinct(toks)).cast("double")
    val lenBand = when(nToks >= 20 && nToks <= 2000, lit(1.0)).otherwise(lit(0.0))
    df.withColumn("n_tokens", size(toks))
      .withColumn("stop_ratio", round(nStop / nToks, 6))
      .withColumn("distinct_ratio", round(nDistinct / nToks, 6))
      .withColumn("quality_score",
        round(lenBand * 0.4 + (lit(1.0) - nStop / nToks) * 0.3
          + (nDistinct / nToks) * 0.3, 6))
  }

  def qualitySqlDuck(text: String): Seq[(String, String)] = {
    val toks = s"string_split($text, ' ')"
    val nToks = s"CAST(len($toks) AS DOUBLE)"
    val stopPat = stopwords.map(w => "\\b" + w + "\\b").mkString("|")
    val nStop = s"CAST(len(regexp_extract_all($text, '$stopPat')) AS DOUBLE)"
    val nDistinct = s"CAST(len(list_distinct($toks)) AS DOUBLE)"
    val lenBand = s"(CASE WHEN $nToks >= 20 AND $nToks <= 2000 THEN 1.0 ELSE 0.0 END)"
    Seq(
      "n_tokens" -> s"len($toks)",
      "stop_ratio" -> s"round($nStop / $nToks, 6)",
      "distinct_ratio" -> s"round($nDistinct / $nToks, 6)",
      "quality_score" -> (s"round($lenBand * 0.4 + (1.0 - $nStop / $nToks) * 0.3 " +
        s"+ ($nDistinct / $nToks) * 0.3, 6)"))
  }

  // ---- document fingerprinting ---------------------------------------------

  /** Winnowing-style fingerprint: the minimum sha256 over the document's
    * 3-word shingles (content-defined, shift-robust). Equal fingerprints ⇒
    * near-identical prefixweight content; used as a cheap first-pass dedup
    * key at scale.
    */
  def fingerprint(text: Column): Column =
    graft.expressions.MinShingleDigest.min_shingle_digest(Dedup.tokens(text))

  /** PARITY TWIN of [[fingerprint]] (declarative HOF chain) — edit kernel
    * and twin together; the randomized spec in AnalysisStreamingSpec pins
    * them equal.
    */
  private[graft] def fingerprintHof(text: Column): Column =
    // bind the token array once per row — inlining the split into the
    // shingle lambdas re-splits the string per element (Dedup.bound doc)
    Dedup.bound(Dedup.tokens(text), toks =>
      array_min(transform(Dedup.shingles(toks), s => sha2(s, 256))))

  def fingerprintSqlDuck(text: String): String = {
    val sh = Dedup.shinglesSqlDuck(s"string_split($text, ' ')")
    s"list_min(list_transform($sh, s -> sha256(s)))"
  }
}
