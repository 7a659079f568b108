package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text functions (P1-P3, P7 of SURVEY.md §2), each in three forms
  * that must agree:
  *
  *  1. a Catalyst `Column` expression (whole-stage-codegen'd, the engine path),
  *  2. a plain-Scala per-row twin (the "reference-faithful row-scalar
  *     implementation" used as the P/R oracle, FIXTURES.md §2),
  *  3. a DuckDB SQL fragment (the driver's oracle dialect).
  *
  * Reference semantics: `ner_tagger/sentsplitter.py:10-18` (cleanup),
  * training notebook cell 3 (PUA strip, dateline strip),
  * `cacheServer.py:34` (key hashing; uuid5 → standardized to sha256 per the
  * BASELINE.json `sha256(content)` row invariant).
  */
object Text {

  /** Explicit whitespace class shared by Java regex and RE2 so Spark and
    * DuckDB agree byte-for-byte (`\s` differs between the two engines).
    * Covers exactly Python's `re.UNICODE` `\s` (the reference dialect,
    * `sentsplitter.py:14` `re.sub('\s{2,}', ...)`): ASCII whitespace, the
    * C1 file/group/record/unit separators, NEL, NBSP, and the Unicode
    * space separators (U+1680, U+2000-200A, U+2028/2029, U+202F, U+205F,
    * U+3000). `\x{...}` escapes parse identically in Java regex and RE2.
    */
  private[graft] val WS = "[ \\t\\n\\x0B\\f\\r\\x{1C}-\\x{1F}\\x{85}\\x{A0}" +
    "\\x{1680}\\x{2000}-\\x{200A}\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]"

  /** Exact char membership of [[WS]] (a spec asserts the two agree on the
    * whole BMP, so the regex literal and the set cannot drift apart).
    */
  private[graft] val wsChars: Set[Char] =
    Set(' ', '\t', '\n', 0x0B.toChar, '\f', '\r', 0x85.toChar, 0xA0.toChar,
      0x1680.toChar, 0x2028.toChar, 0x2029.toChar, 0x202F.toChar,
      0x205F.toChar, 0x3000.toChar) ++
      (0x1C.toChar to 0x1F.toChar) ++ (0x2000.toChar to 0x200A.toChar)

  private val wsBits: java.util.BitSet = {
    val b = new java.util.BitSet(0x3001)
    wsChars.foreach(c => b.set(c.toInt))
    b
  }

  @inline private def isWs(c: Char): Boolean = c <= 0x3000 && wsBits.get(c)

  // ---- P1: cleanup (sentsplitter.py:10-18) -------------------------------
  // Order is load-bearing and faithful to the reference: newline -> space,
  // THEN collapse runs of whitespace, THEN soft-hyphen (U+00AD) -> space.
  // (A soft hyphen followed by a space therefore leaves two spaces, exactly
  // as the reference does.)

  /** Engine path: the fused single-pass native expression
    * ([[graft.expressions.CleanupText]] → [[cleanupScalar]]); cleanup reads
    * every byte of the corpus, so the three chained regex scans of
    * [[cleanupColRegex]] are pure overhead at 10^12-file scale.
    */
  def cleanup(c: Column): Column =
    graft.expressions.CleanupText.cleanup_text(c)

  /** The literal three-pass regexp_replace chain, shape-identical to the
    * reference's re.sub sequence — kept as the parity twin the specs check
    * [[cleanup]]/[[cleanupScalar]] against.
    */
  private[graft] def cleanupColRegex(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, "\\n", " "),
        WS + "{2,}", " "),
      "­", " ")

  /** Single pass over the string, semantics byte-identical to the ordered
    * three-pass chain (randomized parity spec vs [[cleanupScalarRegex]]):
    * a whitespace RUN (≥2 chars, '\n' counts — it maps to ' ' first)
    * collapses to one ' '; a LONE whitespace char survives as itself
    * ('\n' as ' '); soft hyphens become spaces per char AFTER the collapse
    * decision (they are not whitespace, so they break runs — the pinned
    * non-idempotence quirk).
    */
  def cleanupScalar(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) {
        var j = i + 1
        while (j < n && isWs(s.charAt(j))) j += 1
        if (j - i >= 2) sb.append(' ')
        else sb.append(if (c == '\n') ' ' else c)
        i = j
      } else {
        sb.append(if (c == '­') ' ' else c)
        i += 1
      }
    }
    sb.toString
  }

  /** Reference-shaped twin of [[cleanupScalar]] (literally the three
    * re.sub passes of `sentsplitter.py:10-18`); spec-only.
    */
  private[graft] def cleanupScalarRegex(s: String): String =
    s.replace("\n", " ")
      .replaceAll(WS + "{2,}", " ")
      .replace("­", " ")

  /** DuckDB fragment computing the same cleanup over column expr `col`.
    * Generated from the same [[WS]] constant as the Spark plan — backslash
    * escapes stay literal inside SQL single-quoted strings, so the RE2
    * pattern DuckDB compiles is byte-identical to the Java one.
    */
  def cleanupSqlDuck(col: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($col, '\\n', ' ', 'g'), " +
      s"'$WS{2,}', ' ', 'g'), chr(173), ' ', 'g')"

  // ---- P2: PUA codepoint strip (notebook cell 3, remove_pua_codes) -------

  private val PUA_JAVA = "[\\uE000-\\uF8FF\\x{F0000}-\\x{FFFFD}\\x{100000}-\\x{10FFFD}]"
  private val PUA_RE2 = "[\\x{E000}-\\x{F8FF}\\x{F0000}-\\x{FFFFD}\\x{100000}-\\x{10FFFD}]"

  def puaStrip(c: Column): Column = regexp_replace(c, PUA_JAVA, "")

  def puaStripScalar(s: String): String = s.replaceAll(PUA_JAVA, "")

  def puaStripSqlDuck(col: String): String =
    s"regexp_replace($col, '$PUA_RE2', '', 'g')"

  // ---- P3: dateline strip (notebook cell 3, cleanup) ---------------------
  // split('|', 1); drop the prefix if it is shorter than 26 chars.

  def datelineStrip(c: Column): Column = {
    val prefix = element_at(split(c, "\\|", 2), 1)
    when(instr(c, "|") > 0 && length(prefix) < 26,
      element_at(split(c, "\\|", 2), 2)).otherwise(c)
  }

  def datelineStripScalar(s: String): String = {
    val i = s.indexOf('|')
    if (i >= 0 && i < 26) s.substring(i + 1) else s
  }

  def datelineStripSqlDuck(col: String): String =
    s"CASE WHEN strpos($col, '|') > 0 AND length(split_part($col, '|', 1)) < 26 " +
      s"THEN substr($col, strpos($col, '|') + 1) ELSE $col END"

  // ---- P7: content key hashing (cacheServer.py:34, uuid5 -> sha256) ------

  def sha256Hex(c: Column): Column = sha2(c.cast("string"), 256)

  def sha256HexScalar(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  def sha256SqlDuck(col: String): String = s"sha256(CAST($col AS VARCHAR))"

  // ---- reference cache-key parity (migration utility) ---------------------
  // The reference's on-disk cache key is uuid5(NAMESPACE_X500, sentence)
  // (cacheServer.py:34,66,96 — RFC 4122 v5: SHA-1 over namespace bytes +
  // UTF-8 name, version/variant bits forced). The engine standardizes on
  // sha256 for its own keys (BASELINE.json row invariant), so this exists
  // ONLY so a migration from a real reference cache file can verify and
  // re-key entries. Golden-spec'd against Python's uuid.uuid5 (DuckDB has
  // no SHA-1, so no SQL oracle is possible — TextSplitSpec pins goldens).

  /** RFC 4122 NAMESPACE_X500 = 6ba7b814-9dad-11d1-80b4-00c04fd430c8. */
  private val namespaceX500: Array[Byte] =
    Array(0x6b, 0xa7, 0xb8, 0x14, 0x9d, 0xad, 0x11, 0xd1,
      0x80, 0xb4, 0x00, 0xc0, 0x4f, 0xd4, 0x30, 0xc8).map(_.toByte)

  def uuid5X500Scalar(s: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.update(namespaceX500)
    val h = md.digest(s.getBytes("UTF-8")).take(16)
    h(6) = ((h(6) & 0x0f) | 0x50).toByte // version 5
    h(8) = ((h(8) & 0x3f) | 0x80).toByte // RFC 4122 variant
    val hex = h.map("%02x".format(_)).mkString
    s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-${hex.substring(12, 16)}-" +
      s"${hex.substring(16, 20)}-${hex.substring(20)}"
  }

  /** Column form (UDF — a migration utility outside the hot path; the
    * engine's own keys stay on the codegen'd [[sha256Hex]]).
    */
  def uuid5X500(c: Column): Column =
    udf((s: String) => if (s == null) null else uuid5X500Scalar(s))
      .apply(c.cast("string"))

  // ---- deterministic hex-prefix bucketing (O3 stratified split) ----------
  // Engine-agnostic replacement for seeded sampling: the first two hex chars
  // of sha256(key) give a uniform [0,256) bucket identical in Spark & DuckDB.

  def hexBucket(c: Column): Column =
    conv(substring(sha2(c.cast("string"), 256), 1, 2), 16, 10).cast("int")

  def hexBucketSqlDuck(col: String): String =
    s"(strpos('0123456789abcdef', substr(sha256(CAST($col AS VARCHAR)), 1, 1)) - 1) * 16 + " +
      s"(strpos('0123456789abcdef', substr(sha256(CAST($col AS VARCHAR)), 2, 1)) - 1)"
}
