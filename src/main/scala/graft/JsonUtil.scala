package graft

/** Shared JSON string escaping for the hand-built driver-surface JSON
  * (Verify's oracle_sql.json, Bench's one-line report). One copy:
  * backslash, quote, and ALL control chars (< 0x20) — a tab or CR in
  * builder-authored SQL or an exception message would otherwise make
  * the driver's json.load fail.
  */
object JsonUtil {
  /** String→string map as a JSON object — the oracle_sql.json shape.
    * One copy shared by Verify (what the driver gate runs) and
    * DumpOracleSql (what the type audit pre-checks): serialization drift
    * between them would make the audit check different SQL than ships.
    */
  def obj(m: Map[String, String]): String =
    m.map { case (k, v) => s"${str(k)}: ${str(v)}" }.mkString("{", ",", "}")

  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
