package graft.io

/** Minimal JSON string quoting for the engine's hand-authored JSON
  * artifacts (index metadata, the verify harness's oracle dump).
  * Escapes backslash, quote, and ALL control chars — a column name or
  * SQL string containing any of them must round-trip through a strict
  * parser, not corrupt the document.
  */
object JsonUtil {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
