package graft.io

/** Minimal JSON string quoting for the engine's hand-authored JSON
  * artifacts (index metadata, the verify harness's oracle dump).
  * Escapes backslash, quote, and ALL control chars — a column name or
  * SQL string containing any of them must round-trip through a strict
  * parser, not corrupt the document.
  */
object JsonUtil {
  /** Null-safe: a null string renders as JSON `null`, so callers that
    * group arbitrary user parquet by a nullable column (data-card's
    * lang/source) emit a valid document instead of an NPE. */
  def quote(s: String): String = if (s == null) "null" else "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
