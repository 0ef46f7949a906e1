package graft.util

/** Minimal JSON string quoting shared by the Verify and Fuzz dumps.
  * Escapes backslash, quote, and ALL control chars (<0x20) — a tab or CR
  * in builder-authored SQL would otherwise make the driver's json.load
  * fail and silently zero a round's correctness. */
object JsonStr {
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
