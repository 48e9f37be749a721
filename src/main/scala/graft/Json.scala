package graft

/** Minimal JSON string quoting shared by the Verify and Bench mains —
  * escapes backslash, quote, and ALL control chars (<0x20); an unescaped
  * tab or quote would make the driver's json.load fail silently.
  */
object Json {
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
