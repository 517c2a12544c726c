package graft

/** Minimal JSON string escaping shared by the Verify and Bench mains
  * (backslash, quote, and ALL control chars — a tab or CR in authored
  * SQL must not break the driver's json.load). */
private[graft] object Jsons {
  def str(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
