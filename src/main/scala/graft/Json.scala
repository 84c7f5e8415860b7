package graft

/** Minimal JSON string escaping shared by the `Verify` and `Bench`
  * mains (one definition — the two had drifted apart): backslash,
  * quote, and ALL control chars (<0x20) are escaped, so a tab or CR in
  * builder-authored SQL or an exception message can never make the
  * driver's json.load fail and silently zero a round's artifacts. */
object Json {
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
