package graft

/** Shared minimal JSON string escaping for the artifact sidecars the
  * driver-side tooling parses (`oracle_sql.json`, `errors.json`, …):
  * backslash, quote, and ALL control chars (< 0x20) — a tab or CR in
  * builder-authored SQL would otherwise make a downstream `json.load`
  * fail and silently zero a correctness round. One implementation so a
  * future escaping fix cannot miss one of the writers. */
object Jsons {
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
