package graft

import java.nio.file.{Files, Paths}

/** Shared oracle_sql.json writer for the Verify / DevCheck entry points —
  * one copy of the escaping logic the driver's json.load depends on, so a
  * future escaping fix cannot silently apply to one dump path and not the
  * other.
  */
object OracleDump {

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    */
  def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def writeOracleJson(path: String, oracle: Map[String, String]): Unit = {
    val json = oracle.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(path), json)
  }
}
