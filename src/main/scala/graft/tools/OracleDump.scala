package graft.tools

import java.nio.file.{Files, Paths}

/** Dev helper: dump SparkEntry.oracleSql as oracle_sql.json into a
  * directory already holding VerifyOne parquet results, so
  * `tools/check.py` can cross-check a handful of queries without a
  * full Verify pass. Usage: OracleDump <outDir>. */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val Array(outDir) = args
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
