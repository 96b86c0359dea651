package graft

import java.nio.file.{Files, Paths}

/** Writes oracle_sql.json alone (no Spark session, no query execution) so
  * a single new query can be oracle-checked without re-dumping the full
  * suite: run the query via `graft.cli.Main query <name> ...`, refresh the
  * json with this, then `tools/check_oracle.py <sf> <out> <name>`.
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val Array(outDir) = args
    new java.io.File(outDir).mkdirs()
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
