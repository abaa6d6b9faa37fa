package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** The dump loop, separated from `main` so the failure path is testable
    * without `sys.exit` (VerifySabotageSpec poisons the query map and
    * asserts errors.json + the nonzero verdict). Returns the per-query
    * error map — empty means a clean run.
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      only: Set[String],
      queries: Map[String, (SparkSession, String) => DataFrame],
      oracleSql: Map[String, String]): Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    // A thrown query must NOT silently vanish from the round's artifact
    // (r9: 10 queries threw, the driver's correctness JSON shrank 125→115
    // and read as all-green). Every failure lands in errors.json beside
    // the parquet dumps, and the process exits non-zero.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    queries
      .filter { case (name, _) => only.isEmpty || only.exists(name.contains) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}".take(500)
        errors(name) = msg
        System.err.println(s"[verify] FAILED $name: $msg")
      }
      // release this query's localCheckpoint blocks — see
      // [[GraftSession.sweepPersisted]]
      GraftSession.sweepPersisted(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(
        s"[verify] ${errors.size} QUERIES FAILED: ${errors.keys.mkString(", ")}")
    errors.toMap
  }

  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [nameSubstring...] — the optional filters are a
    // local-iteration convenience; the driver always calls with exactly two
    val spark = GraftSession.local()
    val errors = run(spark, args(0), args(1), args.drop(2).toSet,
      SparkEntry.queries, SparkEntry.oracleSql)
    spark.stop()
    // All artifacts are written by this point (good dumps + oracle_sql.json
    // + errors.json), so a red exit code costs the driver nothing and makes
    // a regression unmissable: scream AND exit non-zero.
    if (errors.nonEmpty) sys.exit(1)
  }
}
