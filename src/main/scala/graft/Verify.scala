package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the product session factory, NOT a bespoke builder: the harness must
    // run under the exact configs the engine ships (UTC, ANSI off, NTZ
    // inference off, dynamic partition overwrite) — r7 lost two sweep
    // entries to a bespoke session missing one of them
    val spark = Engine.session(s"local[$cpus]", "graft-verify", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional 3rd arg: comma-separated query-name filter (local iteration
    // only — the driver always calls with exactly two args)
    val only = args.drop(2).headOption.map(_.split(",").toSet)
    // Sweep-shrink guard (r7 lesson): a query that throws at analysis or
    // execution must surface as a recorded error, never as silent absence
    // from the correctness sweep. Every name gets exactly one outcome.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        errors(name) = String.valueOf(e.getMessage).take(500)
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      tools.Checkpoints.sweep()
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
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // errors.json: name -> first 500 chars of the failure. Always written
    // (empty {} on a clean run) so its absence means "verify didn't finish",
    // not "no errors". Reconcile: every selected name has a parquet dir
    // XOR an errors entry; a mismatch is a verify bug worth failing loudly.
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    val unaccounted = selected.keySet.filter(n =>
      !errors.contains(n) && !Files.exists(Paths.get(s"$outDir/$n")))
    if (unaccounted.nonEmpty) {
      System.err.println(s"[verify] SWEEP-SHRINK: no outcome for ${unaccounted.mkString(",")}")
      spark.stop(); sys.exit(2)
    }
    System.err.println(
      s"[verify] ${selected.size} queries: ${selected.size - errors.size} written, ${errors.size} errors")
    spark.stop()
  }
}
