package graft.tools

import org.apache.spark.SparkFiles
import org.apache.spark.sql.SparkSession

/** TRANSFORM script shipping — the reference's ADD FILE / distributed-cache
  * semantics (exec/ScriptOperator.java resolves the USING command against
  * the job's shipped local resources, not a driver path).
  *
  * Spark parity: `sc.addFile` ships the script to every executor; the
  * USING command string is evaluated by `bash -c` ON THE EXECUTOR, so the
  * returned command resolves the shipped copy at exec time. On a cluster,
  * addFile resources are fetched into the executor's working directory
  * (`./name`); in local mode they land in the SparkFiles root instead, so
  * the command falls back to that path — which in local mode is on the
  * same host by construction. No driver-only absolute path survives in the
  * primary branch.
  */
object Scripts {

  /** Ship `path` as a job resource and return a USING command that runs it
    * with `sh` (exec-bit-independent) wherever the task lands.
    */
  def ship(s: SparkSession, path: String): String = {
    s.sparkContext.addFile(path)
    val name = new java.io.File(path).getName
    // local-mode fallback: driver-side SparkFiles root (same JVM/host)
    val localRoot = SparkFiles.get(name)
    s"if [ -f ./$name ]; then exec sh ./$name; else exec sh $localRoot; fi"
  }
}
