package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write UPDATE/DELETE over a parquet table directory.
  *
  * Reference semantics: Hive rewrites UPDATE/DELETE as an insert over the
  * affected rows (ql/src/java/org/apache/hadoop/hive/ql/parse/
  * UpdateDeleteSemanticAnalyzer.java:50); the ORC ACID reader then merges
  * deltas. The Spark-first design skips the delta/merge machinery entirely
  * and does what modern lakehouse formats do in copy-on-write mode: find the
  * files that contain at least one matching row, rewrite ONLY those files
  * with the mutation applied, atomically swap them in, and leave every other
  * file untouched.
  *
  * Scale notes:
  *  - the matching-file scan pushes `cond` down to parquet, so row groups
  *    that can't match are skipped;
  *  - the only driver-side collect is the affected FILE list (metadata, not
  *    rows — same order of magnitude as a lakehouse commit log entry);
  *  - rewrite cost is proportional to affected files, not table size.
  */
object Acid {

  private val FILE = "_graft_file"

  /** UPDATE tbl SET (k -> expr)* WHERE cond, copy-on-write. */
  def updateWhere(spark: SparkSession, path: String, cond: Column,
                  set: Map[String, Column]): Unit =
    rewrite(spark, path, cond, identityKept = true, set)

  /** DELETE FROM tbl WHERE cond, copy-on-write. */
  def deleteWhere(spark: SparkSession, path: String, cond: Column): Unit =
    rewrite(spark, path, cond, identityKept = false, Map.empty)

  private def rewrite(spark: SparkSession, path: String, cond: Column,
                      identityKept: Boolean, set: Map[String, Column]): Unit = {
    val df = spark.read.parquet(path)
    val cols = df.columns
    val withFile = df.withColumn(FILE, col("_metadata.file_path"))

    // Affected-file list: metadata-sized, cond pushed down to the scan.
    val affected = withFile.filter(cond)
      .select(FILE).distinct().collect().map(_.getString(0))
    if (affected.isEmpty) return

    val survivors = withFile.filter(col(FILE).isin(affected.toSeq: _*))
    val rewritten =
      if (identityKept)
        // UPDATE: every row survives; mutated columns flip under cond
        survivors.select(cols.map { c =>
          (if (set.contains(c)) when(cond, set(c)).otherwise(col(c)) else col(c)).as(c)
        }: _*)
      else
        // DELETE: keep rows where cond is false or null (SQL semantics)
        survivors.filter(!coalesce(cond, lit(false))).select(cols.map(col): _*)

    val tmp = path.stripSuffix("/") + "_cow_" + java.util.UUID.randomUUID().toString
    rewritten.write.mode("overwrite").parquet(tmp)

    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(tmp), conf)
    try {
      val tableDir = new Path(path)
      val newFiles = fs.listStatus(new Path(tmp))
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      // swap: land the rewritten files first, then drop the stale ones —
      // a concurrent reader sees duplicates at worst, never missing files
      newFiles.foreach { st =>
        fs.rename(st.getPath,
          new Path(tableDir, "cow-" + java.util.UUID.randomUUID().toString +
            "-" + st.getPath.getName))
      }
      affected.foreach(f => fs.delete(new Path(new java.net.URI(f)), false))
    } finally fs.delete(new Path(tmp), true): Unit
  }
}
