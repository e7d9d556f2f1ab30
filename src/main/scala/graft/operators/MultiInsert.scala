package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Hive multi-insert (`FROM src INSERT OVERWRITE t1 SELECT ... INSERT
  * OVERWRITE t2 SELECT ...` — reference parse/SemanticAnalyzer.java:8711
  * genBodyPlan looping over destinations).
  *
  * Spark-first: cache the source once, run one write action per
  * destination. At scale the persist level matters — MEMORY_AND_DISK_SER
  * keeps a 100 TB-derived intermediate from OOMing executors while still
  * avoiding N source re-scans.
  */
object MultiInsert {
  def fanOut(src: DataFrame,
             dests: Seq[(String, DataFrame => DataFrame)],
             append: Boolean = false): Unit = {
    val cached = src.persist(StorageLevel.MEMORY_AND_DISK_SER)
    try dests.foreach { case (path, f) =>
      f(cached).write.mode(if (append) "append" else "overwrite").parquet(path)
    }
    finally cached.unpersist()
  }
}
