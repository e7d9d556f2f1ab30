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
    try {
      // materialize the cache with ONE explicit pass, then run the sink
      // writes as concurrent jobs (guide: overlap independent jobs — the
      // scheduler back-fills executors freed by one sink's tail with the
      // next sink's tasks). Without the explicit pass, concurrent sinks
      // would RACE to compute the uncached source — duplicate compute of
      // the 100 TB-derived intermediate, the exact thing the cache exists
      // to avoid. Sinks go to distinct directories, so the writes are
      // independent. Pools.runAll (r18) settles EVERY write before
      // rethrowing the first failure — no write outlives this call, so a
      // foreachBatch retry can never race a leaked overwrite into the
      // same batch directory — and runs on the shared bounded pool, not
      // the JVM-wide fork-join global.
      cached.count(): Unit
      graft.tools.Pools.runAll(dests.map { case (path, f) => () =>
        f(cached).write.mode(if (append) "append" else "overwrite").parquet(path)
      })
    }
    finally cached.unpersist()
  }
}
