package org.apache.spark.sql

/** Accessor for the `private[sql]` `SparkSession.cloneSession` — graft's
  * `Engine.insertWithHiveCasts` retries a statement under Hive's permissive
  * store-assignment policy, and doing that on a CLONED session (same shared
  * catalog, snapshotted temp views + conf) keeps the override truly
  * statement-scoped instead of briefly flipping the shared session conf for
  * every concurrent statement.
  */
object GraftSessionClone {
  def cloneSession(spark: SparkSession): SparkSession = spark match {
    case c: classic.SparkSession => c.cloneSession()
    // non-classic implementations: a fresh session (shared catalog, but no
    // temp-view snapshot) is the closest available isolation
    case other => other.newSession()
  }
}
