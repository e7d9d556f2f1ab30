package graft

import graft.operators.{Dedup, GlobalRank}
import graft.tools.Checkpoints
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Round-5 hygiene pins: localCheckpoint storage must not outlive the
  * operator (superseded generations) or the query (final result — swept by
  * the harness), and the global distribution functions must not rescan the
  * input for the total row count.
  */
class Round5Spec extends SparkSpec {
  import spark.implicits._

  private def persistentCount: Int = spark.sparkContext.getPersistentRDDs.size

  test("clusters releases superseded checkpoints; sweep drops the final one") {
    Checkpoints.sweep()
    val base = persistentCount
    // path graph: many iterations → many superseded generations
    val pairs = (0 until 40).map(i => (i.toLong, i.toLong + 1)).toDF("da", "db")
    Dedup.clusters(pairs).count()
    // only the final label checkpoint may still be pinned (edges and every
    // superseded generation were released inside the loop)
    assert(persistentCount <= base + 1,
      s"leaked checkpoints: ${spark.sparkContext.getPersistentRDDs.keys}")
    Checkpoints.sweep()
    assert(persistentCount == base)
  }

  test("global rank checkpoint is released by the harness sweep") {
    Checkpoints.sweep()
    val base = persistentCount
    val c = Tables.t(spark, sf, "customer").select("c_custkey", "c_acctbal")
    GlobalRank.rank(c, Seq(col("c_acctbal").desc), Seq(col("c_acctbal")),
      Seq(col("c_custkey").asc)).count()
    assert(persistentCount == base + 1)
    Checkpoints.sweep()
    assert(persistentCount == base)
  }

  test("distribution derives n from the checkpoint — no second input scan") {
    val c = Tables.t(spark, sf, "customer").select("c_custkey", "c_acctbal")
    val d = GlobalRank.distribution(c, Seq(col("c_acctbal").desc),
      Seq(col("c_acctbal")), Seq(col("c_custkey").asc), buckets = 7)
    // the parquet input is consumed exactly once, while materializing the
    // range-partitioned checkpoint; the returned plan is window arithmetic
    // over that checkpoint and must not contain a second parquet scan
    val plan = d.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("Scan parquet"), plan)
    Checkpoints.sweep()
  }
}
