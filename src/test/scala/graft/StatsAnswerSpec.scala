package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** StatsAnswerRule: count(*) over an ANALYZEd table answers from catalog
  * stats (plan collapses to LocalRelation); guarded queries still scan.
  * Attached through Engine.install's experimental.extraOptimizations hook
  * (the GraftExtensions class covers the spark.sql.extensions path).
  */
class StatsAnswerSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = Engine.session("local[4]", "graft-test", 4)
    s.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    s.sql("DROP TABLE IF EXISTS graft_tmp.stats_t")
    val loc = java.nio.file.Files.createTempDirectory("stats_t").toString
    Tables.t(s, "/root/testdata/sf0.001", "region")
      .write.mode("overwrite").option("path", s"$loc/t").saveAsTable("graft_tmp.stats_t")
    s.sql("ANALYZE TABLE graft_tmp.stats_t COMPUTE STATISTICS")
    s
  }

  test("count(*) answers from stats when enabled") {
    spark.conf.set("spark.graft.statsAnswer.enabled", "true")
    val df = spark.sql("SELECT count(*) AS n FROM graft_tmp.stats_t")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("LocalRelation"), s"expected stats answer, got:\n$plan")
    assert(df.head.getLong(0) == 5L)
  }

  test("disabled by default: plan still scans") {
    spark.conf.set("spark.graft.statsAnswer.enabled", "false")
    val df = spark.sql("SELECT count(*) AS n FROM graft_tmp.stats_t")
    assert(!df.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
    assert(df.head.getLong(0) == 5L)
  }

  test("filtered count never matches the rewrite") {
    spark.conf.set("spark.graft.statsAnswer.enabled", "true")
    val df = spark.sql(
      "SELECT count(*) AS n FROM graft_tmp.stats_t WHERE r_regionkey > 1")
    assert(!df.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
    assert(df.head.getLong(0) == 3L)
  }
}
