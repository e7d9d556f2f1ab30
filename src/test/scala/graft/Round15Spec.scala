package graft

/** Round-15 gates: the r14 verdict/advice findings.
  *
  *  - (verdict #3) the authorization read-path walk FAILS CLOSED: a
  *    statement Spark's analyzer rejects as written is retried through
  *    the engine's own dialect rewrites (virtual columns, bucket
  *    TABLESAMPLE ON, window dialect, ...); if it still cannot be
  *    analyzed, enforcement denies with the analysis error instead of
  *    silently skipping the Select checks. Negatives n250/n251 pin the
  *    deny side; the tests here pin the no-false-denial side — a GRANTED
  *    user's rewrite-owned query must still run under enforcement.
  */
class Round15Spec extends SparkSpec {

  private def freshDb(): Unit =
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")

  private def withAuth(body: => Unit): Unit = {
    spark.conf.set("hive.security.authorization.enabled", "true")
    try body
    finally spark.conf.unset("hive.security.authorization.enabled")
  }

  // ---- rewrite-owned reads are visible to enforcement (verdict #3) -----

  test("virtual-column SELECT is Select-gated, and granted it still runs") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r15_vc")
    spark.sql("CREATE TABLE graft_tmp.r15_vc (k INT, v STRING) USING parquet")
    spark.sql("INSERT INTO graft_tmp.r15_vc VALUES (1, 'a')")
    withAuth {
      // ungranted: the walk must SEE the read through the rewrite retry
      val e = intercept[Exception] {
        Engine.ddl(spark,
          "SELECT INPUT__FILE__NAME, v FROM graft_tmp.r15_vc")
      }
      assert(e.getMessage.contains("No privilege 'Select' found"), e.getMessage)
      // granted: the rewrite retry must not turn into a false denial
      Engine.ddl(spark, "GRANT SELECT ON TABLE graft_tmp.r15_vc TO ROLE public")
      assert(Engine.ddl(spark,
        "SELECT INPUT__FILE__NAME, v FROM graft_tmp.r15_vc").count() == 1)
      Engine.ddl(spark, "REVOKE SELECT ON TABLE graft_tmp.r15_vc FROM ROLE public")
    }
  }

  test("bucket TABLESAMPLE ON is Select-gated, and granted it still runs") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r15_ts")
    spark.sql("CREATE TABLE graft_tmp.r15_ts (k INT, v STRING) USING parquet")
    spark.sql("INSERT INTO graft_tmp.r15_ts VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    withAuth {
      val q = "SELECT v FROM graft_tmp.r15_ts TABLESAMPLE(BUCKET 1 OUT OF 2 ON k)"
      val e = intercept[Exception] { Engine.ddl(spark, q) }
      assert(e.getMessage.contains("No privilege 'Select' found"), e.getMessage)
      Engine.ddl(spark, "GRANT SELECT ON TABLE graft_tmp.r15_ts TO ROLE public")
      Engine.ddl(spark, q).collect(): Unit
      Engine.ddl(spark, "REVOKE SELECT ON TABLE graft_tmp.r15_ts FROM ROLE public")
    }
  }

  test("unanalyzable read path denies with the analysis error, not a skip") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r15_ua")
    spark.sql("CREATE TABLE graft_tmp.r15_ua (k INT) USING parquet")
    spark.sql("INSERT INTO graft_tmp.r15_ua VALUES (1)")
    withAuth {
      Engine.ddl(spark, "GRANT ALL ON TABLE graft_tmp.r15_ua TO ROLE public")
      // the subquery's column does not exist: pre-r15 the walk swallowed
      // this and enforced nothing; now the analysis error surfaces
      val e = intercept[Exception] {
        Engine.ddl(spark, """UPDATE graft_tmp.r15_ua SET k = 2
          WHERE k IN (SELECT no_such FROM graft_tmp.r15_ua)""")
      }
      val m = e.getMessage
      assert(m.contains("UNRESOLVED_COLUMN") || m.contains("cannot be resolved"), m)
      Engine.ddl(spark, "REVOKE ALL ON TABLE graft_tmp.r15_ua FROM ROLE public")
    }
    // untouched — the DML never ran
    assert(spark.table("graft_tmp.r15_ua").collect().map(_.getInt(0)).toSeq == Seq(1))
  }
}
