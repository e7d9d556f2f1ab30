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

  // ---- backticked rename routes through the partition fix (advice) -----

  test("per-segment backticked rename routes through the partition fix") {
    // Spark's V1 catalog rejects names needing backticks for CONTENT
    // (hyphens/spaces fail validateName), but a statement may still
    // backtick-quote individual segments of a plain name — the old
    // regex (`?[\w.]+`? — one optional tick pair around the WHOLE name)
    // missed `db`.`tbl` / db.`tbl` and fell through to native rename,
    // whose partition locations then pointed at the old directory.
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r15_bt")
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r15_bt2")
    Engine.ddl(spark, """CREATE TABLE graft_tmp.r15_bt (k INT, p STRING)
      USING parquet PARTITIONED BY (p)""")
    Engine.ddl(spark, "SET hive.exec.dynamic.partition.mode=nonstrict")
    Engine.ddl(spark,
      "INSERT INTO graft_tmp.r15_bt PARTITION (p) SELECT 1, 'a'")
    Engine.ddl(spark,
      "ALTER TABLE `graft_tmp`.`r15_bt` RENAME TO graft_tmp.`r15_bt2`")
    // without renameWithPartitionFix the partition location still points
    // at the old directory and this reads empty
    assert(spark.table("graft_tmp.r15_bt2").count() == 1)
    Engine.ddl(spark, "DROP TABLE graft_tmp.r15_bt2")
  }

  // ---- multi-principal REVOKE is atomic (r14 advice, low) --------------

  test("REVOKE from two roles where one never held the grant is atomic") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r15_rv")
    spark.sql("CREATE TABLE graft_tmp.r15_rv (k INT) USING parquet")
    spark.sql("INSERT INTO graft_tmp.r15_rv VALUES (1)")
    withAuth {
      Engine.ddl(spark, "CREATE ROLE r15_holder")
      Engine.ddl(spark, "CREATE ROLE r15_empty")
      Engine.ddl(spark,
        "GRANT SELECT ON TABLE graft_tmp.r15_rv TO ROLE r15_holder")
      val e = intercept[Exception] {
        Engine.ddl(spark, "REVOKE SELECT ON TABLE graft_tmp.r15_rv " +
          "FROM ROLE r15_holder, ROLE r15_empty")
      }
      assert(e.getMessage.contains("Cannot find privilege to revoke"),
        e.getMessage)
      // the holder's grant survived the refused statement
      val shown = Engine.ddl(spark,
        "SHOW GRANT ROLE r15_holder ON TABLE graft_tmp.r15_rv").collect()
      assert(shown.nonEmpty, "atomicity lost: holder's grant was stripped")
      Engine.ddl(spark,
        "REVOKE SELECT ON TABLE graft_tmp.r15_rv FROM ROLE r15_holder")
      Engine.ddl(spark, "DROP ROLE r15_holder")
      Engine.ddl(spark, "DROP ROLE r15_empty")
    }
  }

  // ---- archive mid-batch failure: crisp error + rollback (task #8) -----

  test("ARCHIVE with one blocked rename surfaces 'cannot move' and rolls back") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r15_arch")
    spark.sql("""CREATE TABLE graft_tmp.r15_arch (v STRING, ds STRING, hr STRING)
      USING parquet PARTITIONED BY (ds, hr)""")
    spark.sql("INSERT INTO graft_tmp.r15_arch PARTITION (ds='d', hr='h1') VALUES ('a')")
    spark.sql("INSERT INTO graft_tmp.r15_arch PARTITION (ds='d', hr='h2') VALUES ('b')")
    val root = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier("graft_tmp.r15_arch"))
        .location).toUri.getPath
    // inject: a FILE squats on hr=h2's archive destination, so its rename
    // fails while hr=h1's succeeds — the mid-batch shape
    val blocker = java.nio.file.Paths.get(root, ".graft_archive", "ds=d", "hr=h2")
    java.nio.file.Files.createDirectories(blocker.getParent)
    java.nio.file.Files.write(blocker, "squat".getBytes)
    spark.conf.set("hive.archive.enabled", "true")
    try {
      val e = intercept[Exception] {
        Engine.ddl(spark, "ALTER TABLE graft_tmp.r15_arch ARCHIVE PARTITION (ds='d')")
      }
      // unwrapped message quality: the rename's own words, not the
      // pool's ExecutionException wrapper
      assert(e.getMessage.contains("cannot move"), e.getMessage)
      assert(!e.toString.contains("ExecutionException"), e.toString)
      // post-state: catalog untouched, table fully readable
      assert(spark.table("graft_tmp.r15_arch").count() == 2)
      // and hr=h1's completed rename was rolled back to the raw layout
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(root, "ds=d", "hr=h1")),
        "completed rename not rolled back")
      assert(!Archive_entriesNonEmpty("graft_tmp.r15_arch"),
        "failed ARCHIVE must not record archived entries")
      // clear the blocker: the retry completes and reads keep working
      java.nio.file.Files.delete(blocker)
      Engine.ddl(spark, "ALTER TABLE graft_tmp.r15_arch ARCHIVE PARTITION (ds='d')")
      assert(spark.table("graft_tmp.r15_arch").count() == 2)
      Engine.ddl(spark, "ALTER TABLE graft_tmp.r15_arch UNARCHIVE PARTITION (ds='d')")
      assert(spark.table("graft_tmp.r15_arch").count() == 2)
    } finally spark.conf.unset("hive.archive.enabled")
  }

  private def Archive_entriesNonEmpty(table: String): Boolean =
    spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
      .properties.get(operators.Archive.PropKey).exists(_.nonEmpty)

  // ---- nested CHAR strips one level down (verdict next-round #4) -------

  test("struct<char> and array<char> members read stripped, storage padded") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r15_nc")
    val loc = tools.Tmp.dir("r15_nc") + "/t"
    Engine.ddl(spark, s"""CREATE TABLE graft_tmp.r15_nc
      (st STRUCT<c: CHAR(8), s: STRING>, arr ARRAY<CHAR(6)>)
      USING parquet LOCATION '$loc'""")
    Engine.ddl(spark,
      """INSERT INTO graft_tmp.r15_nc
         SELECT named_struct('c', 'ab', 's', 'ab'), array('xy', NULL)""")
    Engine.ddl(spark, "INSERT INTO graft_tmp.r15_nc SELECT NULL, NULL")
    val r = Engine.ddl(spark, """SELECT st.c AS c, length(st.c) AS clen,
        (st.c = 'ab') AS eq, arr[0] AS a0, length(arr[0]) AS alen, arr[1] AS a1
      FROM graft_tmp.r15_nc WHERE st IS NOT NULL""").collect()
    assert(r.length == 1)
    assert(r(0).getString(0) == "ab" && r(0).getInt(1) == 2 &&
      r(0).getBoolean(2) && r(0).getString(3) == "xy" &&
      r(0).getInt(4) == 2 && r(0).isNullAt(5), r(0).toString)
    // container nulls survive the rebuild
    assert(Engine.ddl(spark,
      "SELECT count(*) AS n FROM graft_tmp.r15_nc WHERE st IS NULL AND arr IS NULL")
      .collect()(0).getLong(0) == 1)
    // storage itself stays blank-padded (raw read, engine rules bypassed
    // by reading the parquet files directly without char metadata)
    val raw = spark.read.parquet(loc)
      .where("st IS NOT NULL").selectExpr("st.c", "arr[0]").collect()(0)
    assert(raw.getString(0) == "ab      " && raw.getString(1) == "xy    ",
      s"[${raw.getString(0)}|${raw.getString(1)}]")
  }

  test("map<char> keys and values read stripped, storage padded") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r15_mc")
    val loc = tools.Tmp.dir("r15_mc") + "/t"
    Engine.ddl(spark, s"""CREATE TABLE graft_tmp.r15_mc
      (m MAP<CHAR(6), CHAR(4)>) USING parquet LOCATION '$loc'""")
    Engine.ddl(spark,
      "INSERT INTO graft_tmp.r15_mc SELECT map('ab', 'xy', 'cdef', 'z')")
    val r = Engine.ddl(spark, """SELECT m['ab'] AS v1, length(m['ab']) AS l1,
        cast(sort_array(map_keys(m)) AS string) AS ks,
        cast(sort_array(map_values(m)) AS string) AS vs
      FROM graft_tmp.r15_mc""").collect()(0)
    assert(r.getString(0) == "xy" && r.getInt(1) == 2, r.toString)
    assert(r.getString(2) == "[ab, cdef]" && r.getString(3) == "[xy, z]",
      r.toString)
    // storage stays blank-padded (raw parquet read, no char metadata)
    val raw = spark.read.parquet(loc)
      .selectExpr("cast(sort_array(map_keys(m)) AS string)").collect()(0)
    assert(raw.getString(0) == "[ab    , cdef  ]", raw.getString(0))
  }

  // ---- d08 scale instrument: pointer-doubling converges in O(log n) ----

  test("connected-components rounds grow log n, not linearly (d08 notch)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a single 64-node chain is label propagation's worst case: plain
    // min-neighbor propagation needs ~63 rounds, pointer-doubling ~log2
    val edges = (0 until 63).map(i => (i.toLong, i + 1L))
      .toDF("da", "db")
    val comp = operators.Dedup.clusters(edges)
    assert(comp.agg(countDistinct(col("cluster_id"))).collect()(0).getLong(0) == 1)
    val rounds = operators.Dedup.lastClusterIterations
    // log2(64) = 6; the +prev-carry convergence check costs one extra
    assert(rounds <= 10, s"chain of 64 took $rounds rounds — pointer " +
      "doubling is broken (linear propagation would take ~63)")
  }

  // ---- SQL-std authorizer: ownership + grant-option chains ------------

  private def withSqlStd(body: => Unit): Unit = {
    spark.conf.set("hive.security.authorization.enabled", "true")
    spark.conf.set("hive.security.authorization.manager",
      "org.apache.hadoop.hive.ql.security.authorization.plugin.sqlstd.SQLStdHiveAuthorizerFactoryForTest")
    try body
    finally {
      spark.conf.unset("hive.security.authorization.enabled")
      spark.conf.unset("hive.security.authorization.manager")
      spark.conf.unset("user.name")
    }
  }

  test("sql-std: owner grants, grant-option chains re-grant, owner drops") {
    freshDb()
    val snap = operators.Auth.snapshot(spark)
    try {
      Engine.ddl(spark, "set user.name=r15u1")
      Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r15_own")
      Engine.ddl(spark,
        "CREATE TABLE graft_tmp.r15_own (i INT) USING parquet")
      withSqlStd {
        // owner grants without holding any explicit grant
        Engine.ddl(spark, "GRANT SELECT ON TABLE graft_tmp.r15_own " +
          "TO USER r15u2 WITH GRANT OPTION")
        // the grant-option holder re-grants down the chain
        Engine.ddl(spark, "set user.name=r15u2")
        Engine.ddl(spark,
          "GRANT SELECT ON TABLE graft_tmp.r15_own TO USER r15u3")
        // a plain holder cannot re-grant (the n265 refusal)
        Engine.ddl(spark, "set user.name=r15u3")
        val e = intercept[Exception] { Engine.ddl(spark,
          "GRANT SELECT ON TABLE graft_tmp.r15_own TO USER r15u4") }
        assert(e.getMessage.contains("GRANT_PRIVILEGE"), e.getMessage)
        // the owner drops; a non-owner could not (the n267 refusal)
        Engine.ddl(spark, "set user.name=r15u1")
        Engine.ddl(spark, "DROP TABLE graft_tmp.r15_own")
      }
    } finally operators.Auth.restore(spark, snap)
  }

  // ---- Hive CHAR/VARCHAR length bounds (invalid_char_length_*.q) ------

  test("char/varchar in-range DDL and casts still pass the length guard") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r15_cl")
    Engine.ddl(spark,
      "CREATE TABLE graft_tmp.r15_cl (a CHAR(255), b VARCHAR(65535)) USING parquet")
    val r = Engine.ddl(spark,
      "SELECT CAST('x' AS CHAR(1)) AS c1, CAST('y' AS VARCHAR(1)) AS v1").collect()
    assert(r(0).getString(0) == "x" && r(0).getString(1) == "y")
  }
}
