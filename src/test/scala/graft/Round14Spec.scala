package graft

/** Round-14 gates: the r13 advisor findings.
  *
  *  - (medium) under hive.security.authorization.enabled, a TABLE-FREE
  *    derived table (`FROM (SELECT 1) t`), aliased VALUES, or table-free
  *    CTE body must NOT be treated as a read entity — the reference only
  *    authorizes real ReadEntity tables.
  *  - (low) an INSERT whose static PARTITION spec lists keys in reversed
  *    textual order must still hit the archive write-gate (spec paths
  *    compare in DECLARED column order).
  *  - (low) EXPORT TABLE reads the table's full contents and must be
  *    Select-gated under enforcement; UPDATE/DELETE WHERE-subqueries must
  *    Select-check the OTHER tables they read.
  *  - (low) a partition value containing ';' must round-trip through the
  *    graft.archived table property without splitting into bogus entries.
  *  - (carry) column-level SELECT grants never admit the write side:
  *    GRANT select(key) then INSERT must still refuse.
  */
class Round14Spec extends SparkSpec {

  private def freshDb(): Unit =
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")

  private def withAuth(body: => Unit): Unit = {
    spark.conf.set("hive.security.authorization.enabled", "true")
    try body
    finally spark.conf.unset("hive.security.authorization.enabled")
  }

  // ---- table-free derived tables under enforcement (medium) ------------

  test("enforcement skips table-free derived tables, VALUES, and CTE bodies") {
    freshDb()
    withAuth {
      // no grants held at all — these read no stored table, so they pass
      assert(Engine.ddl(spark,
        "SELECT * FROM (SELECT 1 AS a) t").count() == 1)
      assert(Engine.ddl(spark,
        "SELECT * FROM (VALUES (1), (2)) v(x)").count() == 2)
      assert(Engine.ddl(spark,
        "WITH c AS (SELECT 1 AS a UNION ALL SELECT 2) SELECT * FROM c")
        .count() == 2)
      assert(Engine.ddl(spark,
        "SELECT * FROM range(3)").count() == 3)
    }
  }

  test("enforcement still denies a REAL table wrapped in a derived table") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r14_auth_t")
    spark.sql("CREATE TABLE graft_tmp.r14_auth_t (k INT) USING parquet")
    spark.sql("INSERT INTO graft_tmp.r14_auth_t VALUES (1)")
    withAuth {
      val e = intercept[Exception] {
        Engine.ddl(spark,
          "SELECT * FROM (SELECT k FROM graft_tmp.r14_auth_t) t")
      }
      assert(e.getMessage.contains("No privilege 'Select' found"), e.getMessage)
      Engine.ddl(spark,
        "GRANT SELECT ON TABLE graft_tmp.r14_auth_t TO ROLE public")
      assert(Engine.ddl(spark,
        "SELECT * FROM (SELECT k FROM graft_tmp.r14_auth_t) t").count() == 1)
      Engine.ddl(spark,
        "REVOKE SELECT ON TABLE graft_tmp.r14_auth_t FROM ROLE public")
    }
  }

  // ---- EXPORT is Select-gated (low) -------------------------------------

  test("EXPORT TABLE is denied without Select and admitted with it") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r14_exp")
    spark.sql("CREATE TABLE graft_tmp.r14_exp (k INT) USING parquet")
    spark.sql("INSERT INTO graft_tmp.r14_exp VALUES (1), (2)")
    val dir = java.nio.file.Files.createTempDirectory("r14exp").toString
    new java.io.File(dir).delete() // EXPORT wants a fresh target
    withAuth {
      val e = intercept[Exception] {
        Engine.ddl(spark, s"EXPORT TABLE graft_tmp.r14_exp TO '$dir'")
      }
      assert(e.getMessage.contains("No privilege 'Select' found"), e.getMessage)
      Engine.ddl(spark, "GRANT SELECT ON TABLE graft_tmp.r14_exp TO ROLE public")
      Engine.ddl(spark, s"EXPORT TABLE graft_tmp.r14_exp TO '$dir'")
      assert(new java.io.File(dir).exists, "export must have run after grant")
      Engine.ddl(spark, "REVOKE SELECT ON TABLE graft_tmp.r14_exp FROM ROLE public")
    }
  }

  test("a column-only Select grant does not cover EXPORT's full-table read") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r14_expc")
    spark.sql("CREATE TABLE graft_tmp.r14_expc (k INT, v STRING) USING parquet")
    spark.sql("INSERT INTO graft_tmp.r14_expc VALUES (1, 'a')")
    val dir = java.nio.file.Files.createTempDirectory("r14expc").toString
    new java.io.File(dir).delete()
    withAuth {
      Engine.ddl(spark,
        "GRANT SELECT(k) ON TABLE graft_tmp.r14_expc TO ROLE public")
      val e = intercept[Exception] {
        Engine.ddl(spark, s"EXPORT TABLE graft_tmp.r14_expc TO '$dir'")
      }
      assert(e.getMessage.contains("No privilege 'Select' found"), e.getMessage)
      Engine.ddl(spark,
        "REVOKE SELECT(k) ON TABLE graft_tmp.r14_expc FROM ROLE public")
    }
  }

  // ---- UPDATE/DELETE WHERE-subquery reads are gated (low) ---------------

  test("DELETE with a subquery over an ungranted table is denied") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r14_del_t")
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r14_del_s")
    spark.sql("CREATE TABLE graft_tmp.r14_del_t (k INT) USING parquet")
    spark.sql("CREATE TABLE graft_tmp.r14_del_s (k INT) USING parquet")
    spark.sql("INSERT INTO graft_tmp.r14_del_t VALUES (1), (2)")
    spark.sql("INSERT INTO graft_tmp.r14_del_s VALUES (1)")
    withAuth {
      Engine.ddl(spark, "GRANT ALL ON TABLE graft_tmp.r14_del_t TO ROLE public")
      val e = intercept[Exception] {
        Engine.ddl(spark, """DELETE FROM graft_tmp.r14_del_t
          WHERE k IN (SELECT k FROM graft_tmp.r14_del_s)""")
      }
      assert(e.getMessage.contains("No privilege 'Select' found") &&
        e.getMessage.contains("r14_del_s"), e.getMessage)
      Engine.ddl(spark, "GRANT SELECT ON TABLE graft_tmp.r14_del_s TO ROLE public")
      Engine.ddl(spark, """DELETE FROM graft_tmp.r14_del_t
        WHERE k IN (SELECT k FROM graft_tmp.r14_del_s)""")
      Engine.ddl(spark, "REVOKE SELECT ON TABLE graft_tmp.r14_del_s FROM ROLE public")
      Engine.ddl(spark, "REVOKE ALL ON TABLE graft_tmp.r14_del_t FROM ROLE public")
    }
    assert(spark.table("graft_tmp.r14_del_t").count() == 1)
  }

  test("UPDATE with a subquery over an ungranted table is denied") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r14_upd_t")
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r14_upd_s")
    spark.sql("CREATE TABLE graft_tmp.r14_upd_t (k INT, v STRING) USING parquet")
    spark.sql("CREATE TABLE graft_tmp.r14_upd_s (k INT) USING parquet")
    spark.sql("INSERT INTO graft_tmp.r14_upd_t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft_tmp.r14_upd_s VALUES (2)")
    withAuth {
      Engine.ddl(spark, "GRANT ALL ON TABLE graft_tmp.r14_upd_t TO ROLE public")
      val e = intercept[Exception] {
        Engine.ddl(spark, """UPDATE graft_tmp.r14_upd_t SET v = 'x'
          WHERE k IN (SELECT k FROM graft_tmp.r14_upd_s)""")
      }
      assert(e.getMessage.contains("No privilege 'Select' found") &&
        e.getMessage.contains("r14_upd_s"), e.getMessage)
      Engine.ddl(spark, "REVOKE ALL ON TABLE graft_tmp.r14_upd_t FROM ROLE public")
    }
  }

  test("SELECT with an IN-subquery Select-checks the subquery's table too") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r14_sq_t")
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r14_sq_s")
    spark.sql("CREATE TABLE graft_tmp.r14_sq_t (k INT) USING parquet")
    spark.sql("CREATE TABLE graft_tmp.r14_sq_s (k INT) USING parquet")
    spark.sql("INSERT INTO graft_tmp.r14_sq_t VALUES (1), (2)")
    spark.sql("INSERT INTO graft_tmp.r14_sq_s VALUES (2)")
    withAuth {
      Engine.ddl(spark, "GRANT SELECT ON TABLE graft_tmp.r14_sq_t TO ROLE public")
      val e = intercept[Exception] {
        Engine.ddl(spark, """SELECT k FROM graft_tmp.r14_sq_t
          WHERE k IN (SELECT k FROM graft_tmp.r14_sq_s)""")
      }
      assert(e.getMessage.contains("No privilege 'Select' found") &&
        e.getMessage.contains("r14_sq_s"), e.getMessage)
      Engine.ddl(spark, "GRANT SELECT ON TABLE graft_tmp.r14_sq_s TO ROLE public")
      assert(Engine.ddl(spark, """SELECT k FROM graft_tmp.r14_sq_t
        WHERE k IN (SELECT k FROM graft_tmp.r14_sq_s)""").count() == 1)
      Engine.ddl(spark, "REVOKE SELECT ON TABLE graft_tmp.r14_sq_t FROM ROLE public")
      Engine.ddl(spark, "REVOKE SELECT ON TABLE graft_tmp.r14_sq_s FROM ROLE public")
    }
  }

  // ---- column-level grant never admits the write side (carry) -----------

  test("GRANT select(key) does not admit INSERT (write stays table-level)") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r14_colw")
    spark.sql("CREATE TABLE graft_tmp.r14_colw (k INT, v STRING) USING parquet")
    spark.sql("INSERT INTO graft_tmp.r14_colw VALUES (1, 'a')")
    withAuth {
      Engine.ddl(spark,
        "GRANT SELECT(k) ON TABLE graft_tmp.r14_colw TO ROLE public")
      val e = intercept[Exception] {
        Engine.ddl(spark, "INSERT INTO graft_tmp.r14_colw VALUES (2, 'b')")
      }
      assert(e.getMessage.contains("No privilege 'Insert' found"), e.getMessage)
      Engine.ddl(spark,
        "REVOKE SELECT(k) ON TABLE graft_tmp.r14_colw FROM ROLE public")
    }
    assert(spark.table("graft_tmp.r14_colw").count() == 1)
  }

  // ---- jar-UDF lifecycle hardening ----------------------------------------

  private val fixtureJar = new java.io.File(
    "src/test/resources/jars/graft-hiveudf.jar").getAbsolutePath

  test("@UDFType(stateful) jar UDF advances per row and never folds") {
    import scala.jdk.CollectionConverters._
    Tables.views(spark, sf, "nation")
    spark.table("nation").repartition(1)
      .createOrReplaceTempView("r14_nation_one_part")
    Engine.ddl(spark, "DROP TEMPORARY FUNCTION IF EXISTS r14_seq")
    Engine.ddl(spark,
      s"CREATE TEMPORARY FUNCTION r14_seq AS 'graftjar.StatefulSeq' USING JAR '$fixtureJar'")
    // single partition: ONE instance sees every row, so the sequence is
    // exactly 1..25 — constant folding or CSE sharing would collapse it
    val vals = Engine.ddl(spark,
      "SELECT r14_seq() AS s FROM r14_nation_one_part")
      .collect().map(_.getLong(0)).sorted
    assert(vals.toSeq == (1L to 25L), vals.mkString(","))
    // the expression must report non-deterministic (the reference's
    // isStateful -> non-deterministic rule keeps the optimizer honest)
    val det = Engine.ddl(spark, "SELECT r14_seq() AS s FROM r14_nation_one_part")
      .queryExecution.analyzed.expressions.forall(_.deterministic)
    assert(!det, "stateful UDF reported deterministic")
  }

  test("GenericUDF.close() fires at partition end (jar CloseMarker)") {
    import scala.jdk.CollectionConverters._
    Tables.views(spark, sf, "nation")
    Engine.ddl(spark, "DROP TEMPORARY FUNCTION IF EXISTS r14_close")
    Engine.ddl(spark,
      s"CREATE TEMPORARY FUNCTION r14_close AS 'graftjar.CloseMarker' USING JAR '$fixtureJar'")
    val marker = java.nio.file.Files.createTempFile("r14close", ".txt")
    java.nio.file.Files.delete(marker)
    val out = Engine.ddl(spark,
      s"SELECT r14_close('$marker', n_name) AS v FROM nation").collect()
    assert(out.length == 25 && out.forall(!_.isNullAt(0)))
    assert(java.nio.file.Files.exists(marker),
      "close() never ran — the task-completion hook is dead")
    val lines = java.nio.file.Files.readAllLines(marker)
    assert(lines.size() > 0 && lines.asScala.forall(_.startsWith("closed:")),
      lines.asScala.mkString("|"))
    // every row was seen by exactly one closed instance
    assert(lines.asScala.map(_.stripPrefix("closed:").toLong).sum == 25L,
      lines.asScala.mkString("|"))
  }

  // ---- archive spec-path ordering (low) ----------------------------------

  test("reversed-order PARTITION spec still hits the archive write-gate") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r14_arch_ord")
    spark.sql("""CREATE TABLE graft_tmp.r14_arch_ord (v STRING, ds STRING, hr STRING)
      USING parquet PARTITIONED BY (ds, hr)""")
    spark.sql(
      "INSERT INTO graft_tmp.r14_arch_ord PARTITION (ds='x', hr='1') VALUES ('a')")
    spark.conf.set("hive.archive.enabled", "true")
    try {
      Engine.ddl(spark,
        "ALTER TABLE graft_tmp.r14_arch_ord ARCHIVE PARTITION (ds='x')")
      // the spec keys in REVERSED textual order name the same partition —
      // it must conflict, not silently write into the relocated subtree
      val e = intercept[Exception] {
        Engine.ddl(spark, """INSERT INTO graft_tmp.r14_arch_ord
          PARTITION (hr='1', ds='x') VALUES ('evil')""")
      }
      assert(e.getMessage.contains("conflict with existing archive"), e.getMessage)
      assert(spark.table("graft_tmp.r14_arch_ord").count() == 1)
      Engine.ddl(spark,
        "ALTER TABLE graft_tmp.r14_arch_ord UNARCHIVE PARTITION (ds='x')")
    } finally spark.conf.unset("hive.archive.enabled")
  }

  // ---- archive at partition scale -----------------------------------------

  test("ARCHIVE of a spec covering 1000 partitions is metadata-sized") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r14_arch_1k")
    spark.sql("""CREATE TABLE graft_tmp.r14_arch_1k (v INT, ds STRING, hr INT)
      USING parquet PARTITIONED BY (ds, hr)""")
    spark.conf.set("hive.exec.dynamic.partition.mode", "nonstrict")
    // one dynamic insert creates 1000 leaf partitions under ds='x'
    spark.sql("""INSERT INTO graft_tmp.r14_arch_1k
      SELECT CAST(id AS INT), 'x', CAST(id AS INT) FROM range(1000)""")
    assert(spark.sql("SHOW PARTITIONS graft_tmp.r14_arch_1k").count() == 1000)
    spark.conf.set("hive.archive.enabled", "true")
    try {
      val t0 = System.nanoTime()
      Engine.ddl(spark, "ALTER TABLE graft_tmp.r14_arch_1k ARCHIVE PARTITION (ds='x')")
      val archSec = (System.nanoTime() - t0) / 1e9
      // metadata-sized: concurrent renames + ONE batched alterPartitions.
      // 60 s is an order-of-magnitude guard, not a benchmark — local FS
      // measures ~1-2 s (recorded in PERF.md round 14)
      assert(archSec < 60.0, f"ARCHIVE of 1000 partitions took $archSec%.1f s")
      assert(operators.Archive.entriesOf(spark, "graft_tmp.r14_arch_1k") == Seq("ds=x"))
      // reads still see every row through the relocated locations
      assert(spark.table("graft_tmp.r14_arch_1k").count() == 1000)
      val t1 = System.nanoTime()
      Engine.ddl(spark, "ALTER TABLE graft_tmp.r14_arch_1k UNARCHIVE PARTITION (ds='x')")
      val unSec = (System.nanoTime() - t1) / 1e9
      assert(unSec < 60.0, f"UNARCHIVE of 1000 partitions took $unSec%.1f s")
      assert(spark.table("graft_tmp.r14_arch_1k").count() == 1000)
      info(f"archive=$archSec%.2f s unarchive=$unSec%.2f s (1000 partitions)")
    } finally {
      spark.conf.unset("hive.archive.enabled")
      spark.conf.unset("hive.exec.dynamic.partition.mode")
    }
  }

  // ---- ';' in a partition value round-trips archive bookkeeping (low) ----

  test("partition value containing ';' round-trips archive entries") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r14_arch_semi")
    spark.sql("""CREATE TABLE graft_tmp.r14_arch_semi (v STRING, ds STRING)
      USING parquet PARTITIONED BY (ds)""")
    spark.sql(
      "INSERT INTO graft_tmp.r14_arch_semi PARTITION (ds='a;b') VALUES ('x')")
    spark.sql(
      "INSERT INTO graft_tmp.r14_arch_semi PARTITION (ds='plain') VALUES ('y')")
    spark.conf.set("hive.archive.enabled", "true")
    try {
      Engine.ddl(spark,
        "ALTER TABLE graft_tmp.r14_arch_semi ARCHIVE PARTITION (ds='a;b')")
      // ONE entry, not two bogus halves: a second archive on the other
      // partition must succeed, and the archived one must still read
      assert(operators.Archive.entriesOf(spark, "graft_tmp.r14_arch_semi")
        .size == 1)
      assert(spark.table("graft_tmp.r14_arch_semi").count() == 2)
      // the write-gate sees the true spec
      val e = intercept[Exception] {
        Engine.ddl(spark, """INSERT INTO graft_tmp.r14_arch_semi
          PARTITION (ds='a;b') VALUES ('z')""")
      }
      assert(e.getMessage.contains("conflict with existing archive"), e.getMessage)
      // unarchive restores cleanly (bookkeeping didn't corrupt)
      Engine.ddl(spark,
        "ALTER TABLE graft_tmp.r14_arch_semi UNARCHIVE PARTITION (ds='a;b')")
      assert(operators.Archive.entriesOf(spark, "graft_tmp.r14_arch_semi").isEmpty)
      Engine.ddl(spark, """INSERT INTO graft_tmp.r14_arch_semi
        PARTITION (ds='a;b') VALUES ('z')""")
      assert(spark.table("graft_tmp.r14_arch_semi").count() == 3)
    } finally spark.conf.unset("hive.archive.enabled")
  }

  // ---- role hierarchy (SQLStd role-to-role grants) ----------------------
  // Reference: SQLStdHiveAccessController expands getCurrentRoles
  // transitively (clientpositive/authorization_rolehierarchy_privs.q);
  // grant-time guards refuse unknown targets and cycles
  // (clientnegative/authorization_role_grant_nosuchrole.q, role_cycles1/2.q).

  test("privileges flow transitively through role-to-role grants") {
    freshDb()
    spark.sql("DROP TABLE IF EXISTS graft_tmp.r14_hier")
    spark.sql("CREATE TABLE graft_tmp.r14_hier (k INT) USING parquet")
    spark.sql("INSERT INTO graft_tmp.r14_hier VALUES (1), (2)")
    Engine.ddl(spark, "CREATE ROLE r14h_leaf")
    Engine.ddl(spark, "CREATE ROLE r14h_mid")
    Engine.ddl(spark, "GRANT SELECT ON TABLE graft_tmp.r14_hier TO ROLE r14h_leaf")
    // public -> r14h_mid -> r14h_leaf: the session user holds public
    // implicitly, so the Select grant must reach through TWO hops
    Engine.ddl(spark, "GRANT ROLE r14h_leaf TO ROLE r14h_mid")
    Engine.ddl(spark, "GRANT ROLE r14h_mid TO ROLE public")
    withAuth {
      assert(Engine.ddl(spark, "SELECT k FROM graft_tmp.r14_hier").count() == 2)
      // cutting the middle link severs the inherited privilege
      Engine.ddl(spark, "REVOKE ROLE r14h_leaf FROM ROLE r14h_mid")
      val e = intercept[Exception] {
        Engine.ddl(spark, "SELECT k FROM graft_tmp.r14_hier").collect()
      }
      assert(e.getMessage.contains("No privilege 'Select' found"), e.getMessage)
    }
  }

  test("GRANT ROLE to a role that does not exist is refused") {
    Engine.ddl(spark, "CREATE ROLE r14h_orphan")
    val e = intercept[Exception] {
      Engine.ddl(spark, "GRANT ROLE r14h_orphan TO ROLE r14h_nosuchrole")
    }
    assert(e.getMessage.toLowerCase.contains("cannot find role"), e.getMessage)
  }

  test("role-to-role grants refuse cycles, direct and transitive") {
    Engine.ddl(spark, "CREATE ROLE r14h_c1")
    Engine.ddl(spark, "CREATE ROLE r14h_c2")
    Engine.ddl(spark, "CREATE ROLE r14h_c3")
    Engine.ddl(spark, "GRANT ROLE r14h_c1 TO ROLE r14h_c2")
    Engine.ddl(spark, "GRANT ROLE r14h_c2 TO ROLE r14h_c3")
    // direct 2-cycle
    val e1 = intercept[Exception] {
      Engine.ddl(spark, "GRANT ROLE r14h_c2 TO ROLE r14h_c1")
    }
    assert(e1.getMessage.contains("no cycles allowed"), e1.getMessage)
    // 3-deep cycle (role_cycles2.q shape)
    val e2 = intercept[Exception] {
      Engine.ddl(spark, "GRANT ROLE r14h_c3 TO ROLE r14h_c1")
    }
    assert(e2.getMessage.contains("no cycles allowed"), e2.getMessage)
    // self-grant
    val e3 = intercept[Exception] {
      Engine.ddl(spark, "GRANT ROLE r14h_c1 TO ROLE r14h_c1")
    }
    assert(e3.getMessage.contains("no cycles allowed"), e3.getMessage)
  }

  // ---- CHAR trailing-pad semantics at the read boundary -----------------
  // Reference: PrimitiveObjectInspectorUtils.getString CHAR case ("when
  // converting from char to string/varchar, strip any trailing spaces"),
  // HiveChar.getCharacterLength/compareTo on the stripped value;
  // clientpositive/char_udf1.q pins concat/upper/length equality with
  // string-typed twin columns. Spark pads char on read; the
  // HiveSemantics.CharStripReads rule restores the stripped view.

  test("char columns read stripped: concat/upper/length match string twins") {
    freshDb()
    spark.sql("DROP TABLE IF EXISTS graft_tmp.r14_char")
    spark.sql("""CREATE TABLE graft_tmp.r14_char
      (c1 STRING, c2 STRING, c3 CHAR(10), c4 CHAR(20)) USING parquet""")
    spark.sql("""INSERT INTO graft_tmp.r14_char
      VALUES ('238', 'val_238', '238', 'val_238')""")
    val r = Engine.ddl(spark, """SELECT
        concat(c1, c2) = concat(c3, c4) AS cat_eq,
        upper(c2) = upper(c4) AS up_eq,
        length(c2) AS slen, length(c4) AS clen
      FROM graft_tmp.r14_char""").collect()(0)
    assert(r.getBoolean(0), "concat over char must equal the string twin")
    assert(r.getBoolean(1), "upper over char must equal the string twin")
    assert(r.getInt(2) == 7 && r.getInt(3) == 7,
      s"length(char) counts the stripped value (got ${r.getInt(3)})")
  }

  test("char-vs-string-literal comparison uses the stripped value") {
    freshDb()
    spark.sql("DROP TABLE IF EXISTS graft_tmp.r14_charc")
    spark.sql("CREATE TABLE graft_tmp.r14_charc (c CHAR(10)) USING parquet")
    spark.sql("INSERT INTO graft_tmp.r14_charc VALUES ('abc')")
    // Hive converts the char side to string by STRIPPING, so the padded
    // literal does NOT match and the bare literal does
    val r = Engine.ddl(spark, """SELECT
        c = 'abc' AS bare, c = 'abc       ' AS padded
      FROM graft_tmp.r14_charc""").collect()(0)
    assert(r.getBoolean(0), "bare literal must match")
    assert(!r.getBoolean(1), "pad-length literal must NOT match (Hive strips)")
  }

  test("char join keys of different declared lengths match on content") {
    freshDb()
    spark.sql("DROP TABLE IF EXISTS graft_tmp.r14_chj1")
    spark.sql("DROP TABLE IF EXISTS graft_tmp.r14_chj2")
    spark.sql("CREATE TABLE graft_tmp.r14_chj1 (c CHAR(10)) USING parquet")
    spark.sql("CREATE TABLE graft_tmp.r14_chj2 (c CHAR(20)) USING parquet")
    spark.sql("INSERT INTO graft_tmp.r14_chj1 VALUES ('k1'), ('k2')")
    spark.sql("INSERT INTO graft_tmp.r14_chj2 VALUES ('k1'), ('k3')")
    assert(Engine.ddl(spark,
      """SELECT a.c FROM graft_tmp.r14_chj1 a
         JOIN graft_tmp.r14_chj2 b ON a.c = b.c""").count() == 1)
    // storage stays padded (write-side check) — a fresh raw read without
    // the engine session would still see char(10)-padded bytes; the
    // stripped view is the READ semantic, so round-trip inserts keep
    // matching
    spark.sql("""INSERT INTO graft_tmp.r14_chj2
      SELECT c FROM graft_tmp.r14_chj1 WHERE c = 'k2'""")
    assert(Engine.ddl(spark,
      """SELECT a.c FROM graft_tmp.r14_chj1 a
         JOIN graft_tmp.r14_chj2 b ON a.c = b.c""").count() == 2)
  }

  // ---- ALTER TABLE RENAME keeps partitioned data readable ---------------
  // Spark's InMemoryCatalog re-roots partition locations on table rename
  // but re-escapes already-escaped segments, so a partition value that
  // needed escaping (':' -> %3A) reads EMPTY after the rename. The engine
  // recomputes partition locations from their specs (alter3.q's
  // 'test_part:' values are exactly this probe).

  test("RENAME of a partitioned table with escaped partition values keeps data") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r14_ren2")
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r14_ren1")
    spark.sql("""CREATE TABLE graft_tmp.r14_ren1 (col1 STRING)
      USING parquet PARTITIONED BY (p STRING)""")
    spark.sql("""INSERT INTO graft_tmp.r14_ren1 PARTITION (p='test_part:')
      VALUES ('a'), ('b')""")
    spark.sql("""INSERT INTO graft_tmp.r14_ren1 PARTITION (p='plain')
      VALUES ('c')""")
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.r14_ren1 RENAME TO graft_tmp.r14_ren2")
    assert(spark.table("graft_tmp.r14_ren2").count() == 3)
    assert(Engine.ddl(spark,
      "SELECT * FROM graft_tmp.r14_ren2 WHERE p = 'test_part:'").count() == 2)
    // and the renamed table still takes writes into the escaped partition
    spark.sql("""INSERT INTO graft_tmp.r14_ren2 PARTITION (p='test_part:')
      VALUES ('d')""")
    assert(Engine.ddl(spark,
      "SELECT * FROM graft_tmp.r14_ren2 WHERE p = 'test_part:'").count() == 3)
  }
}
