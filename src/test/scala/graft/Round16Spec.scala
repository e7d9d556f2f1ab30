package graft

/** Round-16 gates: the r15 verdict/advice findings.
  *
  *  - CHAR stripping at EVERY nesting depth (verdict next-round #2): the
  *    reference strips at every conversion
  *    (PrimitiveObjectInspectorUtils.java:826); r15 stopped one level
  *    down. CharStripReads is now one recursive rewriter; the tests here
  *    pin depth-3 reads stripped with storage still padded.
  *  - Ownership hardening (ADVICE r15 #1/#2): no ownership transfer on
  *    no-op CREATE IF NOT EXISTS / TEMPORARY objects; absent tables
  *    don't refuse `DROP IF EXISTS` under the sql-std authorizer.
  *  - char-length guard masks string literals/comments (ADVICE r15 #3).
  *  - ALTER VIEW ADD PARTITION duplicate-key spec refused (ADVICE #5).
  *  - ExportImport.parseSpec tokenizes quoted commas (verdict #4).
  *  - Bench stdout line stays under the driver's ~2 KB tail capture even
  *    on a worst-case board (verdict #1 — the r15 `parsed: null`).
  */
class Round16Spec extends SparkSpec {

  private def freshDb(): Unit =
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")

  // ---- CHAR strips at depth >= 2 (verdict next-round #2) ---------------

  test("struct-in-struct / array-of-struct / map-of-struct char reads strip") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r16_deep")
    val loc = tools.Tmp.dir("r16_deep") + "/t"
    Engine.ddl(spark, s"""CREATE TABLE graft_tmp.r16_deep (
        ost STRUCT<inner: STRUCT<c: CHAR(8), n: INT>, tag: CHAR(4)>,
        arrst ARRAY<STRUCT<c2: CHAR(6)>>,
        mps MAP<STRING, STRUCT<mc: CHAR(5)>>)
      USING parquet LOCATION '$loc'""")
    Engine.ddl(spark, """INSERT INTO graft_tmp.r16_deep SELECT
        named_struct('inner', named_struct('c', 'ab', 'n', 7), 'tag', 'xy'),
        array(named_struct('c2', 'pq'), NULL),
        map('k', named_struct('mc', 'mn'))""")
    Engine.ddl(spark,
      "INSERT INTO graft_tmp.r16_deep SELECT NULL, NULL, NULL")
    val r = Engine.ddl(spark, """SELECT
        ost.inner.c AS c, length(ost.inner.c) AS clen, (ost.inner.c = 'ab') AS eq,
        ost.inner.n AS n, ost.tag AS tag, length(ost.tag) AS taglen,
        arrst[0].c2 AS c2, length(arrst[0].c2) AS c2len, arrst[1] AS nul,
        mps['k'].mc AS mc, length(mps['k'].mc) AS mclen
      FROM graft_tmp.r16_deep WHERE ost IS NOT NULL""").collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getString(0) == "ab" && row.getInt(1) == 2 &&
      row.getBoolean(2) && row.getInt(3) == 7, row.toString)
    assert(row.getString(4) == "xy" && row.getInt(5) == 2, row.toString)
    assert(row.getString(6) == "pq" && row.getInt(7) == 2 && row.isNullAt(8),
      row.toString)
    assert(row.getString(9) == "mn" && row.getInt(10) == 2, row.toString)
    // container nulls survive the rebuild at every level
    assert(Engine.ddl(spark, """SELECT count(*) AS n FROM graft_tmp.r16_deep
        WHERE ost IS NULL AND arrst IS NULL AND mps IS NULL""")
      .collect()(0).getLong(0) == 1)
    // storage stays blank-padded at depth (raw parquet read bypasses the
    // engine's char metadata — the drift the recursive strip closes)
    val raw = spark.read.parquet(loc).where("ost IS NOT NULL")
      .selectExpr("ost.inner.c", "ost.tag", "arrst[0].c2", "mps['k'].mc")
      .collect()(0)
    assert(raw.getString(0) == "ab      " && raw.getString(1) == "xy  " &&
      raw.getString(2) == "pq    " && raw.getString(3) == "mn   ",
      s"[${raw.getString(0)}|${raw.getString(1)}|${raw.getString(2)}|${raw.getString(3)}]")
  }

  // ---- varchar reads keep pushdown unless the table was narrowed -------

  test("untouched varchar column keeps parquet filter pushdown") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r16_vc")
    Engine.ddl(spark,
      "CREATE TABLE graft_tmp.r16_vc (k INT, v VARCHAR(20)) USING parquet")
    Engine.ddl(spark,
      "INSERT INTO graft_tmp.r16_vc VALUES (1, 'alpha'), (2, 'beta')")
    val df = Engine.ddl(spark,
      "SELECT k FROM graft_tmp.r16_vc WHERE v = 'alpha'")
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1))
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec"))
    // the equality must reach the scan as a pushed data filter — an
    // analyzer wrap (substring/rtrim) over the column would erase it
    assert(scan.dataFilters.nonEmpty &&
      scan.metadata.get("PushedFilters").exists(_.contains("EqualTo")),
      scan.metadata.get("PushedFilters").toString)
  }

  test("narrowing CHANGE COLUMN stamps the table and clamps reads") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r16_nar")
    Engine.ddl(spark,
      "CREATE TABLE graft_tmp.r16_nar (k INT, v STRING) USING parquet")
    Engine.ddl(spark,
      "INSERT INTO graft_tmp.r16_nar VALUES (1, 'abcdefghij')")
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.r16_nar CHANGE COLUMN v v VARCHAR(4)")
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("graft_tmp.r16_nar"))
    assert(meta.properties.contains(
      plans.HiveSemantics.CharStripReads.NarrowedProp), meta.properties)
    // stored 10-char value reads through the declared varchar(4) clamp
    val r = Engine.ddl(spark,
      "SELECT v, length(v) AS l FROM graft_tmp.r16_nar").collect()(0)
    assert(r.getString(0) == "abcd" && r.getInt(1) == 4, r.toString)
    // widening back restores the full value (metadata-only, data intact)
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.r16_nar CHANGE COLUMN v v VARCHAR(30)")
    val r2 = Engine.ddl(spark,
      "SELECT v, length(v) AS l FROM graft_tmp.r16_nar").collect()(0)
    assert(r2.getString(0) == "abcdefghij" && r2.getInt(1) == 10, r2.toString)
  }

  // ---- ownership hardening (ADVICE r15 #1 / #2) -------------------------

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

  test("no ownership seizure via IF NOT EXISTS or TEMPORARY VIEW") {
    freshDb()
    val snap = operators.Auth.snapshot(spark)
    try {
      Engine.ddl(spark, "set user.name=r16owner")
      Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r16_own")
      Engine.ddl(spark,
        "CREATE TABLE graft_tmp.r16_own (i INT) USING parquet")
      assert(operators.Auth.ownerOf(spark, "graft_tmp", "r16_own")
        .contains("r16owner"))
      // a different user's no-op CREATE IF NOT EXISTS must not re-own
      Engine.ddl(spark, "set user.name=r16thief")
      Engine.ddl(spark,
        "CREATE TABLE IF NOT EXISTS graft_tmp.r16_own (i INT) USING parquet")
      assert(operators.Auth.ownerOf(spark, "graft_tmp", "r16_own")
        .contains("r16owner"), "IF NOT EXISTS no-op transferred ownership")
      // nor a TEMPORARY VIEW sharing the table's name
      Engine.ddl(spark, "CREATE TEMPORARY VIEW r16_own AS SELECT 1 AS x")
      assert(operators.Auth.ownerOf(spark,
        spark.sessionState.catalog.getCurrentDatabase, "r16_own").isEmpty,
        "temp view recorded an owner")
      spark.sql("DROP VIEW IF EXISTS r16_own")
      withSqlStd {
        // the real owner can still drop (ownership intact)
        Engine.ddl(spark, "set user.name=r16owner")
        Engine.ddl(spark, "DROP TABLE graft_tmp.r16_own")
      }
    } finally operators.Auth.restore(spark, snap)
  }

  test("sql-std: DROP IF EXISTS on an absent table no-ops for non-admin") {
    freshDb()
    val snap = operators.Auth.snapshot(spark)
    try {
      Engine.ddl(spark, "set user.name=r16nobody")
      Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r16_absent")
      withSqlStd {
        // must no-op, not raise a Permission denied about a ghost table
        Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r16_absent")
      }
    } finally operators.Auth.restore(spark, snap)
  }

  // ---- char-length guard masks literals and comments (ADVICE r15 #3) ---

  test("char(300) inside a string literal or comment is not refused") {
    val r = Engine.ddl(spark,
      "SELECT 'char(300)' AS a, \"varchar(0)\" AS b -- char(9999)\n").collect()(0)
    assert(r.getString(0) == "char(300)" && r.getString(1) == "varchar(0)")
    // the guard still fires on a REAL out-of-range type position
    val e = intercept[Exception] {
      Engine.ddl(spark, "SELECT CAST('x' AS CHAR(300)) AS c")
    }
    assert(e.getMessage.contains("out of allowed range"), e.getMessage)
  }

  // ---- ALTER VIEW ADD PARTITION duplicate keys refused (ADVICE #5) -----

  test("duplicate partition spec keys cannot bypass view spec validation") {
    freshDb()
    Engine.ddl(spark, "DROP VIEW IF EXISTS graft_tmp.r16_pv")
    Engine.ddl(spark, """CREATE VIEW graft_tmp.r16_pv
      PARTITIONED ON (a, b) AS SELECT 1 AS x, 2 AS a, 3 AS b""")
    val e = intercept[Exception] {
      Engine.ddl(spark,
        "ALTER VIEW graft_tmp.r16_pv ADD PARTITION (a='1', a='2')")
    }
    assert(e.getMessage.toLowerCase.contains("duplicate") ||
      e.getMessage.contains("doesn't contain all"), e.getMessage)
  }

  // ---- parseSpec: quoted commas stay in ONE pair (verdict #4) ----------

  test("PARTITION spec values may contain commas and equals signs") {
    val kvs = operators.ExportImport.parseSpec(Some("k='a,b', k2='c=d'")).get
    assert(kvs == Seq("k" -> "a,b", "k2" -> "c=d"), kvs.toString)
    val single = operators.ExportImport.parseSpec(Some("p='x'")).get
    assert(single == Seq("p" -> "x"))
    val unquoted = operators.ExportImport.parseSpec(Some("a=1, b=2")).get
    assert(unquoted == Seq("a" -> "1", "b" -> "2"))
  }

  test("EXPORT/IMPORT round-trips a partition value containing a comma") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r16_exp")
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r16_imp")
    Engine.ddl(spark, """CREATE TABLE graft_tmp.r16_exp (i INT, p STRING)
      USING parquet PARTITIONED BY (p)""")
    Engine.ddl(spark, "SET hive.exec.dynamic.partition.mode=nonstrict")
    Engine.ddl(spark, """INSERT INTO graft_tmp.r16_exp PARTITION (p)
      VALUES (1, 'a,b'), (2, 'plain')""")
    val dump = tools.Tmp.dir("r16_exim")
    Engine.ddl(spark,
      s"EXPORT TABLE graft_tmp.r16_exp PARTITION (p='a,b') TO '$dump'")
    Engine.ddl(spark,
      s"IMPORT TABLE graft_tmp.r16_imp FROM '$dump'")
    val r = Engine.ddl(spark,
      "SELECT i, p FROM graft_tmp.r16_imp").collect()
    assert(r.length == 1 && r(0).getInt(0) == 1 && r(0).getString(1) == "a,b",
      r.mkString(","))
  }

  test("EXPORT/IMPORT round-trips a many-file partitioned table (pooled copy)") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r16_mf")
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r16_mf_i")
    Engine.ddl(spark, """CREATE TABLE graft_tmp.r16_mf (i INT, p STRING)
      USING parquet PARTITIONED BY (p)""")
    Engine.ddl(spark, "SET hive.exec.dynamic.partition.mode=nonstrict")
    // 6 partitions × several files each (repartition forces multiple
    // part-files per partition) — the copy pool gets real fan-out
    import org.apache.spark.sql.functions._
    spark.range(600)
      .select(col("id").cast("int").as("i"),
        concat(lit("p"), (col("id") % 6).cast("string")).as("p"))
      .repartition(8)
      .write.mode("append").insertInto("graft_tmp.r16_mf")
    val dump = tools.Tmp.dir("r16_manyfile")
    Engine.ddl(spark, s"EXPORT TABLE graft_tmp.r16_mf TO '$dump'")
    Engine.ddl(spark, s"IMPORT TABLE graft_tmp.r16_mf_i FROM '$dump'")
    val a = spark.table("graft_tmp.r16_mf")
      .selectExpr("sum(i) s", "count(*) c", "count(distinct p) p").collect()(0)
    val b = spark.table("graft_tmp.r16_mf_i")
      .selectExpr("sum(i) s", "count(*) c", "count(distinct p) p").collect()(0)
    assert(a == b, s"export/import diverged: $a vs $b")
    assert(b.getLong(1) == 600 && b.getLong(2) == 6, b.toString)
  }

  // ---- s05 Lloyd passes instrumented (verdict next-round #6) -----------

  test("kmeans records executed Lloyd passes and stops at a fixed point") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // two tight, well-separated clusters: Lloyd converges on the first
    // recompute, so a 10-pass budget must short-circuit long before 10
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.99f, 0.01f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.01f, 0.99f)))
      .toDF("vec_id", "emb")
      .select(col("vec_id"), col("emb").cast("array<double>").as("emb"))
    val cents = operators.Similarity.kmeansCentroids(emb, k = 2, iters = 10)
    assert(cents.count() == 2)
    val it = operators.Similarity.lastKmeansIterations
    assert(it >= 1 && it < 10, s"executed $it of 10 budget — fixed-point " +
      "early exit is not firing (every pass over a 100TB corpus is paid)")
  }

  // ---- view partitions: partial DROP spec drops every match ------------

  test("ALTER VIEW DROP PARTITION accepts a partial spec (Hive prefix drop)") {
    freshDb()
    Engine.ddl(spark, "DROP VIEW IF EXISTS graft_tmp.r16_vp")
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r16_vpt")
    Engine.ddl(spark,
      "CREATE TABLE graft_tmp.r16_vpt (k INT, ds STRING, hr STRING) USING parquet")
    Engine.ddl(spark, """CREATE VIEW graft_tmp.r16_vp PARTITIONED ON (ds, hr)
      AS SELECT k, ds, hr FROM graft_tmp.r16_vpt""")
    Engine.ddl(spark,
      "ALTER VIEW graft_tmp.r16_vp ADD PARTITION (ds='1', hr='a')")
    Engine.ddl(spark,
      "ALTER VIEW graft_tmp.r16_vp ADD PARTITION (ds='1', hr='b')")
    Engine.ddl(spark,
      "ALTER VIEW graft_tmp.r16_vp ADD PARTITION (ds='2', hr='a')")
    assert(Engine.ddl(spark, "SHOW PARTITIONS graft_tmp.r16_vp")
      .collect().map(_.getString(0)).toSeq ==
      Seq("ds=1/hr=a", "ds=1/hr=b", "ds=2/hr=a"))
    // one partial spec drops BOTH ds=1 partitions
    Engine.ddl(spark, "ALTER VIEW graft_tmp.r16_vp DROP PARTITION (ds='1')")
    assert(Engine.ddl(spark, "SHOW PARTITIONS graft_tmp.r16_vp")
      .collect().map(_.getString(0)).toSeq == Seq("ds=2/hr=a"))
    // absent spec without IF EXISTS refuses; with it, no-ops
    val e = intercept[Exception] { Engine.ddl(spark,
      "ALTER VIEW graft_tmp.r16_vp DROP PARTITION (ds='9')") }
    assert(e.getMessage.contains("does not exist"), e.getMessage)
    Engine.ddl(spark,
      "ALTER VIEW graft_tmp.r16_vp DROP IF EXISTS PARTITION (ds='9')")
  }

  // ---- avro nested record names deterministic ---------------------------

  test("avro nested record names are deterministic across schema builds") {
    import org.apache.spark.sql.types._
    // avro schema RESOLUTION matches records by NAME: the reader rebuilds
    // the expected schema from the catalog in a different JVM than the
    // writer, so the generated record names must be a pure function of
    // the struct shape (a counter would drift between builds)
    val st = StructType(Seq(
      StructField("k", IntegerType),
      StructField("s1", StructType(Seq(
        StructField("c1", IntegerType), StructField("c2", StringType)))),
      StructField("m", MapType(StringType, StructType(Seq(
        StructField("mc", StringType)))))))
    val a = sources.Avro.toAvroSchema(st).toString
    val b = sources.Avro.toAvroSchema(st).toString
    assert(a == b, "record names drifted between two builds of one shape")
    // different shapes must NOT share a name (one definition per name)
    val other = StructType(Seq(StructField("s1", StructType(Seq(
      StructField("x", DoubleType))))))
    assert(sources.Avro.toAvroSchema(other).toString != a)
  }

  // ---- bench stdout line bounded (verdict #1: r15 parsed:null) ---------

  test("bench stdout line stays under 1500 chars on a worst-case board") {
    // worst plausible shape: every headline row present, 8 residual
    // suspects with their steal/cpu signals, a failed query, the
    // sanctioned global-window row, triple-digit counts
    val suspects = (1 to 8).map(i => f"q1$i%02d_some_long_query_name")
    val line = Bench.stdoutLine(
      total = 1234.567, nQueries = 250, runs = 2, stealSec = 372.123,
      globalWindow = Seq("t12_vocab_build"),
      failed = Seq("q999_some_failed_query_name"),
      retriedCount = 123, sweptCount = 99, clearedCount = 98,
      suspects = suspects,
      suspectSteal = suspects.map(_ -> 123.456),
      suspectCpu = suspects.map(_ -> 123.456),
      headlineResults = Bench.headline.map(_ -> 123.456),
      sfDir = "/root/testdata/sf0.1")
    assert(line.length < 1500, s"stdout line ${line.length} chars: $line")
    // and it parses as the single-line JSON the driver expects
    assert(!line.contains("\n") && line.startsWith("{") && line.endsWith("}"))
  }
}
