package graft

import org.apache.spark.sql.functions._

/** Round-12 gates: session-faithful Hadoop conf in the DSv2 sources'
  * split planning and executor reader/writer paths (the r11 advisor
  * finding — a bare `new Configuration()` drops spark.hadoop.* settings,
  * so S3A credentials / custom FS impls configured on the session would
  * be invisible exactly where split planning lists files).
  *
  * Launch-time `--conf spark.hadoop.foo=v` lands in
  * sparkContext.hadoopConfiguration (SparkHadoopUtil strips the prefix);
  * sessionState.newHadoopConf() layers the session on top. The tests set
  * the key there — the same place a real deployment's S3A credentials
  * live — and assert the planning/overlay paths see it where a bare
  * `new Configuration()` would not.
  */
class Round12Spec extends SparkSpec {

  test("spark.hadoop.* launch conf is visible to the split-listing path") {
    spark.sparkContext.hadoopConfiguration.set("graft.test.fsconf", "visible-r12")
    try {
      assert(new org.apache.hadoop.conf.Configuration().get("graft.test.fsconf") == null,
        "test key must not come from site files")
      val planned = sources.v2.FileSplits.hadoopConf()
      assert(planned.get("graft.test.fsconf") == "visible-r12",
        s"listing conf dropped the session entry: ${planned.get("graft.test.fsconf")}")
    } finally spark.sparkContext.hadoopConfiguration.unset("graft.test.fsconf")
  }

  test("conf overlay captures session entries and rebuilds them for executors") {
    spark.sparkContext.hadoopConfiguration.set("graft.test.overlay", "travels-r12")
    try {
      val overlay = sources.v2.FileSplits.confOverlay()
      assert(overlay.get("graft.test.overlay").contains("travels-r12"),
        s"overlay missing session entry: ${overlay.keys.filter(_.startsWith("graft")).toList}")
      // what a reader on an executor would reconstruct
      val rebuilt = sources.v2.FileSplits.buildConf(overlay)
      assert(rebuilt.get("graft.test.overlay") == "travels-r12")
    } finally spark.sparkContext.hadoopConfiguration.unset("graft.test.overlay")
  }

  // ---- CREATE TEMPORARY TABLE session-end auto-drop (g332 parity) ------

  test("TEMPORARY tables are dropped at session end; plain tables survive") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r12_temp")
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r12_plain")
    Engine.ddl(spark,
      "CREATE TEMPORARY TABLE graft_tmp.r12_temp (k INT) USING PARQUET")
    Engine.ddl(spark,
      "CREATE TABLE graft_tmp.r12_plain (k INT) USING PARQUET")
    spark.sql("INSERT INTO graft_tmp.r12_temp VALUES (1)")
    assert(spark.table("graft_tmp.r12_temp").count() == 1)
    // what the session-end listener runs (the listener itself only fires
    // on context stop, which a shared-JVM suite can't do)
    Engine.dropTempTables(spark)
    assert(!spark.catalog.tableExists("graft_tmp.r12_temp"),
      "TEMPORARY table must be gone after session close")
    assert(spark.catalog.tableExists("graft_tmp.r12_plain"),
      "plain table must survive session close")
    // idempotent: a second close (listener + explicit stop) is a no-op
    Engine.dropTempTables(spark)
    spark.sql("DROP TABLE graft_tmp.r12_plain")
  }

  test("temp-table auto-drop resolves unqualified names at CREATE time") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp2")
    val prevDb = spark.catalog.currentDatabase
    try {
      spark.sql("USE graft_tmp")
      Engine.ddl(spark, "DROP TABLE IF EXISTS r12_tmpq")
      Engine.ddl(spark, "CREATE TEMPORARY TABLE r12_tmpq (k INT) USING PARQUET")
      // a USE between CREATE and session end must not retarget the drop
      spark.sql("USE graft_tmp2")
      Engine.dropTempTables(spark)
      assert(!spark.catalog.tableExists("graft_tmp.r12_tmpq"),
        "temp table must drop from the database it was created in")
    } finally spark.sql(s"USE $prevDb")
  }

  // ---- strict-check suspension is per-thread (r11 advisor) -------------

  test("strict-check suspension on one thread does not bypass another") {
    spark.conf.set("hive.mapred.mode", "strict")
    try {
      val entered = new java.util.concurrent.CountDownLatch(1)
      val release = new java.util.concurrent.CountDownLatch(1)
      val t = new Thread(() => plans.StrictChecks.suspended(spark) {
        entered.countDown(); release.await()
      })
      t.start(); entered.await()
      try {
        // a concurrent user query must STILL be refused while the
        // maintenance thread holds checks suspended
        val e = intercept[Exception] {
          Engine.sql(spark, sf, "SELECT * FROM nation ORDER BY n_name").collect()
        }
        assert(e.getMessage.toLowerCase.contains("strict"), e.getMessage)
      } finally { release.countDown(); t.join() }
      // and this thread (never suspended) is also still guarded
      val e2 = intercept[Exception] {
        Engine.sql(spark, sf, "SELECT * FROM nation ORDER BY n_name").collect()
      }
      assert(e2.getMessage.toLowerCase.contains("strict"), e2.getMessage)
    } finally spark.conf.unset("hive.mapred.mode")
  }

  // ---- IMPORT into an existing table (ImportSemanticAnalyzer parity) ---

  test("IMPORT into an existing EMPTY table loads; a loaded table refuses") {
    // ImportSemanticAnalyzer parity: an existing compatible but EMPTY
    // destination accepts the import; once the table holds data files a
    // re-import is refused (exim_01_nonpart_over_loaded.q) — the r12
    // append-on-repeat behavior silently doubled rows on script re-runs
    // and was tightened to the reference's refusal in round 14.
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r12_exsrc")
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r12_exdst")
    spark.sql("CREATE TABLE graft_tmp.r12_exsrc (k INT, v STRING) USING PARQUET")
    spark.sql("INSERT INTO graft_tmp.r12_exsrc VALUES (1, 'a'), (2, 'b')")
    val exp = tools.Tmp.dir("r12_exim") + "/exp"
    Engine.ddl(spark, s"EXPORT TABLE graft_tmp.r12_exsrc TO '$exp'")
    spark.sql("CREATE TABLE graft_tmp.r12_exdst (k INT, v STRING) USING PARQUET")
    Engine.ddl(spark, s"IMPORT TABLE graft_tmp.r12_exdst FROM '$exp'")
    assert(spark.table("graft_tmp.r12_exdst").count() == 2)
    val e = intercept[Exception] {
      Engine.ddl(spark, s"IMPORT TABLE graft_tmp.r12_exdst FROM '$exp'")
    }
    assert(e.getMessage.contains("contains data files"), e.getMessage)
    assert(spark.table("graft_tmp.r12_exdst").count() == 2)
  }

  test("IMPORT refuses an existing table of a different provider") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r12_exsrc2")
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r12_exdst2")
    spark.sql("CREATE TABLE graft_tmp.r12_exsrc2 (k STRING) USING PARQUET")
    spark.sql("INSERT INTO graft_tmp.r12_exsrc2 VALUES ('x')")
    val exp = tools.Tmp.dir("r12_exim2") + "/exp"
    Engine.ddl(spark, s"EXPORT TABLE graft_tmp.r12_exsrc2 TO '$exp'")
    spark.sql("CREATE TABLE graft_tmp.r12_exdst2 (k STRING) USING `graft-seq`")
    val e = intercept[Exception] {
      Engine.ddl(spark, s"IMPORT TABLE graft_tmp.r12_exdst2 FROM '$exp'")
    }
    assert(e.getMessage.contains("does not match the export data format"),
      e.getMessage)
  }

  // ---- MP4 box walk robustness (m09/m10 operator) ----------------------

  test("video box walk survives corrupt payloads instead of throwing") {
    import spark.implicits._
    val junk = Seq(
      (1L, Array[Byte](1, 2, 3)),                       // too short
      (2L, "XXXXYYYY-not-an-mp4-payload".getBytes("US-ASCII")),
      (3L, Array[Byte](0, 0, 0, 0, 'f', 't', 'y', 'p')), // size<8: stop
      (4L, operators.Multimodal.mp4Bytes(4L).take(40))   // truncated tree
    ).toDF("doc_id", "payload")
    val metas = operators.Multimodal.decodeVideoMeta(spark, junk)
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas.size == 4)
    // nothing parseable claims to be a valid container
    assert(metas.values.forall(!_.sizes_ok), metas.toString)
    assert(operators.Multimodal.sampleVideoFrames(spark, junk, 4).count() == 0)
  }

  test("mp4 synth round-trips through the box walk (unit closed forms)") {
    import spark.implicits._
    val media = Seq((7L, operators.Multimodal.mp4Bytes(7L))).toDF("doc_id", "payload")
    val m = operators.Multimodal.decodeVideoMeta(spark, media).collect().head
    assert(m.duration_ms == 500 + (7 % 97) * 40)
    assert(m.n_tracks == 1 + 7 % 3)
    assert(m.frame_size == 16 + 7 % 17 && m.n_frames == 10 + 7 % 50)
    assert(m.sizes_ok && m.mdat_bytes == m.frame_size * m.n_frames)
  }

  test("listFilesWithLen lists through the session conf (round-trip sanity)") {
    // behavioral pin: the planning path still lists correctly with the
    // session conf in place of a bare default conf
    val dir = tools.Tmp.dir("r12_split_list")
    spark.range(10).select(col("id").cast("string").as("c0"))
      .write.format("graft-seq").mode("overwrite").save(dir)
    val listed = sources.v2.FileSplits.listFilesWithLen(dir)
    assert(listed.nonEmpty && listed.forall(_._2 > 0), listed.toString)
    // and the table still reads whole
    assert(spark.read.format("graft-seq")
      .schema("c0 STRING").load(dir).count() == 10)
  }
}
