package graft

import org.apache.spark.sql.functions._

/** Round-13 gates: the r12 advisor findings.
  *
  *  - (high) CREATE TEMPORARY TABLE must register its name for
  *    session-end drop only AFTER the statement succeeds and only when
  *    the table was NEWLY created — a failed CREATE (permanent table of
  *    the same name exists) or an IF NOT EXISTS no-op must never queue a
  *    PERMANENT table for a purge-drop at application end.
  *  - (medium) DROP PARTITION on an EXTERNAL heterogeneous-format table
  *    removes the catalog partition but keeps the files; the divergence
  *    entry must be pruned against the CATALOG, not directory existence,
  *    or the union read keeps serving the dropped partition forever.
  *  - (low) a thread created while strict checks are suspended must NOT
  *    inherit the suspension (fail-closed: checks enforced).
  *  - (low) the MP4 box walk must handle size==0 (box-to-EOF) and
  *    size==1 (64-bit largesize) encodings — real-world files use both.
  */
class Round13Spec extends SparkSpec {

  private def freshDb(): Unit =
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")

  // ---- temp-table registration only on successful NEW create (high) ----

  test("failed CREATE TEMPORARY TABLE never queues the permanent table for drop") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r13_perm")
    Engine.ddl(spark, "CREATE TABLE graft_tmp.r13_perm (k INT) USING PARQUET")
    spark.sql("INSERT INTO graft_tmp.r13_perm VALUES (7)")
    intercept[Exception] {
      Engine.ddl(spark,
        "CREATE TEMPORARY TABLE graft_tmp.r13_perm (k INT) USING PARQUET")
    }
    Engine.dropTempTables(spark) // what the session-end listener runs
    assert(spark.catalog.tableExists("graft_tmp.r13_perm"),
      "session end purged a permanent table a FAILED create never made")
    assert(spark.table("graft_tmp.r13_perm").count() == 1)
  }

  test("IF NOT EXISTS no-op CREATE TEMPORARY TABLE does not register either") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r13_perm2")
    Engine.ddl(spark, "CREATE TABLE graft_tmp.r13_perm2 (k INT) USING PARQUET")
    spark.sql("INSERT INTO graft_tmp.r13_perm2 VALUES (1), (2)")
    // succeeds as a no-op — the table it "created" is the permanent one
    Engine.ddl(spark,
      "CREATE TEMPORARY TABLE IF NOT EXISTS graft_tmp.r13_perm2 (k INT) USING PARQUET")
    Engine.dropTempTables(spark)
    assert(spark.catalog.tableExists("graft_tmp.r13_perm2"),
      "session end purged a permanent table an IF NOT EXISTS no-op never made")
    assert(spark.table("graft_tmp.r13_perm2").count() == 2)
  }

  test("a genuinely created IF NOT EXISTS temp table is still dropped") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r13_fresh")
    Engine.ddl(spark,
      "CREATE TEMPORARY TABLE IF NOT EXISTS graft_tmp.r13_fresh (k INT) USING PARQUET")
    assert(spark.catalog.tableExists("graft_tmp.r13_fresh"))
    Engine.dropTempTables(spark)
    assert(!spark.catalog.tableExists("graft_tmp.r13_fresh"),
      "a temp table the statement DID create must be session-scoped")
  }

  // ---- hetero entry pruning against the catalog (medium) ---------------

  test("DROP PARTITION on an EXTERNAL hetero table prunes the entry despite surviving files") {
    freshDb()
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.r13_ext")
    val ext = java.nio.file.Files.createTempDirectory("r13_ext").toString
    spark.sql(s"""CREATE TABLE graft_tmp.r13_ext (v STRING, p STRING)
      USING parquet PARTITIONED BY (p) LOCATION '$ext'""")
    spark.sql("INSERT INTO graft_tmp.r13_ext PARTITION (p='keep') VALUES ('base')")
    spark.sql("INSERT INTO graft_tmp.r13_ext PARTITION (p='old') VALUES ('seed')")
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.r13_ext PARTITION (p='old') SET FILEFORMAT SEQUENCEFILE")
    Engine.ddl(spark, """INSERT OVERWRITE TABLE graft_tmp.r13_ext
      PARTITION (p='old') SELECT 'gone'""")
    assert(plans.HeteroPartitions.entriesOf(spark, "graft_tmp.r13_ext").nonEmpty)
    Engine.ddl(spark, "ALTER TABLE graft_tmp.r13_ext DROP PARTITION (p='old')")
    // EXTERNAL: the files survive the drop — the exact shape that made a
    // directory-existence-only prune keep the divergence entry alive
    assert(new java.io.File(ext + "/p=old").exists,
      "precondition: external DROP PARTITION keeps the files on disk")
    assert(plans.HeteroPartitions.entriesOf(spark, "graft_tmp.r13_ext").isEmpty,
      "divergence entry must be pruned against the CATALOG partition list")
    val rows = spark.table("graft_tmp.r13_ext").select("v")
      .collect().map(_.getString(0)).toSet
    assert(rows == Set("base"),
      s"dropped partition's rows kept being served: $rows")
  }

  // ---- strict-check suspension must not leak into child threads (low) --

  test("a thread created inside a suspended block starts with checks enforced") {
    Tables.views(spark, sf, "nation")
    spark.conf.set("hive.mapred.mode", "strict")
    try {
      plans.StrictChecks.suspended(spark) {
        // under the pre-fix InheritableThreadLocal, this thread inherits
        // depth>=1 at creation and nothing ever decrements it — strict
        // checks permanently and silently disabled on it
        @volatile var refused: Option[String] = None
        val t = new Thread(() => {
          try {
            spark.sql("SELECT n_name FROM nation ORDER BY n_name").collect()
            ()
          } catch { case e: Exception => refused = Some(e.getMessage) }
        })
        t.start(); t.join()
        assert(refused.exists(_.contains("LIMIT must also be specified")),
          s"child thread silently skipped strict checks: $refused")
        // the suspending thread itself IS still suspended
        assert(spark.sql("SELECT n_name FROM nation ORDER BY n_name")
          .count() > 0)
      }
    } finally spark.conf.unset("hive.mapred.mode")
  }

  // ---- ISO-BMFF size encodings: largesize and box-to-EOF (low) ---------

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)
  private def readBe32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
      ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)

  /** Re-encode the synthetic MP4's top-level boxes: moov as a size==1
    * largesize box and mdat as a size==0 to-EOF box — the two encodings
    * the plain 32-bit walk could not step over. */
  private def reEncode(b: Array[Byte]): Array[Byte] = {
    val s1 = readBe32(b, 0)                    // ftyp
    val s2 = readBe32(b, s1)                   // moov
    val ftyp = b.slice(0, s1)
    val moovPayload = b.slice(s1 + 8, s1 + s2)
    val mdatPayload = b.slice(s1 + s2 + 8, b.length)
    val moovLarge = be32(1) ++ "moov".getBytes("US-ASCII") ++
      be64(16L + moovPayload.length) ++ moovPayload
    val mdatEof = be32(0) ++ "mdat".getBytes("US-ASCII") ++ mdatPayload
    ftyp ++ moovLarge ++ mdatEof
  }

  test("decodeVideoMeta handles largesize and to-EOF boxes identically") {
    import spark.implicits._
    val plain = operators.Multimodal.mp4Bytes(5L)
    val media = Seq((1L, plain), (2L, reEncode(plain)))
      .toDF("doc_id", "payload")
    val metas = operators.Multimodal.decodeVideoMeta(spark, media)
      .collect().sortBy(_.doc_id)
    assert(metas.length == 2)
    val (a, b) = (metas(0), metas(1))
    assert(a.sizes_ok && b.sizes_ok, s"$a / $b")
    assert(a.duration_ms == b.duration_ms && a.n_tracks == b.n_tracks &&
      a.mdat_bytes == b.mdat_bytes && a.frame_size == b.frame_size &&
      a.n_frames == b.n_frames,
      s"re-encoded sizes changed the decoded metadata: $a vs $b")
  }

  test("a truncated largesize header stops the walk instead of throwing") {
    import spark.implicits._
    // size==1 but fewer than 16 bytes remain: corrupt — m01 convention
    val corrupt = be32(1) ++ "ftyp".getBytes("US-ASCII") ++ be32(0)
    val media = Seq((1L, corrupt)).toDF("doc_id", "payload")
    val m = operators.Multimodal.decodeVideoMeta(spark, media).collect().head
    assert(m.duration_ms == -1 && !m.sizes_ok, m.toString)
  }
}
