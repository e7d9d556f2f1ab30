package graft

import org.apache.spark.sql.functions._

/** Per-partition SET FILEFORMAT (DDLTask.alterTableFileFormat with a
  * partition spec) — the last DDL parity refusal, now a real feature:
  * diverged partitions are recorded in a table property, reads union
  * per-format scans, static INSERTs into a diverged partition write its
  * own format, dynamic writes and whole-table DML refuse loudly.
  */
class HeteroPartitionSpec extends SparkSpec {

  private def mkTable(name: String): Unit = {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    Engine.ddl(spark, s"DROP TABLE IF EXISTS graft_tmp.$name")
    spark.sql(s"""CREATE TABLE graft_tmp.$name (v STRING, n INT)
      USING PARQUET PARTITIONED BY (p STRING)""")
    spark.sql(s"""INSERT INTO graft_tmp.$name
      VALUES ('a1', 1, 'old'), ('a2', 2, 'old'), ('b1', 3, 'new')""")
  }

  test("ALTER PARTITION SET FILEFORMAT + reload: union read sees both formats") {
    mkTable("het1")
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.het1 PARTITION (p='old') SET FILEFORMAT SEQUENCEFILE")
    // Hive workflow: the ALTER does not rewrite — reload the partition
    // in its new format (routed write must produce graft-seq files)
    Engine.ddl(spark, """INSERT OVERWRITE TABLE graft_tmp.het1
      PARTITION (p='old') SELECT v, n FROM graft_tmp.het1 WHERE p = 'new'""")
    Engine.ddl(spark, """INSERT INTO graft_tmp.het1
      PARTITION (p='old') SELECT 'x9', 9""")
    val rows = spark.table("graft_tmp.het1")
      .select("v", "n", "p").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(rows == Set(("b1", 3, "old"), ("x9", 9, "old"), ("b1", 3, "new")),
      rows.toString)
    // the diverged directory holds graft-seq containers, not parquet
    val loc = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("graft_tmp.het1"))
      .location.toString
    val dir = new org.apache.hadoop.fs.Path(loc + "/p=old")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val data = fs.listStatus(dir).filter(st => st.isFile &&
      !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
    assert(data.nonEmpty)
    data.foreach { st =>
      val in = fs.open(st.getPath)
      val head = new Array[Byte](3); in.readFully(head); in.close()
      assert(new String(head, "ISO-8859-1") == "SEQ",
        s"${st.getPath} is not a SequenceFile")
    }
    // base partition still reads, filters prune into the union
    assert(spark.table("graft_tmp.het1").filter(col("p") === "new").count() == 1)
    assert(spark.table("graft_tmp.het1").filter(col("p") === "old").count() == 2)
  }

  test("dynamic INSERT and whole-table DML refuse on a hetero table") {
    mkTable("het2")
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.het2 PARTITION (p='old') SET FILEFORMAT SEQUENCEFILE")
    val e1 = intercept[Exception] {
      Engine.ddl(spark, """INSERT INTO graft_tmp.het2
        PARTITION (p) SELECT v, n, p FROM graft_tmp.het2""")
    }
    assert(e1.getMessage.contains("fully-static"), e1.getMessage)
    val e2 = intercept[Exception] {
      Engine.ddl(spark, "DELETE FROM graft_tmp.het2 WHERE n = 1")
    }
    assert(e2.getMessage.contains("heterogeneous"), e2.getMessage)
    val e3 = intercept[Exception] {
      Engine.ddl(spark, "UPDATE graft_tmp.het2 SET v = 'z' WHERE n = 1")
    }
    assert(e3.getMessage.contains("heterogeneous"), e3.getMessage)
  }

  test("static INSERT into a NON-diverged partition stays on the normal path") {
    mkTable("het3")
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.het3 PARTITION (p='old') SET FILEFORMAT SEQUENCEFILE")
    Engine.ddl(spark, """INSERT INTO graft_tmp.het3
      PARTITION (p='new') SELECT 'c4', 4""")
    assert(spark.table("graft_tmp.het3").filter(col("p") === "new").count() == 2)
  }

  test("ALTER back to the base format clears the divergence") {
    mkTable("het4")
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.het4 PARTITION (p='old') SET FILEFORMAT SEQUENCEFILE")
    assert(plans.HeteroPartitions.entriesOf(spark, "graft_tmp.het4").nonEmpty)
    // reload in seq, then flip the partition back to parquet and reload
    Engine.ddl(spark, """INSERT OVERWRITE TABLE graft_tmp.het4
      PARTITION (p='old') SELECT 'r1', 7""")
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.het4 PARTITION (p='old') SET FILEFORMAT PARQUET")
    assert(plans.HeteroPartitions.entriesOf(spark, "graft_tmp.het4").isEmpty)
    Engine.ddl(spark, """INSERT OVERWRITE TABLE graft_tmp.het4
      PARTITION (p='old') SELECT 'r2', 8""")
    val rows = spark.table("graft_tmp.het4").select("v", "p").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("r2", "old"), ("b1", "new")), rows.toString)
  }

  test("per-partition ALTER validates: missing partition, non-v1 base") {
    mkTable("het5")
    val e1 = intercept[Exception] {
      Engine.ddl(spark,
        "ALTER TABLE graft_tmp.het5 PARTITION (p='nope') SET FILEFORMAT ORC")
    }
    assert(e1.getMessage.contains("does not exist"), e1.getMessage)
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.het5s")
    spark.sql("""CREATE TABLE graft_tmp.het5s (v STRING, p STRING)
      USING `graft-seq` PARTITIONED BY (p)""")
    spark.sql("INSERT INTO graft_tmp.het5s VALUES ('a', 'x')")
    val e2 = intercept[Exception] {
      Engine.ddl(spark,
        "ALTER TABLE graft_tmp.het5s PARTITION (p='x') SET FILEFORMAT PARQUET")
    }
    assert(e2.getMessage.contains("v1 datasource"), e2.getMessage)
  }

  test("diverged directories are pruned out of the base scan's listing") {
    mkTable("het7")
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.het7 PARTITION (p='old') SET FILEFORMAT SEQUENCEFILE")
    Engine.ddl(spark, """INSERT OVERWRITE TABLE graft_tmp.het7
      PARTITION (p='old') SELECT 'q1', 1""")
    val plan = spark.table("graft_tmp.het7").queryExecution.executedPlan
    val scans = plan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.nonEmpty, plan.toString)
    // the parquet base scan must LIST only non-diverged partitions — at
    // 100 TB, a scan that lists (let alone reads) the diverged dirs
    // would also fail outright on the foreign-format files
    scans.foreach { s =>
      val loc = s.metadata.getOrElse("Location", "")
      assert(!loc.contains("p=old"), loc)
    }
  }

  test("two partitions diverged to DIFFERENT formats read as one table") {
    mkTable("het8")
    spark.sql("INSERT INTO graft_tmp.het8 VALUES ('c1', 5, 'mid')")
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.het8 PARTITION (p='old') SET FILEFORMAT SEQUENCEFILE")
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.het8 PARTITION (p='mid') SET FILEFORMAT RCFILE")
    Engine.ddl(spark, """INSERT OVERWRITE TABLE graft_tmp.het8
      PARTITION (p='old') SELECT 's1', 1""")
    Engine.ddl(spark, """INSERT OVERWRITE TABLE graft_tmp.het8
      PARTITION (p='mid') SELECT 'r1', 2""")
    val rows = spark.table("graft_tmp.het8").select("v", "p").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("s1", "old"), ("r1", "mid"), ("b1", "new")), rows.toString)
  }

  test("table-wide SET FILEFORMAT unifies a hetero table through the union") {
    mkTable("het9")
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.het9 PARTITION (p='old') SET FILEFORMAT SEQUENCEFILE")
    Engine.ddl(spark, """INSERT OVERWRITE TABLE graft_tmp.het9
      PARTITION (p='old') SELECT 's1', 1""")
    // the CTAS swap's SELECT * reads through the union, so the rewrite
    // carries BOTH formats' rows into the new uniform table and the
    // divergence property does not survive
    Engine.ddl(spark, "ALTER TABLE graft_tmp.het9 SET FILEFORMAT ORC")
    assert(plans.HeteroPartitions.entriesOf(spark, "graft_tmp.het9").isEmpty)
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("graft_tmp.het9"))
    assert(meta.provider.exists(_.equalsIgnoreCase("orc")), meta.provider)
    val rows = spark.table("graft_tmp.het9").select("v", "p").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("s1", "old"), ("b1", "new")), rows.toString)
  }

  test("hetero divergence on a two-column, non-string partition key") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.het10")
    spark.sql("""CREATE TABLE graft_tmp.het10 (v STRING, dt STRING, hr INT)
      USING PARQUET PARTITIONED BY (dt, hr)""")
    spark.sql("""INSERT INTO graft_tmp.het10
      VALUES ('a', 'd1', 1), ('b', 'd1', 2), ('c', 'd2', 1)""")
    Engine.ddl(spark, """ALTER TABLE graft_tmp.het10
      PARTITION (dt='d1', hr=2) SET FILEFORMAT SEQUENCEFILE""")
    Engine.ddl(spark, """INSERT OVERWRITE TABLE graft_tmp.het10
      PARTITION (dt='d1', hr=2) SELECT 'b2'""")
    val rows = spark.table("graft_tmp.het10").select("v", "dt", "hr").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(rows == Set(("a", "d1", 1), ("b2", "d1", 2), ("c", "d2", 1)),
      rows.toString)
    // sibling (dt='d1', hr=1) stays on the base path and still reads;
    // the INT partition value round-trips through the literal cast
    assert(spark.table("graft_tmp.het10")
      .filter(col("dt") === "d1" && col("hr") === 1).count() == 1)
    assert(spark.table("graft_tmp.het10").filter(col("hr") === 2)
      .select("v").collect().map(_.getString(0)).toSet == Set("b2"))
    // a PARTIAL spec is refused (every partition column must be named)
    val e = intercept[Exception] {
      Engine.ddl(spark, """ALTER TABLE graft_tmp.het10
        PARTITION (dt='d1') SET FILEFORMAT RCFILE""")
    }
    assert(e.getMessage.contains("every partition column"), e.getMessage)
  }

  test("custom-located partitions refuse per-partition SET FILEFORMAT") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.het11")
    spark.sql("""CREATE TABLE graft_tmp.het11 (v STRING, p STRING)
      USING PARQUET PARTITIONED BY (p)""")
    val custom = tools.Tmp.dir("het11_custom")
    spark.sql(s"""ALTER TABLE graft_tmp.het11
      ADD PARTITION (p='ext') LOCATION '$custom'""")
    spark.sql("INSERT INTO graft_tmp.het11 PARTITION (p='ext') VALUES ('x')")
    // a standard-layout directory of the same spelling must not fool the
    // guard: create it so the existence check passes, then expect the
    // location check to refuse
    val loc = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("graft_tmp.het11"))
      .location.toString
    val std = new org.apache.hadoop.fs.Path(loc + "/p=ext")
    std.getFileSystem(spark.sessionState.newHadoopConf()).mkdirs(std)
    val e = intercept[Exception] {
      Engine.ddl(spark,
        "ALTER TABLE graft_tmp.het11 PARTITION (p='ext') SET FILEFORMAT SEQUENCEFILE")
    }
    assert(e.getMessage.contains("custom location"), e.getMessage)
  }

  test("COMPACT of a diverged partition rewrites in ITS format, not the table's") {
    mkTable("het12")
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.het12 PARTITION (p='old') SET FILEFORMAT SEQUENCEFILE")
    // several small seq files, then compact the partition
    Engine.ddl(spark, """INSERT OVERWRITE TABLE graft_tmp.het12
      PARTITION (p='old') SELECT 's1', 1""")
    Engine.ddl(spark, """INSERT INTO graft_tmp.het12
      PARTITION (p='old') SELECT 's2', 2""")
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.het12 PARTITION (p='old') COMPACT 'major'")
    val loc = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("graft_tmp.het12"))
      .location.toString
    val dir = new org.apache.hadoop.fs.Path(loc + "/p=old")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val data = fs.listStatus(dir).filter(st => st.isFile &&
      !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
    assert(data.length == 1, data.map(_.getPath.getName).mkString(","))
    val in = fs.open(data.head.getPath)
    val head = new Array[Byte](3); in.readFully(head); in.close()
    assert(new String(head, "ISO-8859-1") == "SEQ",
      "compaction must rewrite the diverged partition as SequenceFile")
    val rows = spark.table("graft_tmp.het12").filter(col("p") === "old")
      .select("v").collect().map(_.getString(0)).toSet
    assert(rows == Set("s1", "s2"), rows.toString)
  }

  test("EXCHANGE PARTITION refuses hetero tables on either side") {
    mkTable("het13a")
    mkTable("het13b")
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.het13a PARTITION (p='old') SET FILEFORMAT SEQUENCEFILE")
    val e = intercept[Exception] {
      Engine.ddl(spark, """ALTER TABLE graft_tmp.het13b
        EXCHANGE PARTITION (p='old') WITH TABLE graft_tmp.het13a""")
    }
    assert(e.getMessage.contains("heterogeneous"), e.getMessage)
  }

  test("DROP PARTITION prunes the divergence; re-ADD starts clean") {
    mkTable("het14")
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.het14 PARTITION (p='old') SET FILEFORMAT SEQUENCEFILE")
    Engine.ddl(spark, """INSERT OVERWRITE TABLE graft_tmp.het14
      PARTITION (p='old') SELECT 's1', 1""")
    assert(plans.HeteroPartitions.entriesOf(spark, "graft_tmp.het14").nonEmpty)
    Engine.ddl(spark, "ALTER TABLE graft_tmp.het14 DROP PARTITION (p='old')")
    assert(plans.HeteroPartitions.entriesOf(spark, "graft_tmp.het14").isEmpty,
      "stale hetero entry must be pruned with its partition")
    // a re-added partition of the same spec is plain base format again
    spark.sql("INSERT INTO graft_tmp.het14 PARTITION (p='old') VALUES ('fresh', 9)")
    val rows = spark.table("graft_tmp.het14").select("v", "p").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("fresh", "old"), ("b1", "new")), rows.toString)
  }

  test("RENAME PARTITION carries the divergence entry with it") {
    mkTable("het15")
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.het15 PARTITION (p='old') SET FILEFORMAT SEQUENCEFILE")
    Engine.ddl(spark, """INSERT OVERWRITE TABLE graft_tmp.het15
      PARTITION (p='old') SELECT 's1', 1""")
    Engine.ddl(spark, """ALTER TABLE graft_tmp.het15
      PARTITION (p='old') RENAME TO PARTITION (p='older')""")
    val entries = plans.HeteroPartitions.entriesOf(spark, "graft_tmp.het15")
    assert(entries.map(_._1) == Seq("p=older"), entries.toString)
    // the renamed seq partition still reads in its own format
    val rows = spark.table("graft_tmp.het15").select("v", "p").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("s1", "older"), ("b1", "new")), rows.toString)
  }

  test("RENAME TABLE keeps the divergence (entries are location-relative)") {
    mkTable("het16")
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.het16 PARTITION (p='old') SET FILEFORMAT SEQUENCEFILE")
    Engine.ddl(spark, """INSERT OVERWRITE TABLE graft_tmp.het16
      PARTITION (p='old') SELECT 's1', 1""")
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.het16r")
    spark.sql("ALTER TABLE graft_tmp.het16 RENAME TO graft_tmp.het16r")
    val rows = spark.table("graft_tmp.het16r").select("v", "p").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("s1", "old"), ("b1", "new")), rows.toString)
    spark.sql("DROP TABLE graft_tmp.het16r")
  }

  test("many v1-format diverged partitions collapse into ONE scan branch") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    Engine.ddl(spark, "DROP TABLE IF EXISTS graft_tmp.het17")
    spark.sql("""CREATE TABLE graft_tmp.het17 (v STRING, p STRING)
      USING PARQUET PARTITIONED BY (p)""")
    val parts = (0 until 6).map(i => s"d$i")
    parts.foreach(p => spark.sql(
      s"INSERT INTO graft_tmp.het17 PARTITION (p='$p') VALUES ('x$p')"))
    spark.sql("INSERT INTO graft_tmp.het17 PARTITION (p='keep') VALUES ('base')")
    // diverge ALL six to ORC and reload each
    parts.foreach { p =>
      Engine.ddl(spark,
        s"ALTER TABLE graft_tmp.het17 PARTITION (p='$p') SET FILEFORMAT ORC")
      Engine.ddl(spark, s"""INSERT OVERWRITE TABLE graft_tmp.het17
        PARTITION (p='$p') SELECT 'o$p'""")
    }
    val df = spark.table("graft_tmp.het17")
    // plan-size pin: 6 diverged partitions of ONE format = exactly 2
    // file scans total (base parquet + one grouped orc basePath scan) —
    // the property that keeps a thousand-partition migration planar
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.length == 2, s"expected 2 scans, got ${scans.length}:\n" +
      df.queryExecution.executedPlan)
    // partition columns recovered from the directory names
    val rows = df.select("v", "p").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val expect = parts.map(p => (s"o$p", p)).toSet + (("base", "keep"))
    assert(rows == expect, rows.toString)
    // and a partition filter prunes INSIDE the grouped branch
    assert(df.filter(col("p") === "d3").collect()
      .map(_.getString(0)).toSet == Set("od3"))
  }

  test("TEXTFILE divergence round-trips through the csv options") {
    mkTable("het18")
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.het18 PARTITION (p='old') SET FILEFORMAT TEXTFILE")
    Engine.ddl(spark, """INSERT OVERWRITE TABLE graft_tmp.het18
      PARTITION (p='old') SELECT 't1', 42""")
    val rows = spark.table("graft_tmp.het18").select("v", "n", "p").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(rows == Set(("t1", 42, "old"), ("b1", 3, "new")), rows.toString)
    // the partition's files are Hive-delimited text, not parquet
    val loc = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("graft_tmp.het18"))
      .location.toString
    val dir = new org.apache.hadoop.fs.Path(loc + "/p=old")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val data = fs.listStatus(dir).filter(st => st.isFile &&
      !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
    assert(data.nonEmpty)
    val in = fs.open(data.head.getPath)
    val buf = new Array[Byte](16)
    val n = in.read(buf); in.close()
    val text = new String(buf, 0, n, "UTF-8")
    assert(text.startsWith("t142"), text.replace('', '|'))
  }

  test("DESCRIBE FORMATTED of a diverged partition shows its own format") {
    mkTable("het19")
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.het19 PARTITION (p='old') SET FILEFORMAT SEQUENCEFILE")
    val rows = Engine.ddl(spark,
      "DESCRIBE FORMATTED graft_tmp.het19 PARTITION (p='old')").collect()
    val fmt = rows.find(_.getString(0) == "Partition Format")
    assert(fmt.exists(_.getString(1) == "graft-seq"),
      rows.map(_.toString).mkString("\n"))
    // a NON-diverged partition describes without the extra row
    val rows2 = Engine.ddl(spark,
      "DESCRIBE FORMATTED graft_tmp.het19 PARTITION (p='new')").collect()
    assert(!rows2.exists(_.getString(0) == "Partition Format"))
  }

  test("SHOW TABLE EXTENDED on a diverged partition reports its own format") {
    mkTable("het20")
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.het20 PARTITION (p='old') SET FILEFORMAT SEQUENCEFILE")
    val txt = Engine.ddl(spark, """SHOW TABLE EXTENDED IN graft_tmp
      LIKE 'het20' PARTITION (p='old')""").collect()
      .map(_.getString(0)).mkString("\n")
    assert(txt.contains("inputformat:org.apache.hadoop.mapred.SequenceFileInputFormat"),
      txt)
    val txt2 = Engine.ddl(spark, """SHOW TABLE EXTENDED IN graft_tmp
      LIKE 'het20' PARTITION (p='new')""").collect()
      .map(_.getString(0)).mkString("\n")
    assert(txt2.contains("MapredParquetInputFormat"), txt2)
  }

  test("LOAD DATA into a diverged partition validates that partition's magic") {
    mkTable("het6")
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.het6 PARTITION (p='old') SET FILEFORMAT SEQUENCEFILE")
    // Hive parity: the ALTER leaves the old-format files in place; the
    // workflow reloads the partition before reading it (a mixed-format
    // directory fails to read in Hive too)
    Engine.ddl(spark, """INSERT OVERWRITE TABLE graft_tmp.het6
      PARTITION (p='old') SELECT 'w0', 10""")
    // stage a one-file graft-seq payload and LOAD it into the partition
    val stage = tools.Tmp.dir("het6_stage")
    spark.createDataFrame(Seq(("s1", 11))).toDF("v", "n")
      .coalesce(1).write.format("graft-seq").mode("overwrite").save(stage)
    Engine.ddl(spark,
      s"LOAD DATA LOCAL INPATH '$stage' INTO TABLE graft_tmp.het6 PARTITION (p='old')")
    val got = spark.table("graft_tmp.het6")
      .filter(col("p") === "old" && col("v") === "s1").count()
    assert(got == 1)
    // and a parquet payload into the seq partition is refused up front
    val bad = tools.Tmp.dir("het6_bad")
    spark.createDataFrame(Seq(("p1", 12))).toDF("v", "n")
      .coalesce(1).write.mode("overwrite").parquet(bad)
    val e = intercept[Exception] {
      Engine.ddl(spark,
        s"LOAD DATA LOCAL INPATH '$bad' INTO TABLE graft_tmp.het6 PARTITION (p='old')")
    }
    assert(e.getMessage.contains("Wrong file format"), e.getMessage)
    // OVERWRITE leg: replaces the partition's files with the staged seq
    Engine.ddl(spark,
      s"LOAD DATA LOCAL INPATH '$stage' OVERWRITE INTO TABLE graft_tmp.het6 PARTITION (p='old')")
    val after = spark.table("graft_tmp.het6").filter(col("p") === "old")
      .select("v").collect().map(_.getString(0)).toSet
    assert(after == Set("s1"), after.toString)
  }
}
