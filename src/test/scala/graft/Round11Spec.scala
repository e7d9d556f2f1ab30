package graft

import java.nio.file.Files

/** Round-11 gates: type-aware partition-value semantics (the r10 advisor
  * batch — string-typed partition columns compare by exact text, numeric
  * columns by value), unescape robustness against non-Hive writers, and
  * the EXCHANGE PARTITION duplicate guard on graft destinations.
  */
class Round11Spec extends SparkSpec {

  // ---- partition-value comparison dispatches on the DECLARED type --------

  test("static overwrite on a STRING partition col keeps lookalike siblings") {
    // Hive treats p='1' and p='01' as DISTINCT partitions of a string
    // column; a numeric match would silently delete the sibling.
    val base = tools.Tmp.dir("r11_str_part")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    spark.sql("DROP TABLE IF EXISTS graft_tmp.r11_strp")
    spark.sql(s"""CREATE TABLE graft_tmp.r11_strp (v INT)
      USING `graft-seq` PARTITIONED BY (p STRING) LOCATION '$base'""")
    spark.sql("INSERT INTO graft_tmp.r11_strp PARTITION (p='01') VALUES (10)")
    spark.sql("INSERT INTO graft_tmp.r11_strp PARTITION (p='1') VALUES (20)")
    spark.sql("INSERT OVERWRITE TABLE graft_tmp.r11_strp PARTITION (p='1') VALUES (30)")
    val rows = spark.table("graft_tmp.r11_strp").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    // p=01 untouched; p=1 replaced
    assert(rows == Set((10, "01"), (30, "1")), rows.toString)
    spark.sql("DROP TABLE graft_tmp.r11_strp")
  }

  test("static overwrite on an INT partition col still value-matches") {
    val base = tools.Tmp.dir("r11_int_part")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    spark.sql("DROP TABLE IF EXISTS graft_tmp.r11_intp")
    spark.sql(s"""CREATE TABLE graft_tmp.r11_intp (v INT)
      USING `graft-seq` PARTITIONED BY (hr INT) LOCATION '$base'""")
    // write a directory spelled hr=01 by hand-renaming the hr=1 dir
    spark.sql("INSERT INTO graft_tmp.r11_intp PARTITION (hr=1) VALUES (10)")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sessionState.newHadoopConf())
    assert(fs.rename(new org.apache.hadoop.fs.Path(base, "hr=1"),
      new org.apache.hadoop.fs.Path(base, "hr=01")))
    spark.sql("REFRESH TABLE graft_tmp.r11_intp")
    // overwrite names it hr=1: the hr=01 spelling is the SAME logical
    // partition of an INT column and must be replaced, not duplicated
    spark.sql("INSERT OVERWRITE TABLE graft_tmp.r11_intp PARTITION (hr=1) VALUES (30)")
    val rows = spark.table("graft_tmp.r11_intp").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(rows == Set((30, 1)), rows.toString)
    spark.sql("DROP TABLE graft_tmp.r11_intp")
  }

  test("DROP PARTITION on a STRING col drops only the exact spelling") {
    val base = tools.Tmp.dir("r11_str_drop")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    spark.sql("DROP TABLE IF EXISTS graft_tmp.r11_strd")
    spark.sql(s"""CREATE TABLE graft_tmp.r11_strd (v INT)
      USING `graft-seq` PARTITIONED BY (p STRING) LOCATION '$base'""")
    spark.sql("INSERT INTO graft_tmp.r11_strd PARTITION (p='01') VALUES (10)")
    spark.sql("INSERT INTO graft_tmp.r11_strd PARTITION (p='1') VALUES (20)")
    Engine.ddl(spark, "ALTER TABLE graft_tmp.r11_strd DROP PARTITION (p='1')")
    val rows = spark.table("graft_tmp.r11_strd").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(rows == Set((10, "01")), rows.toString)
    spark.sql("DROP TABLE graft_tmp.r11_strd")
  }

  test("partition pruning on a STRING col is exact, numeric col by value") {
    import org.apache.spark.sql.types._
    val strTypes = Map("p" -> (StringType: DataType))
    val intTypes = Map("hr" -> (IntegerType: DataType))
    // string: '1' filter must NOT admit directory p=01
    assert(!sources.v2.PartPrune.accepts(
      Seq(org.apache.spark.sql.sources.EqualTo("p", "1")), Map("p" -> "01"), strTypes))
    assert(sources.v2.PartPrune.accepts(
      Seq(org.apache.spark.sql.sources.EqualTo("p", "01")), Map("p" -> "01"), strTypes))
    // int: directory hr=01 must survive an hr=1 filter
    assert(sources.v2.PartPrune.accepts(
      Seq(org.apache.spark.sql.sources.EqualTo("hr", 1)), Map("hr" -> "01"), intTypes))
    assert(!sources.v2.PartPrune.accepts(
      Seq(org.apache.spark.sql.sources.EqualTo("hr", 2)), Map("hr" -> "01"), intTypes))
  }

  // ---- unescape tolerates raw '%' from non-Hive writers ------------------

  test("PartLayout.unescape passes through % not followed by hex digits") {
    assert(sources.v2.PartLayout.unescape("a%2Fb") == "a/b")
    assert(sources.v2.PartLayout.unescape("100%done") == "100%done")
    assert(sources.v2.PartLayout.unescape("pct%") == "pct%")
    assert(sources.v2.PartLayout.unescape("%ZZ") == "%ZZ")
    // round-trip of a value containing '%' itself
    val v = "50% off/now"
    assert(sources.v2.PartLayout.unescape(sources.v2.PartLayout.escape(v)) == v)
  }

  // ---- byte-range file splits in the graft DSv2 sources ------------------

  test("FileSplits.ranges: FileInputFormat-style target splits with slop tail") {
    assert(sources.v2.FileSplits.ranges(100, 1000) == Seq((0L, 100L)))
    // 10% slop: a 1.05x remainder is ONE split, not a task plus a sliver
    assert(sources.v2.FileSplits.ranges(1050, 1000) == Seq((0L, 1050L)))
    assert(sources.v2.FileSplits.ranges(2500, 1000) ==
      Seq((0L, 1000L), (1000L, 1000L), (2000L, 500L)))
    // ranges tile the file exactly
    for (len <- Seq(1L, 999L, 1000L, 1101L, 123457L)) {
      val rs = sources.v2.FileSplits.ranges(len, 1000)
      assert(rs.head._1 == 0 && rs.map(_._2).sum == len)
      assert(rs.sliding(2).forall {
        case Seq((s1, l1), (s2, _)) => s1 + l1 == s2
        case _ => true
      })
    }
    assert(!sources.v2.FileSplits.isSplittable("/x/part-0.gz"))
    assert(sources.v2.FileSplits.isSplittable("/x/part-0.seq"))
  }

  /** Write via `write`, then read the same directory at a tiny split
    * target and at a whole-file target; both reads must agree exactly
    * and the split read must fan out to > 1 scan partition. */
  private def splitRoundTrip(fmt: String, dir: String,
      write: org.apache.spark.sql.DataFrame => Unit,
      read: () => org.apache.spark.sql.DataFrame,
      minSplits: Int = 2): Unit = {
    val rows = 120000
    import spark.implicits._
    val df = spark.range(rows.toLong).select(
      $"id".cast("int").as("k"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("v_"), $"id",
        org.apache.spark.sql.functions.lit("_" + "x" * 40)).as("v"))
    write(df)
    def collectAll() = read().select("k", "v").collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
    spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    val (nSplit, splitRows) =
      try (read().rdd.getNumPartitions, collectAll())
      finally spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
    val (nWhole, wholeRows) = (read().rdd.getNumPartitions, collectAll())
    assert(nSplit >= minSplits,
      s"$fmt: expected >= $minSplits scan partitions at 64k target, got $nSplit")
    assert(nSplit > nWhole, s"$fmt: split plan ($nSplit) not wider than whole-file ($nWhole)")
    assert(splitRows.length == rows, s"$fmt: split read lost/duplicated rows (${splitRows.length})")
    assert(splitRows == wholeRows, s"$fmt: split read diverges from whole-file read")
  }

  test("graft-seq scans split large files on sync boundaries") {
    val dir = tools.Tmp.dir("r11_split_seq")
    splitRoundTrip("graft-seq", dir,
      df => df.write.format("graft-seq").mode("overwrite").save(dir),
      () => spark.read.format("graft-seq")
        .schema("k INT, v STRING").load(dir))
  }

  test("graft-text scans split large files on newline boundaries") {
    val dir = tools.Tmp.dir("r11_split_text")
    splitRoundTrip("graft-text", dir,
      df => df.write.format("graft-text").mode("overwrite").save(dir),
      () => spark.read.format("graft-text")
        .schema("k INT, v STRING").load(dir))
  }

  test("graft-rcfile scans split large files on sync boundaries") {
    val dir = tools.Tmp.dir("r11_split_rc")
    splitRoundTrip("graft-rcfile", dir,
      df => df.write.format("graft-rcfile").mode("overwrite").save(dir),
      () => spark.read.format("graft-rcfile")
        .schema("k INT, v STRING").load(dir))
  }

  test("graft-avro scans split large files on block sync boundaries") {
    val dir = tools.Tmp.dir("r11_split_avro")
    splitRoundTrip("graft-avro", dir,
      df => df.write.format("graft-avro").mode("overwrite").save(dir),
      () => spark.read.format("graft-avro")
        .schema("k INT, v STRING").load(dir))
  }

  test("graft-thrift-seq scans split large files on sync boundaries") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    spark.sql("DROP TABLE IF EXISTS graft_tmp.r11_thrift")
    val base = tools.Tmp.dir("r11_split_thrift")
    Engine.ddl(spark, s"""CREATE TABLE graft_tmp.r11_thrift
      ROW FORMAT SERDE 'org.apache.hadoop.hive.serde2.thrift.ThriftDeserializer'
      WITH SERDEPROPERTIES (
        'serialization.class' = 'org.apache.hadoop.hive.serde2.thrift.test.Complex',
        'serialization.format' = 'org.apache.thrift.protocol.TBinaryProtocol')
      STORED AS SEQUENCEFILE
      LOCATION '$base/t'""")
    Engine.ddl(spark, """INSERT INTO graft_tmp.r11_thrift
      SELECT CAST(id AS INT), concat('record_', id),
             array(CAST(id AS INT)), array(concat('s', id)),
             array(named_struct('myint', CAST(id AS INT),
               'myString', concat('m', id), 'underscore_int', CAST(id + 1 AS INT))),
             map('k', concat('v', id)), NULL, NULL, NULL, NULL
      FROM range(30000)""")
    def read() = spark.table("graft_tmp.r11_thrift").select("aint", "astring")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    val (nSplit, splitRows) =
      try (read().rdd.getNumPartitions,
        read().collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq)
      finally spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
    val wholeRows = read().collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
    assert(nSplit > 1, s"thrift-seq: expected multiple scan partitions, got $nSplit")
    assert(splitRows.length == 30000 && splitRows == wholeRows)
    spark.sql("DROP TABLE graft_tmp.r11_thrift")
  }

  test("a multi-hundred-MB graft-seq file splits at the DEFAULT scan target") {
    // the literal r10-verdict criterion: one large container file, no
    // conf lowering — the default 128 MB maxPartitionBytes alone must
    // fan the scan out, and the row count must survive the split
    import org.apache.spark.sql.functions._
    val dir = tools.Tmp.dir("r11_bigseq")
    val rows = 5000000L
    spark.range(rows).select(col("id").cast("int").as("k"),
        concat(lit("v_"), col("id"), lit("_" + "x" * 40)).as("v"))
      .coalesce(1).write.format("graft-seq").mode("overwrite").save(dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sessionState.newHadoopConf())
    val len = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.isFile).filterNot(_.getPath.getName.startsWith("_"))
      .map(_.getLen).max
    assert(len > 150L * 1024 * 1024, s"fixture too small: $len bytes")
    val df = spark.read.format("graft-seq").schema("k INT, v STRING").load(dir)
    assert(df.rdd.getNumPartitions >= 2,
      s"default-target scan planned ${df.rdd.getNumPartitions} partition(s) for a ${len / 1e6}%.0f MB file")
    assert(df.count() == rows)
  }

  test("gzip text stays one split per file") {
    val dir = tools.Tmp.dir("r11_gz_text")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sessionState.newHadoopConf())
    val out = new java.util.zip.GZIPOutputStream(
      fs.create(new org.apache.hadoop.fs.Path(dir, "part-0.gz")))
    val sb = new StringBuilder
    for (i <- 0 until 50000) sb.append(s"$i\u0001line_$i\n")
    out.write(sb.toString.getBytes("UTF-8")); out.close()
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
    try {
      val df = spark.read.format("graft-text").schema("k INT, v STRING").load(dir)
      assert(df.rdd.getNumPartitions == 1, "gzip must not be byte-range split")
      assert(df.count() == 50000)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
  }

  // ---- compressed text OUTPUT (FileSinkOperator hive.exec.compress.output)

  test("graft-text writes gzip output under compress.codec and reads it back") {
    import spark.implicits._
    val dir = tools.Tmp.dir("r11_txt_gz_w")
    val df = (0 until 2000).map(i => (i, s"v_$i")).toDF("k", "v")
    df.write.format("graft-text").option("compress.codec", "gzip")
      .mode("overwrite").save(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part"))
    assert(files.nonEmpty && files.forall(_.getName.endsWith(".txt.gz")),
      files.map(_.getName).mkString(","))
    // genuinely a gzip stream, and Hive-layout lines inside
    val in = new java.util.zip.GZIPInputStream(
      new java.io.FileInputStream(files.minBy(_.getName)))
    val first = scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().next()
    assert(first.matches("\\d+\u0001v_\\d+"), first)
    val back = spark.read.format("graft-text").schema("k INT, v STRING")
      .load(dir)
    assert(back.count() == 2000)
    assert(back.agg(org.apache.spark.sql.functions.sum("k")).head.getLong(0)
      == (0 until 2000).map(_.toLong).sum)
  }

  test("SET hive.exec.compress.output=true compresses text INSERT output") {
    val d = Engine.ddl(spark, _: String)
    val dir = tools.Tmp.dir("r11_txt_hec")
    d("DROP TABLE IF EXISTS r11_hec")
    // complex type forces the graft-text route (csv can't express it)
    d(s"""CREATE TABLE r11_hec (k INT, a ARRAY<INT>)
          STORED AS TEXTFILE LOCATION '$dir'""")
    d("SET hive.exec.compress.output=true")
    try {
      d("INSERT INTO r11_hec SELECT 1, array(7, 8)")
      // Hive's default codec when only the boolean is set: deflate
      val comp = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("part"))
      assert(comp.nonEmpty && comp.forall(_.getName.endsWith(".deflate")),
        comp.map(_.getName).mkString(","))
      d("SET mapred.output.compression.codec=gzip")
      d("INSERT INTO r11_hec SELECT 2, array(9)")
      val gz = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".txt.gz"))
      assert(gz.nonEmpty, new java.io.File(dir).listFiles()
        .map(_.getName).mkString(","))
    } finally {
      d("SET hive.exec.compress.output=false")
      d("SET mapred.output.compression.codec=")
    }
    // mixed compressed files still read as one table
    val rows = d("SELECT k, a[0] FROM r11_hec ORDER BY k").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(rows == Seq((1, 7), (2, 9)), rows.toString)
    // and plain output resumes once the flag is off
    d("INSERT INTO r11_hec SELECT 3, array(1)")
    assert(new java.io.File(dir).listFiles()
      .exists(f => f.getName.startsWith("part") && f.getName.endsWith(".txt")))
    d("DROP TABLE r11_hec")
  }

  test("graft-seq compresses BLOCK/gzip, stays sync-splittable, reads back") {
    import spark.implicits._
    val dir = tools.Tmp.dir("r11_seq_gz")
    val df = (0 until 120000).map(i => (i, s"payload_value_$i")).toDF("k", "v")
    df.repartition(1).write.format("graft-seq")
      .option("compress.codec", "gzip").option("compress.type", "BLOCK")
      .mode("overwrite").save(dir)
    // the container itself records the codec — verify with the RAW reader
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part")).head
    val conf = spark.sessionState.newHadoopConf()
    val r = new org.apache.hadoop.io.SequenceFile.Reader(conf,
      org.apache.hadoop.io.SequenceFile.Reader.file(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath)))
    try {
      assert(r.isBlockCompressed, "expected BLOCK compression")
      assert(r.getCompressionCodec.isInstanceOf[
        org.apache.hadoop.io.compress.GzipCodec], r.getCompressionCodec)
    } finally r.close()
    // byte-range splits still work on the compressed container (sync
    // markers survive compression — the reason Hive default-compresses
    // seq output without losing parallelism)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    try {
      val back = spark.read.format("graft-seq").schema("k INT, v STRING")
        .load(dir)
      assert(back.rdd.getNumPartitions > 1,
        s"compressed seq should still split, got ${back.rdd.getNumPartitions}")
      assert(back.count() == 120000)
      assert(back.agg(org.apache.spark.sql.functions.sum("k")).head.getLong(0)
        == (0 until 120000).map(_.toLong).sum)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
  }

  test("SET hive.exec.compress.output compresses RCFILE and SEQUENCEFILE inserts") {
    val d = Engine.ddl(spark, _: String)
    val rcDir = tools.Tmp.dir("r11_rc_comp")
    val seqDir = tools.Tmp.dir("r11_seq_comp")
    d("DROP TABLE IF EXISTS r11_rcc"); d("DROP TABLE IF EXISTS r11_seqc")
    d(s"CREATE TABLE r11_rcc (k INT, v STRING) STORED AS RCFILE LOCATION '$rcDir'")
    d(s"CREATE TABLE r11_seqc (k INT, v STRING) STORED AS SEQUENCEFILE LOCATION '$seqDir'")
    d("SET hive.exec.compress.output=true")
    try {
      d("INSERT INTO r11_rcc SELECT id, concat('v', id) FROM range(500)")
      d("INSERT INTO r11_seqc SELECT id, concat('v', id) FROM range(500)")
    } finally d("SET hive.exec.compress.output=false")
    val conf = spark.sessionState.newHadoopConf()
    val rcFile = new java.io.File(rcDir).listFiles()
      .filter(_.getName.startsWith("part")).head
    val rr = new org.apache.hadoop.hive.ql.io.RCFile.Reader(
      org.apache.hadoop.fs.FileSystem.getLocal(conf),
      new org.apache.hadoop.fs.Path(rcFile.getAbsolutePath), conf)
    try {
      assert(rr.isCompressedRCFile, "RCFile value sections not compressed")
      // Hive's default codec when only the boolean is set
      assert(rr.getCompressionCodec.isInstanceOf[
        org.apache.hadoop.io.compress.DefaultCodec], rr.getCompressionCodec)
    } finally rr.close()
    val seqFile = new java.io.File(seqDir).listFiles()
      .filter(_.getName.startsWith("part")).head
    val sr = new org.apache.hadoop.io.SequenceFile.Reader(conf,
      org.apache.hadoop.io.SequenceFile.Reader.file(
        new org.apache.hadoop.fs.Path(seqFile.getAbsolutePath)))
    try assert(sr.isCompressed && !sr.isBlockCompressed,
      "seq default is RECORD compression") finally sr.close()
    // both tables read back intact through the graft scan
    assert(d("SELECT sum(k) FROM r11_rcc").head.getLong(0) == 124750L)
    assert(d("SELECT sum(k) FROM r11_seqc").head.getLong(0) == 124750L)
    d("DROP TABLE r11_rcc"); d("DROP TABLE r11_seqc")
  }

  test("CoW DML works on tables whose files were written compressed") {
    val d = Engine.ddl(spark, _: String)
    val dir = tools.Tmp.dir("r11_cow_comp")
    d("DROP TABLE IF EXISTS r11_cowc")
    d(s"""CREATE TABLE r11_cowc (k INT, v STRING)
          STORED AS SEQUENCEFILE LOCATION '$dir'""")
    d("SET hive.exec.compress.output=true")
    try d("INSERT INTO r11_cowc SELECT id, concat('v', id) FROM range(100)")
    finally d("SET hive.exec.compress.output=false")
    // the UPDATE rewrites affected files through the same writer with
    // compression now OFF — mixed compressed/plain files must coexist
    d("UPDATE r11_cowc SET v = 'patched' WHERE k % 10 = 3")
    val rows = d("SELECT count(*), sum(k) FROM r11_cowc").head
    assert(rows.getLong(0) == 100 && rows.getLong(1) == 4950, rows.toString)
    assert(d("SELECT count(*) FROM r11_cowc WHERE v = 'patched'")
      .head.getLong(0) == 10)
    // DELETE over the mixed layout too
    d("DELETE FROM r11_cowc WHERE k < 20")
    assert(d("SELECT count(*) FROM r11_cowc").head.getLong(0) == 80)
    d("DROP TABLE r11_cowc")
  }

  // ---- EXCHANGE PARTITION refuses a value-equal partition at a graft dest

  test("EXCHANGE PARTITION refuses moving hr=1 onto a graft dest holding hr=01") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    for (t <- Seq("r11_exs", "r11_exd")) spark.sql(s"DROP TABLE IF EXISTS graft_tmp.$t")
    val bs = tools.Tmp.dir("r11_ex_src"); val bd = tools.Tmp.dir("r11_ex_dst")
    spark.sql(s"""CREATE TABLE graft_tmp.r11_exs (v INT)
      USING `graft-seq` PARTITIONED BY (hr INT) LOCATION '$bs'""")
    spark.sql(s"""CREATE TABLE graft_tmp.r11_exd (v INT)
      USING `graft-seq` PARTITIONED BY (hr INT) LOCATION '$bd'""")
    spark.sql("INSERT INTO graft_tmp.r11_exs PARTITION (hr=1) VALUES (10)")
    spark.sql("INSERT INTO graft_tmp.r11_exd PARTITION (hr=1) VALUES (99)")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sessionState.newHadoopConf())
    // respell the dest's directory: same logical partition, different text
    assert(fs.rename(new org.apache.hadoop.fs.Path(bd, "hr=1"),
      new org.apache.hadoop.fs.Path(bd, "hr=01")))
    val e = intercept[Exception](Engine.ddl(spark,
      "ALTER TABLE graft_tmp.r11_exd EXCHANGE PARTITION (hr=1) WITH TABLE graft_tmp.r11_exs"))
    assert(e.getMessage.contains("already exists"), e.getMessage)
    // source unmoved
    assert(fs.exists(new org.apache.hadoop.fs.Path(bs, "hr=1")))
    for (t <- Seq("r11_exs", "r11_exd")) spark.sql(s"DROP TABLE graft_tmp.$t")
  }

  // ---- real pixel decode (javax.imageio) ---------------------------------

  test("hand-rolled PNG decodes to the exact generating pattern") {
    val png = operators.Multimodal.pngEncodeRgb(11, 9,
      (x, y) => (x << 16) | (y << 8) | 200)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null, "JDK reader rejected the hand-rolled PNG")
    assert(img.getWidth == 11 && img.getHeight == 9)
    for (x <- 0 until 11; y <- 0 until 9)
      assert((img.getRGB(x, y) & 0xFFFFFF) == ((x << 16) | (y << 8) | 200),
        s"pixel ($x,$y) decoded wrong")
  }

  test("JPEG pixel decode: exact dims, means within lossy tolerance") {
    // uniform-color image through the JDK's lossy JPEG writer: dimensions
    // survive exactly; channel means land within a small band of the
    // source color (a decoder bug — channel swap, scaling — lands far out)
    val img = new java.awt.image.BufferedImage(40, 30,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 40; y <- 0 until 30)
      img.setRGB(x, y, (180 << 16) | (90 << 8) | 40)
    val buf = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", buf))
    import spark.implicits._
    val media = Seq((7L, buf.toByteArray)).toDF("doc_id", "payload")
    val st = operators.Multimodal.decodePixelStats(spark, media).collect()(0)
    assert(st.width == 40 && st.height == 30)
    assert(math.abs(st.mean_r - 180) < 8, st.mean_r.toString)
    assert(math.abs(st.mean_g - 90) < 8, st.mean_g.toString)
    assert(math.abs(st.mean_b - 40) < 8, st.mean_b.toString)
    assert(st.feature.length == 64)
  }

  test("audio sample decode survives truncated data chunks") {
    import spark.implicits._
    // a WAV whose data chunk declares more bytes than the file carries:
    // the decoder must clamp to what exists, not walk off the end
    val full = operators.Multimodal.synthWavPcm(spark,
      Seq(7L).toDF("doc_id")).collect()(0).getAs[Array[Byte]]("payload")
    val truncated = full.take(full.length - 10)
    val st = operators.Multimodal.decodeAudioStats(spark,
      Seq((7L, truncated)).toDF("doc_id", "payload")).collect()(0)
    assert(st.channels == 2 && st.n_values == (full.length - 44 - 10) / 2)
    // and non-WAV bytes flow through as unknown rows
    val bad = operators.Multimodal.decodeAudioStats(spark,
      Seq((8L, Array[Byte](9, 9, 9))).toDF("doc_id", "payload")).collect()(0)
    assert(bad.channels == -1L)
  }

  test("aHash on real pixels: deterministic, sensitive, corrupt-safe") {
    import spark.implicits._
    def stats(id: Long) = operators.Multimodal.decodePixelStats(spark,
      operators.Multimodal.synthPng(spark, Seq(id).toDF("doc_id"))).collect()(0)
    val (a, b) = (stats(5L), stats(6L))
    val (ha, hb) = (operators.Multimodal.aHash(a.feature),
      operators.Multimodal.aHash(b.feature))
    assert(ha == operators.Multimodal.aHash(stats(5L).feature), "not deterministic")
    assert(ha != 0L && ha != -1L)
    // gradient images share structure but differ in mean split → need not
    // collide; the important pin is corrupt payloads flow through as rows
    val corrupt = Seq((99L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val c = operators.Multimodal.decodePixelStats(spark, corrupt).collect()(0)
    assert(c.width == -1L && c.feature.isEmpty &&
      operators.Multimodal.aHash(c.feature) == -1L)
    assert(hb != 0L)
  }

  // ---- hive.mapred.mode=strict / hive.strict.checks.* query guards -------

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val before = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally before.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("strict checks are OFF by default and refuse under strict mode") {
    Tables.views(spark, sf, "nation", "region")
    // nonstrict (default): all three shapes pass
    assert(spark.sql("SELECT n_name FROM nation ORDER BY n_name").count() > 0)
    assert(spark.sql("SELECT * FROM nation JOIN region").count() > 0)
    withConfs("hive.mapred.mode" -> "strict") {
      val e1 = intercept[Exception](
        spark.sql("SELECT n_name FROM nation ORDER BY n_name").collect())
      assert(e1.getMessage.contains("LIMIT must also be specified"))
      // the TopN shape stays legal
      assert(spark.sql(
        "SELECT n_name FROM nation ORDER BY n_name LIMIT 3").count() == 3)
      val e2 = intercept[Exception](
        spark.sql("SELECT * FROM nation JOIN region").collect())
      assert(e2.getMessage.contains("cartesian product is not allowed"))
      // a conditioned join is fine
      assert(spark.sql("""SELECT * FROM nation n JOIN region r
        ON n.n_regionkey = r.r_regionkey""").count() > 0)
    }
  }

  test("hive.strict.checks.* toggles override the legacy mode per check") {
    Tables.views(spark, sf, "nation", "region")
    withConfs("hive.mapred.mode" -> "strict",
      "hive.strict.checks.cartesian.product" -> "false") {
      // cartesian explicitly re-allowed; orderby still strict
      assert(spark.sql("SELECT * FROM nation JOIN region").count() > 0)
      intercept[Exception](
        spark.sql("SELECT n_name FROM nation ORDER BY n_name").collect())
    }
    withConfs("hive.strict.checks.no.partition.filter" -> "true") {
      val base = tools.Tmp.dir("r11_strictp")
      spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
      spark.sql("DROP TABLE IF EXISTS graft_tmp.r11_strictp")
      spark.sql(s"""CREATE TABLE graft_tmp.r11_strictp (v INT)
        USING parquet PARTITIONED BY (ds STRING) LOCATION '$base'""")
      spark.sql(
        "INSERT INTO graft_tmp.r11_strictp PARTITION (ds='a') VALUES (1)")
      val e = intercept[Exception](
        spark.sql("SELECT count(1) FROM graft_tmp.r11_strictp").collect())
      assert(e.getMessage.contains("no partition predicate"), e.getMessage)
      // a partition filter anywhere in the plan clears it
      assert(spark.sql("""SELECT count(1) FROM graft_tmp.r11_strictp
        WHERE ds = 'a'""").collect()(0).getLong(0) == 1L)
      // unpartitioned tables are never flagged
      assert(spark.sql("SELECT count(1) FROM nation").count() == 1)
      spark.sql("DROP TABLE graft_tmp.r11_strictp")
    }
  }

  test("strict pruning fires on partitioned graft DSv2 tables too") {
    withConfs("hive.strict.checks.no.partition.filter" -> "true") {
      val base = tools.Tmp.dir("r11_strictg")
      spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
      spark.sql("DROP TABLE IF EXISTS graft_tmp.r11_strictg")
      spark.sql(s"""CREATE TABLE graft_tmp.r11_strictg (v INT)
        USING `graft-seq` PARTITIONED BY (p STRING) LOCATION '$base'""")
      spark.sql(
        "INSERT INTO graft_tmp.r11_strictg PARTITION (p='x') VALUES (1)")
      val e = intercept[Exception](
        spark.sql("SELECT count(1) FROM graft_tmp.r11_strictg").collect())
      assert(e.getMessage.contains("no partition predicate"), e.getMessage)
      assert(spark.sql("""SELECT count(1) FROM graft_tmp.r11_strictg
        WHERE p = 'x'""").collect()(0).getLong(0) == 1L)
      spark.sql("DROP TABLE graft_tmp.r11_strictg")
    }
  }

  // ---- dynamic-partition INSERT guards ------------------------------------

  test("dyn-part guards: ordering, strict mode, disabled, and the cap") {
    Tables.views(spark, sf, "nation")
    val base = tools.Tmp.dir("r11_dynguard")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    spark.sql("DROP TABLE IF EXISTS graft_tmp.r11_dyng")
    spark.sql(s"""CREATE TABLE graft_tmp.r11_dyng (a STRING)
      USING parquet PARTITIONED BY (p STRING, q STRING) LOCATION '$base'""")
    // static after dynamic: refused regardless of mode
    val e0 = intercept[Exception](Engine.sql(spark, sf,
      """INSERT OVERWRITE TABLE graft_tmp.r11_dyng PARTITION (p, q='1')
         SELECT n_name, CAST(n_regionkey AS STRING) FROM nation"""))
    assert(e0.getMessage.contains("cannot be the parent of a static"))
    // hybrid static-then-dynamic stays legal (the a16 shape)
    Engine.sql(spark, sf,
      """INSERT OVERWRITE TABLE graft_tmp.r11_dyng PARTITION (p='s', q)
         SELECT n_name, CAST(n_regionkey AS STRING) FROM nation""")
    assert(spark.table("graft_tmp.r11_dyng").count() > 0)
    withConfs("hive.exec.dynamic.partition.mode" -> "strict") {
      val e = intercept[Exception](Engine.sql(spark, sf,
        """INSERT OVERWRITE TABLE graft_tmp.r11_dyng PARTITION (p, q)
           SELECT n_name, 'a', CAST(n_regionkey AS STRING) FROM nation"""))
      assert(e.getMessage.contains("at least one static partition"))
    }
    withConfs("hive.exec.dynamic.partition" -> "false") {
      val e = intercept[Exception](Engine.sql(spark, sf,
        """INSERT OVERWRITE TABLE graft_tmp.r11_dyng PARTITION (p='s', q)
           SELECT n_name, CAST(n_regionkey AS STRING) FROM nation"""))
      assert(e.getMessage.contains("Dynamic partition is disabled"))
    }
    withConfs("hive.exec.max.dynamic.partitions" -> "2") {
      val e = intercept[Exception](Engine.sql(spark, sf,
        """INSERT OVERWRITE TABLE graft_tmp.r11_dyng PARTITION (p='s', q)
           SELECT n_name, CAST(n_nationkey AS STRING) FROM nation"""))
      assert(e.getMessage.contains("hive.exec.max.dynamic.partitions"))
      // at or under the cap: proceeds (5 regions > 2, 1 constant <= 2)
      Engine.sql(spark, sf,
        """INSERT OVERWRITE TABLE graft_tmp.r11_dyng PARTITION (p='s', q)
           SELECT n_name, 'one' FROM nation""")
    }
    spark.sql("DROP TABLE graft_tmp.r11_dyng")
  }

  // ---- strict type-safety (ErrorMsg 10123/10124) --------------------------

  test("strict mode refuses bigint-vs-string and bigint-vs-double compares") {
    Tables.views(spark, sf, "orders")
    // default nonstrict: both shapes run (Hive only WARNs)
    assert(spark.sql(
      "SELECT count(1) FROM orders WHERE o_orderkey = '1'").count() == 1)
    withConfs("hive.mapred.mode" -> "strict") {
      val e1 = intercept[Exception](spark.sql(
        "SELECT * FROM orders WHERE CAST(1 AS BIGINT) = '1'").collect())
      assert(e1.getMessage.contains("comparing bigints and strings"),
        e1.getMessage)
      val e2 = intercept[Exception](spark.sql(
        "SELECT * FROM orders WHERE o_orderkey = o_totalprice").collect())
      assert(e2.getMessage.contains("comparing bigints and doubles"),
        e2.getMessage)
      // bigint vs int literal coerces long-to-long — stays legal
      assert(spark.sql(
        "SELECT count(1) FROM orders WHERE o_orderkey = 1").count() == 1)
      // the fine-grained toggle re-allows under the legacy mode
      withConfs("hive.strict.checks.type.safety" -> "false") {
        assert(spark.sql(
          "SELECT count(1) FROM orders WHERE o_orderkey = '1'").count() == 1)
      }
    }
  }

  // ---- Hive execution-conf bridge ------------------------------------------

  test("SET mapred.reduce.tasks / hive.auto.convert.join steer the engine") {
    Tables.views(spark, sf, "nation", "region")
    val origShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    def joinPlan: String = spark.sql(
      """SELECT * FROM nation n JOIN region r
         ON n.n_regionkey = r.r_regionkey""")
      .queryExecution.sparkPlan.toString
    try {
      Engine.sql(spark, sf, "SET mapred.reduce.tasks=7")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "7")
      assert(spark.conf.get("mapred.reduce.tasks") == "7")
      // -1 = engine decides: back to the session default
      Engine.sql(spark, sf, "SET mapred.reduce.tasks=-1")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == origShuffle)
      assert(joinPlan.contains("BroadcastHashJoin"))
      Engine.sql(spark, sf, "SET hive.auto.convert.join=false")
      assert(!joinPlan.contains("BroadcastHashJoin"),
        "mapjoin auto-conversion still broadcasting after disable")
      Engine.sql(spark, sf, "SET hive.auto.convert.join=true")
      assert(joinPlan.contains("BroadcastHashJoin"))
      // unmapped hive.* keys stay inert session confs (g259)
      Engine.sql(spark, sf, "SET hive.map.aggr=true")
      assert(spark.conf.get("hive.map.aggr") == "true")
      // skew-join and CBO toggles
      Engine.sql(spark, sf, "SET hive.optimize.skewjoin=false")
      assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "false")
      Engine.sql(spark, sf, "SET hive.optimize.skewjoin=true")
      assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
      Engine.sql(spark, sf, "SET hive.cbo.enable=true")
      assert(spark.conf.get("spark.sql.cbo.enabled") == "true")
      spark.conf.unset("spark.sql.cbo.enabled")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", origShuffle)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("hive.stats.autogather refreshes catalog stats after INSERT") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    spark.sql("DROP TABLE IF EXISTS graft_tmp.r11_ag")
    spark.sql("CREATE TABLE graft_tmp.r11_ag (v INT) USING parquet")
    def rowCount: Option[BigInt] =
      spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier("graft_tmp.r11_ag"))
        .stats.flatMap(_.rowCount)
    // default off: INSERT leaves no rowCount stat
    Engine.sql(spark, sf,
      "INSERT INTO graft_tmp.r11_ag SELECT CAST(id AS INT) FROM range(10)")
    assert(rowCount.isEmpty)
    withConfs("hive.stats.autogather" -> "true") {
      Engine.sql(spark, sf,
        "INSERT INTO graft_tmp.r11_ag SELECT CAST(id AS INT) FROM range(10)")
      assert(rowCount.contains(BigInt(20)), s"stats not gathered: $rowCount")
    }
    spark.sql("DROP TABLE graft_tmp.r11_ag")
  }

  // ---- hive.merge.* small-file auto-merge after INSERT ---------------------

  test("hive.merge.mapfiles merges only the statement's own output files") {
    val base = tools.Tmp.dir("r11_automerge")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    spark.sql("DROP TABLE IF EXISTS graft_tmp.r11_am")
    spark.sql(s"""CREATE TABLE graft_tmp.r11_am (v INT)
      USING parquet LOCATION '$base'""")
    def files: Set[String] = {
      val p = new org.apache.hadoop.fs.Path(base)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      val b = Set.newBuilder[String]
      while (it.hasNext) {
        val st = it.next()
        val n = st.getPath.getName
        if (st.isFile && !n.startsWith("_") && !n.startsWith("."))
          b += st.getPath.toUri.toString
      }
      b.result()
    }
    // default: no merge — an 8-partition insert leaves 8 files
    Engine.sql(spark, sf, """INSERT INTO graft_tmp.r11_am
      SELECT /*+ REPARTITION(8) */ CAST(id AS INT) FROM range(100)""")
    val first = files
    assert(first.size == 8, s"expected 8 unmerged files, got ${first.size}")
    // opt-in: the second insert's 8 outputs merge to 1; the first
    // insert's files are untouched (same names on disk)
    withConfs("hive.merge.mapfiles" -> "true") {
      Engine.sql(spark, sf, """INSERT INTO graft_tmp.r11_am
        SELECT /*+ REPARTITION(8) */ CAST(id AS INT) + 100 FROM range(100)""")
    }
    val second = files
    assert(first.subsetOf(second), "pre-existing files were rewritten")
    assert(second.size == first.size + 1,
      s"expected ${first.size + 1} files after merge, got ${second.size}")
    assert(spark.table("graft_tmp.r11_am").count() == 200)
    assert(spark.sql("SELECT sum(v) FROM graft_tmp.r11_am")
      .collect()(0).getLong(0) == (0 until 200).sum.toLong)
    // above the avgsize threshold: no merge (files stay as written)
    withConfs("hive.merge.mapfiles" -> "true",
      "hive.merge.smallfiles.avgsize" -> "1") {
      Engine.sql(spark, sf, """INSERT INTO graft_tmp.r11_am
        SELECT /*+ REPARTITION(4) */ CAST(id AS INT) FROM range(10)""")
    }
    assert(files.size == second.size + 4, "merge fired above the threshold")
    spark.sql("DROP TABLE graft_tmp.r11_am")
  }

  test("auto-merge never touches bucketed tables (bucket-id file naming)") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    spark.sql("DROP TABLE IF EXISTS graft_tmp.r11_amb")
    spark.sql("""CREATE TABLE graft_tmp.r11_amb (k INT, v INT)
      USING parquet CLUSTERED BY (k) INTO 4 BUCKETS""")
    withConfs("hive.merge.mapfiles" -> "true") {
      Engine.sql(spark, sf, """INSERT INTO graft_tmp.r11_amb
        SELECT CAST(id % 16 AS INT), CAST(id AS INT) FROM range(100)""")
    }
    // a merge would have rewritten the bucket files into cow-* names and
    // broken bucket-id derivation; the table must still read and keep
    // its 4 bucket files
    assert(spark.table("graft_tmp.r11_amb").count() == 100)
    val loc = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("graft_tmp.r11_amb"))
      .location
    val p = new org.apache.hadoop.fs.Path(loc)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(p).filter(_.isFile).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
    assert(names.forall(_.startsWith("part-")),
      s"bucket files rewritten: ${names.mkString(",")}")
    spark.sql("DROP TABLE graft_tmp.r11_amb")
  }

  test("a quoted comma in a static partition value is not a dynamic column") {
    val base = tools.Tmp.dir("r11_dyncomma")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    spark.sql("DROP TABLE IF EXISTS graft_tmp.r11_dync")
    spark.sql(s"""CREATE TABLE graft_tmp.r11_dync (a STRING)
      USING parquet PARTITIONED BY (p STRING) LOCATION '$base'""")
    withConfs("hive.exec.dynamic.partition" -> "false") {
      // fully static: must pass even with dynamic partitions disabled
      Engine.sql(spark, sf, """INSERT OVERWRITE TABLE graft_tmp.r11_dync
        PARTITION (p='a,b') SELECT n_name FROM nation""")
    }
    assert(spark.sql(
      "SELECT count(1) FROM graft_tmp.r11_dync WHERE p = 'a,b'")
      .collect()(0).getLong(0) > 0)
    spark.sql("DROP TABLE graft_tmp.r11_dync")
  }

  test("strict pruning accepts join-ON predicates, aliases, and maintenance") {
    Tables.views(spark, sf, "nation")
    val base = tools.Tmp.dir("r11_strictp2")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    spark.sql("DROP TABLE IF EXISTS graft_tmp.r11_sp2")
    spark.sql(s"""CREATE TABLE graft_tmp.r11_sp2 (v INT)
      USING parquet PARTITIONED BY (ds STRING) LOCATION '$base'""")
    spark.sql("INSERT INTO graft_tmp.r11_sp2 PARTITION (ds='a') VALUES (1)")
    spark.sql("INSERT INTO graft_tmp.r11_sp2 PARTITION (ds='b') VALUES (2)")
    withConfs("hive.strict.checks.no.partition.filter" -> "true") {
      // partition predicate in the JOIN condition, not a Filter
      assert(spark.sql("""SELECT count(1) FROM graft_tmp.r11_sp2 t
        JOIN nation n ON t.ds = 'a' AND t.v = n.n_nationkey""").count() == 1)
      // predicate over a renaming subquery alias
      assert(spark.sql("""SELECT count(1) FROM
        (SELECT ds AS d, v FROM graft_tmp.r11_sp2) q
        WHERE q.d = 'a'""").count() == 1)
      // maintenance DDL is a task, not a query: CONCATENATE must run
      Engine.sql(spark, sf,
        "ALTER TABLE graft_tmp.r11_sp2 PARTITION (ds='a') CONCATENATE")
      // and the unfiltered scan is still refused
      intercept[Exception](
        spark.sql("SELECT count(1) FROM graft_tmp.r11_sp2").collect())
      // a BARE equi-join on the partition column prunes nothing and is
      // also refused (only single-side pushable conjuncts count)
      val e2 = intercept[Exception](spark.sql(
        """SELECT count(1) FROM graft_tmp.r11_sp2 a
           JOIN graft_tmp.r11_sp2 b ON a.ds = b.ds""").collect())
      assert(e2.getMessage.contains("no partition predicate"))
      // but filter-via-dimension DOES count: the dim filter transfers to
      // the fact's partition column through the equi-join (constant
      // propagation — the shape Hive accepts)
      assert(spark.sql(
        """SELECT count(1) FROM graft_tmp.r11_sp2 t
           JOIN nation n ON t.ds = CAST(n.n_name AS STRING)
           WHERE n.n_name = 'a'""").count() == 1)
      // an ON predicate on the PRESERVED side of a LEFT JOIN does not
      // filter that side's scan — still refused
      val e3 = intercept[Exception](spark.sql(
        """SELECT count(1) FROM graft_tmp.r11_sp2 t
           LEFT JOIN nation n ON t.ds = 'a' AND t.v = n.n_nationkey""")
        .collect())
      assert(e3.getMessage.contains("no partition predicate"))
      // the WHERE-spelled bare equi-join is the same plan shape and is
      // refused identically (attr=attr never prunes by itself)
      val e4 = intercept[Exception](spark.sql(
        """SELECT count(1) FROM graft_tmp.r11_sp2 a, graft_tmp.r11_sp2 b
           WHERE a.ds = b.ds""").collect())
      assert(e4.getMessage.contains("no partition predicate"))
    }
    spark.sql("DROP TABLE graft_tmp.r11_sp2")
  }

  test("re-enabling auto.convert.join keeps an explicit size bound") {
    val orig = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      Engine.sql(spark, sf,
        "SET hive.auto.convert.join.noconditionaltask.size=12345678")
      Engine.sql(spark, sf, "SET hive.auto.convert.join=false")
      assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1")
      // size confs are INERT while conversion is disabled (Hive parity):
      // setting one must not silently re-enable the broadcast
      Engine.sql(spark, sf, "SET hive.mapjoin.smalltable.filesize=999")
      assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1")
      Engine.sql(spark, sf, "SET hive.auto.convert.join=true")
      assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        == "12345678", "explicit size bound lost on re-enable")
      // a trailing semicolon reaches the same handler (Engine.sql path)
      Engine.sql(spark, sf, "SET mapred.reduce.tasks=9;")
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "9")
      Engine.sql(spark, sf, "SET mapred.reduce.tasks=-1")
      // boolean bridges validate their value
      val eb = intercept[Exception](
        Engine.sql(spark, sf, "SET hive.cbo.enable=maybe"))
      assert(eb.getMessage.contains("expects true or false"))
    } finally {
      orig match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
      spark.conf.unset("hive.auto.convert.join.noconditionaltask.size")
      spark.conf.unset("hive.mapjoin.smalltable.filesize")
      spark.conf.unset("hive.auto.convert.join")
    }
  }

  test("auto-merge scope spells escaped partition values the way Spark does") {
    val base = tools.Tmp.dir("r11_amesc")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    spark.sql("DROP TABLE IF EXISTS graft_tmp.r11_ame")
    spark.sql(s"""CREATE TABLE graft_tmp.r11_ame (v INT)
      USING parquet PARTITIONED BY (p STRING) LOCATION '$base'""")
    withConfs("hive.merge.mapfiles" -> "true") {
      // a colon must be escaped to %3A in the directory name; the scoped
      // listing has to find it or the merge silently no-ops
      Engine.sql(spark, sf, """INSERT INTO graft_tmp.r11_ame
        PARTITION (P='a:b')
        SELECT /*+ REPARTITION(4) */ CAST(id AS INT) FROM range(40)""")
    }
    val dir = new org.apache.hadoop.fs.Path(base, "p=a%3Ab")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val n = fs.listStatus(dir).count(st => st.isFile &&
      !st.getPath.getName.startsWith("_") &&
      !st.getPath.getName.startsWith("."))
    assert(n == 1, s"expected 1 merged file in p=a%3Ab, got $n")
    assert(spark.sql(
      "SELECT count(1) FROM graft_tmp.r11_ame WHERE p = 'a:b'")
      .collect()(0).getLong(0) == 40)
    spark.sql("DROP TABLE graft_tmp.r11_ame")
  }

  test("hive.merge merges per partition directory on dynamic inserts") {
    val base = tools.Tmp.dir("r11_automerge_p")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    spark.sql("DROP TABLE IF EXISTS graft_tmp.r11_amp")
    spark.sql(s"""CREATE TABLE graft_tmp.r11_amp (v INT)
      USING parquet PARTITIONED BY (p STRING) LOCATION '$base'""")
    withConfs("hive.merge.mapfiles" -> "true") {
      Engine.sql(spark, sf, """INSERT OVERWRITE TABLE graft_tmp.r11_amp
        PARTITION (p)
        SELECT /*+ REPARTITION(6) */ CAST(id AS INT),
               CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END FROM range(60)""")
    }
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("a", "b").foreach { pv =>
      val dir = new org.apache.hadoop.fs.Path(p, s"p=$pv")
      val n = fs.listStatus(dir).count(st => st.isFile &&
        !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      assert(n == 1, s"partition p=$pv has $n files, expected 1 merged")
    }
    assert(spark.table("graft_tmp.r11_amp").count() == 60)
    spark.sql("DROP TABLE graft_tmp.r11_amp")
  }
}
