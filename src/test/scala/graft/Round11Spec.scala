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
}
