package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Seeded randomized round-trip property for the graft DSv2 sources:
  * write a batch of adversarial rows (nulls everywhere, empty strings,
  * unicode, extreme numerics), read it back, compare as multisets.
  *
  * Also pins the text-vs-binary robustness CONTRAST: the binary RCFile
  * serde must round-trip strings containing the \x01 field separator and
  * newlines — bytes that corrupt delimiter-based text layouts by design
  * (Hive's own text-table hazard, shared by graft-seq for parity).
  */
class SourceRoundTripSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", IntegerType),
    StructField("s", StringType),
    StructField("d", DoubleType),
    StructField("l", LongType),
    StructField("b", BooleanType)))

  /** Deterministic adversarial batch; `textSafe` keeps strings free of
    * the control bytes a delimiter-based text layout cannot carry. */
  private def batch(textSafe: Boolean): Seq[Row] = {
    val rnd = new scala.util.Random(42)
    val specials: Seq[String] =
      Seq("", " ", "  pad  ", "héllo wörld", "日本語テキスト", "a" * 500,
        "NULL", "null", "-", "0", "1e3", "true") ++
        // a literal "\N" string is indistinguishable from NULL in the
        // delimiter-text layouts (Hive's own sentinel ambiguity) — only
        // the binary cells must preserve it, along with delimiter bytes
        (if (textSafe) Nil
         else Seq("\\N", "a\u0001b", "line1\nline2", "tab\there"))
    val strings = specials ++ (1 to 50).map(_ =>
      rnd.alphanumeric.take(rnd.nextInt(20)).mkString)
    val doubles = Seq(0.0, -0.0, 1.5e308, -2.2e-308, 123.456,
      Double.MaxValue, Double.MinPositiveValue) ++
      (1 to 20).map(_ => rnd.nextDouble() * 1e6 - 5e5)
    val longs = Seq(0L, Long.MaxValue, Long.MinValue, -1L) ++
      (1 to 20).map(_ => rnd.nextLong())
    (0 until 200).map { i =>
      Row(
        if (i % 17 == 0) null else Int.box(rnd.nextInt()),
        if (i % 13 == 0) null else strings(i % strings.size),
        if (i % 11 == 0) null else Double.box(doubles(i % doubles.size)),
        if (i % 7 == 0) null else Long.box(longs(i % longs.size)),
        if (i % 5 == 0) null else Boolean.box(rnd.nextBoolean()))
    }
  }

  private def canon(r: Row): (Option[Int], Option[String], Option[String],
      Option[Long], Option[Boolean]) =
    (Option(r.get(0)).map(_.asInstanceOf[Int]),
      Option(r.get(1)).map(_.asInstanceOf[String]),
      // doubles via their exact bit-preserving text form
      Option(r.get(2)).map(_.asInstanceOf[Double].toString),
      Option(r.get(3)).map(_.asInstanceOf[Long]),
      Option(r.get(4)).map(_.asInstanceOf[Boolean]))

  private def roundTrip(fmt: String, opts: Map[String, String],
      textSafe: Boolean): Unit = {
    val rows = batch(textSafe)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val dir = Files.createTempDirectory(s"rt_${fmt.replace('-', '_')}")
      .toString + "/t"
    df.write.format(fmt).options(opts).mode("overwrite").save(dir)
    val back = spark.read.options(opts).schema(schema).format(fmt).load(dir)
      .collect()
    assert(back.length == rows.length, s"$fmt: ${back.length}")
    val (got, want) = (back.toSeq.map(canon).sortBy(_.toString),
      rows.map(canon).sortBy(_.toString))
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"$fmt row $i: got $g want $w")
    }
  }

  test("graft-rcfile (binary default) round-trips adversarial rows incl. \\x01 and newlines") {
    roundTrip("graft-rcfile", Map.empty, textSafe = false)
  }

  test("graft-rcfile (ColumnarSerDe text) round-trips text-safe adversarial rows") {
    roundTrip("graft-rcfile",
      Map("serde" -> "org.apache.hadoop.hive.serde2.columnar.ColumnarSerDe"),
      textSafe = true)
  }

  test("graft-seq round-trips text-safe adversarial rows") {
    roundTrip("graft-seq", Map.empty, textSafe = true)
  }

  test("graft-text round-trips text-safe adversarial rows") {
    roundTrip("graft-text", Map.empty, textSafe = true)
  }

  test("graft-text round-trips complex-typed adversarial rows") {
    // the reason graft-text exists: LazySimpleSerDe's nested
    // \002/\003/deeper separators for array/map/struct columns — the csv
    // datasource cannot express these at all. Nulls at every level,
    // empty containers, and unicode all round-trip.
    val cschema = StructType(Seq(
      StructField("k", IntegerType),
      StructField("arr", ArrayType(StringType)),
      StructField("m", MapType(StringType, IntegerType)),
      StructField("st", StructType(Seq(
        StructField("x", IntegerType),
        StructField("tags", ArrayType(StringType))))),
      StructField("deep", ArrayType(ArrayType(IntegerType)))))
    val rnd = new scala.util.Random(7)
    val rows = (0 until 120).map { i =>
      Row(
        Int.box(i),
        if (i % 11 == 0) null
        else if (i % 9 == 0) Seq.empty[String]
        else Seq(s"v$i", "héllo", if (i % 3 == 0) null else "x" * (i % 7)),
        if (i % 13 == 0) null
        else Map(s"k$i" -> Int.box(i), "fixed" -> Int.box(rnd.nextInt(100))),
        if (i % 17 == 0) null
        else Row(if (i % 5 == 0) null else Int.box(i * 2),
          Seq(s"t$i", s"u$i")),
        if (i % 19 == 0) null
        else Seq(Seq(Int.box(i), null), Seq.empty[Integer], null))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), cschema)
    val dir = Files.createTempDirectory("rt_text_cx").toString + "/t"
    df.write.format("graft-text").mode("overwrite").save(dir)
    val back = spark.read.format("graft-text").schema(cschema).load(dir)
      .collect()
    assert(back.length == rows.length, back.length)
    def canonV(v: Any): String = v match {
      case s: scala.collection.Seq[_] => s.map(canonV).mkString("[", ",", "]")
      case m: scala.collection.Map[_, _] => m.toSeq
        .map { case (k, v2) => canonV(k) + ":" + canonV(v2) }
        .sorted.mkString("{", ",", "}")
      case r: Row => r.toSeq.map(canonV).mkString("(", ",", ")")
      case other => String.valueOf(other)
    }
    def canonC(r: Row) = canonV(r)
    val (got, want) = (back.toSeq.map(canonC).sorted, rows.map(canonC).sorted)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"row $i: got $g want $w")
    }
  }

  test("graft-thrift-seq round-trips adversarial strings incl. \\x01 and newlines") {
    // the thrift protocol is length-prefixed binary: delimiter bytes,
    // newlines and the text-null sentinel all pass through literally.
    // CONTRACT PIN: default-requiredness thrift PRIMITIVES are not
    // nullable on the wire — a NULL int would silently read back as the
    // thrift default 0, so the writer REFUSES it loudly (r10 advisor
    // seam); null STRINGS stay nullable and round-trip.
    val rows = batch(textSafe = false).map(r =>
      Row(Option(r.get(0)).getOrElse(0), r.get(1),
        Option(r.get(3)).flatMap(_ => Option(r.get(0))).getOrElse(0)))
    val tschema = StructType(Seq(
      StructField("myint", IntegerType),
      StructField("myString", StringType),
      StructField("underscore_int", IntegerType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), tschema)
    val dir = Files.createTempDirectory("rt_thrift").toString + "/t"
    val cls = "org.apache.hadoop.hive.serde2.thrift.test.IntString"
    df.write.format("graft-thrift-seq").option("thrift.class", cls)
      .mode("overwrite").save(dir)
    val back = spark.read.format("graft-thrift-seq")
      .option("thrift.class", cls).schema(tschema).load(dir).collect()
    def canon(r: Row) = (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)))
    val (got, want) = (back.toSeq.map(canon).sortBy(_.toString),
      rows.map(canon).sortBy(_.toString))
    assert(got == want, got.zip(want).find { case (g, w) => g != w })
  }

  test("graft-thrift-seq refuses NULL into a non-optional primitive field") {
    val tschema = StructType(Seq(
      StructField("myint", IntegerType),
      StructField("myString", StringType),
      StructField("underscore_int", IntegerType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1, "ok", 2), Row(null, "null int", 3)), 1), tschema)
    val dir = Files.createTempDirectory("rt_thrift_null").toString + "/t"
    val cls = "org.apache.hadoop.hive.serde2.thrift.test.IntString"
    val e = intercept[org.apache.spark.SparkException](
      df.write.format("graft-thrift-seq").option("thrift.class", cls)
        .mode("overwrite").save(dir))
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " " + chain(t.getCause)
    assert(chain(e).contains("NULL for non-optional primitive"), chain(e).take(400))
  }
}
