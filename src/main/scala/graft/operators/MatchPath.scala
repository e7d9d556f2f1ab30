package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Row-sequence pattern matching over ordered partitions — the reference's
  * MatchPath PTF (/root/reference/ql/src/java/org/apache/hadoop/hive/ql/udf/
  * ptf/MatchPath.java), a proto-MATCH_RECOGNIZE.
  *
  * Spark-first shape: no built-in exists, so per SURVEY.md §2.5 this uses
  * `groupByKey(partition).flatMapSortedGroups` — rows are classified into
  * single-char symbols by boolean predicates, and a regex over the
  * concatenated symbol string yields one output row per match span.
  *
  * Scale: one shuffle on the partition key (same cost as any window over
  * that key), then streaming per-group evaluation. Only the symbol chars
  * are buffered per group (1 byte/row), so even million-row keys are cheap.
  */
object MatchPath {

  /** @param symbols (symbolChar, predicate); first match wins, unmatched
    *                rows become '_'
    * @param ordA/ordB long-valued ordering columns (e.g. unix_micros(ts),
    *                event_id) defining row order within a partition
    * @param pattern regex over symbol chars, e.g. "c+p"
    */
  def matchPath(
      spark: SparkSession,
      df: DataFrame,
      partitionCol: Column,
      ordA: Column,
      ordB: Column,
      symbols: Seq[(Char, Column)],
      pattern: String): DataFrame = {
    import spark.implicits._

    val symCol = symbols.foldRight(lit("_")) { case ((c, pred), acc) =>
      when(pred, lit(c.toString)).otherwise(acc)
    }
    val prepared = df
      .select(partitionCol.cast("string").as("pk"),
        ordA.cast("long").as("o1"), ordB.cast("long").as("o2"),
        symCol.as("sym"))
      .as[(String, Long, Long, String)]

    // compiled once on the driver, serialized into the task closure
    // (Pattern is Serializable) instead of recompiling per group
    val regex = java.util.regex.Pattern.compile(pattern)
    prepared
      .groupByKey(_._1)
      .flatMapSortedGroups(col("o1"), col("o2")) { (key, rows) =>
        val syms = new StringBuilder
        rows.foreach(r => syms.append(r._4))
        val m = regex.matcher(syms)
        val res = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int, String)]
        while (m.find()) res += ((key, m.start(), m.end() - 1, m.group()))
        res.iterator
      }
      .toDF("pk", "match_start", "match_end", "matched_symbols")
  }

  /** The reference's FULL MatchPath output contract (MatchPath.java:
    * one row per matched path, carrying the path-START row's columns plus
    * `tpath`, the matched rows as array<struct>), for the SQL-text PTF
    * surface. The caller applies the invocation's result-expression list
    * (Hive's last argument) with `selectExpr` on top — `tpath[0].col`,
    * `size(tpath)` etc. resolve naturally against the array column.
    *
    * Same scale shape as the simple form: one shuffle on the partition
    * key, then a streaming per-group pass. The group's rows are buffered
    * to build `tpath` — the reference PTF materializes partitions too
    * (PTFPartition); keys are expected user/entity-sized, not global.
    *
    * @param symbols (name, predicate); a row gets the FIRST matching name
    * @param pattern Hive path spec: dot-separated symbol names, each with
    *                an optional +, * or ? quantifier, e.g. "LATE.LATE+"
    */
  def matchPathRows(
      spark: SparkSession,
      df: DataFrame,
      partCols: Seq[Column],
      sortCols: Seq[Column],
      pattern: String,
      symbols: Seq[(String, Column)]): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, StructType}

    require(symbols.nonEmpty && symbols.size <= 26, "1..26 symbols supported")
    val names = symbols.map(_._1.toUpperCase)
    val charOf = names.zipWithIndex.map { case (n, i) => n -> ('a' + i).toChar }.toMap
    // translate the dot-separated name pattern into a char regex
    val regexStr = pattern.trim.split("\\.").map { tok0 =>
      val tok = tok0.trim
      val (name, quant) =
        if (tok.endsWith("+") || tok.endsWith("*") || tok.endsWith("?"))
          (tok.dropRight(1).trim, tok.last.toString)
        else (tok, "")
      val c = charOf.getOrElse(name.toUpperCase,
        throw new IllegalArgumentException(
          s"matchpath pattern symbol '$name' has no definition; known: ${names.mkString(", ")}"))
      s"$c$quant"
    }.mkString
    val regex = java.util.regex.Pattern.compile(regexStr)

    val inSchema: StructType = df.schema
    val n = inSchema.size
    val outSchema = inSchema.add("tpath", ArrayType(inSchema))
    val symIdx = symbols.zipWithIndex.foldRight(lit(-1)) {
      case (((_, pred), i), acc) => when(pred, lit(i)).otherwise(acc)
    }
    val keyed = df
      .withColumn("__mp_sym", symIdx)
      // injective group key: concat_ws silently DROPS null components, so
      // ("a", null) and (null, "a") would land in one group (and an
      // embedded separator char in a value could splice tuples); JSON
      // keeps field names, escaping, and null distinctions
      .withColumn("__mp_pk",
        to_json(struct(partCols.zipWithIndex.map {
          case (c, i) => c.cast("string").as(s"p$i")
        }: _*)))
    val grouped = keyed.groupByKey(
      (r: Row) => r.getAs[String]("__mp_pk"))(Encoders.STRING)
    grouped.flatMapSortedGroups(sortCols: _*) { (_, rows) =>
      val buf = rows.toArray
      val syms = new StringBuilder(buf.length)
      buf.foreach { r =>
        val i = r.getInt(n) // __mp_sym sits right after the input columns
        syms.append(if (i < 0) '_' else ('a' + i).toChar)
      }
      // the reference tries the pattern at EVERY row (MatchPath.execute
      // walks each index), so matches may overlap — lookingAt per start,
      // not non-overlapping find()
      val m = regex.matcher(syms)
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      var i = 0
      while (i < buf.length) {
        m.region(i, buf.length)
        if (m.lookingAt()) {
          val path = (m.start() until m.end()).map { j =>
            Row.fromSeq(buf(j).toSeq.take(n))
          }
          out += Row.fromSeq(buf(i).toSeq.take(n) :+ path)
        }
        i += 1
      }
      out.iterator
    }(Encoders.row(outSchema))
  }
}
