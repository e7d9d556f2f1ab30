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
}
