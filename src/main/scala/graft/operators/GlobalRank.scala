package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global row_number/rank over a total order WITHOUT the single-partition
  * WindowExec that `row_number() OVER (ORDER BY ...)` plans to — the one
  * Spark shape that cannot survive 100 TB (every row funnels through one
  * task; Spark itself warns "Moving all data to a single partition").
  *
  * This is the reference's parallel total-order discipline
  * (exec/HiveTotalOrderPartitioner.java + PartitionKeySampler) re-expressed
  * on DataFrames: range-repartition on the sort key (sampled boundaries —
  * the same machinery `orderBy` uses), sort within partitions, then convert
  * per-partition local row numbers to global ones by adding per-partition
  * row-count offsets. The offsets are one count per partition — metadata
  * scale — collected to the driver and re-broadcast, the same bounded
  * collect discipline as Acid's file lists and kmeans' centroid matrix.
  * Every heavy stage stays fully parallel.
  */
object GlobalRank {

  /** Global 1-based row_number by `order` plus the total row count — both
    * from ONE pass over the input. The checkpoint that materializes the
    * range layout is tracked through [[graft.tools.Checkpoints]]; the
    * harness sweeps it after the consuming action (the caller-must-release
    * contract Bench/Verify honor between queries).
    */
  private def numbered(df: DataFrame, order: Seq[Column], out: String,
                       numPartitions: Int): (DataFrame, Long) = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    // Materialize the range-partitioned layout ONCE: repartitionByRange
    // samples its boundaries per execution, so the offsets job and the
    // window job would otherwise see (slightly) different partitionings
    // on a multi-split scan and the offsets would be wrong. One
    // materialization is the same cost class as the sort itself; a real
    // cluster would persist/checkpoint the sorted layout it is about to
    // number anyway.
    val parted = graft.tools.Checkpoints.cut(
      df.repartitionByRange(n, order: _*)
        .withColumn("__pid", spark_partition_id()))
    // one row per partition; cumulative offsets computed driver-side. The
    // per-partition counts also carry the total — callers needing n (the
    // distribution functions) must NOT pay a second full scan for it.
    val counts = parted.groupBy("__pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) => val o = acc; acc += c; (pid, o) }
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__offset"))
    val w = Window.partitionBy("__pid").orderBy(order: _*)
    val numbered = parted.join(offDf, "__pid")
      .withColumn(out, row_number().over(w).cast("long") + col("__offset"))
      .drop("__pid", "__offset")
    (numbered, acc)
  }

  /** Global 1-based row_number by `order` (must be a total order — include
    * a unique tiebreaker column). Output column `out` is LONG.
    */
  def rowNumber(df: DataFrame, order: Seq[Column], out: String = "rn",
                numPartitions: Int = 0): DataFrame =
    numbered(df, order, out, numPartitions)._1

  private def ranked(df: DataFrame, keyOrder: Seq[Column], keys: Seq[Column],
                     tieBreak: Seq[Column], out: String,
                     rnOut: String): (DataFrame, Long) = {
    val (rn, n) = numbered(df, keyOrder ++ tieBreak, rnOut, 0)
    (rn.withColumn(out, min(col(rnOut)).over(Window.partitionBy(keys: _*))), n)
  }

  /** Global SQL `rank()` (ties share a rank): the global row_number over
    * `keyOrder ++ tieBreak`, then the minimum row number within each tie
    * group (`keys` = the bare ordering columns) — one additional
    * PARTITIONED window, never a single-partition one. Emits both the
    * row_number (`rnOut`) and the rank (`out`).
    */
  def rank(df: DataFrame, keyOrder: Seq[Column], keys: Seq[Column],
           tieBreak: Seq[Column], out: String = "rk",
           rnOut: String = "rn"): DataFrame =
    ranked(df, keyOrder, keys, tieBreak, out, rnOut)._1

  /** Global distribution functions — ntile(buckets), percent_rank,
    * cume_dist — from the same machinery: the global row number, the tie
    * rank, and the single total row count (one driver-side long). All
    * derived with exact integer arithmetic (+ one terminal division), so
    * results are engine-reproducible; no single-partition stage anywhere.
    * ntile uses the exact SQL distribution — with n = q·b + r, the first
    * r groups take q+1 rows, the rest q (NOT the proportional
    * floor((rn-1)b/n) split, which places the bigger groups differently);
    * cume_dist is max row number within the tie group over n.
    */
  def distribution(df: DataFrame, keyOrder: Seq[Column], keys: Seq[Column],
                   tieBreak: Seq[Column], buckets: Int): DataFrame = {
    // n comes from the per-partition counts `numbered` already collected —
    // a second df.count() would be a full extra pass over the input
    val (rk, n) = ranked(df, keyOrder, keys, tieBreak, "rk", "rn")
    val q = n / buckets
    val r = n % buckets
    val ntileExpr =
      if (q == 0) "rn"
      else s"""CASE WHEN rn <= ${r * (q + 1)}L THEN (rn - 1L) div ${q + 1}L + 1L
               ELSE ${r}L + (rn - ${r * (q + 1)}L - 1L) div ${q}L + 1L END"""
    rk
      .withColumn("nt", expr(ntileExpr))
      // single-row input: SQL percent_rank() is 0.0, not 0/0 = NaN
      .withColumn("pr",
        if (n <= 1) lit(0.0)
        else (col("rk") - 1).cast("double") / lit(n - 1).cast("double"))
      .withColumn("cd",
        max(col("rn")).over(Window.partitionBy(keys: _*)).cast("double") /
          lit(n).cast("double"))
  }
}
