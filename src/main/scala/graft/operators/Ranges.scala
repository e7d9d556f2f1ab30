package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join without an equi-key: points ⋈ intervals where
  * lo <= point <= hi.
  *
  * Scale design — Spark executes a bare inequality join as a broadcast /
  * shuffled nested-loop (O(|P|·|I|) comparisons), which is the classic
  * 100 TB scale-killer. This operator turns it into an EQUI-join by value
  * binning (the same trick Spark's own storage-partitioned range joins and
  * the interval-join literature use):
  *
  *   1. pick a bin width `w`
  *   2. each point maps to ONE bin: floor(p / w)
  *   3. each interval explodes to the bins it overlaps:
  *      floor(lo/w) .. floor(hi/w)  — (hi-lo)/w + 1 rows
  *   4. hash equi-join on the bin id, then re-check lo <= p <= hi
  *
  * Each qualifying (point, interval) pair meets in exactly one bin (the
  * point's), so no dedup pass is needed. Shuffle volume is |P| + Σ
  * interval-spans/w — tune `binWidth` to the typical interval length so the
  * explode factor stays small. The plan is a plain shuffled hash/sort-merge
  * join: AQE handles skewed bins, and both inputs keep column pruning and
  * filter pushdown.
  */
object Ranges {

  /** @param points    DataFrame with a numeric point column
    * @param pointCol  name of the point column
    * @param intervals DataFrame with numeric lo/hi columns (inclusive)
    * @param loCol     interval lower bound column name
    * @param hiCol     interval upper bound column name
    * @param binWidth  bin width in point units; choose ≈ median interval
    *                  length so each interval lands in O(1) bins
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("_bin", floor(col(pointCol) / binWidth))
    val i = intervals
      .withColumn("_bin",
        explode(sequence(floor(col(loCol) / binWidth),
          floor(col(hiCol) / binWidth))))
    p.join(i, Seq("_bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bin")
  }
}
