package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join: for every left row, attach the payload of
  * the latest right row whose time is <= the left row's time, per key.
  *
  * The reference engine has no as-of operator (its closest idiom is a
  * windowed self-join); this is one of the time-series primitives a
  * training-data pipeline needs (e.g. "state of the user profile at event
  * time"), so it is provided as a first-class operator.
  *
  * Scale design — the naive formulation is a non-equi join
  * (`l.k = r.k AND r.t <= l.t` + max-per-group), which Spark can only run
  * as a shuffled/broadcast nested-loop. Instead both sides are UNIONED and
  * resolved with one window pass:
  *
  *   1. tag rows: right = (k, t, payload, side=0), left = (k, t, null, side=1)
  *   2. one shuffle: partition by k, sort by (t, side)
  *   3. `last(payload, ignoreNulls)` over rows UNBOUNDED PRECEDING..CURRENT
  *      carries the latest right payload forward onto each left row
  *   4. keep side=1 rows
  *
  * Cost is ONE hash shuffle of |L|+|R| rows and a sort within partitions —
  * the same complexity as a regular equi-join, no row-pair explosion, and
  * it survives 100× scale-up as long as single keys fit a partition (skewed
  * hot keys can be pre-split by time range if needed). Ties (r.t == l.t)
  * sort the right row first, so an exactly-simultaneous right row IS
  * visible to the left row, matching DuckDB/pandas ASOF `>=` semantics.
  */
object AsOf {

  /** @param left     probe side; all its columns survive
    * @param right    reference side
    * @param key      equi-key column name (present on both sides)
    * @param leftTime ordering column on `left`
    * @param rightTime ordering column on `right`; must be unique per
    *                  (key, time) for deterministic output — pre-aggregate
    *                  the right side if it is not
    * @param payload  right-side columns to carry onto each left row (null
    *                  when no right row precedes it)
    */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = org.apache.spark.sql.types.StructType(
      right.select(payload.map(col): _*).schema.fields)
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_p", lit(null).cast(payloadType))
    // NULL-time right rows can never satisfy l.t >= r.t (SQL comparison
    // semantics; DuckDB ASOF agrees) — drop them, or the ascending sort
    // would place them first and carry their payload onto every left row
    val r = right
      .filter(col(rightTime).isNotNull)
      .select((Seq(col(key), col(rightTime).as("_t")) :+
        struct(payload.map(col): _*).as("_p")): _*)
      .withColumn("_side", lit(0))
    // align columns: right side gets nulls for the left-only columns
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }.select((leftCols.map(col) ++ Seq(col("_t"), col("_side"), col("_p"))): _*)
    val unioned = l.select((leftCols.map(col) ++
      Seq(col("_t"), col("_side"), col("_p"))): _*).unionByName(rAligned)

    val w = Window.partitionBy(key).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val resolved = unioned
      .withColumn("_match", last("_p", ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    payload.foldLeft(resolved)((df, p) => df.withColumn(p, col("_match")(p)))
      .select((leftCols ++ payload).map(col): _*)
  }
}
