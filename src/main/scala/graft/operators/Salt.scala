package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-join salting (reference: exec/SkewJoinHandler.java +
  * GenSparkSkewJoinProcessor — Hive splits oversized keys into follow-up
  * map-join tasks).
  *
  * Spark-first order of preference: (1) AQE skew-join splitting — on by
  * default in Engine.session and free; (2) this utility, for the cases AQE
  * can't fix (e.g. a single hot key inside one shuffle partition of an
  * aggregation-after-join). The left (skewed) side gets a random-but-
  * deterministic salt in [0, saltFactor); the right side is replicated
  * saltFactor times, so (key, salt) joins spread a hot key across
  * saltFactor reducers. Correctness contract: identical result multiset
  * to the unsalted join — verified against the plain-join oracle.
  */
object Salt {

  /** Deterministic pseudo-salt (stable across retries — a nondeterministic
    * rand() would break task re-execution at scale).
    */
  private def salt(c: Column, saltFactor: Int): Column =
    pmod(xxhash64(c), lit(saltFactor))

  /** @param saltCol a HIGH-CARDINALITY left-side column (row id, line
    *                number...) — salting by the join key itself would map a
    *                hot key to one salt bucket and change nothing
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame,
                     leftKey: String, rightKey: String,
                     saltCol: Column, saltFactor: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt", salt(saltCol, saltFactor))
    val explodedRight = right
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    // FORCE a shuffle strategy: Catalyst sizes the exploded side from the
    // pre-explode stats (Generate keeps the child's sizeInBytes), so a
    // "small" right side times saltFactor can get BROADCAST — the driver
    // then builds a saltFactor×-replicated hash table, which at scale is
    // exactly the blow-up salting exists to avoid (measured: the 30×
    // ScaleBoard run of q75 went 2× over linear through a 36M-row
    // broadcast). If the right side genuinely fits in a broadcast, use a
    // plain join instead — a broadcast join has no shuffle and no skew.
    saltedLeft.join(explodedRight.hint("merge"),
      saltedLeft(leftKey) === explodedRight(rightKey) &&
        saltedLeft("__salt") === explodedRight("__salt"))
      .drop("__salt")
  }
}
