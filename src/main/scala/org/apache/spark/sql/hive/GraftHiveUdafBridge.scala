package org.apache.spark.sql.hive

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-access bridge to Spark's own `HiveUDAFFunction` — the
  * TypedImperativeAggregate that drives a Hive GenericUDAF evaluator's
  * PARTIAL1/FINAL modes with partial results crossing the shuffle
  * (spark-hive module, `private[hive]` at the Scala level, hence this
  * one-liner in the hive package — same pattern as GraftSessionClone).
  * Used by the CREATE FUNCTION ... USING JAR surface (graft.Engine) to
  * execute third-party aggregate classes; everything else about the
  * plan (partial aggregation, AQE, codegen around the agg) stays native.
  */
object GraftHiveUdafBridge {
  def udaf(name: String, className: String, children: Seq[Expression],
      isLegacyBridge: Boolean): Expression =
    HiveUDAFFunction(name, HiveShim.HiveFunctionWrapper(className),
      children, isUDAFBridgeRequired = isLegacyBridge)
      .toAggregateExpression()
}
