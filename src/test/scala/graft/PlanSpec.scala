package graft

import org.apache.spark.sql.execution.ExplainMode

/** Scale-property regression tests: the physical plans must keep the
  * shapes that make these operators viable at 100 TB — pushdown reaching
  * the scan, partition pruning, broadcast for dims, top-k without a
  * global sort. A refactor that silently loses one of these still passes
  * correctness; this spec is what catches it.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    Registry.byName(name).fn(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q01: shipdate filter is pushed into the parquet scan") {
    val p = plan("q01_agg")
    assert(p.contains("PushedFilters") && p.contains("LessThanOrEqual(l_shipdate"))
  }

  test("q02: only projected columns are read") {
    val p = plan("q02_filter_project")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_tax"), "scan reads columns the query never uses")
  }

  test("q10: dimension joins broadcast") {
    assert(plan("q10_join_multiway").contains("BroadcastHashJoin"))
  }

  test("q18: top-k compiles to TakeOrderedAndProject, not a global sort") {
    assert(plan("q18_topk").contains("TakeOrderedAndProject"))
  }

  test("q69: partitioned read prunes partitions") {
    val p = plan("q69_partitioned_write")
    assert(p.contains("PartitionFilters") && p.contains("event_type"))
  }

  test("s03: candidate bound is pushed to the embeddings scan") {
    assert(plan("s03_embed_neardup").contains("LessThan(vec_id,200)"))
  }

  test("q75: salt participates in the join keys") {
    assert(plan("q75_salted_join").contains("__salt"))
  }

  test("a17: RCFile scan prunes columns at the storage layer") {
    // the DML gate ends in a 3-column read of a 2+1-partition-column
    // table; the scan description must carry the pruned ReadSchema (the
    // container then skips unprojected column buffers entirely)
    assert(plan("a17_partitioned_dml_rcfile").contains("graft-rcfile ReadSchema:"))
  }

  test("q154: thrift scan converts only the projected fields") {
    val p = plan("q154_thrift_seq")
    // the join reads aint/aString/lintString; the per-side scans must
    // show a pruned field list, not all 10 Complex fields
    assert(p.contains("graft-thrift-seq"), p.take(400))
    assert(!p.contains("unionField1"), "thrift scan failed to prune")
  }
}
