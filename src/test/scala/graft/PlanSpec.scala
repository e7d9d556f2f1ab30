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

  test("q161: char-partition equality prunes with a CONVERTIBLE filter") {
    // CharStripReads wraps char reads in rtrim(); for a PARTITION key
    // CharPartitionPruning must rewrite the pruning predicate back to the
    // bare attribute (metastore listPartitionsByFilter can't take an
    // rtrim at 100k partitions). Pin: PartitionFilters non-empty AND free
    // of rtrim — and the scan location actually pruned to one partition.
    val df = Registry.byName("q161_char_part_prune").fn(spark, sf)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in q161 plan"))
    assert(scan.partitionFilters.exists(_.references.nonEmpty),
      "char partition equality lost its PartitionFilters: " + scan)
    assert(!scan.partitionFilters.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.StringTrimRight])),
      "partition filter still carries rtrim (non-convertible): " +
        scan.partitionFilters.mkString("; "))
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected exactly the ASIA partition, got ${scan.selectedPartitions.partitionCount}")
  }

  test("t18: domain cap windows by source, never a single partition") {
    val p = plan("t18_domain_cap")
    assert(p.contains("Window"), p.take(800))
    assert(!p.contains("SinglePartition"),
      "domain cap must partition its window by source:\n" + p.take(1500))
  }

  test("t20: the stop-set anti-join broadcasts; no global window") {
    val p = plan("t20_boilerplate_strip")
    assert(p.contains("BroadcastHashJoin LeftAnti"),
      "stop-set must broadcast onto the token stream:\n" + p.take(1500))
    // the only SinglePartition allowed is the one-row corpus count that
    // feeds the DF threshold — never a Window or a corpus-wide sort
    assert(!p.contains("Window") && !p.contains("SortExec"), p.take(1500))
  }

  test("t21: classifier scoring is one codegen'd partial/final aggregate") {
    // r17: the per-row aggregate() fold (zero-shuffle but interpreted —
    // HOFs are CodegenFallback, an md5 per token ran interpreted) became
    // explode + hash aggregate: everything whole-stage-codegen'd, with
    // exactly ONE exchange that carries (doc_id, partial sum, count) —
    // 24 bytes per doc regardless of document length. Pin that contract:
    // one exchange, partial aggregation below it, no second shuffle.
    val p = plan("t21_quality_classifier")
    assert(p.split("\\(\\d+\\) Exchange").length == 2,
      "per-doc scoring must shuffle exactly once (partial-agg rows):\n" +
        p.take(1500))
    assert(p.contains("partial_sum"),
      "the sum must partial-aggregate map-side before the exchange:\n" +
        p.take(1500))
  }

  test("t19: mixture rates broadcast back onto the corpus") {
    val p = plan("t19_mixture_sample")
    assert(p.contains("BroadcastHashJoin"),
      "per-source rates must broadcast, not shuffle the corpus:\n" +
        p.take(1500))
    assert(!p.contains("SortMergeJoin"), p.take(1500))
  }

  test("s03: candidate bound is pushed to the embeddings scan") {
    assert(plan("s03_embed_neardup").contains("LessThan(vec_id,200)"))
  }

  test("q75: salt participates in the join keys") {
    assert(plan("q75_salted_join").contains("__salt"))
  }

  test("q75: the salted join never broadcasts the replicated side") {
    // Catalyst sizes the exploded right side from PRE-explode stats, so
    // without the merge hint it broadcasts a saltFactor×-replicated hash
    // table — the 30× ScaleBoard measured that path 2× over linear
    // (96 s vs 16 s; SCALE.md round 14). Salting targets shuffle skew;
    // a broadcast of the replicated side defeats both.
    val p = plan("q75_salted_join")
    assert(!p.contains("BroadcastHashJoin"), p.take(1500))
    assert(p.contains("SortMergeJoin"), p.take(1500))
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

  test("partitioned fact x filtered dim join gains a DPP subquery filter") {
    // At fixture scale the PERF.md observation was that Spark's benefit
    // estimator declines DPP; this fixture is sized so the estimator
    // injects it (broadcast-reuse path): a 400k-row fact partitioned 40
    // ways joined to a selectively-filtered 40-row dim on the partition
    // column. The physical scan must carry a dynamicpruning expression in
    // its PartitionFilters — the runtime analogue of q69's static pruning.
    import org.apache.spark.sql.functions._
    val dir = tools.Tmp.dir("plan_dpp")
    spark.range(400000).select(
        (col("id") % 1000).as("v"), (col("id") % 40).cast("int").as("pk"))
      .write.mode("overwrite").partitionBy("pk").parquet(dir + "/fact")
    spark.range(40).select(col("id").cast("int").as("pk"),
        (col("id") % 4).as("attr"))
      .write.mode("overwrite").parquet(dir + "/dim")
    val fact = spark.read.parquet(dir + "/fact")
    val dim = spark.read.parquet(dir + "/dim").filter(col("attr") === 1)
    val q = fact.join(broadcast(dim), "pk").agg(sum("v"))
    val p = q.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      "no DPP filter in the fact scan:\n" + p.take(1500))
    // and it actually prunes: only 10 of 40 partitions survive the dim
    // filter, so the result equals the filtered-join value
    val expect = spark.read.parquet(dir + "/fact")
      .filter(col("pk") % 4 === 1).agg(sum("v")).collect()(0).getLong(0)
    assert(q.collect()(0).getLong(0) == expect)
  }

  test("selective dim join injects a runtime bloom filter into the fact side") {
    // The non-partitioned sibling of DPP: when the join key is NOT the
    // partition column, Spark's runtime-filter rule can still push a
    // bloom filter of the (filtered) dim keys into the fact scan —
    // at 100 TB this is the difference between shuffling the whole fact
    // table and shuffling the ~matching slice. Thresholds are lowered to
    // fixture scale (the estimator's defaults ask for a 10 GB
    // application side); the assertion is the mechanism, the sizing
    // rides the same confs in production.
    import org.apache.spark.sql.functions._
    val dir = tools.Tmp.dir("plan_bloom")
    spark.range(400000).select(
        (col("id") % 1000).as("v"), (col("id") % 5000).as("fk"))
      .write.mode("overwrite").parquet(dir + "/fact")
    spark.range(5000).select(col("id").as("fk"), (col("id") % 50).as("attr"))
      .write.mode("overwrite").parquet(dir + "/dim")
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force the shuffle-join path so the runtime filter pays off
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val before = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.read.parquet(dir + "/fact")
      val dim = spark.read.parquet(dir + "/dim").filter(col("attr") === 7)
      val q = fact.join(dim, "fk").agg(sum("v"))
      val p = q.queryExecution.executedPlan.toString.toLowerCase
      assert(p.contains("bloomfilter"),
        "no runtime bloom filter on the fact scan:\n" + p.take(1500))
      val expect = spark.read.parquet(dir + "/fact")
        .filter(col("fk") % 50 === 7).agg(sum("v")).collect()(0).getLong(0)
      assert(q.collect()(0).getLong(0) == expect)
    } finally before.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("third-party jar UDAF aggregates partially (map-side combine)") {
    // the HiveUDAFFunction bridge must behave like any native partial
    // aggregate at scale: PARTIAL1 buffers cross the shuffle, not rows —
    // the plan carries partial_<fn> BELOW the exchange and the final
    // merge above it
    Tables.views(spark, sf, "nation")
    Engine.ddl(spark, "CREATE TEMPORARY FUNCTION plan_ss AS " +
      "'graftjar.SumSquares' USING JAR 'src/test/resources/jars/graft-hiveudf.jar'")
    val q = spark.sql(
      "SELECT n_regionkey, plan_ss(n_nationkey) AS ss FROM nation GROUP BY n_regionkey")
    val p = q.queryExecution.executedPlan.toString
    val partialIdx = p.indexOf("partial_plan_ss")
    val exchangeIdx = p.indexOf("Exchange")
    assert(partialIdx >= 0, "no partial aggregation for the jar UDAF:\n" + p.take(1500))
    assert(exchangeIdx >= 0 && exchangeIdx < partialIdx,
      "partial_ must sit BELOW the exchange (plan prints top-down):\n" + p.take(1500))
  }
}
