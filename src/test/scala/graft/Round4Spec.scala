package graft

import graft.functions.Bitmap
import graft.operators.{Dedup, GlobalRank, Similarity}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavior pins for the round-4 operators: connected-component clustering
  * (transitive closure, pointer-doubling convergence), cluster-vs-pair
  * resolution difference, the bitmap family's set semantics, the
  * single-partition-free global rank, and quantized-ANN recall.
  */
class Round4Spec extends SparkSpec {
  import spark.implicits._

  // ---- Dedup.clusters ----

  test("clusters labels a long chain with its min id (pointer doubling)") {
    // path graph 0-1-2-...-40: naive propagation needs 40 rounds; the
    // shortcutting loop must finish well inside maxIters=25
    val pairs = (0 until 40).map(i => (i.toLong, i.toLong + 1)).toDF("da", "db")
    val lbl = Dedup.clusters(pairs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl.size == 41)
    assert(lbl.values.forall(_ == 0L))
  }

  test("clusters merges transitive pairs into one component") {
    // (2,3) and (1,3) but never (1,2): 1-2-3 is ONE component labeled 1
    val pairs = Seq((2L, 3L), (1L, 3L), (10L, 11L)).toDF("da", "db")
    val lbl = Dedup.clusters(pairs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lbl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("resolveByCluster collapses chains the pair-based keep-list cannot") {
    // doc 3 is near-dup of BOTH 1 and 2, but 1 vs 2 falls below 0.85:
    // pair set is (1,3),(2,3). Pair-based resolve drops only db=3 and
    // keeps {1,2}; cluster-based resolution keeps exactly min{1,2,3}=1.
    val base = (1 to 20).map(i => s"t$i")
    val doc1 = ("x1" +: base.tail).mkString(" ")                // 19/21 vs doc3
    val doc2 = (base.init :+ "x2").mkString(" ")                // 19/21 vs doc3
    val doc3 = base.mkString(" ")
    val docs = Seq((1L, doc1), (2L, doc2), (3L, doc3)).toDF("doc_id", "text")
    val pairKept = Dedup.resolve(docs).as[Long].collect().sorted
    val ccKept = Dedup.resolveByCluster(docs).as[Long].collect().sorted
    assert(pairKept.toSeq == Seq(1L, 2L))
    assert(ccKept.toSeq == Seq(1L))
  }

  // ---- Bitmap family ----

  test("bitmap aggregate + and/or/count/empty match set semantics") {
    val df = Seq(("a", 1L), ("a", 65L), ("a", 1L), ("a", 200L),
                 ("b", 65L), ("b", 3L)).toDF("g", "v")
    val bm = df.groupBy("g").agg(Bitmap.bitmapAgg(col("v")).as("bm"))
    val row = bm.as("x").join(bm.as("y"),
        col("x.g") === lit("a") && col("y.g") === lit("b"))
      .select(
        Bitmap.bitmapCount(col("x.bm")).as("ca"),
        Bitmap.bitmapCount(col("y.bm")).as("cb"),
        Bitmap.bitmapCount(Bitmap.bitmapAnd(col("x.bm"), col("y.bm"))).as("cand"),
        Bitmap.bitmapCount(Bitmap.bitmapOr(col("x.bm"), col("y.bm"))).as("cor"),
        Bitmap.bitmapEmpty(Bitmap.bitmapAnd(col("x.bm"), col("y.bm"))).as("e"))
      .collect().head
    assert(row.getLong(0) == 3)  // {1, 65, 200}
    assert(row.getLong(1) == 2)  // {3, 65}
    assert(row.getLong(2) == 1)  // {65}
    assert(row.getLong(3) == 4)  // {1, 3, 65, 200}
    assert(!row.getBoolean(4))
  }

  test("bitmap words are canonical: equal sets encode equal regardless of path") {
    // same set built from different insertion orders/groups must produce
    // identical word arrays (trailing zero words trimmed)
    val a = Seq(1L, 200L, 65L).toDF("v").agg(Bitmap.bitmapAgg(col("v"))).collect().head.getSeq[Long](0)
    val b = Seq(65L, 1L, 200L).toDF("v").agg(Bitmap.bitmapAgg(col("v"))).collect().head.getSeq[Long](0)
    assert(a == b)
    assert(a.last != 0L)
    // disjoint-word AND trims to the canonical EMPTY encoding (no all-zero
    // tail), so it is empty AND hash-equal to an aggregated empty bitmap
    val z = Seq(1L).toDF("v").agg(Bitmap.bitmapAgg(col("v")).as("x"))
      .crossJoin(Seq(300L).toDF("v").agg(Bitmap.bitmapAgg(col("v")).as("y")))
      .select(Bitmap.bitmapEmpty(Bitmap.bitmapAnd(col("x"), col("y"))).as("e"),
        Bitmap.bitmapAnd(col("x"), col("y")).as("w"))
      .collect().head
    assert(z.getBoolean(0))
    assert(z.getSeq[Long](1).isEmpty)
    // AND/OR of equal sets reproduce the aggregated encoding word-for-word
    val sets = Seq(1L, 65L, 200L)
    val agg = sets.toDF("v").agg(Bitmap.bitmapAgg(col("v"))).collect().head.getSeq[Long](0)
    val both = sets.toDF("v").agg(Bitmap.bitmapAgg(col("v")).as("x"))
      .crossJoin(sets.toDF("v").agg(Bitmap.bitmapAgg(col("v")).as("y")))
      .select(Bitmap.bitmapAnd(col("x"), col("y")).as("a"),
        Bitmap.bitmapOr(col("x"), col("y")).as("o"))
      .collect().head
    assert(both.getSeq[Long](0) == agg)
    assert(both.getSeq[Long](1) == agg)
  }

  test("bitmap aggregate rejects out-of-range inputs") {
    val ex = intercept[Exception] {
      Seq(-1L).toDF("v").agg(Bitmap.bitmapAgg(col("v"))).collect()
    }
    assert(ex.getMessage != null)
  }

  // ---- GlobalRank ----

  test("global rank matches window semantics with no single-partition stage") {
    val c = Tables.t(spark, sf, "customer").select("c_custkey", "c_acctbal")
    val got = GlobalRank.rank(c, Seq(col("c_acctbal").desc), Seq(col("c_acctbal")),
      Seq(col("c_custkey").asc))
    val want = c
      .withColumn("rn", row_number().over(
        Window.orderBy(col("c_acctbal").desc, col("c_custkey").asc)).cast("long"))
      .withColumn("rk", rank().over(
        Window.orderBy(col("c_acctbal").desc)).cast("long"))
    assert(got.select("c_custkey", "rn", "rk").except(
      want.select("c_custkey", "rn", "rk")).isEmpty)
    // the whole point: the naive global window funnels everything through
    // an Exchange SinglePartition; GlobalRank's plan never does (AQE may
    // still coalesce the tiny fixture output — that's partition COUNT
    // tuning, not a single-partition funnel in the plan)
    val gotPlan = got.queryExecution.explainString(ExplainMode.fromString("formatted"))
    val naivePlan = want.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!gotPlan.contains("SinglePartition"), gotPlan)
    assert(naivePlan.contains("SinglePartition"))
  }

  // ---- GlobalRank.distribution ----

  test("global ntile/percent_rank/cume_dist match window semantics") {
    // buckets=7 over n=150 → n mod b = 3 larger groups; exercises the
    // exact SQL ntile distribution, not a proportional split
    val c = Tables.t(spark, sf, "customer").select("c_custkey", "c_acctbal")
    val got = GlobalRank.distribution(c, Seq(col("c_acctbal").desc),
      Seq(col("c_acctbal")), Seq(col("c_custkey").asc), buckets = 7)
      .select(col("c_custkey"), col("nt"), col("pr"), col("cd"))
    val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    val wk = Window.orderBy(col("c_acctbal").desc)
    val want = c.select(col("c_custkey"),
      ntile(7).over(w).cast("long").as("nt"),
      percent_rank().over(wk).as("pr"),
      cume_dist().over(wk).as("cd"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  // ---- ExportImport ----

  test("export/import round-trips schema and bytes through _metadata") {
    val base = tools.Tmp.dir("exp_spec")
    val src = Tables.t(spark, sf, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    graft.operators.ExportImport.exportTable(src, base + "/exp")
    assert(new java.io.File(base + "/exp/_metadata").exists())
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    spark.sql("DROP TABLE IF EXISTS graft_tmp.exp_spec_t")
    val back = graft.operators.ExportImport.importTable(
      spark, base + "/exp", "graft_tmp.exp_spec_t", base + "/tbl")
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      src.schema.map(f => (f.name, f.dataType)))
    assert(back.except(src).isEmpty && src.except(back).isEmpty)
    // import is a byte copy: same file sizes as the export snapshot
    val expSizes = new java.io.File(base + "/exp/data").listFiles()
      .filter(_.getName.startsWith("part-")).map(_.length).sorted.toSeq
    val tblSizes = new java.io.File(base + "/tbl").listFiles()
      .filter(_.getName.startsWith("part-")).map(_.length).sorted.toSeq
    assert(expSizes == tblSizes && expSizes.nonEmpty)
  }

  // ---- bitmap aggregator as streaming state ----

  test("bitmap aggregate runs as streaming state and matches batch") {
    // the typed Aggregator must merge partial BitSets across micro-batches
    // exactly like across partitions: per-type bitmap cardinality from the
    // stream equals the batch distinct count
    val dir = java.nio.file.Files.createTempDirectory("graft_bm_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("part-00000.parquet"))
    val stream = graft.streaming.EventStreams.readEvents(spark, dir.toString)
      .groupBy("event_type")
      .agg(Bitmap.bitmapAgg(col("user_id") % 1024).as("bm"))
      .select(col("event_type"), Bitmap.bitmapCount(col("bm")).as("n"))
    val q = stream.writeStream.format("memory").queryName("bm_out")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("bm_out")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.t(spark, sf, "events")
      .groupBy("event_type")
      .agg(countDistinct(expr("user_id % 1024")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  // ---- quantized ANN ----

  test("quantized ANN achieves high recall vs exact brute force") {
    val e = Similarity.prep(Tables.t(spark, sf, "embeddings"))
    val qs = e.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(e, qs, k = 10)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.quantizedTopK(e, qs, k = 10)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall@10 = $recall")
  }
}
