package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale soak for the dedup/ANN chain: run each banded operator at 1× and
  * 10× the sf0.1 corpus and report wall-time + shuffle-byte ratios. The
  * claim under test is the O(docs × bands) design — candidate generation
  * through band equi-joins, never all-pairs — which predicts ~linear
  * shuffle growth in corpus size (modulo candidate-density change: the
  * synthetic vocabulary is tiny, so duplicates grow superlinearly in the
  * replicated corpus; the all-pairs alternative would be 100×).
  *
  * Usage: sbt "runMain graft.tools.Soak [sfDir]" — prints one table row
  * per (operator, scale) with wall seconds and shuffle read/write bytes.
  * Results are recorded in PERF.md §Round 7.
  */
object Soak {

  /** N× corpus: shard s re-keys doc_id into its own id space and prefixes
    * every TOKEN with the shard id (shard 0 keeps the originals). Token
    * prefixing makes shards mutually invisible to shingle LSH (cross-shard
    * jaccard = 0), so the N× corpus is N independent copies of the 1×
    * problem — exactly the controlled experiment for the O(docs × bands)
    * claim. Naive replication instead creates cross-shard near-duplicates
    * of every doc, inflating candidate pairs QUADRATICALLY in N: that
    * measures the (already documented) candidate-density hazard, not the
    * banding design.
    */
  def scaleDocs(docs: DataFrame, copies: Int): DataFrame =
    docs.crossJoin(
        docs.sparkSession.range(copies.toLong).select(col("id").as("shard")))
      .select(
        (col("doc_id") + col("shard") * 1000000L).as("doc_id"),
        when(col("shard") === 0, col("text")).otherwise(concat_ws(" ",
          expr("transform(split(text, ' '), w -> concat('s', CAST(shard AS STRING), '_', w))")))
          .as("text"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Engine.session(s"local[$cpus]", "graft-soak", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_CHECKPOINT_DIR switches the iterative operators'
    // Checkpoints.cut from executor-memory localCheckpoint to DURABLE
    // checkpoint files — the production mode for 1000-executor runs,
    // soaked here under real iteration volume (d09's label propagation)
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR").foreach { d =>
      spark.conf.set("spark.graft.checkpointDir", d)
      println(s"durable checkpoints -> $d")
    }
    // SPARK_GRAFT_NO_BROADCAST pins every join to shuffle strategies so the
    // 1× and 10× measurements compare the same plan shape — AQE flips a
    // sub-threshold side to broadcast at 1× (no shuffle bytes for that
    // side), which inflates the REPORTED shuffle ratio of small fixtures
    // without any superlinear design cost (the d11 adjudication knob)
    if (sys.env.contains("SPARK_GRAFT_NO_BROADCAST")) {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      println("broadcast joins disabled (plan-shape-controlled measurement)")
    }

    val shuffleRead = new java.util.concurrent.atomic.AtomicLong
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    val shuffleRecs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          // records are the scale-relevant axis: bytes mix in lz4's
          // entropy-dependent ratio (small-fixture ids compress better)
          // and the broadcast-vs-shuffle plan flip at sub-threshold sizes
          shuffleRecs.addAndGet(m.shuffleReadMetrics.recordsRead)
        }
      }
    })

    val base = graft.Tables.t(spark, sfDir, "documents")
    // persist inputs to parquet so scan cost is comparable at both scales
    val tmp = Tmp.dir("graft_soak")
    base.write.mode("overwrite").parquet(s"$tmp/docs1x")
    scaleDocs(base, 10).write.mode("overwrite").parquet(s"$tmp/docs10x")
    val embBase = graft.operators.Similarity.prep(
      graft.Tables.t(spark, sfDir, "embeddings"))

    def docs(scale: Int): DataFrame =
      spark.read.parquet(s"$tmp/docs${scale}x")

    case class Op(name: String, run: Int => Long)
    val ops = Seq(
      Op("d02_minhash_pairs", s =>
        graft.operators.Dedup.minhashPairs(docs(s)).count()),
      Op("d06_resolve", s =>
        graft.operators.Dedup.resolve(docs(s)).count()),
      Op("d11_increment", s => {
        val d = docs(s)
        graft.operators.Dedup.dedupIncrement(
          corpus = d.filter(col("doc_id") % 2 === 0),
          batch = d.filter(col("doc_id") % 2 === 1)).count()
      }),
      // the ITERATIVE chain (confirmedPairs -> clusters label propagation):
      // every round runs through Checkpoints.cut, so this op is the real
      // soak for the durable-checkpoint mode
      Op("d09_cluster_resolve", s =>
        graft.operators.Dedup.resolveByCluster(docs(s)).count()),
      // span dedup (t23): token-prefixed shards share no 8-gram, so the
      // N× corpus is N independent copies — gram-aggregate + per-doc
      // merge shuffles should grow ~linearly, never pairwise. The probe
      // aggregates n_removed, NOT count(): a bare count lets Catalyst
      // eliminate the unique-key left join and the whole gram pipeline
      // with it (measured 0 shuffle — the optimizer at work)
      Op("t23_span_dedup", s =>
        graft.operators.Dedup.removeDuplicateSpans(docs(s), 8)
          .agg(sum(col("n_removed"))).collect()(0).getLong(0)),
      Op("s04_neardup_ivf", s => {
        // Embedding shards get a cyclic DIMENSION rotation (shard 0 =
        // identity): within-shard cosine structure is exactly the 1×
        // problem (both vectors share the permutation), cross-shard
        // cosines decorrelate so shards land in different clusters. The
        // centroid set grows with the corpus (k ∝ N, the IVF scale rule)
        // keeping per-cluster occupancy — hence candidate density — flat.
        // (Plain replication is degenerate: identical copies + identical
        // centroids pile every copy into one cluster, candidates ∝ N².)
        val e = if (s == 1) embBase else
          embBase.crossJoin(embBase.sparkSession.range(s.toLong)
              .select(col("id").as("shard")))
            .select((col("vec_id") + col("shard") * 1000000L).as("vec_id"),
              expr("""concat(slice(emb, CAST(shard AS INT) + 1,
                             size(emb) - CAST(shard AS INT)),
                             slice(emb, 1, CAST(shard AS INT)))""").as("emb"))
        graft.operators.Similarity.neardupIVF(
          e, e.filter(col("vec_id") % 1000000L < 8), minSim = 0.4, nProbe = 2).count()
      }),
      // NEGATIVE CONTROL for s04's output-rows ratio: the brute-force
      // TRUE count of cosine>=0.4 pairs in the exact rotated fixture.
      // s04's sim filter is exact, so every emitted pair is a true pair —
      // observed rows <= this, and the observed 10x/1x rows ratio is the
      // FIXTURE's pair growth iff it tracks this op's ratio. The 10x
      // count decomposes analytically: rotations are commuting powers of
      // one cyclic shift, so cos(rot_s(x), rot_t(y)) = cos(x, rot_{t-s}(y))
      // — within-shard pairs are exactly 10x the 1x truth, and cross-shard
      // pairs reduce to 9 delta-classes with multiplicity (10-d), i.e.
      // O(9 N^2) dot products instead of O((10N)^2 / 2).
      Op("s04_control_bf", s => {
        val e = embBase
        def bf1: Long = e.select(col("vec_id").as("ai"), col("emb").as("a_emb"))
          .join(e.select(col("vec_id").as("bi"), col("emb").as("b_emb")),
            col("ai") < col("bi"))
          .filter(expr("cosine_sim(a_emb, b_emb)") >= 0.4).count()
        if (s == 1) bf1
        else {
          val rot = e.crossJoin(spark.range(1, 10).select(col("id").as("d")))
            .select(col("d"),
              expr("""concat(slice(emb, CAST(d AS INT) + 1,
                             size(emb) - CAST(d AS INT)),
                             slice(emb, 1, CAST(d AS INT)))""").as("b_emb"))
          val cd = e.select(col("emb").as("a_emb")).crossJoin(rot)
            .filter(expr("cosine_sim(a_emb, b_emb)") >= 0.4)
            .groupBy("d").count().collect()
            .map(r => (r.getLong(0), r.getLong(1))).toMap
          10 * bf1 + (1L to 9L).map(d => (10 - d) * cd.getOrElse(d, 0L)).sum
        }
      }))

    val opFilter = args.drop(1).headOption
    val selected = ops.filter(o => opFilter.forall(o.name.contains))
    println(f"${"operator"}%-20s ${"scale"}%5s ${"rows"}%10s ${"wall_s"}%8s ${"shuf_rd_mb"}%11s ${"shuf_wr_mb"}%11s ${"shuf_recs_m"}%12s")
    val rows = for (op <- selected; scale <- Seq(1, 10)) yield {
      Checkpoints.sweep()
      shuffleRead.set(0); shuffleWrite.set(0); shuffleRecs.set(0)
      val t0 = System.nanoTime()
      val n = op.run(scale)
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a moment to drain
      Thread.sleep(2000)
      val (rd, wr, rc) = (shuffleRead.get / 1e6, shuffleWrite.get / 1e6,
        shuffleRecs.get / 1e6)
      println(f"${op.name}%-20s $scale%5d $n%10d $wall%8.2f $rd%11.1f $wr%11.1f $rc%12.2f")
      (op.name, scale, n, wall, rd, wr, rc)
    }
    println("\nratios (10x / 1x):")
    rows.grouped(2).foreach { case Seq(a, b) =>
      println(f"${a._1}%-20s wall ${b._4 / a._4}%6.2fx  shuffle_rd ${b._5 / math.max(a._5, 0.1)}%6.2fx  shuffle_recs ${b._7 / math.max(a._7, 0.001)}%6.2fx  rows ${b._3.toDouble / math.max(a._3, 1)}%6.2fx")
    }
    spark.stop()
  }
}
