package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registry query on SPARK_GRAFT_SF_DIR,
  * prints ONE JSON line (driver contract). A warmup pass (flagship query)
  * absorbs JVM/codegen startup so per-query numbers reflect steady state.
  */
object Bench {
  private[graft] def fmt(v: Double): String =
    BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
  private[graft] def dict(rs: Seq[(String, Double)]): String =
    rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")

  /** Stdout headline queries. The driver keeps only a ~2 KB tail of the sbt
    * output when it parses the JSON line; the r15 board's line outgrew that
    * window (35 headline queries + two 17-entry sweep lists + per-query cpu)
    * and came back `parsed: null` — the full detail already lives in
    * BENCH_RESULT.json, so the stdout line carries ONLY totals, the suspect
    * machinery's verdicts (lists stay bounded: a clean board has zero
    * suspects), aggregate counts for retried/swept/cleared, and these 15
    * representative queries. stdoutLine() is pure so a spec can assert the
    * worst-case line length stays under the driver's capture window.
    */
  private[graft] val headline = Vector(
    "q01_agg", "q03_join_inner", "q18_topk", "q19_window_rank",
    "q58_bucketed_join", "q65_matchpath", "q71_orderby_global",
    "q75_salted_join", "a03_merge_cow", "d02_dedup_minhash",
    "d08_dedup_cluster", "d11_dedup_incremental", "s01_cosine_topk",
    "s05_ann_kmeans", "t01_langid")
  private[graft] val headlineSet = headline.toSet

  /** The ONE stdout JSON line the driver parses. Suspect lists/signals are
    * per-residual-suspect only (empty on a clean board); swept/cleared/
    * retried ride as counts — their name lists live in BENCH_RESULT.json.
    * Hard size bounds even on a catastrophic board: at most 12 suspect
    * names (true count in suspect_count) and wall-steal/cpu signal pairs
    * for the first 5 — full per-query signals are always in
    * BENCH_RESULT.json; a board that residual-suspects more than a
    * handful of rows is adjudicated from that artifact anyway.
    */
  private[graft] def stdoutLine(total: Double, nQueries: Int, runs: Int,
      stealSec: Double, globalWindow: Seq[String], failed: Seq[String],
      retriedCount: Int, sweptCount: Int, clearedCount: Int,
      suspects: Seq[String], suspectSteal: Seq[(String, Double)],
      suspectCpu: Seq[(String, Double)], headlineResults: Seq[(String, Double)],
      sfDir: String): String = {
    def arr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val keep = suspects.take(5).toSet
    s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":$nQueries,""" +
      s""""runs_per_query":$runs,"steal_sec":${fmt(stealSec)},""" +
      s""""global_window_queries":${arr(globalWindow)},"failed_queries":${arr(failed.take(12))},""" +
      s""""retried_count":$retriedCount,"swept_count":$sweptCount,"sweep_cleared_count":$clearedCount,""" +
      s""""suspect_count":${suspects.size},"suspect_queries":${arr(suspects.take(12))},""" +
      s""""suspect_steal":${dict(suspectSteal.filter(kv => keep(kv._1)))},""" +
      s""""suspect_cpu":${dict(suspectCpu.filter(kv => keep(kv._1)))},""" +
      s""""queries":${dict(headlineResults)},"sf":"$sfDir"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the product session factory, NOT a bespoke builder — same configs
    // the engine ships (see Verify.scala note)
    val spark = Engine.session(s"local[$cpus]", "graft-bench", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    // durable-checkpoint mode (same switch as tools/Soak): measures the
    // cluster-mode lineage-cut tax — every Checkpoints.cut site writes
    // reliable checkpoints instead of executor-block localCheckpoints
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR").foreach { d =>
      spark.conf.set("spark.graft.checkpointDir", d)
    }

    // Full materialization: .count() lets Catalyst prune every projection,
    // so expression-heavy queries would time the scan only. Executing the
    // already-optimized plan's RDD forces every output column through
    // whole-stage codegen into UnsafeRows (and handles map-typed columns
    // that xxhash64 can't).
    def materialize(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    // warmup: JIT + codegen + parquet footer caches — and one tiny write,
    // so the first write-heavy query (a01, alphabetically right after
    // warmup) doesn't absorb committer/output-format first-touch loading
    try {
      materialize(SparkEntry.queries("q01_agg")(spark, sfDir))
      val warm = tools.Tmp.dir("bench_warm")
      spark.range(100).write.mode("overwrite").parquet(warm + "/w")
    } catch { case _: Throwable => () }

    // CPU steal seconds from /proc/stat (field 8, USER_HZ ticks): the
    // direct noisy-neighbor signal on a shared VM. Annotated into the
    // JSON so a contended run is distinguishable from a real regression.
    def stealSec(): Double = try {
      val cpu = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).get.trim.split("\\s+")
      cpu(8).toDouble / 100.0
    } catch { case _: Throwable => -1.0 }
    val steal0 = stealSec()

    // Process CPU seconds (utime+stime across all JVM threads,
    // /proc/self/stat fields 14+15 in USER_HZ). The second contention
    // signal the r14 adjudication debt called for: /proc/stat steal
    // misses bursts shorter than its sampling window and cgroup/GC
    // descheduling entirely, but a run whose WALL inflates while its
    // CPU delta stays at the quiet-run level was descheduled, not slow —
    // the engine did the same work, the host just didn't schedule it.
    // Parse after the last ')' (comm may contain spaces/parens).
    def cpuSec(): Double = try {
      val stat = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/self/stat")), "UTF-8")
      val rest = stat.substring(stat.lastIndexOf(')') + 2).split("\\s+")
      // rest(0) is field 3 (state); utime=field 14 → rest(11), stime → rest(12)
      (rest(11).toDouble + rest(12).toDouble) / 100.0
    } catch { case _: Throwable => -1.0 }

    // Each query is timed SPARK_GRAFT_BENCH_RUNS times (default 2) and
    // scored by its MIN — host contention inflates some runs, never
    // deflates one, so the min is the stable engine-cost estimate (the
    // r6 "regressions" were 40% VM noise; see PERF.md).
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)

    // Committed quiet-host per-query seconds (bench_reference_times.json):
    // the steal-retry baseline. Three of four recent driver boards were
    // contention-distorted and each cost a judge adjudication cycle — a
    // query whose min lands far above its quiet-host time WHILE the host
    // was stealing cycles is re-timed (bounded) instead of reported as a
    // regression; whatever remains is annotated per query in the artifact.
    val refTimes: Map[String, Double] = try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("bench_reference_times.json")), "UTF-8")
      """"([^"\s]+)"\s*:\s*([0-9][0-9.eE+-]*)""".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case _: Throwable => Map.empty }
    val stealRetries = sys.env.getOrElse("SPARK_GRAFT_STEAL_RETRIES", "3").toInt
    // a min this far above the committed quiet time is "suspect". The bar
    // is max(2x, ref+0.15s) — the additive floor keeps sub-100ms queries
    // from tripping on scheduler jitter, while the 2x ratio keeps fast
    // queries from drifting un-annotated under a pure-ratio bar (r11:
    // q124 at 2.55x its 0.357s quiet time slipped under the old flat 3x).
    // r17 tightened the floor 0.4 -> 0.15 (r16 verdict #1): t08 at 2.84x
    // of its 0.113s row slipped the sweep because its absolute delta
    // (0.21s) sat under the old floor — sub-second rows now self-report,
    // and the bounded retry + end-of-board sweep absorb the extra churn.
    def suspectBar(ref: Double): Double = math.max(2.0 * ref, ref + 0.15)
    // ...but only when the host visibly stole cycles during the timing
    val stealGate = 0.5
    // focused adjudication runs (PERF.md protocol): comma-separated names
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val picked = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // any data-sized query planning a GLOBAL window (empty partitionSpec →
    // single-partition WindowExec) is a scale bug; the only sanctioned
    // site is t12's 20-row post-limit ranking. Attribution rides in the
    // bench artifact so a new offender fails loudly at judge time.
    val globalWindowQueries = scala.collection.mutable.SortedSet.empty[String]
    // a throwing query must be VISIBLE in the artifact: its time-to-failure
    // would otherwise read as a speedup and pass the regression gate
    val failedQueries = scala.collection.mutable.SortedSet.empty[String]
    val querySteal = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // CPU seconds of the run that produced each query's min wall — paired
    // wall/cpu is the adjudicable unit (cpu ≈ quiet-run cpu while wall is
    // inflated ⇒ descheduled, not a regression)
    val queryCpu = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val retriedQueries = scala.collection.mutable.SortedSet.empty[String]
    val suspectQueries = scala.collection.mutable.SortedSet.empty[String]
    // end-of-board sweep bookkeeping: which residual suspects got a final
    // re-time after the whole board completed, and which of them cleared
    val sweptQueries = scala.collection.mutable.SortedSet.empty[String]
    val sweepCleared = scala.collection.mutable.SortedSet.empty[String]
    val attributedSet = scala.collection.mutable.HashSet.empty[String]
    // one timed run: (wall_sec, cpu_sec). Shared by the in-loop retries and
    // the end-of-board sweep so both phases measure identically.
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Double) = {
      val c0 = cpuSec()
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        materialize(df)
        val d = (System.nanoTime() - t0) / 1e9
        val c = { val c1 = cpuSec(); if (c1 < 0 || c0 < 0) -1.0 else c1 - c0 }
        // plan attribution OUTSIDE the timed window, once per query, on
        // the first SUCCESSFUL run — the optimizedPlan walk must not
        // pollute the timings, and an erroring first run must not let a
        // global-window offender evade the guard
        if (!attributedSet.contains(name)) {
          attributedSet += name
          import org.apache.spark.sql.catalyst.plans.logical.{Window, WindowGroupLimit}
          val global = df.queryExecution.optimizedPlan.collectFirst {
            case w: Window if w.partitionSpec.isEmpty => w
            case w: WindowGroupLimit if w.partitionSpec.isEmpty => w
          }
          if (global.nonEmpty) globalWindowQueries += name: Unit
        }
        // release any localCheckpoint the query materialized — leaked
        // blocks would shrink execution memory for every query after it
        // (the r4 fleet-wide regression)
        tools.Checkpoints.sweep()
        (d, c)
      } catch { case _: Throwable =>
        failedQueries += name
        tools.Checkpoints.sweep()
        ((System.nanoTime() - t0) / 1e9, -1.0)
      }
    }
    val bestTimes = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val timers = picked.toMap
    picked.foreach { case (name, fn) =>
      val qSteal0 = stealSec()
      var (best, bestCpu) = (1 to runs).map(_ => timeOnce(name, fn))
        .minBy(_._1)
      var qSteal = { val s = stealSec(); if (s < 0 || qSteal0 < 0) -1.0 else s - qSteal0 }
      // contention-retry: min far above the committed quiet-host time →
      // re-time, bounded. The FIRST retry is steal-UNGATED: burst
      // contention shorter than the /proc/stat sampling window shows
      // per-query steal ≈ 0 yet still inflates a run (r13: q75 at 3.6x
      // with steal 0.02 — unexplainable from the artifact alone), so any
      // row over the bar earns one re-time on its own evidence. Later
      // retries still require VISIBLE steal, keeping the loop from
      // grinding on a genuine regression. Each retry re-reads steal so a
      // now-quiet host can clear the query.
      val ref = refTimes.getOrElse(name, -1.0)
      var attempts = 0
      while (attempts < stealRetries && ref > 0.02 && !failedQueries.contains(name) &&
          best > suspectBar(ref) && (attempts == 0 || qSteal > stealGate)) {
        attempts += 1
        retriedQueries += name
        val s0 = stealSec()
        val (w, c) = timeOnce(name, fn)
        if (w < best) { best = w; bestCpu = c }
        qSteal = { val s = stealSec(); if (s < 0 || s0 < 0) qSteal else s - s0 }
      }
      if (ref > 0.02 && best > suspectBar(ref)) suspectQueries += name: Unit
      querySteal(name) = qSteal
      queryCpu(name) = bestCpu
      bestTimes(name) = best
    }
    // End-of-board suspect re-sweep (r14 adjudication-debt fix): the r14
    // suspects clustered in contiguous alphabetical windows — burst
    // contention hitting whichever queries were running, invisible to
    // per-query steal. By the time the whole board has finished, that
    // burst has passed; one more timing per residual suspect, minutes
    // after its first, gives an independent sample. Keep the min.
    // Bounded: one run per suspect, suspects only.
    for (name <- suspectQueries.toSeq if !failedQueries.contains(name)) {
      val fn = timers(name)
      sweptQueries += name
      val s0 = stealSec()
      val (w, c) = timeOnce(name, fn)
      val qSteal = { val s = stealSec(); if (s < 0 || s0 < 0) -1.0 else s - s0 }
      if (w < bestTimes(name)) {
        bestTimes(name) = w
        queryCpu(name) = c
        querySteal(name) = qSteal
      }
      val ref = refTimes.getOrElse(name, -1.0)
      if (ref > 0.02 && bestTimes(name) <= suspectBar(ref)) {
        suspectQueries -= name
        sweepCleared += name: Unit
      }
    }
    val results = picked.map { case (name, _) => name -> bestTimes(name) }
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val stealDelta = { val s1 = stealSec(); if (s1 < 0 || steal0 < 0) -1.0 else s1 - steal0 }
    val json = stdoutLine(total, results.size, runs, stealDelta,
      globalWindowQueries.toSeq, failedQueries.toSeq, retriedQueries.size,
      sweptQueries.size, sweepCleared.size, suspectQueries.toSeq,
      suspectQueries.toSeq.map(n => n -> querySteal.getOrElse(n, -1.0)),
      suspectQueries.toSeq.map(n => n -> queryCpu.getOrElse(n, -1.0)),
      results.filter(r => headlineSet(r._1)), sfDir)
    // Full board: every query's wall + per-query steal + cpu, plus the full
    // swept/cleared lists. This is the audit artifact; stdout stays small.
    val rq = retriedQueries.map("\"" + _ + "\"").mkString("[", ",", "]")
    val sq = suspectQueries.map("\"" + _ + "\"").mkString("[", ",", "]")
    val sw = sweptQueries.map("\"" + _ + "\"").mkString("[", ",", "]")
    val sc = sweepCleared.map("\"" + _ + "\"").mkString("[", ",", "]")
    val gw = globalWindowQueries.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fq = failedQueries.map("\"" + _ + "\"").mkString("[", ",", "]")
    val meta = s""""runs_per_query":$runs,"steal_sec":${fmt(stealDelta)},"global_window_queries":$gw,"failed_queries":$fq,"retried_queries":$rq,"swept_queries":$sw,"sweep_cleared":$sc,"suspect_queries":$sq"""
    val fullJson = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},$meta,"query_steal":${dict(querySteal.toSeq)},"query_cpu":${dict(queryCpu.toSeq)},"queries":${dict(results)},"sf":"$sfDir"}"""
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_RESULT.json"),
        (fullJson + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    spark.stop()
    // Print after spark.stop() so no executor/shutdown log line lands between
    // the JSON and the end of output; one flush'd line on its own.
    System.out.flush()
    System.out.println()
    System.out.println(json)
    System.out.flush()
  }
}
