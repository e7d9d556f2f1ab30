package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registry query on SPARK_GRAFT_SF_DIR,
  * prints ONE JSON line (driver contract). A warmup pass (flagship query)
  * absorbs JVM/codegen startup so per-query numbers reflect steady state.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Engine.install(spark)
    spark.sparkContext.setLogLevel("WARN")

    // Full materialization: .count() lets Catalyst prune every projection,
    // so expression-heavy queries would time the scan only. Executing the
    // already-optimized plan's RDD forces every output column through
    // whole-stage codegen into UnsafeRows (and handles map-typed columns
    // that xxhash64 can't).
    def materialize(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    // warmup: JIT + codegen + parquet footer caches
    try materialize(SparkEntry.queries("q01_agg")(spark, sfDir))
    catch { case _: Throwable => () }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { materialize(fn(spark, sfDir)) } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Driver contract: ONE JSON line. sbt interleaves its own log lines on
    // stdout, so (a) force a fresh line + flush around the JSON and (b) also
    // write it to BENCH_RESULT.json in the working dir as a deterministic
    // fallback for the parser.
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_RESULT.json"),
        (json + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    System.out.flush()
    System.out.println()
    System.out.println(json)
    System.out.flush()
    spark.stop()
  }
}
