package graft

import org.apache.spark.sql.SparkSession
import graft.functions.FieldExpr

/** Session factory + function-gap installation.
  *
  * The reference's entire parse/optimize/execute stack collapses onto
  * `SparkSession` (SURVEY.md §3.1): Catalyst is the optimizer, AQE the
  * runtime re-planner, Tungsten the execution engine. What remains of
  * "the engine" is configuration tuned for warehouse workloads plus the
  * handful of Hive functions Spark lacks.
  */
object Engine {

  /** Hive-compatible, scale-tuned local session. On a cluster the same
    * configs apply; only master/memory change.
    */
  def session(master: String = "local[*]", appName: String = "graft",
              shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      // local[n]: match cores, not the 200 default; clusters re-tune or
      // rely on AQE coalescing
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Hive 1.2 semantics: permissive implicit coercions (string<->numeric
      // comparisons via double), no ANSI cast/overflow errors
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.files.maxPartitionBytes", "128m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    install(spark)
    spark
  }

  /** Register the function-gap pack + optional optimizer rules on any
    * session (idempotent). The stats-answer rule stays dormant unless
    * spark.graft.statsAnswer.enabled=true.
    */
  def install(spark: SparkSession): SparkSession = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "field", exprs => FieldExpr(exprs), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "parse_url_tuple", exprs => graft.functions.ParseUrlTuple(exprs), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "in_file", exprs => graft.functions.InFile(exprs(0), exprs(1)), "scala_udf")
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[graft.plans.StatsAnswerRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.StatsAnswerRule(spark)
    spark
  }

  // one registration per (session, dataDir); avoids 10 schema reads per query
  private val registered =
    java.util.Collections.synchronizedSet(new java.util.HashSet[String]())

  /** Drop-in SQL entry point: register the fixture tables that exist under
    * `dataDir` by their reference names and run HiveQL/Spark SQL text —
    * the workflow a reference user keeps when switching engines. Spark SQL
    * natively parses the HiveQL surface exercised here (LATERAL VIEW,
    * DISTRIBUTE/SORT/CLUSTER BY, TRANSFORM ... USING, GROUPING SETS,
    * LEFT SEMI JOIN).
    *
    * NOTE: registration REPLACES any same-named temp views on the session
    * (first call per (session, dataDir) only). Missing fixture files are
    * skipped so partial directories still serve the tables they do have.
    */
  def sql(spark: SparkSession, dataDir: String,
          query: String): org.apache.spark.sql.DataFrame = {
    install(spark)
    val key = System.identityHashCode(spark) + "|" + dataDir
    if (registered.add(key)) {
      val present = Tables.all.filter(n =>
        java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dataDir/$n.parquet")))
      Tables.views(spark, dataDir, present: _*)
    }
    spark.sql(query)
  }
}
