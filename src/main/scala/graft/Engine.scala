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
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => graft.functions.CosineSim(exprs(0), exprs(1)), "scala_udf")
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[graft.plans.StatsAnswerRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.StatsAnswerRule(spark)
    spark
  }

  /** CREATE/DROP [TEMPORARY] FUNCTION DDL surface — the reference's
    * FunctionSemanticAnalyzer + FunctionTask: a statement names an
    * implementing class, the task resolves the class to a function builder
    * and registers it under the statement's name. The class catalog maps
    * BOTH this engine's expression classes and the reference's Hive UDF
    * class names (what a migrating user's scripts actually contain) onto
    * the same Catalyst builders, so `CREATE TEMPORARY FUNCTION f AS
    * 'org.apache.hadoop.hive.ql.udf.generic.GenericUDFField'` just works.
    * Statements with an unknown class fall through to Spark's native
    * parser (which handles UDF1..22 classes and USING JAR).
    */
  private val functionClasses: Map[String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression] = Map(
    "graft.functions.FieldExpr" -> (exprs => FieldExpr(exprs)),
    "org.apache.hadoop.hive.ql.udf.generic.GenericUDFField" -> (exprs => FieldExpr(exprs)),
    "graft.functions.ParseUrlTuple" -> (exprs => graft.functions.ParseUrlTuple(exprs)),
    "org.apache.hadoop.hive.ql.udf.generic.GenericUDTFParseUrlTuple" -> (exprs => graft.functions.ParseUrlTuple(exprs)),
    "graft.functions.InFile" -> (exprs => graft.functions.InFile(exprs(0), exprs(1))),
    "org.apache.hadoop.hive.ql.udf.UDFInFile" -> (exprs => graft.functions.InFile(exprs(0), exprs(1))))

  private val createFunRe =
    """(?is)\s*CREATE\s+(?:TEMPORARY\s+)?FUNCTION\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s+AS\s+'([^']+)'\s*;?\s*""".r
  private val dropFunRe =
    """(?is)\s*DROP\s+(?:TEMPORARY\s+)?FUNCTION\s+(?:IF\s+EXISTS\s+)?([\w.]+)\s*;?\s*""".r
  private val loadDataRe =
    """(?is)\s*LOAD\s+DATA\s+(?:LOCAL\s+)?INPATH\s+'([^']+)'\s+(OVERWRITE\s+)?INTO\s+TABLE\s+([\w.]+)\s*(?:PARTITION\s*\(([^)]*)\))?\s*;?\s*""".r

  /** LOAD DATA INPATH — LoadSemanticAnalyzer + MoveTask parity: files move
    * into the table's (or partition's) directory byte-for-byte, no rewrite
    * and no validation, then the table is refreshed (and partitions
    * recovered when a PARTITION spec names the target subdir). Spark's
    * native LOAD DATA only serves Hive-catalog tables; this serves the
    * engine's own parquet tables through the same statement text.
    */
  private def loadData(spark: SparkSession, inpath: String, overwrite: Boolean,
                       table: String, partSpec: Option[String]): Unit = {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val tableLoc = new Path(spark.sessionState.catalog.getTableMetadata(ident).location)
    val dst = partSpec match {
      case Some(spec) =>
        val sub = spec.split(",").map { kv =>
          val Array(k, v) = kv.split("=", 2).map(_.trim)
          s"$k=${v.stripPrefix("'").stripSuffix("'")}"
        }.mkString("/")
        new Path(tableLoc, sub)
      case None => tableLoc
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val srcFs = new Path(inpath).getFileSystem(conf)
    val dstFs = dst.getFileSystem(conf)
    dstFs.mkdirs(dst)
    if (overwrite)
      dstFs.listStatus(dst).filter(_.isFile).foreach(st => dstFs.delete(st.getPath, false))
    val src = new Path(inpath)
    val files =
      if (srcFs.getFileStatus(src).isDirectory)
        srcFs.listStatus(src).filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
          .map(_.getPath)
      else Array(src)
    files.foreach(f => FileUtil.copy(srcFs, f, dstFs, new Path(dst, f.getName), false, conf))
    if (partSpec.nonEmpty) spark.sql(s"MSCK REPAIR TABLE $table")
    spark.sql(s"REFRESH TABLE $table")
  }

  /** Run one statement, intercepting function DDL (result: empty frame,
    * like a DDL command). Everything else goes to Spark SQL unchanged.
    */
  def ddl(spark: SparkSession, stmt: String): org.apache.spark.sql.DataFrame =
    stmt match {
      case createFunRe(name, cls) if functionClasses.contains(cls) =>
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          name.split('.').last, functionClasses(cls), "scala_udf")
        spark.emptyDataFrame
      case dropFunRe(name) =>
        spark.sessionState.functionRegistry.dropFunction(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name.split('.').last))
        spark.emptyDataFrame
      case loadDataRe(inpath, over, table, part) =>
        loadData(spark, inpath, over != null, table, Option(part))
        spark.emptyDataFrame
      case _ => spark.sql(stmt)
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
    // function DDL is part of the drop-in surface: a migrating user's
    // script may open with CREATE TEMPORARY FUNCTION lines
    ddl(spark, query)
  }

  /** Run a multi-statement script (statements separated by a line-ending
    * semicolon, .q-file style) and return the LAST statement's result —
    * the CliDriver per-statement loop. Semicolons inside one-line string
    * literals are safe (the split needs end-of-line); multi-line literals
    * containing `;\n` are not supported, matching CliDriver's own
    * line-based splitting.
    */
  def script(spark: SparkSession, dataDir: String,
             text: String): org.apache.spark.sql.DataFrame = {
    val stmts = text.split(";\\s*(\\n|$)").map(_.trim).filter(_.nonEmpty)
    require(stmts.nonEmpty, "empty script")
    stmts.map(sql(spark, dataDir, _)).last
  }
}
