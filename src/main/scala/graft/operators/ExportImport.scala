package graft.operators

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Hive `EXPORT TABLE t TO dir` / `IMPORT TABLE t FROM dir` parity.
  *
  * Reference: ql/src/java/org/apache/hadoop/hive/ql/parse/
  * ExportSemanticAnalyzer.java + ImportSemanticAnalyzer.java — export
  * writes the table's data files plus a `_metadata` descriptor into a
  * self-contained directory that can move across warehouses; import reads
  * the descriptor, recreates the table, and COPIES the data files in
  * (exec/CopyTask — a byte copy, never a row rewrite).
  *
  * Spark-first shape: `_metadata` is a small JSON (format + schema DDL)
  * written through the Hadoop FileSystem API (works on HDFS/S3, not just
  * local disk); the data snapshot is one parquet write at export; import
  * is a FileUtil byte copy plus a catalog `CREATE TABLE ... USING parquet
  * LOCATION`, so imported bytes are identical to exported bytes and no
  * executor job runs at all — import cost is pure I/O, independent of
  * query-engine concurrency.
  */
object ExportImport {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    FileSystem.get(new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)

  /** `k='v', k2='v2'` → ordered pairs (quotes optional), None when no
    * PARTITION clause was present. Splits on TOP-LEVEL commas only: a
    * quoted value may contain commas (or `=`), so `k='a,b'` is ONE pair —
    * the naive `split(",")` mis-parsed it into two bogus pairs. */
  def parseSpec(text: Option[String]): Option[Seq[(String, String)]] =
    text.map { t =>
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var quote: Char = 0
      var i = 0
      while (i < t.length) {
        val c = t.charAt(i)
        if (quote != 0) {
          if (c == '\\' && i + 1 < t.length) { cur.append(c).append(t.charAt(i + 1)); i += 1 }
          else { if (c == quote) quote = 0; cur.append(c) }
        } else if (c == '\'' || c == '"') { quote = c; cur.append(c) }
        else if (c == ',') { parts += cur.result(); cur.clear() }
        else cur.append(c)
        i += 1
      }
      parts += cur.result()
      parts.toSeq.map(_.trim).filter(_.nonEmpty).map { kv =>
        require(kv.contains("="), s"PARTITION spec needs key=value, got: $kv")
        val Array(k, v) = kv.split("=", 2).map(_.trim)
        val unq =
          if (v.length >= 2 && (v.head == '\'' || v.head == '"') && v.last == v.head)
            v.substring(1, v.length - 1)
          else v
        (k, unq)
      }
    }

  /** Run `units` (each one FileUtil.copy call) through a bounded thread
    * pool — Hive's CopyTask is also a byte copy, but a SERIAL driver loop
    * over a large partitioned dump is a wall-clock hazard (on an object
    * store each copy is a full byte transfer); 16-wide matches
    * Archive.relocate's bounded-connection pattern. Failures propagate
    * unwrapped so the caller sees the copy's own error, first one wins.
    */
  private def copyConcurrently(units: Seq[() => Unit]): Unit = {
    if (units.isEmpty) return
    if (units.size == 1) { units.head(); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(16, units.size)))
    val outcomes =
      try units.map { u =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = u()
        })
      }.map { fu =>
        try { fu.get(); None: Option[Throwable] }
        catch {
          case e: java.util.concurrent.ExecutionException =>
            Some(Option(e.getCause).getOrElse(e))
          case e: Throwable => Some(e)
        }
      }
      finally pool.shutdown()
    outcomes.flatten.headOption.foreach(t => throw t)
  }

  /** The spec's escaped directory path under the dump's data/ dir —
    * `emp_country=in/emp_state=ka` — matching the export layout. */
  private def specRelPath(spec: Seq[(String, String)]): String =
    spec.map { case (k, v) =>
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(k) + "=" +
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .escapePathName(v)
    }.mkString("/")

  /** EXPORT: snapshot `df` into `dir` (data/ + _metadata). With
    * `partitionBy`, the snapshot keeps the Hive partition-directory layout
    * (`p=v/part-*.parquet`) and the descriptor records the partition
    * columns — ExportSemanticAnalyzer exports per-partition subdirs plus
    * the partition spec, so a partitioned table survives the round trip
    * WITH its layout (import stays pruning-capable, no rewrite).
    */
  def exportTable(df: DataFrame, dir: String,
                  partitionBy: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    // EXPORT is a maintenance task: the reference never subjects it to
    // strict query checks (an unfiltered scan of the exported table is
    // the point), so the staging write runs with them suspended
    graft.plans.StrictChecks.suspended(spark) {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(dir + "/data")
    val meta =
      s"""{"format":"parquet","schema_ddl":${ujsonStr(df.schema.toDDL)},"partitions":${ujsonStr(partitionBy.mkString(","))}}"""
    val out = fs(spark, dir).create(new Path(dir, "_metadata"), true)
    try out.write(meta.getBytes("UTF-8")) finally out.close()
    }
  }

  /** IMPORT: recreate the exported table as catalog table `table` at
    * `location`, byte-copying the exported data files. Partitioned exports
    * are copied subtree-by-subtree (the `p=v` dirs ARE the layout), the
    * table is created `PARTITIONED BY` the descriptor's columns, and the
    * partitions are recovered from the directory names (MSCK REPAIR) — so
    * a filter on a partition column prunes directories exactly as it did
    * on the source table.
    */
  def importTable(spark: SparkSession, dir: String, table: String,
                  location: String,
                  spec: Option[Seq[(String, String)]] = None,
                  external: Boolean = false,
                  explicitLocation: Boolean = false): DataFrame = {
    val f = fs(spark, dir)
    val meta = {
      val in = f.open(new Path(dir, "_metadata"))
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      finally in.close()
    }
    val ddl = metaField(meta, "schema_ddl")
    val schema = StructType.fromDDL(ddl)
    val parts = metaField(meta, "partitions", required = false)
      .split(",").filter(_.nonEmpty).toSeq
    // IMPORT ... PARTITION (spec): restore just that partition from the
    // dump (ImportSemanticAnalyzer partSpecs). The spec must bind EVERY
    // exported partition column — the reference refuses an
    // underspecified import spec with the same "Specified partition not
    // found" it uses for an absent one (clientnegative/
    // exim_17_part_spec_underspec.q, exim_18_part_spec_missing.q,
    // SemanticException 10006) — and the dump must actually hold it.
    spec.foreach { kvs =>
      if (parts.isEmpty)
        sys.error(s"IMPORT into $table: partition spec supplied but the " +
          "export is not partitioned")
      if (kvs.map(_._1.toLowerCase) != parts.take(kvs.length).map(_.toLowerCase))
        sys.error(s"IMPORT into $table: partition spec " +
          s"(${kvs.map(_._1).mkString(", ")}) must name the exported " +
          s"partition columns in declared order (${parts.mkString(", ")})")
      if (kvs.length < parts.length ||
          !f.exists(new Path(dir + "/data/" + specRelPath(kvs))))
        sys.error(s"IMPORT into $table: Specified partition not found in " +
          "import directory: " +
          kvs.map { case (k, v) => s"$k='$v'" }.mkString("(", ", ", ")"))
    }
    // IMPORT into an EXISTING table (ImportSemanticAnalyzer
    // checkTable): the existing table's column schema and partitioning
    // must match the export descriptor — a mismatch is refused
    // (exim_03/04/05_noncompat_*); a match APPENDS the exported files
    // into the existing table's own location (Hive IMPORT semantics),
    // never into the caller-supplied fresh location.
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    if (spark.sessionState.catalog.tableExists(ident)) {
      // IMPORT EXTERNAL TABLE over an existing table is refused outright
      // (ImportSemanticAnalyzer checkTable, clientnegative/
      // exim_19_external_over_existing.q): an external import re-points
      // a location, it never merges into managed storage.
      if (external)
        sys.error(s"IMPORT into $table: the existing table is not " +
          "compatible with the import spec. External table cannot " +
          "overwrite existing table. Drop existing table first.")
      // a MANAGED import may not redirect an existing table's storage
      // (ImportSemanticAnalyzer checkTable; clientnegative/
      // exim_20_managed_location_over_existing.q): an explicit LOCATION
      // that differs from the table's own is refused
      if (explicitLocation) {
        // compare FULLY-QUALIFIED paths (ImportSemanticAnalyzer does):
        // a scheme-qualified catalog location (file:/warehouse/t) and
        // the same path given unqualified ('/warehouse/t') are the same
        // place, not a mismatch — qualify each against its own
        // filesystem before comparing
        val qconf = spark.sessionState.newHadoopConf()
        def qualified(p: String): String = {
          val pp = new Path(p)
          pp.getFileSystem(qconf).makeQualified(pp).toString.stripSuffix("/")
        }
        val existingLoc = qualified(new Path(spark.sessionState.catalog
          .getTableMetadata(ident).location).toString)
        val givenLoc = qualified(location)
        if (existingLoc != givenLoc)
          sys.error(s"IMPORT into $table: the existing table is not " +
            "compatible with the import spec. Location does not match")
      }
      return importIntoExisting(spark, f, dir, table, ident, schema, parts, spec)
    }
    // byte copy of the data files (CopyTask semantics — no rewrite):
    // partition dirs copy recursively, preserving the layout. The
    // DESTINATION resolves its own FileSystem — source and target may live
    // on different stores (the operator's cross-warehouse purpose).
    // Committer droppings (_SUCCESS, .crc FILES) are skipped. Partition
    // DIRECTORIES pass through even with a leading underscore (a partition
    // column can legally start with one) — but known committer staging
    // directories a failed export job could leave behind (_temporary,
    // .spark-staging-*, .hive-staging*) are excluded by exact name so they
    // are never byte-copied into the imported table.
    val committerDirs: String => Boolean = n =>
      n == "_temporary" || n.startsWith(".spark-staging") ||
        n.startsWith(".hive-staging") || n == "_SUCCESS"
    val target = new Path(location)
    val df2 = target.getFileSystem(spark.sessionState.newHadoopConf())
    // partition-scoped import copies only the spec's subtree (and lands
    // it under the same relative path, so pruning layout is preserved)
    val rel = spec.map(specRelPath)
    val srcRoot = rel.fold(new Path(dir, "data"))(r => new Path(dir + "/data/" + r))
    val dstRoot = rel.fold(target)(r => new Path(target, r))
    df2.mkdirs(dstRoot)
    // each top-level entry (a partition subtree or a data file) is one
    // pool unit — FileUtil.copy recurses into directories itself, so the
    // grain is per-partition, the natural parallel unit of a dump
    val hconf = spark.sparkContext.hadoopConfiguration
    copyConcurrently(
      f.listStatus(srcRoot)
        .filter { st =>
          val n = st.getPath.getName
          if (st.isDirectory) !committerDirs(n)
          else !n.startsWith("_") && !n.startsWith(".")
        }
        .map { st => () =>
          FileUtil.copy(f, st.getPath, df2,
            new Path(dstRoot, st.getPath.getName), false, hconf): Unit
        }.toSeq)
    val partClause =
      if (parts.isEmpty) "" else parts.mkString(" PARTITIONED BY (", ", ", ")")
    spark.sql(s"CREATE TABLE $table (${schema.toDDL}) USING parquet$partClause LOCATION '$location'")
    if (parts.nonEmpty) spark.sql(s"MSCK REPAIR TABLE $table")
    spark.table(table)
  }

  /** Validate-and-append leg of IMPORT (existing destination). Column
    * names/types and partition columns must equal the descriptor's
    * (case-insensitive names, exact Catalyst types); files byte-copy
    * into the EXISTING location with an import-unique prefix so repeated
    * imports never collide, partition dirs merging by name. */
  private def importIntoExisting(spark: SparkSession, f: FileSystem,
      dir: String, table: String,
      ident: org.apache.spark.sql.catalyst.TableIdentifier,
      schema: StructType, parts: Seq[String],
      spec: Option[Seq[(String, String)]] = None): DataFrame = {
    val em = spark.sessionState.catalog.getTableMetadata(ident)
    // the export data files are parquet (exportTable's snapshot format) —
    // appending them under a table of another provider would corrupt it
    val eProv = em.provider.map(_.toLowerCase).getOrElse("parquet")
    if (eProv != "parquet")
      sys.error(s"IMPORT into existing table $table: table format $eProv " +
        "does not match the export data format parquet")
    val ePartCols = em.partitionColumnNames
    val eData = em.schema.filterNot(fd => ePartCols.contains(fd.name))
    def sig(s: Seq[org.apache.spark.sql.types.StructField]) =
      s.map(fd => fd.name.toLowerCase -> fd.dataType)
    // the descriptor's `partitions` field holds column NAMES; their types
    // (and the data columns) live in schema_ddl, which covers the FULL
    // exported schema — split it the same way the table metadata splits
    val dParts = schema.fields.filter(f =>
      parts.exists(_.equalsIgnoreCase(f.name))).toSeq
    val dData = schema.fields.filterNot(f =>
      parts.exists(_.equalsIgnoreCase(f.name))).toSeq
    if (sig(eData) != sig(dData))
      sys.error(s"IMPORT into existing table $table: column schema does " +
        s"not match the export (table: ${eData.map(_.toDDL).mkString(", ")}; " +
        s"export: ${dData.map(_.toDDL).mkString(", ")})")
    if (sig(em.schema.filter(fd => ePartCols.contains(fd.name))) != sig(dParts))
      sys.error(s"IMPORT into existing table $table: partition columns do " +
        s"not match the export (table: ${ePartCols.mkString(", ")}; " +
        s"export: ${dParts.map(_.name).mkString(", ")})")
    val target = new Path(em.location)
    val tfs = target.getFileSystem(spark.sessionState.newHadoopConf())
    // the reference's overlap refusals (ImportSemanticAnalyzer):
    // a NON-PARTITIONED destination that already holds data files refuses
    // (clientnegative/exim_01_nonpart_over_loaded.q — an append would
    // silently double rows a re-run script already loaded), and a
    // PARTITIONED import refuses when any incoming partition already
    // exists (exim_02_all_part_over_overlap.q) — only NEW partitions may
    // land next to existing ones.
    if (ePartCols.isEmpty) {
      // a LOCATION-created table whose directory was never materialized
      // is empty by definition — listStatus on the absent dir would throw
      val hasData = tfs.exists(target) &&
        Option(tfs.listStatus(target)).toSeq.flatten.exists { st =>
          val n = st.getPath.getName
          !st.isDirectory && !n.startsWith("_") && !n.startsWith(".")
        }
      if (hasData)
        sys.error(s"IMPORT into existing table $table: " +
          "table exists and contains data files")
    } else {
      val existing = spark.sessionState.catalog.listPartitionNames(ident).toSet
      // export lays out one level per partition column; compare full
      // relative partition paths against the catalog's names. A
      // partition-scoped import only checks (and later copies) the
      // spec's own subtree.
      def leaves(p: Path, rel: String): Seq[String] = {
        val kids = Option(f.listStatus(p)).toSeq.flatten
          .filter(c => c.isDirectory && c.getPath.getName.contains("="))
        if (kids.isEmpty) Seq(rel)
        else kids.flatMap(c => leaves(c.getPath, rel + "/" + c.getPath.getName))
      }
      val roots: Seq[(Path, String)] = spec match {
        case Some(kvs) =>
          val r = specRelPath(kvs)
          Seq(new Path(dir + "/data/" + r) -> r)
        case None =>
          Option(f.listStatus(new Path(dir, "data"))).toSeq.flatten
            .filter(st => st.isDirectory && st.getPath.getName.contains("="))
            .map(st => st.getPath -> st.getPath.getName)
      }
      roots.foreach { case (p, rel0) =>
        leaves(p, rel0).foreach { name =>
          if (existing.contains(name))
            sys.error(s"IMPORT into existing table $table: " +
              s"partition already exists: $name")
        }
      }
    }
    val uid = java.util.UUID.randomUUID().toString.take(8)
    // the append path renames every file with the import-unique prefix,
    // so the walk (cheap metadata listing, serial, creates dirs as it
    // goes) collects per-FILE pairs and the byte copies run pooled
    def collectCopies(srcDir: Path, dst: Path): Seq[() => Unit] = {
      tfs.mkdirs(dst)
      Option(f.listStatus(srcDir)).toSeq.flatten.flatMap { st =>
        val n = st.getPath.getName
        if (st.isDirectory) {
          if (n != "_temporary" && !n.startsWith(".spark-staging") &&
              !n.startsWith(".hive-staging"))
            collectCopies(st.getPath, new Path(dst, n))
          else Nil
        } else if (!n.startsWith("_") && !n.startsWith(".")) {
          val hconf = spark.sparkContext.hadoopConfiguration
          Seq(() => FileUtil.copy(f, st.getPath, tfs,
            new Path(dst, s"imp-$uid-$n"), false, hconf): Unit)
        } else Nil
      }
    }
    copyConcurrently(spec match {
      case Some(kvs) =>
        val r = specRelPath(kvs)
        collectCopies(new Path(dir + "/data/" + r), new Path(target, r))
      case None => collectCopies(new Path(dir, "data"), target)
    })
    if (ePartCols.nonEmpty) spark.sql(s"MSCK REPAIR TABLE $table")
    spark.sql(s"REFRESH TABLE $table")
    spark.table(table)
  }

  // minimal JSON string codec for the one-field descriptor (no JSON lib in
  // the dependency set; mirrors Verify.scala's escaping)
  private def ujsonStr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def metaField(json: String, key: String,
                        required: Boolean = true): String = {
    val m = ("\"" + key + "\":\"((?:[^\"\\\\]|\\\\.)*)\"").r
    m.findFirstMatchIn(json) match {
      case Some(g) =>
        // sequential single-pass unescape: chained replace()s corrupt
        // adjacent escapes (\\n — an escaped backslash then 'n' — would
        // first collapse to \n and then decode as a newline) and never
        // decoded the \\uXXXX forms ujsonStr emits for control chars
        val raw = g.group(1)
        val sb = new StringBuilder(raw.length)
        var i = 0
        while (i < raw.length) {
          if (raw.charAt(i) == '\\' && i + 1 < raw.length) {
            raw.charAt(i + 1) match {
              case 'u' if i + 6 <= raw.length =>
                sb.append(Integer.parseInt(raw.substring(i + 2, i + 6), 16).toChar)
                i += 6
              case 'n' => sb.append('\n'); i += 2
              case c   => sb.append(c); i += 2 // covers \" and \\ (and passthrough)
            }
          } else { sb.append(raw.charAt(i)); i += 1 }
        }
        sb.toString
      case None if required => sys.error(s"_metadata missing $key")
      case None => ""
    }
  }
}
