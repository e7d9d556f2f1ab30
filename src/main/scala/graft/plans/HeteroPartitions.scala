package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.catalog.{CatalogTable, ExternalCatalogUtils}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, EqualNullSafe, Expression, Literal, Not, Or}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.StructType

/** Heterogeneous per-partition file formats — the reference's
  * `ALTER TABLE t PARTITION (...) SET FILEFORMAT fmt`
  * (DDLTask.alterTableFileFormat with a partition spec): a migrating
  * warehouse really does hold tables whose old partitions are text or
  * sequencefile while new ones are parquet, and each partition's
  * metadata names its own serde.
  *
  * Spark datasource tables carry ONE provider table-wide, so the
  * partition-level divergence lives in a table property
  * (`graft.hetero.formats`: `escaped/spec/path>provider` entries joined
  * by ';') and an injected analyzer rule rewrites every READ of such a
  * table into a union: the base relation filtered to NOT the diverged
  * partitions, plus one path-scoped scan per diverged partition in its
  * own format with the partition values re-attached as literals. The
  * union's first child is the filtered base relation, so the union
  * exposes the original attribute ids and the surrounding plan resolves
  * unchanged; Catalyst still prunes columns into each branch and
  * partition-filter predicates cancel branches entirely.
  *
  * Writes: Engine routes a fully-static INSERT aimed at a diverged
  * partition to a path write in that partition's format, and REFUSES
  * dynamic-partition writes and whole-table DML on hetero tables loudly
  * (a blind base-format write into a diverged directory would corrupt
  * it at the next read).
  */
object HeteroPartitions {

  val PropKey = "graft.hetero.formats"

  /** Per-diverged-partition fixed reader/writer options, mirroring the
    * table-wide SET FILEFORMAT mapping (TEXTFILE -> csv with Hive's
    * default delimiters). */
  def providerOptions(provider: String): Map[String, String] =
    provider match {
      case "csv" => Map("sep" -> "\u0001", "nullValue" -> "\\N")
      case _ => Map.empty
    }

  /** spec path (escaped `k=v/k2=v2`, the on-disk subdir spelling) ->
    * provider, in insertion order. */
  def parse(props: Map[String, String]): Seq[(String, String)] =
    props.get(PropKey).toSeq.flatMap(_.split(";").toSeq.filter(_.nonEmpty).map { e =>
      val Array(spec, prov) = e.split(">", 2)
      spec -> prov
    })

  def encode(entries: Seq[(String, String)]): String =
    entries.map { case (s, p) => s"$s>$p" }.mkString(";")

  def entriesOf(spark: SparkSession, table: String): Seq[(String, String)] =
    try parse(spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table)).properties)
    catch { case _: Exception => Nil }

  /** The escaped `k=v` path components of a spec path, decoded back to
    * (column, raw value) pairs. */
  def specPairs(specPath: String): Seq[(String, String)] =
    specPath.split("/").toSeq.map { kv =>
      val Array(k, v) = kv.split("=", 2)
      ExternalCatalogUtils.unescapePathName(k) ->
        ExternalCatalogUtils.unescapePathName(v)
    }

  private val expanded = TreeNodeTag[Boolean]("graft.hetero.expanded")

  case class Reads(session: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan match {
      // never rewrite the TARGET of a write — only the query side reads
      case i: InsertIntoStatement => i.copy(query = apply(i.query))
      case a: AppendData => a.copy(query = apply(a.query))
      case o: OverwriteByExpression => o.copy(query = apply(o.query))
      case o: OverwritePartitionsDynamic => o.copy(query = apply(o.query))
      case _ => plan.resolveOperatorsUp {
        case lr: LogicalRelation
            if lr.getTagValue(expanded).isEmpty &&
              lr.catalogTable.exists(_.properties.contains(PropKey)) =>
          expand(lr, lr.catalogTable.get)
      }
    }

    private def expand(lr0: LogicalRelation, cat: CatalogTable): LogicalPlan = {
      val entries = parse(cat.properties)
      if (entries.isEmpty) return lr0
      // never tag lr0 itself: the session's tableRelationCache hands the
      // SAME LogicalRelation instance to every query, so a tag on it
      // would make the FIRST query expand and every later one skip —
      // expand a fresh copy (same output attributes) and tag that
      val lr = lr0.copy()
      lr.setTagValue(expanded, true)
      val attrByName = lr.output.map(a => a.name.toLowerCase -> a).toMap
      val partCols = cat.partitionColumnNames
      val tz = Option(session.sessionState.conf.sessionLocalTimeZone)
      // base: every partition EXCEPT the diverged ones (null-safe equality
      // — a diverged __HIVE_DEFAULT_PARTITION__ must still be excluded)
      val divergedPreds: Seq[Expression] = entries.map { case (spec, _) =>
        specPairs(spec).map { case (k, v) =>
          val attr = attrByName(k.toLowerCase)
          val value =
            if (v == ExternalCatalogUtils.DEFAULT_PARTITION_NAME)
              Literal(null, attr.dataType)
            else Cast(Literal(v), attr.dataType, tz)
          EqualNullSafe(attr, value): Expression
        }.reduce(org.apache.spark.sql.catalyst.expressions.And)
      }
      val base: LogicalPlan = Filter(Not(divergedPreds.reduce(Or)), lr)
      val dataSchema = StructType(
        cat.schema.filterNot(f => partCols.exists(_.equalsIgnoreCase(f.name))))
      val loc = cat.location.toString.stripSuffix("/")
      def dirExists(dir: String): Boolean = try {
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(session.sessionState.newHadoopConf()).exists(p)
      } catch { case _: Exception => false }
      // REFRESH TABLE walks the analyzed plan and calls .catalogTable.get
      // on every LogicalRelation (and .catalog.get/.identifier.get on
      // every DataSourceV2Relation) — a bare path-based relation would
      // NPE there. Attach the owning table's metadata with the hetero
      // property STRIPPED (so this rule never re-expands the branch) /
      // its catalog + identifier.
      def patched(df: org.apache.spark.sql.DataFrame): LogicalPlan =
        df.queryExecution.analyzed.transform {
          case plr: LogicalRelation if plr.catalogTable.isEmpty =>
            val p = plr.copy(catalogTable =
              Some(cat.copy(properties = cat.properties - PropKey)))
            p.setTagValue(expanded, true)
            p
          case v2: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
              if v2.catalog.isEmpty || v2.identifier.isEmpty =>
            v2.copy(
              catalog = Some(org.apache.spark.sql.GraftCatalogBridge
                .sessionCatalogPlugin(session)),
              identifier = Some(
                org.apache.spark.sql.connector.catalog.Identifier.of(
                  Array(cat.identifier.database.getOrElse("default")),
                  cat.identifier.table)))
        }
      import org.apache.spark.sql.functions.{col, lit}
      // Plan size must NOT grow with the number of diverged partitions —
      // a migrating warehouse can hold THOUSANDS of old-format partitions
      // and a per-partition Union branch would explode the plan. v1
      // providers group into ONE basePath scan per FORMAT: Spark recovers
      // the partition columns from the directory names (declared types via
      // the full schema), so partition-filter predicates still prune
      // inside the branch. DSv2 graft providers (no multi-path basePath
      // contract) keep one branch per partition with literal re-attach.
      val v1Providers = Set("parquet", "orc", "csv", "json")
      val partSchema = StructType(
        cat.schema.filter(f => partCols.exists(_.equalsIgnoreCase(f.name))))
      val extras: Seq[LogicalPlan] = entries.groupBy(_._2).toSeq
        .sortBy(_._1).flatMap { case (prov, specs) =>
          if (v1Providers(prov)) {
            val dirs = specs.map(_._1).map(s => loc + "/" + s).filter(dirExists)
            if (dirs.isEmpty)
              Seq(LocalRelation(lr.output.map(_.newInstance())): LogicalPlan)
            else {
              val df = session.read.format(prov).options(providerOptions(prov))
                .option("basePath", loc)
                .schema(StructType(dataSchema.fields ++ partSchema.fields))
                .load(dirs: _*)
              Seq(patched(df.select(lr.output.map(a => col(a.name)): _*)))
            }
          } else specs.map { case (spec, _) =>
            val dir = loc + "/" + spec
            val pairs = specPairs(spec).map { case (k, v) => k.toLowerCase -> v }.toMap
            if (!dirExists(dir))
              LocalRelation(lr.output.map(_.newInstance())): LogicalPlan
            else {
              val df = session.read.format(prov).options(providerOptions(prov))
                .schema(dataSchema).load(dir)
              // relation column order, partition values as typed literals
              val cols = lr.output.map { a =>
                pairs.get(a.name.toLowerCase) match {
                  case Some(v) =>
                    val c = if (v == ExternalCatalogUtils.DEFAULT_PARTITION_NAME)
                      lit(null) else lit(v)
                    c.cast(a.dataType).as(a.name)
                  case None => col(a.name)
                }
              }
              patched(df.select(cols: _*))
            }
          }
        }
      // union exposes the FIRST child's (the base relation's) attribute
      // ids, so references in the surrounding plan stay resolved
      Union(base +: extras)
    }
  }
}
