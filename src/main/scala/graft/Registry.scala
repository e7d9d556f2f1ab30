package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark-first DataFrame program plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  * Column names/aliases MUST match between `fn`'s output and `oracle` —
  * the driver sorts columns by name before hashing.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Central inventory of every operator-query the engine claims. */
object Registry {
  lazy val all: Seq[Q] =
    queries.CoreQueries.all ++
      queries.AnalyticQueries.all ++
      queries.PipelineQueries.all ++
      queries.ExtraQueries.all ++
      queries.FormatQueries.all ++
      queries.Round2Queries.all ++
      queries.Round3Queries.all ++
      queries.Round4Queries.all ++
      queries.Round5Queries.all ++
      queries.Round6Queries.all ++
      queries.Round7Queries.all ++
      queries.Round8Queries.all ++
      queries.Round10Queries.all ++
      queries.Round11Queries.all ++
      queries.Round12Queries.all ++
      queries.Round13Queries.all ++
      queries.Round14Queries.all ++
      queries.Round15Queries.all ++
      queries.Round16Queries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
