package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Scale note: every reader goes through `spark.read.parquet` so Catalyst's
  * vectorized reader, predicate pushdown, and column pruning apply. On a real
  * cluster the same code reads partitioned directories; nothing here assumes
  * single-file inputs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables we always broadcast in joins. */
  val dims: Set[String] = Set("region", "nation")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Nanosecond parquet timestamps (the events fixture) are rejected by
    // Spark's reader. Only when that actually bites, flip nanosAsLong (it
    // must stay on for the DataFrame's whole lifetime, so it cannot be
    // restored here — a session that reads nanos fixtures keeps the flag)
    // and normalize the known ts column to micros so windowing is uniform.
    val df =
      try spark.read.parquet(s"$dir/$name.parquet")
      catch {
        case e: Exception
            if (String.valueOf(e.getMessage).contains("PARQUET_TYPE_ILLEGAL") ||
              String.valueOf(e.getMessage).contains("Illegal Parquet type")) =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(s"$dir/$name.parquet")
      }
    // integer `div`, NOT `/`: epoch nanos exceed double's 2^53 mantissa, so
    // float division shifts timestamps by up to a microsecond
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register temp views for SQL-shaped queries (subqueries, grouping sets). */
  def views(spark: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
