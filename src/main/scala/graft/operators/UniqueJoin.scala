package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hive's UNIQUEJOIN (parse/HiveParser.g `KW_UNIQUEJOIN`, plan
  * `JoinDesc.UNIQUE_JOIN`): an n-way join on ONE key expression per table.
  * A PRESERVEd table keeps its keys in the output even when no other table
  * matches (NULLs fill the gaps); a non-PRESERVEd table's exclusive keys
  * are dropped. So a key survives iff it appears in at least one PRESERVEd
  * table — or in every table, which is what makes the no-PRESERVE form the
  * n-way inner join and the all-PRESERVE form the n-way full outer.
  *
  * Scale design: folds into a chain of full-outer hash joins on the key
  * (one shuffle per side, AQE-eligible), then one filter applying the
  * presence rule — no operator-specific shuffle beyond what an ordinary
  * n-way join costs.
  */
object UniqueJoin {

  /** @param tables (df, key expression, preserve?) per table; each df's
    *               columns must be mutually distinct (alias upstream).
    * @return joined frame: `k` (the coalesced key) + every table's columns
    */
  def apply(tables: Seq[(DataFrame, Column, Boolean)]): DataFrame = {
    require(tables.size >= 2, "uniquejoin needs at least two tables")
    val tagged = tables.zipWithIndex.map { case ((df, key, preserve), i) =>
      (df.withColumn(s"_k$i", key).withColumn(s"_p$i", lit(true)), preserve, i)
    }
    val joined = tagged.tail.foldLeft(tagged.head._1) { case (acc, (df, _, i)) =>
      val accKey = coalesce((0 until i).map(j => col(s"_k$j")): _*)
      acc.join(df, accKey === col(s"_k$i"), "full_outer")
    }
    val preservedAny = tagged.collect { case (_, true, i) => col(s"_p$i").isNotNull }
    val inAll = tagged.map { case (_, _, i) => col(s"_p$i").isNotNull }.reduce(_ && _)
    val filtered = joined.filter((preservedAny :+ inAll).reduce(_ || _))
    filtered
      .withColumn("k", coalesce(tagged.map { case (_, _, i) => col(s"_k$i") }: _*))
      .drop(tagged.flatMap { case (_, _, i) => Seq(s"_k$i", s"_p$i") }: _*)
  }
}
