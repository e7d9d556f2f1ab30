package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** UNIONTYPE<T0..Tn> shim (SURVEY.md §1.2: reference
  * serde/.../typeinfo/UnionTypeInfo.java; grammar HiveParser.g:2050).
  *
  * Spark has no union type, so the documented model is a struct of
  * (tag, field0..fieldN) where exactly the tag'th field is non-null.
  * Pure column composition — codegen'd, no UDF.
  */
object UnionTypeShim {

  /** create_union(tag, v0, v1, ...) — Hive GenericUDFUnion. */
  def createUnion(tag: Column, values: Column*): Column =
    struct(
      tag.cast("int").as("tag") +:
        values.zipWithIndex.map { case (v, i) =>
          when(tag === i, v).otherwise(lit(null)).as(s"field$i")
        }: _*)

  def unionTag(u: Column): Column = u.getField("tag")

  def unionExtract(u: Column, i: Int): Column = u.getField(s"field$i")
}
