package graft.functions

import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions._

/** Hive's `sort_array_by(array<struct>, 'f1' [, 'f2'...] [, 'ASC'|'DESC'])`
  * — sorts an array of structs by the named field(s).
  *
  * Reference: /root/reference/ql/src/java/org/apache/hadoop/hive/ql/udf/
  * generic/GenericUDFSortArrayByField.java (registered in
  * exec/FunctionRegistry.java as "sort_array_by"). Spark has no same-named
  * built-in; rather than a row-at-a-time UDF this BUILDS the equivalent
  * `array_sort(arr, (l, r) -> ...)` Catalyst tree — a nested-If comparator
  * over the named fields — so the sort stays inside codegen like a
  * hand-written lambda would.
  */
object SortArrayBy {

  private def strLit(e: Expression): Option[String] = e match {
    case Literal(v, org.apache.spark.sql.types.StringType) if v != null =>
      Some(v.toString)
    case _ => None
  }

  def apply(exprs: Seq[Expression]): Expression = {
    require(exprs.size >= 2,
      "sort_array_by(arr, 'field'...[, 'ASC'|'DESC']) needs >= 2 args")
    val tail = exprs.tail.map(e => strLit(e).getOrElse(
      throw new IllegalArgumentException(
        "sort_array_by: field names and sort order must be string literals")))
    val (fields, desc) = tail.last.toUpperCase match {
      case "ASC" => (tail.dropRight(1), false)
      case "DESC" => (tail.dropRight(1), true)
      case _ => (tail, false)
    }
    require(fields.nonEmpty, "sort_array_by: no sort fields given")
    val l = UnresolvedNamedLambdaVariable(Seq("sab_l"))
    val r = UnresolvedNamedLambdaVariable(Seq("sab_r"))
    // nested comparator: first differing field decides; equal on all -> 0
    val cmp = fields.foldRight[Expression](Literal(0)) { (f, tie) =>
      val (lf, rf) = (UnresolvedExtractValue(l, Literal(f)),
        UnresolvedExtractValue(r, Literal(f)))
      val (lt, gt) = if (desc) (Literal(1), Literal(-1))
        else (Literal(-1), Literal(1))
      If(LessThan(lf, rf), lt, If(GreaterThan(lf, rf), gt, tie))
    }
    ArraySort(exprs.head, LambdaFunction(cmp, Seq(l, r)))
  }
}
