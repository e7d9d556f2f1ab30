package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}

/** Hive's `in_file(str, filename)`: true iff `str` equals one full line of
  * the named file.
  *
  * Reference: /root/reference/ql/src/java/org/apache/hadoop/hive/ql/udf/
  * UDFInFile.java (registered in exec/FunctionRegistry.java).
  *
  * Scale design: the filename must be foldable (as in Hive), so the file is
  * read ONCE on the driver at plan time and the resulting line set travels
  * to executors as a codegen reference object — executors never touch the
  * filesystem, which is what makes this correct on a 1000-executor cluster
  * where the dictionary file only exists on the submitting host.
  */
case class InFile(str: Expression, fileName: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(str, fileName)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (str.dataType != StringType || fileName.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("in_file(str, filename) takes two strings")
    else if (!fileName.foldable)
      TypeCheckResult.TypeCheckFailure("in_file() filename must be a constant")
    else {
      // Force the dictionary read HERE, on the driver, during analysis.
      // A forced lazy val serializes its computed value with the plan, so
      // the interpreted-eval path on executors reuses the driver's set and
      // never touches the (driver-local) filesystem. A missing file fails
      // the query at analysis time, like Hive's UDFInFile initialize().
      lineSet
      TypeCheckResult.TypeCheckSuccess
    }

  // null ⇔ the filename literal itself was NULL (in_file then returns NULL)
  private lazy val lineSet: java.util.HashSet[String] = {
    val f = fileName.eval(InternalRow.empty)
    if (f == null) null
    else {
      val set = new java.util.HashSet[String]()
      val src = scala.io.Source.fromFile(f.toString, "UTF-8")
      try src.getLines().foreach(set.add) finally src.close()
      set
    }
  }

  override def eval(input: InternalRow): Any = {
    if (lineSet == null) return null
    val s = str.eval(input)
    if (s == null) null else lineSet.contains(s.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (lineSet == null) {
      ev.copy(code = code"""
        |boolean ${ev.isNull} = true;
        |boolean ${ev.value} = false;
      """.stripMargin)
    } else {
      val setRef = ctx.addReferenceObj("inFileSet", lineSet, "java.util.HashSet<String>")
      val c = str.genCode(ctx)
      ev.copy(code = code"""
        |${c.code}
        |boolean ${ev.isNull} = ${c.isNull};
        |boolean ${ev.value} = false;
        |if (!${ev.isNull}) {
        |  ${ev.value} = $setRef.contains(${c.value}.toString());
        |}
      """.stripMargin)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(str = newChildren(0), fileName = newChildren(1))
}
