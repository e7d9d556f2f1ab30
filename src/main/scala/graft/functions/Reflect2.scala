package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hive's `reflect2(obj, 'method', args...)`: invoke an instance method of
  * the first argument's Java boxed value, by reflection.
  *
  * Reference: /root/reference/ql/src/java/org/apache/hadoop/hive/ql/udf/
  * generic/GenericUDFReflect2.java (registered as "reflect2" in
  * exec/FunctionRegistry.java). Like the reference, the method name must be
  * a constant, the method is resolved ONCE at analysis time against the
  * target's class (so a typo fails the query at compile, not per row), and
  * the return type is the method's declared return type.
  *
  * Scale note: resolution happens on the driver; executors replay a cached
  * `java.lang.reflect.Method` invoke per row. Reflection is inherently
  * non-codegen (same as Hive's), so this expression is CodegenFallback —
  * fine for the migration-compat role it plays, wrong for hot paths (the
  * native functions cover those).
  */
case class Reflect2(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def nullable: Boolean = true

  private def javaClass(dt: DataType): Class[_] = dt match {
    case StringType    => classOf[String]
    case IntegerType   => classOf[java.lang.Integer]
    case LongType      => classOf[java.lang.Long]
    case DoubleType    => classOf[java.lang.Double]
    case FloatType     => classOf[java.lang.Float]
    case ShortType     => classOf[java.lang.Short]
    case ByteType      => classOf[java.lang.Byte]
    case BooleanType   => classOf[java.lang.Boolean]
    case other => throw new IllegalArgumentException(
      s"reflect2: unsupported argument type $other")
  }

  // a method declared on primitive int/long/... still matches boxed args
  private def compatible(param: Class[_], arg: Class[_]): Boolean =
    param.isAssignableFrom(arg) ||
      (param == classOf[Int] && arg == classOf[java.lang.Integer]) ||
      (param == classOf[Long] && arg == classOf[java.lang.Long]) ||
      (param == classOf[Double] && arg == classOf[java.lang.Double]) ||
      (param == classOf[Float] && arg == classOf[java.lang.Float]) ||
      (param == classOf[Short] && arg == classOf[java.lang.Short]) ||
      (param == classOf[Byte] && arg == classOf[java.lang.Byte]) ||
      (param == classOf[Boolean] && arg == classOf[java.lang.Boolean]) ||
      (param == classOf[CharSequence] && arg == classOf[String])

  @transient private lazy val method: java.lang.reflect.Method = {
    val targetCls = javaClass(children.head.dataType)
    val name = children(1).eval(InternalRow.empty).toString
    val argClasses = children.drop(2).map(c => javaClass(c.dataType))
    targetCls.getMethods
      .filter(m => m.getName == name &&
        m.getParameterCount == argClasses.length &&
        m.getParameterTypes.zip(argClasses).forall((compatible _).tupled))
      .sortBy(_.toString) // deterministic pick among overloads
      .headOption
      .getOrElse(throw new IllegalArgumentException(
        s"reflect2: no method $name(${argClasses.map(_.getSimpleName).mkString(",")}) " +
          s"on ${targetCls.getName}"))
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length < 2)
      TypeCheckResult.TypeCheckFailure("reflect2(obj, 'method', args...) needs >= 2 args")
    else if (children(1).dataType != StringType || !children(1).foldable)
      TypeCheckResult.TypeCheckFailure("reflect2: method name must be a string constant")
    else try {
      // probe dataType too: a resolvable method with an unsupported RETURN
      // type must fail the type check cleanly, not throw from dataType
      // during later analysis
      method; dataType
      TypeCheckResult.TypeCheckSuccess
    }
    catch { case e: IllegalArgumentException => TypeCheckResult.TypeCheckFailure(e.getMessage) }

  override def dataType: DataType = method.getReturnType match {
    case c if c == classOf[String] || c == classOf[CharSequence] => StringType
    case c if c == classOf[Int] || c == classOf[java.lang.Integer]     => IntegerType
    case c if c == classOf[Long] || c == classOf[java.lang.Long]       => LongType
    case c if c == classOf[Double] || c == classOf[java.lang.Double]   => DoubleType
    case c if c == classOf[Float] || c == classOf[java.lang.Float]     => FloatType
    case c if c == classOf[Short] || c == classOf[java.lang.Short]     => ShortType
    case c if c == classOf[Byte] || c == classOf[java.lang.Byte]       => ByteType
    case c if c == classOf[Boolean] || c == classOf[java.lang.Boolean] => BooleanType
    case other => throw new IllegalArgumentException(
      s"reflect2: unsupported return type ${other.getName}")
  }

  private def fromCatalyst(v: Any): AnyRef = v match {
    case s: UTF8String => s.toString
    case other         => other.asInstanceOf[AnyRef]
  }

  override def eval(input: InternalRow): Any = {
    val target = children.head.eval(input)
    if (target == null) return null
    val args = children.drop(2).map { c =>
      val v = c.eval(input)
      if (v == null) return null
      fromCatalyst(v)
    }
    method.invoke(fromCatalyst(target), args: _*) match {
      case null      => null
      case s: String => UTF8String.fromString(s)
      case other     => other
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
