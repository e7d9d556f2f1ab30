package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Fused dot product over two array<double> columns — one codegen'd loop,
  * no intermediate product array. Replaces the
  * `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v)`
  * composition, whose higher-order functions are CodegenFallback and run
  * interpreted per element (the r17 d03 lesson: HOF folds in a hot path
  * cost more than the work they save). Semantics are identical to the
  * composed form bit for bit: the loop accumulates `acc += x*y` in index
  * order — the same left fold ((0+v0)+v1)+... — so results feed oracle
  * comparisons unchanged.
  *
  * Null semantics (matching the composed form): null array → null; any
  * null element → null (zip_with poisons the fold); length mismatch →
  * null (zip_with pads the shorter side with null). Empty arrays → 0.0
  * (a fold over an empty array returns its zero).
  *
  * Used by the LSH signature pass (s07: dot against literal hyperplanes)
  * — any per-row vector math against a broadcastable matrix can route
  * through it.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product(a, b) takes two array<double>, got (${left.dataType}, ${right.dataType})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val bad = ctx.freshName("bad")
      s"""
      final int $n = $x.numElements();
      boolean $bad = ($n != $y.numElements());
      double $dot = 0.0;
      if (!$bad) {
        for (int $i = 0; $i < $n; $i++) {
          if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; break; }
          $dot += $x.getDouble($i) * $y.getDouble($i);
        }
      }
      if ($bad) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $dot;
      }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Fused integer dot product over two array<int> columns, accumulated in
  * long — the quantized-ANN candidate kernel (s06), replacing
  * `aggregate(zip_with(q, c, (x, y) => (x*y).cast(long)), 0L, _ + _)`.
  * Per-element int multiply wraps exactly like the composed form
  * (java int overflow == Catalyst non-ANSI Multiply(int,int)) before
  * widening to long; accumulation order and null semantics match the
  * HOF composition the same way [[DotProduct]]'s do, so candidate
  * rankings are bit-identical.
  */
case class IntDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int_dot(a, b) takes two array<int>, got (${left.dataType}, ${right.dataType})")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "int_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += (x.getInt(i) * y.getInt(i)).toLong
      i += 1
    }
    java.lang.Long.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val bad = ctx.freshName("bad")
      s"""
      final int $n = $x.numElements();
      boolean $bad = ($n != $y.numElements());
      long $dot = 0L;
      if (!$bad) {
        for (int $i = 0; $i < $n; $i++) {
          if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; break; }
          $dot += (long) ($x.getInt($i) * $y.getInt($i));
        }
      }
      if ($bad) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $dot;
      }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDot =
    copy(left = newLeft, right = newRight)
}
