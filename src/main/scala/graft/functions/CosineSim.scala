package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused cosine similarity over two array<double> columns — ONE loop
  * computes dot, |a|² and |b|² with no intermediate array, replacing the
  * `aggregate(zip_with(...))` composition (which allocates a product array
  * per row pair and traverses the vectors four times). Semantics are
  * identical to the composed form, including float behavior: the loop
  * accumulates in index order exactly like the sequential `aggregate`
  * fold, and sim = dot / (sqrt(na) * sqrt(nb)) keeps the same operation
  * order, so oracle comparisons are unaffected bit-for-bit.
  *
  * Null semantics (matching the composed form): null array → null; any
  * null element → null (zip_with poisons the fold); length mismatch →
  * null (zip_with pads with null); zero norm → null (Spark divide-by-zero
  * with ANSI off).
  *
  * This is the hot inner expression of every ANN path (brute-force,
  * IVF assignment and probe, quantized rerank, embedding near-dup,
  * k-means), so it carries a full `doGenCode` — the reference keeps its
  * equivalent hot loops in vectorized operators for the same reason.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim(a, b) takes two array<double>, got (${left.dataType}, ${right.dataType})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) null else java.lang.Double.valueOf(dot / d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val den = ctx.freshName("den")
      val bad = ctx.freshName("bad")
      s"""
      final int $n = $x.numElements();
      boolean $bad = ($n != $y.numElements());
      double $dot = 0.0, $na = 0.0, $nb = 0.0;
      if (!$bad) {
        for (int $i = 0; $i < $n; $i++) {
          if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; break; }
          final double $xv = $x.getDouble($i);
          final double $yv = $y.getDouble($i);
          $dot += $xv * $yv;
          $na += $xv * $xv;
          $nb += $yv * $yv;
        }
      }
      final double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
      if ($bad || $den == 0.0) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $dot / $den;
      }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
