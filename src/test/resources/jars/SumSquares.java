package graftjar;

import org.apache.hadoop.hive.ql.exec.UDFArgumentException;
import org.apache.hadoop.hive.ql.metadata.HiveException;
import org.apache.hadoop.hive.ql.parse.SemanticException;
import org.apache.hadoop.hive.ql.udf.generic.AbstractGenericUDAFResolver;
import org.apache.hadoop.hive.ql.udf.generic.GenericUDAFEvaluator;
import org.apache.hadoop.hive.serde2.io.DoubleWritable;
import org.apache.hadoop.hive.serde2.objectinspector.ObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.PrimitiveObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.primitive.PrimitiveObjectInspectorFactory;
import org.apache.hadoop.hive.serde2.objectinspector.primitive.PrimitiveObjectInspectorUtils;
import org.apache.hadoop.hive.serde2.typeinfo.TypeInfo;

/** Example THIRD-PARTY GenericUDAF in the session jar: sum of squares of
 * a numeric column, with a DoubleWritable partial — exercising the full
 * evaluator contract (PARTIAL1 iterate/terminatePartial crossing the
 * shuffle, FINAL merge/terminate) that the CREATE FUNCTION ... USING JAR
 * surface runs through Spark's HiveUDAFFunction bridge.
 */
public class SumSquares extends AbstractGenericUDAFResolver {

  @Override
  public GenericUDAFEvaluator getEvaluator(TypeInfo[] parameters) throws SemanticException {
    if (parameters.length != 1) {
      throw new UDFArgumentException("sum_squares needs exactly one numeric argument");
    }
    return new Eval();
  }

  public static class Eval extends GenericUDAFEvaluator {
    private transient PrimitiveObjectInspector inputOI;
    private final DoubleWritable result = new DoubleWritable();

    static class SumBuffer extends AbstractAggregationBuffer {
      double sum;
      boolean empty;
    }

    @Override
    public ObjectInspector init(Mode m, ObjectInspector[] parameters) throws HiveException {
      super.init(m, parameters);
      inputOI = (PrimitiveObjectInspector) parameters[0];
      return PrimitiveObjectInspectorFactory.writableDoubleObjectInspector;
    }

    @Override
    public AggregationBuffer getNewAggregationBuffer() {
      SumBuffer b = new SumBuffer();
      reset(b);
      return b;
    }

    @Override
    public void reset(AggregationBuffer agg) {
      ((SumBuffer) agg).sum = 0;
      ((SumBuffer) agg).empty = true;
    }

    @Override
    public void iterate(AggregationBuffer agg, Object[] parameters) throws HiveException {
      if (parameters[0] != null) {
        double v = PrimitiveObjectInspectorUtils.getDouble(parameters[0], inputOI);
        SumBuffer b = (SumBuffer) agg;
        b.sum += v * v;
        b.empty = false;
      }
    }

    @Override
    public Object terminatePartial(AggregationBuffer agg) {
      return terminate(agg);
    }

    @Override
    public void merge(AggregationBuffer agg, Object partial) throws HiveException {
      if (partial != null) {
        SumBuffer b = (SumBuffer) agg;
        // FINAL/PARTIAL2 mode: inputOI is the partial's OI (a double)
        b.sum += PrimitiveObjectInspectorUtils.getDouble(partial, inputOI);
        b.empty = false;
      }
    }

    @Override
    public Object terminate(AggregationBuffer agg) {
      SumBuffer b = (SumBuffer) agg;
      if (b.empty) {
        return null;
      }
      result.set(b.sum);
      return result;
    }
  }
}
