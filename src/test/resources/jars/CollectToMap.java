package graftjar;

import java.util.HashMap;
import java.util.Map;

import org.apache.hadoop.hive.ql.exec.UDFArgumentException;
import org.apache.hadoop.hive.ql.metadata.HiveException;
import org.apache.hadoop.hive.ql.parse.SemanticException;
import org.apache.hadoop.hive.ql.udf.generic.AbstractGenericUDAFResolver;
import org.apache.hadoop.hive.ql.udf.generic.GenericUDAFEvaluator;
import org.apache.hadoop.hive.serde2.objectinspector.MapObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.ObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.ObjectInspectorFactory;
import org.apache.hadoop.hive.serde2.objectinspector.PrimitiveObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.primitive.PrimitiveObjectInspectorFactory;
import org.apache.hadoop.hive.serde2.objectinspector.primitive.PrimitiveObjectInspectorUtils;
import org.apache.hadoop.hive.serde2.typeinfo.TypeInfo;

/** Example THIRD-PARTY collect-to-map GenericUDAF in the session jar:
 * collect_kv(key, value) builds a map&lt;string,bigint&gt; summing values per
 * key — a MAP-typed partial crossing the shuffle (PARTIAL1
 * terminatePartial returns the map itself; FINAL merge folds maps), the
 * aggregation-state shape the simple sum-style fixtures never exercise.
 */
public class CollectToMap extends AbstractGenericUDAFResolver {

  @Override
  public GenericUDAFEvaluator getEvaluator(TypeInfo[] parameters) throws SemanticException {
    if (parameters.length != 2) {
      throw new UDFArgumentException("collect_kv needs (key, value)");
    }
    return new Eval();
  }

  public static class Eval extends GenericUDAFEvaluator {
    private transient PrimitiveObjectInspector keyOI;
    private transient PrimitiveObjectInspector valOI;
    private transient MapObjectInspector partialOI;

    static class Buf extends AbstractAggregationBuffer {
      final Map<String, Long> m = new HashMap<>();
    }

    @Override
    public ObjectInspector init(Mode mode, ObjectInspector[] parameters) throws HiveException {
      super.init(mode, parameters);
      if (mode == Mode.PARTIAL1 || mode == Mode.COMPLETE) {
        keyOI = (PrimitiveObjectInspector) parameters[0];
        valOI = (PrimitiveObjectInspector) parameters[1];
      } else {
        partialOI = (MapObjectInspector) parameters[0];
      }
      return ObjectInspectorFactory.getStandardMapObjectInspector(
          PrimitiveObjectInspectorFactory.javaStringObjectInspector,
          PrimitiveObjectInspectorFactory.javaLongObjectInspector);
    }

    @Override
    public AggregationBuffer getNewAggregationBuffer() {
      return new Buf();
    }

    @Override
    public void reset(AggregationBuffer agg) {
      ((Buf) agg).m.clear();
    }

    @Override
    public void iterate(AggregationBuffer agg, Object[] parameters) throws HiveException {
      if (parameters[0] == null) {
        return;
      }
      String k = PrimitiveObjectInspectorUtils.getString(parameters[0], keyOI);
      long v = parameters[1] == null
          ? 0L : PrimitiveObjectInspectorUtils.getLong(parameters[1], valOI);
      ((Buf) agg).m.merge(k, v, Long::sum);
    }

    @Override
    public Object terminatePartial(AggregationBuffer agg) {
      return new HashMap<>(((Buf) agg).m);
    }

    @Override
    @SuppressWarnings("unchecked")
    public void merge(AggregationBuffer agg, Object partial) throws HiveException {
      if (partial == null) {
        return;
      }
      Map<?, ?> in = partialOI.getMap(partial);
      for (Map.Entry<?, ?> e : in.entrySet()) {
        String k = PrimitiveObjectInspectorUtils.getString(e.getKey(),
            (PrimitiveObjectInspector) partialOI.getMapKeyObjectInspector());
        long v = PrimitiveObjectInspectorUtils.getLong(e.getValue(),
            (PrimitiveObjectInspector) partialOI.getMapValueObjectInspector());
        ((Buf) agg).m.merge(k, v, Long::sum);
      }
    }

    @Override
    public Object terminate(AggregationBuffer agg) {
      return new HashMap<>(((Buf) agg).m);
    }
  }
}
