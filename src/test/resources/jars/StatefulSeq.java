package graftjar;

import org.apache.hadoop.hive.ql.exec.UDFArgumentException;
import org.apache.hadoop.hive.ql.metadata.HiveException;
import org.apache.hadoop.hive.ql.udf.UDFType;
import org.apache.hadoop.hive.ql.udf.generic.GenericUDF;
import org.apache.hadoop.hive.serde2.objectinspector.ObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.primitive.PrimitiveObjectInspectorFactory;
import org.apache.hadoop.io.LongWritable;

/** Example THIRD-PARTY STATEFUL GenericUDF in the session jar: a
 * per-instance row-sequence counter (Hive's classic
 * contrib.udf.UDFRowSequence shape). @UDFType(stateful = true) — the
 * engine must treat it as non-foldable/non-deterministic: constant
 * folding or common-subexpression collapse would freeze or share the
 * counter.
 */
@UDFType(deterministic = false, stateful = true)
public class StatefulSeq extends GenericUDF {
  private final LongWritable result = new LongWritable(0);

  @Override
  public ObjectInspector initialize(ObjectInspector[] arguments) throws UDFArgumentException {
    if (arguments.length != 0) {
      throw new UDFArgumentException("stateful_seq takes no arguments");
    }
    return PrimitiveObjectInspectorFactory.writableLongObjectInspector;
  }

  @Override
  public Object evaluate(DeferredObject[] arguments) throws HiveException {
    result.set(result.get() + 1);
    return result;
  }

  @Override
  public String getDisplayString(String[] children) {
    return "stateful_seq()";
  }
}
