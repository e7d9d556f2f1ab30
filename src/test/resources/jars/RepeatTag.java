package graftjar;

import org.apache.hadoop.hive.ql.exec.UDFArgumentException;
import org.apache.hadoop.hive.ql.metadata.HiveException;
import org.apache.hadoop.hive.ql.udf.generic.GenericUDF;
import org.apache.hadoop.hive.serde2.objectinspector.ConstantObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.ObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.primitive.PrimitiveObjectInspectorFactory;
import org.apache.hadoop.hive.serde2.objectinspector.primitive.StringObjectInspector;
import org.apache.hadoop.io.IntWritable;
import org.apache.hadoop.io.Text;

/** Example THIRD-PARTY GenericUDF compiled into a standalone session jar
 * (src/test/resources/jars/graft-hiveudf.jar) — the migrating-user shape
 * the CREATE FUNCTION ... USING JAR surface executes through the
 * HiveGenericUdfExpr adapter. Deliberately exercises the full
 * GenericUDF contract: initialize over ObjectInspectors, a REQUIRED
 * ConstantObjectInspector argument (read up front, the common
 * pattern/format-parameter idiom), DeferredObject lazy args, and a
 * reused writable return value.
 */
public class RepeatTag extends GenericUDF {
  private transient StringObjectInspector strOI;
  private int times;
  private final Text out = new Text();

  @Override
  public ObjectInspector initialize(ObjectInspector[] args) throws UDFArgumentException {
    if (args.length != 2) {
      throw new UDFArgumentException("repeat_tag needs (string, const int)");
    }
    if (!(args[0] instanceof StringObjectInspector)) {
      throw new UDFArgumentException("repeat_tag arg0 must be a string");
    }
    strOI = (StringObjectInspector) args[0];
    if (!(args[1] instanceof ConstantObjectInspector)) {
      throw new UDFArgumentException("repeat_tag arg1 must be a constant int");
    }
    Object c = ((ConstantObjectInspector) args[1]).getWritableConstantValue();
    times = ((IntWritable) c).get();
    return PrimitiveObjectInspectorFactory.writableStringObjectInspector;
  }

  @Override
  public Object evaluate(DeferredObject[] args) throws HiveException {
    Object o = args[0].get();
    if (o == null) {
      return null;
    }
    String s = strOI.getPrimitiveJavaObject(o);
    StringBuilder sb = new StringBuilder();
    for (int i = 0; i < times; i++) {
      if (i > 0) {
        sb.append('-');
      }
      sb.append(s.toUpperCase());
    }
    out.set(sb.toString());
    return out;
  }

  @Override
  public String getDisplayString(String[] children) {
    return "repeat_tag(" + String.join(", ", children) + ")";
  }
}
