package graftjar;

import org.apache.hadoop.hive.ql.exec.UDFArgumentException;
import org.apache.hadoop.hive.ql.metadata.HiveException;
import org.apache.hadoop.hive.ql.udf.generic.GenericUDF;
import org.apache.hadoop.hive.serde2.objectinspector.ListObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.ObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.ObjectInspectorFactory;
import org.apache.hadoop.hive.serde2.objectinspector.PrimitiveObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.primitive.PrimitiveObjectInspectorFactory;
import org.apache.hadoop.hive.serde2.objectinspector.primitive.PrimitiveObjectInspectorUtils;

import java.util.Arrays;

/** Example third-party GenericUDF over COMPLEX types: takes array<int>,
 * returns struct<mn:int, mx:int, n:int> — exercising the adapter's
 * list-input conversion (Catalyst ArrayData -> java List through the
 * standard ListObjectInspector) and struct-output conversion (Object[]
 * under a StandardStructObjectInspector -> InternalRow).
 */
public class ArrayStats extends GenericUDF {
  private transient ListObjectInspector listOI;
  private transient PrimitiveObjectInspector elemOI;

  @Override
  public ObjectInspector initialize(ObjectInspector[] args) throws UDFArgumentException {
    if (args.length != 1 || !(args[0] instanceof ListObjectInspector)) {
      throw new UDFArgumentException("array_stats needs one array argument");
    }
    listOI = (ListObjectInspector) args[0];
    if (!(listOI.getListElementObjectInspector() instanceof PrimitiveObjectInspector)) {
      throw new UDFArgumentException("array_stats needs a numeric element type");
    }
    elemOI = (PrimitiveObjectInspector) listOI.getListElementObjectInspector();
    return ObjectInspectorFactory.getStandardStructObjectInspector(
        Arrays.asList("mn", "mx", "n"),
        Arrays.asList(
            PrimitiveObjectInspectorFactory.javaIntObjectInspector,
            PrimitiveObjectInspectorFactory.javaIntObjectInspector,
            PrimitiveObjectInspectorFactory.javaIntObjectInspector));
  }

  @Override
  public Object evaluate(DeferredObject[] args) throws HiveException {
    Object o = args[0].get();
    if (o == null) {
      return null;
    }
    int n = listOI.getListLength(o);
    Integer mn = null;
    Integer mx = null;
    int present = 0;
    for (int i = 0; i < n; i++) {
      Object e = listOI.getListElement(o, i);
      if (e == null) {
        continue;
      }
      int v = PrimitiveObjectInspectorUtils.getInt(e, elemOI);
      present += 1;
      if (mn == null || v < mn) {
        mn = v;
      }
      if (mx == null || v > mx) {
        mx = v;
      }
    }
    return new Object[] {mn, mx, present};
  }

  @Override
  public String getDisplayString(String[] children) {
    return "array_stats(" + String.join(", ", children) + ")";
  }
}
