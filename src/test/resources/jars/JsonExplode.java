package graftjar;

import java.util.ArrayList;
import java.util.Arrays;
import java.util.List;

import org.apache.hadoop.hive.ql.exec.UDFArgumentException;
import org.apache.hadoop.hive.ql.metadata.HiveException;
import org.apache.hadoop.hive.ql.udf.generic.GenericUDTF;
import org.apache.hadoop.hive.serde2.objectinspector.ObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.ObjectInspectorFactory;
import org.apache.hadoop.hive.serde2.objectinspector.StructObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.primitive.PrimitiveObjectInspectorFactory;
import org.apache.hadoop.hive.serde2.objectinspector.primitive.StringObjectInspector;

/** Example THIRD-PARTY json-exploding GenericUDTF in the session jar:
 * json_kv_explode('k1:1,2,3|k2:4,5') forwards one row per |-separated
 * entry with a STRUCT-OF-ARRAY output shape — (name string, nums
 * array&lt;int&gt;, total int) — the nested return the simple (token, len)
 * fixture never exercises. Hand-rolled parsing: the fixture must not
 * pull a JSON library into the jar.
 */
public class JsonExplode extends GenericUDTF {
  private transient StringObjectInspector strOI;

  @Override
  public StructObjectInspector initialize(ObjectInspector[] argOIs) throws UDFArgumentException {
    if (argOIs.length != 1 || !(argOIs[0] instanceof StringObjectInspector)) {
      throw new UDFArgumentException("json_kv_explode expects one string argument");
    }
    strOI = (StringObjectInspector) argOIs[0];
    List<String> names = Arrays.asList("name", "nums", "total");
    List<ObjectInspector> ois = Arrays.asList(
        PrimitiveObjectInspectorFactory.javaStringObjectInspector,
        ObjectInspectorFactory.getStandardListObjectInspector(
            PrimitiveObjectInspectorFactory.javaIntObjectInspector),
        PrimitiveObjectInspectorFactory.javaIntObjectInspector);
    return ObjectInspectorFactory.getStandardStructObjectInspector(names, ois);
  }

  @Override
  public void process(Object[] args) throws HiveException {
    if (args[0] == null) {
      return;
    }
    String doc = strOI.getPrimitiveJavaObject(args[0]);
    for (String entry : doc.split("\\|")) {
      int colon = entry.indexOf(':');
      if (colon < 0) {
        continue;
      }
      String name = entry.substring(0, colon).trim();
      List<Integer> nums = new ArrayList<>();
      int total = 0;
      for (String n : entry.substring(colon + 1).split(",")) {
        String t = n.trim();
        if (!t.isEmpty()) {
          int v = Integer.parseInt(t);
          nums.add(v);
          total += v;
        }
      }
      forward(new Object[] {name, nums, total});
    }
  }

  @Override
  public void close() {
  }
}
