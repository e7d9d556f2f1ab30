package graftjar;

import org.apache.hadoop.hive.ql.exec.UDFArgumentException;
import org.apache.hadoop.hive.ql.metadata.HiveException;
import org.apache.hadoop.hive.ql.udf.generic.GenericUDTF;
import org.apache.hadoop.hive.serde2.objectinspector.ObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.ObjectInspectorFactory;
import org.apache.hadoop.hive.serde2.objectinspector.StructObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.primitive.PrimitiveObjectInspectorFactory;
import org.apache.hadoop.hive.serde2.objectinspector.primitive.StringObjectInspector;

import java.util.Arrays;

/** Example THIRD-PARTY GenericUDTF in the session jar: forwards one
 * (token, len) row per whitespace token of its string argument, and a
 * final ("__rows", totalTokens) row from close() — exercising the full
 * UDTF contract (initialize -> StructObjectInspector, process/forward
 * per input row, close() flushing after ALL rows) that the
 * HiveGenericUdtfExpr adapter drives as a Catalyst Generator.
 */
public class TokenExplode extends GenericUDTF {
  private transient StringObjectInspector strOI;
  private long total = 0;

  @Override
  public StructObjectInspector initialize(ObjectInspector[] args) throws UDFArgumentException {
    if (args.length != 1 || !(args[0] instanceof StringObjectInspector)) {
      throw new UDFArgumentException("token_explode needs one string argument");
    }
    strOI = (StringObjectInspector) args[0];
    return ObjectInspectorFactory.getStandardStructObjectInspector(
        Arrays.asList("token", "len"),
        Arrays.asList(
            PrimitiveObjectInspectorFactory.javaStringObjectInspector,
            PrimitiveObjectInspectorFactory.javaIntObjectInspector));
  }

  @Override
  public void process(Object[] args) throws HiveException {
    if (args[0] == null) {
      return;
    }
    String s = strOI.getPrimitiveJavaObject(args[0]);
    for (String tok : s.split("\\s+")) {
      if (!tok.isEmpty()) {
        total += 1;
        forward(new Object[] {tok, tok.length()});
      }
    }
  }

  @Override
  public void close() throws HiveException {
    forward(new Object[] {"__rows", (int) total});
    total = 0;
  }
}
