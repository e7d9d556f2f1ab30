package graftjar;

import java.io.FileOutputStream;
import java.io.IOException;
import java.nio.charset.StandardCharsets;

import org.apache.hadoop.hive.ql.exec.UDFArgumentException;
import org.apache.hadoop.hive.ql.metadata.HiveException;
import org.apache.hadoop.hive.ql.udf.generic.GenericUDF;
import org.apache.hadoop.hive.serde2.objectinspector.ObjectInspector;
import org.apache.hadoop.hive.serde2.objectinspector.primitive.PrimitiveObjectInspectorFactory;
import org.apache.hadoop.hive.serde2.objectinspector.primitive.StringObjectInspector;
import org.apache.hadoop.io.Text;

/** Example THIRD-PARTY GenericUDF with a close() side: passes its second
 * argument through unchanged and, when the operator pipeline closes,
 * appends one line to the (constant) path named by its first argument —
 * the wild pattern of UDFs that flush buffers or release native handles
 * in GenericUDF.close(). The fixture exists to pin that the adapter
 * honors the initialize -&gt; evaluate* -&gt; close() lifecycle per
 * partition, like the reference's per-operator closeOp.
 */
public class CloseMarker extends GenericUDF {
  private transient StringObjectInspector pathOI;
  private transient StringObjectInspector valOI;
  private transient String path;
  private long rows = 0;

  @Override
  public ObjectInspector initialize(ObjectInspector[] arguments) throws UDFArgumentException {
    if (arguments.length != 2
        || !(arguments[0] instanceof StringObjectInspector)
        || !(arguments[1] instanceof StringObjectInspector)) {
      throw new UDFArgumentException("close_marker expects (path string, value string)");
    }
    pathOI = (StringObjectInspector) arguments[0];
    valOI = (StringObjectInspector) arguments[1];
    return PrimitiveObjectInspectorFactory.writableStringObjectInspector;
  }

  @Override
  public Object evaluate(DeferredObject[] arguments) throws HiveException {
    if (path == null && arguments[0].get() != null) {
      path = pathOI.getPrimitiveJavaObject(arguments[0].get());
    }
    rows++;
    Object v = arguments[1].get();
    return v == null ? null : new Text(valOI.getPrimitiveJavaObject(v));
  }

  @Override
  public void close() throws IOException {
    if (path != null && rows > 0) {
      synchronized (CloseMarker.class) {
        try (FileOutputStream out = new FileOutputStream(path, true)) {
          out.write(("closed:" + rows + "\n").getBytes(StandardCharsets.UTF_8));
        }
      }
    }
  }

  @Override
  public String getDisplayString(String[] children) {
    return "close_marker(" + String.join(", ", children) + ")";
  }
}
