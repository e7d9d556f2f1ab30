package graftjar;

import org.apache.hadoop.hive.ql.exec.UDF;

/** Example LEGACY Hive UDF (the pre-GenericUDF evaluate()-overload
 * shape) in the same session jar — executes through Hive's own
 * GenericUDFBridge inside the adapter, which reflects the right
 * overload per argument types exactly like the reference runtime.
 */
public class LegacyPlusOne extends UDF {
  public long evaluate(long x) {
    return x + 1;
  }

  public String evaluate(String s) {
    return s == null ? null : s + "+1";
  }
}
