package graftjar;

import org.apache.spark.sql.api.java.UDF2;

/** Example UDF compiled into a standalone jar for the ADD JAR runtime
 * class-loading surface (mapjoin_addjar.q family): registered via
 * CREATE TEMPORARY FUNCTION ... AS 'graftjar.UpperConcat' after ADD JAR.
 */
public class UpperConcat implements UDF2<String, String, String> {
  @Override
  public String call(String a, String b) {
    return (a == null ? "" : a.toUpperCase()) + "|" +
           (b == null ? "" : b.toUpperCase());
  }
}
