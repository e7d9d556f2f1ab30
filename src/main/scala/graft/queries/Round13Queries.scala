package graft.queries

import graft.{Engine, Q, Tables}

/** Round-13 additions: third-party Hive UDF execution — the
  * CREATE FUNCTION ... USING JAR surface (reference
  * ql/exec/FunctionTask.java:164-166,
  * parse/FunctionSemanticAnalyzer.java:134) running arbitrary
  * GenericUDF subclasses and legacy UDFs from a session jar through the
  * ObjectInspector-bridging adapter (functions/HiveUdfAdapter.scala).
  * The fixture jar is repo-local (sources beside it); both UDFs have
  * closed-form SQL semantics, so the full DuckDB oracle applies.
  */
object Round13Queries {

  private val udfJar = new java.io.File(
    "src/test/resources/jars/graft-hiveudf.jar").getAbsolutePath

  val all: Seq[Q] = Seq(

    // ---- q158: CREATE FUNCTION ... USING JAR end-to-end — a GenericUDF
    //      (initialize over ObjectInspectors, constant-OI int arg,
    //      writable return) and a legacy evaluate()-overload UDF (long
    //      and String overloads picked per argument type), both executed
    //      distributed over a real scan. ----
    Q("q158_hive_udf_jar", (s, d) => {
      Tables.t(s, d, "nation").createOrReplaceTempView("q158_nation")
      Engine.ddl(s, "CREATE TEMPORARY FUNCTION q158_repeat_tag AS " +
        s"'graftjar.RepeatTag' USING JAR '$udfJar'")
      Engine.ddl(s, "CREATE TEMPORARY FUNCTION q158_plus_one AS " +
        s"'graftjar.LegacyPlusOne' USING JAR '$udfJar'")
      s.sql("""SELECT n_name,
                      q158_repeat_tag(n_name, 2) AS tagged,
                      q158_plus_one(CAST(n_nationkey AS BIGINT)) AS bumped,
                      q158_plus_one(n_name) AS suffixed
               FROM q158_nation""")
    },
      Some("""SELECT n_name,
                     upper(n_name) || '-' || upper(n_name) AS tagged,
                     CAST(n_nationkey + 1 AS BIGINT) AS bumped,
                     n_name || '+1' AS suffixed
              FROM nation"""))
  )
}
