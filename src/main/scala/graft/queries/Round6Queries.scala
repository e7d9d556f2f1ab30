package graft.queries

import graft.{Engine, Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{round => _, _}

/** Round-6 sweep: the last DDL holes — explicit partition lifecycle
  * (ALTER TABLE ADD/DROP PARTITION, RENAME TO), function discovery
  * (SHOW FUNCTIONS / DESCRIBE FUNCTION) — the no-WHERE DML forms, and a
  * NOT IN three-valued-logic pin against the oracle.
  */
object Round6Queries {
  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  val all: Seq[Q] = Seq(

    // ---- ALTER TABLE ADD/DROP PARTITION + RENAME TO (the reference's
    //      DDLTask.java:919 addPartitions + the alter-table family around
    //      HiveOperation.java:39-46; golden drop_partitions_filter.q).
    //      Explicit partition lifecycle: two partitions registered with
    //      external LOCATIONs, one dropped, the table renamed, then a
    //      partition-filtered read-back that must prune to the surviving
    //      partition directory. All statements run through Engine.ddl —
    //      Spark SQL parses and executes them natively on datasource
    //      tables, which is the point: catalog DDL is the catalog's job. ----
    Q("a11_partition_ddl", (s, d) => {
      val base = graft.tools.Tmp.dir("graft_pddl")
      val n = t(s, d, "nation")
      n.filter(col("n_regionkey") <= 1).select("n_nationkey", "n_name")
        .write.mode("overwrite").parquet(base + "/ext0")
      n.filter(col("n_regionkey") === 2).select("n_nationkey", "n_name")
        .write.mode("overwrite").parquet(base + "/ext2")
      s.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
      s.sql("DROP TABLE IF EXISTS graft_tmp.pddl_t")
      s.sql("DROP TABLE IF EXISTS graft_tmp.pddl_renamed")
      // pre-create the (empty) table dir: Spark's source-resolution probe
      // logs a noisy FileNotFoundException for missing LOCATIONs otherwise
      new java.io.File(base + "/tbl").mkdirs()
      s.sql(s"""CREATE TABLE graft_tmp.pddl_t (n_nationkey INT, n_name STRING)
               USING parquet PARTITIONED BY (p INT) LOCATION '$base/tbl'""")
      Engine.ddl(s,
        s"ALTER TABLE graft_tmp.pddl_t ADD PARTITION (p=0) LOCATION '$base/ext0'")
      Engine.ddl(s,
        s"ALTER TABLE graft_tmp.pddl_t ADD IF NOT EXISTS PARTITION (p=2) LOCATION '$base/ext2'")
      Engine.ddl(s, "ALTER TABLE graft_tmp.pddl_t DROP PARTITION (p=2)")
      Engine.ddl(s, "ALTER TABLE graft_tmp.pddl_t RENAME TO graft_tmp.pddl_renamed")
      s.table("graft_tmp.pddl_renamed").filter(col("p") === 0)
        .select("n_nationkey", "n_name", "p")
    },
      Some("""SELECT n_nationkey, n_name, 0 AS p
             FROM nation WHERE n_regionkey <= 1""")),

    // ---- UPDATE / DELETE without WHERE (UpdateDeleteSemanticAnalyzer
    //      accepts the no-predicate forms: rewrite/drop every row). The
    //      update table reads back mutated in full; the deleted table
    //      reads back as a zero count. ----
    Q("a12_dml_no_where", (s, d) => {
      val base = graft.tools.Tmp.dir("graft_nw")
      t(s, d, "supplier").select("s_suppkey", "s_acctbal")
        .repartition(3)
        .write.mode("overwrite").parquet(base + "/sup")
      t(s, d, "nation").select("n_nationkey")
        .write.mode("overwrite").parquet(base + "/nat")
      s.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
      s.sql("DROP TABLE IF EXISTS graft_tmp.nw_sup")
      s.sql("DROP TABLE IF EXISTS graft_tmp.nw_nat")
      s.sql(s"""CREATE TABLE graft_tmp.nw_sup (s_suppkey BIGINT, s_acctbal DOUBLE)
               USING parquet LOCATION '$base/sup'""")
      s.sql(s"""CREATE TABLE graft_tmp.nw_nat (n_nationkey INT)
               USING parquet LOCATION '$base/nat'""")
      Engine.ddl(s,
        "UPDATE graft_tmp.nw_sup SET s_acctbal = round(s_acctbal * 2 * 100) / 100")
      Engine.ddl(s, "DELETE FROM graft_tmp.nw_nat")
      s.table("graft_tmp.nw_sup")
        .select(col("s_suppkey").as("k"), col("s_acctbal").as("v"))
        .unionByName(s.table("graft_tmp.nw_nat")
          .agg(count(lit(1)).as("k")).select(col("k"), lit(-1.0).as("v")))
    },
      Some("""SELECT s_suppkey AS k, round(s_acctbal * 2 * 100) / 100 AS v
             FROM supplier
             UNION ALL SELECT 0 AS k, -1.0 AS v""")),

    // ---- DROP PARTITION with comparison filters (DDLTask.dropPartitions;
    //      golden drop_partitions_filter.q): Spark's parser only accepts
    //      exact `=` specs, so Engine.ddl expands the filtered form from a
    //      catalog listing (metadata-sized, no data scan) into native
    //      exact drops. Two statements: a range drop and a union of a
    //      != filter group with an exact group. ----
    Q("a13_drop_partitions_filter", (s, d) => {
      val base = graft.tools.Tmp.dir("graft_dpf")
      s.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
      s.sql("DROP TABLE IF EXISTS graft_tmp.dpf_t")
      new java.io.File(base + "/tbl").mkdirs()
      s.sql(s"""CREATE TABLE graft_tmp.dpf_t (n_nationkey INT, n_name STRING)
               USING parquet PARTITIONED BY (rk INT) LOCATION '$base/tbl'""")
      t(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey").as("rk"))
        .write.insertInto("graft_tmp.dpf_t")
      Engine.ddl(s, "ALTER TABLE graft_tmp.dpf_t DROP PARTITION (rk < 2)")
      Engine.ddl(s,
        "ALTER TABLE graft_tmp.dpf_t DROP IF EXISTS PARTITION (rk != 3), PARTITION (rk = 2)")
      s.table("graft_tmp.dpf_t").select("n_nationkey", "n_name", "rk")
    },
      Some("""SELECT n_nationkey, n_name, n_regionkey AS rk
             FROM nation WHERE n_regionkey = 3""")),

    // ---- TRUNCATE TABLE [PARTITION] (DDLTask truncateTable): whole-table
    //      truncate empties the managed table; partition-spec truncate
    //      empties only that partition's files. ----
    Q("q133_truncate", (s, d) => {
      val whBase = graft.tools.Tmp.dir("graft_trwh")
      s.sql("DROP DATABASE IF EXISTS graft_tr CASCADE")
      s.sql(s"CREATE DATABASE graft_tr LOCATION '$whBase'")
      s.sql("CREATE TABLE graft_tr.f (s_suppkey BIGINT, s_name STRING) USING parquet")
      t(s, d, "supplier").select("s_suppkey", "s_name")
        .write.insertInto("graft_tr.f")
      s.sql("CREATE TABLE graft_tr.p (n_nationkey INT) USING parquet PARTITIONED BY (pk INT)")
      t(s, d, "nation").filter(col("n_regionkey") <= 1)
        .select(col("n_nationkey"), col("n_regionkey").as("pk"))
        .write.insertInto("graft_tr.p")
      Engine.ddl(s, "TRUNCATE TABLE graft_tr.f")
      Engine.ddl(s, "TRUNCATE TABLE graft_tr.p PARTITION (pk=0)")
      s.table("graft_tr.p")
        .select(col("n_nationkey").cast("long").as("k"), col("pk"))
        .unionByName(s.table("graft_tr.f")
          .agg(count(lit(1)).as("k")).select(col("k"), lit(-1).as("pk")))
    },
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS k, 1 AS pk
             FROM nation WHERE n_regionkey = 1
             UNION ALL SELECT 0, -1""")),

    // ---- SHOW FUNCTIONS (DDLTask.java:407 showFunctions): a migrating
    //      user's first discovery command. Filtered to a fixed prefix so
    //      the row set is stable: the xpath family is pinned by the Spark
    //      version this engine builds against. ----
    Q("q130_show_functions", (s, d) =>
      Engine.sql(s, d, "SHOW FUNCTIONS LIKE 'xpath*'"),
      Some("""SELECT * FROM (VALUES ('xpath'), ('xpath_boolean'),
             ('xpath_double'), ('xpath_float'), ('xpath_int'), ('xpath_long'),
             ('xpath_number'), ('xpath_short'), ('xpath_string'))
             AS t(function)""")),

    // ---- DESCRIBE FUNCTION (DDLTask.java:377 describeFunction): name +
    //      implementing class, the two lines whose content this engine
    //      controls (usage text is Spark-version prose, excluded). ----
    Q("q131_describe_function", (s, d) =>
      Engine.sql(s, d, "DESCRIBE FUNCTION upper")
        .filter(col("function_desc").startsWith("Function:") ||
          col("function_desc").startsWith("Class:")),
      Some("""SELECT 'Function: upper' AS function_desc
             UNION ALL
             SELECT 'Class: org.apache.spark.sql.catalyst.expressions.Upper'""")),

    // ---- NOT IN with a nullable subquery column — the classic
    //      three-valued-logic trap (reference parse/QBSubQuery.java:42-57
    //      documents the rewrite hazards): one NULL in the subquery makes
    //      NOT IN unknowable for every non-member, so the 'nullable'
    //      branch must return ZERO rows while the NULL-free branch
    //      anti-joins normally. Pins Spark's null-aware anti-join against
    //      the oracle's standard semantics. ----
    Q("q132_not_in_null", (s, d) =>
      Engine.sql(s, d,
        """SELECT 'clean' AS tag, c_custkey FROM customer
           WHERE c_custkey < 60
             AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey < 30)
           UNION ALL
           SELECT 'nullable' AS tag, c_custkey FROM customer
           WHERE c_custkey < 60
             AND c_custkey NOT IN
               (SELECT CASE WHEN o_custkey >= 20 THEN NULL ELSE o_custkey END
                FROM orders WHERE o_custkey < 30)"""),
      Some("""SELECT 'clean' AS tag, c_custkey FROM customer
             WHERE c_custkey < 60
               AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey < 30)
             UNION ALL
             SELECT 'nullable' AS tag, c_custkey FROM customer
             WHERE c_custkey < 60
               AND c_custkey NOT IN
                 (SELECT CASE WHEN o_custkey >= 20 THEN NULL ELSE o_custkey END
                  FROM orders WHERE o_custkey < 30)"""))
  )
}
