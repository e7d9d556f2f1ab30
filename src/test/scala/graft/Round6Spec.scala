package graft

import graft.operators.{Dedup, Similarity}
import graft.tools.Checkpoints
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Round-6 pins: the self-join double-scan is gone (dedup confirm chain and
  * embedding near-dup read a checkpoint, not a second corpus scan), variable
  * substitution matches the reference's VariableSubstitution semantics, and
  * concurrent multi-insert statements keep separate shared-scan views.
  */
class Round6Spec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("confirmedPairs scans the corpus once — join sides read the checkpoint") {
    val docs = Tables.t(spark, sf, "documents")
    val pairs = Dedup.confirmedPairs(docs)
    // the one parquet scan happened while materializing the token-set
    // checkpoint; the returned plan (band self-join + two tset joins) must
    // hold NO parquet scan — every leg reads the checkpointed RDDs
    val plan = planOf(pairs)
    assert(!plan.contains("Scan parquet"), plan)
    assert(pairs.columns.toSeq == Seq("da", "db"))
    pairs.limit(1).collect()
    Checkpoints.sweep()
  }

  test("neardupIVF scans embeddings once — assignment is checkpointed") {
    val emb = Similarity.prep(Tables.t(spark, sf, "embeddings"))
    val cent = emb.orderBy("vec_id").limit(5)
    val nd = Similarity.neardupIVF(emb, cent, 0.9)
    val plan = planOf(nd)
    assert(!plan.contains("Scan parquet"), plan)
    nd.limit(1).collect()
    Checkpoints.sweep()
  }

  test("variable substitution: namespaced, bare, nested, unknown-verbatim") {
    assert(Engine.substitute("a=${hivevar:x} b=${x} c=${y}", Map("x" -> "1"))
      == "a=1 b=1 c=${y}")
    assert(Engine.substitute("${a}", Map("a" -> "${b}", "b" -> "7")) == "7")
    assert(Engine.substitute("no vars here", Map("x" -> "1")) == "no vars here")
    // self-referencing definition must terminate (fixpoint/40-pass cap)
    assert(Engine.substitute("${a}", Map("a" -> "${a}")) == "${a}")
  }

  test("script: SET hivevar/hiveconf define in-script vars; caller seeds them") {
    val df = Engine.script(spark, sf,
      """SET hivevar:maxkey=5;
        |SET hiveconf:nm=n_name;
        |SELECT n_nationkey, ${hiveconf:nm} FROM nation
        |WHERE n_nationkey < ${maxkey};""".stripMargin)
    assert(df.columns.toSeq == Seq("n_nationkey", "n_name"))
    assert(df.count() == 5)
    // caller-seeded vars (the CLI's -d/--hivevar equivalent)
    assert(Engine.script(spark, sf,
      "SELECT n_nationkey FROM nation WHERE n_nationkey < ${hivevar:k};",
      vars = Map("k" -> "3")).count() == 3)
    // plain SET (no namespace) still reaches Spark as a conf statement
    Engine.script(spark, sf, "SET spark.sql.cbo.enabled=true;")
    assert(spark.conf.get("spark.sql.cbo.enabled") == "true")
  }

  test("concurrent multi-insert statements keep separate shared-scan views") {
    for (i <- 1 to 2) {
      spark.sql(s"DROP TABLE IF EXISTS g_mi_conc_$i")
      spark.sql(s"CREATE TABLE g_mi_conc_$i (k BIGINT, n BIGINT) USING parquet")
    }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { i =>
      new Thread(() => {
        try Engine.sql(spark, sf,
          s"""FROM orders
              INSERT OVERWRITE TABLE g_mi_conc_$i
                SELECT o_orderkey, count(*) GROUP BY o_orderkey""")
        catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errs.isEmpty, errs)
    val n1 = spark.table("g_mi_conc_1").count()
    assert(n1 > 0 && n1 == spark.table("g_mi_conc_2").count())
    // no shared-scan view leaked
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("graft_mi_src")))
  }

  test("UPDATE/DELETE without WHERE rewrite every row") {
    val base = tools.Tmp.dir("nw_spec")
    Tables.t(spark, sf, "nation").select("n_nationkey", "n_name")
      .write.parquet(base + "/t")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    spark.sql("DROP TABLE IF EXISTS graft_tmp.nw_spec_t")
    spark.sql(s"""CREATE TABLE graft_tmp.nw_spec_t (n_nationkey INT, n_name STRING)
                 USING parquet LOCATION '$base/t'""")
    Engine.ddl(spark, "UPDATE graft_tmp.nw_spec_t SET n_name = upper(n_name)")
    val t = spark.table("graft_tmp.nw_spec_t")
    assert(t.filter(col("n_name") =!= upper(col("n_name"))).count() == 0)
    assert(t.count() == 25)
    Engine.ddl(spark, "DELETE FROM graft_tmp.nw_spec_t")
    assert(spark.table("graft_tmp.nw_spec_t").count() == 0)
  }
}
