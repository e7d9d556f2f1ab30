package graft

import org.apache.spark.sql.functions._

/** Every registry query must execute at sf0.001; the driver's stronger
  * DuckDB gate runs out-of-band (tools/check.py).
  */
class RegistrySpec extends SparkSpec {

  test("no duplicate query names; oracle keys subset of query names") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  Registry.all.foreach { q =>
    test(s"${q.name} executes") {
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty)
      // force execution, not just analysis
      df.limit(1).collect()
    }
  }

  test("Engine.sql runs HiveQL text against the registered tables") {
    val df = Engine.sql(spark, sf,
      """SELECT n_name, count(*) AS n FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name
        |DISTRIBUTE BY n_name SORT BY n DESC""".stripMargin)
    assert(df.count() > 0)
    assert(Engine.sql(spark, sf,
      "SELECT field(o_orderstatus,'O','F','P') AS f FROM orders LIMIT 1").count() == 1)
  }

  test("selected queries return nonempty results") {
    for (n <- Seq("q01_agg", "q10_join_multiway", "q19_window_rank",
      "q29_explode", "q45_events_tumbling", "d01_dedup_exact",
      "s01_cosine_topk", "t01_langid")) {
      assert(Registry.byName(n).fn(spark, sf).count() > 0, n)
    }
  }
}
