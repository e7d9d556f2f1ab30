package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{round => _, _}
import graft.queries.Fns.round

/** Core relational operators: scan/filter/project, every join flavor,
  * hash aggregation (plain, distinct, multi-distinct), rollup/cube/
  * grouping-sets, having, distinct, top-k.
  *
  * Reference semantics: ql/src/java/org/apache/hadoop/hive/ql/exec/
  * {FilterOperator,SelectOperator,JoinOperator,CommonJoinOperator,
  * MapJoinOperator,GroupByOperator,LimitOperator}.java — re-expressed as
  * declarative DataFrame plans so Catalyst picks broadcast vs sort-merge,
  * does partial aggregation, and pushes filters/projections to the scan.
  *
  * Scale notes (100 TB): fact-fact joins (lineitem⋈orders) shuffle on the
  * join key — correct and unavoidable; dimension joins broadcast explicitly
  * so no shuffle of the fact side; all aggregates are partial-then-final
  * (map-side combine) by construction.
  */
object CoreQueries {
  private def li(s: SparkSession, d: String) = Tables.t(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables.t(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Tables.t(s, d, "customer")
  private def sup(s: SparkSession, d: String) = Tables.t(s, d, "supplier")
  private def nat(s: SparkSession, d: String) = Tables.t(s, d, "nation")
  private def reg(s: SparkSession, d: String) = Tables.t(s, d, "region")

  val all: Seq[Q] = Seq(
    // ---- TPC-H Q1-style full-scan aggregation (GroupByOperator, hash mode,
    //      map-side partial agg) ----
    Q("q01_agg", (s, d) =>
      li(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity),2) AS sum_qty,
             round(sum(l_extendedprice),2) AS sum_base_price,
             round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
             round(avg(l_quantity),4) AS avg_qty,
             round(avg(l_discount),4) AS avg_disc,
             count(*) AS count_order
             FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             GROUP BY l_returnflag, l_linestatus""")),

    // ---- filter + projection; predicate and column pruning reach the scan ----
    Q("q02_filter_project", (s, d) =>
      li(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_quantity") < 5)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2).as("revenue")),
      Some("""SELECT l_orderkey, l_linenumber,
             round(l_extendedprice*(1.0-l_discount),2) AS revenue
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1996-01-01'
               AND l_shipdate < TIMESTAMP '1997-01-01' AND l_quantity < 5""")),

    // ---- inner equi-join fact⋈fact (SortMergeJoin / shuffled hash at scale) ----
    Q("q03_join_inner", (s, d) => {
      val l = li(s, d); val o = ord(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n"))
    },
      Some("""SELECT o_orderpriority,
             round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue, count(*) AS n
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             GROUP BY o_orderpriority""")),

    // ---- left outer join ----
    Q("q04_join_left", (s, d) => {
      val c = cust(s, d); val o = ord(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("n_orders"),
          round(coalesce(sum(o("o_totalprice")), lit(0.0)), 2).as("tot"))
    },
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders,
             round(coalesce(sum(o_totalprice),0),2) AS tot
             FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             GROUP BY c_custkey""")),

    // ---- right outer join (same semantics, opposite build side) ----
    Q("q05_join_right", (s, d) => {
      val c = cust(s, d); val o = ord(s, d)
      o.join(c, o("o_custkey") === c("c_custkey"), "right")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("n_orders"))
    },
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
             FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
             GROUP BY c_custkey""")),

    // ---- full outer join over partially-overlapping keyed sets ----
    Q("q06_join_full", (s, d) => {
      val big = ord(s, d).groupBy("o_custkey")
        .agg(round(sum("o_totalprice"), 2).as("tot"))
        .filter(col("tot") > 4000000)
      val poor = cust(s, d).filter(col("c_acctbal") < 0)
        .select(col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"))
      big.join(poor, big("o_custkey") === poor("c_custkey"), "full")
        .select(coalesce(big("o_custkey"), poor("c_custkey")).as("custkey"),
          col("tot"), col("acctbal"))
    },
      Some("""WITH b AS (SELECT o_custkey, round(sum(o_totalprice),2) AS tot
                         FROM orders GROUP BY o_custkey
                         HAVING round(sum(o_totalprice),2) > 4000000),
                  p AS (SELECT c_custkey, round(c_acctbal,2) AS acctbal
                        FROM customer WHERE c_acctbal < 0)
             SELECT coalesce(o_custkey, c_custkey) AS custkey, tot, acctbal
             FROM b FULL OUTER JOIN p ON o_custkey = c_custkey""")),

    // ---- left semi join (Hive LEFT SEMI / IN-subquery lowering) ----
    Q("q07_join_semi", (s, d) => {
      val c = cust(s, d); val o = ord(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    },
      Some("""SELECT c_custkey, c_name FROM customer
             WHERE c_custkey IN (SELECT o_custkey FROM orders)""")),

    // ---- left anti join (Hive: LEFT OUTER + IS NULL idiom; NOT EXISTS) ----
    Q("q08_join_anti", (s, d) => {
      val c = cust(s, d); val o = ord(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },
      Some("""SELECT c_custkey, c_name FROM customer c
             WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""")),

    // ---- explicit cross join (CrossProductCheck is the Hive analog) ----
    Q("q09_join_cross", (s, d) =>
      reg(s, d).crossJoin(nat(s, d)).select("r_name", "n_name"),
      Some("SELECT r_name, n_name FROM region CROSS JOIN nation")),

    // ---- 6-way join, TPC-H Q5 shape; dims broadcast, facts shuffle once ----
    Q("q10_join_multiway", (s, d) => {
      val c = cust(s, d); val o = ord(s, d); val l = li(s, d)
      val sp = sup(s, d); val n = nat(s, d); val r = reg(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .join(broadcast(sp), l("l_suppkey") === sp("s_suppkey") &&
          c("c_nationkey") === sp("s_nationkey"))
        .join(broadcast(n), sp("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n"))
    },
      Some("""SELECT r_name, n_name,
             round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue, count(*) AS n
             FROM customer
             JOIN orders ON c_custkey = o_custkey
             JOIN lineitem ON o_orderkey = l_orderkey
             JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             JOIN nation ON s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             GROUP BY r_name, n_name""")),

    // ---- distinct aggregate (Expand-based rewrite in Catalyst) ----
    Q("q11_agg_distinct", (s, d) =>
      li(s, d).groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("nd_part"), count(lit(1)).as("n")),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_part, count(*) AS n
             FROM lineitem GROUP BY l_returnflag""")),

    // ---- multi-distinct + plain agg in one pass ----
    Q("q12_agg_multidistinct", (s, d) =>
      li(s, d).groupBy("l_linestatus")
        .agg(countDistinct("l_partkey").as("nd_part"),
          countDistinct("l_suppkey").as("nd_supp"),
          round(sum("l_quantity"), 2).as("sum_qty")),
      Some("""SELECT l_linestatus, count(DISTINCT l_partkey) AS nd_part,
             count(DISTINCT l_suppkey) AS nd_supp, round(sum(l_quantity),2) AS sum_qty
             FROM lineitem GROUP BY l_linestatus""")),

    // ---- ROLLUP with grouping_id (GroupByOperator grouping-sets mode) ----
    Q("q13_rollup", (s, d) =>
      li(s, d).rollup("l_returnflag", "l_linestatus")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"),
          grouping_id().cast("long").as("gid")),
      Some("""SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
             count(*) AS n, CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid
             FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""")),

    // ---- CUBE ----
    Q("q14_cube", (s, d) =>
      li(s, d).cube("l_returnflag", "l_linestatus")
        .agg(round(sum("l_extendedprice"), 2).as("sum_price"),
          grouping_id().cast("long").as("gid")),
      Some("""SELECT l_returnflag, l_linestatus, round(sum(l_extendedprice),2) AS sum_price,
             CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid
             FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""")),

    // ---- explicit GROUPING SETS ----
    Q("q15_grouping_sets", (s, d) => {
      Tables.views(s, d, "lineitem")
      s.sql("""SELECT l_returnflag, l_linestatus, round(sum(l_quantity) * 100) / 100 AS sum_qty
              FROM lineitem
              GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")
    },
      Some("""SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty
             FROM lineitem
             GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")),

    // ---- HAVING ----
    Q("q16_having", (s, d) =>
      ord(s, d).groupBy("o_custkey")
        .agg(round(sum("o_totalprice"), 2).as("tot"), count(lit(1)).as("n_orders"))
        .filter(col("tot") > 5000000),
      Some("""SELECT o_custkey, round(sum(o_totalprice),2) AS tot, count(*) AS n_orders
             FROM orders GROUP BY o_custkey
             HAVING round(sum(o_totalprice),2) > 5000000""")),

    // ---- SELECT DISTINCT ----
    Q("q17_distinct", (s, d) =>
      ord(s, d).select("o_orderstatus", "o_orderpriority").distinct(),
      Some("SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders")),

    // ---- global top-k: orderBy+limit → TakeOrderedAndProject (no full sort) ----
    Q("q18_topk", (s, d) =>
      ord(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
        .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 2).as("price")),
      Some("""SELECT o_orderkey, o_custkey, round(o_totalprice,2) AS price
             FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""))
  )
}
