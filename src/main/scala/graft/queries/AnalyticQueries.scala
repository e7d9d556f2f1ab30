package graft.queries

import graft.{Q, Tables}
import graft.operators.GlobalRank
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{round => _, _}
import graft.queries.Fns.round

/** Window functions (ranking, analytic, running/range frames — reference
  * PTFOperator/WindowingTableFunction), set operations (UnionOperator +
  * the INTERSECT/EXCEPT superset), UDTF/lateral-view (GenericUDTFExplode/
  * PosExplode), the scalar-function surface (FunctionRegistry), subqueries
  * (QBSubQuery IN/EXISTS/scalar), statistical + percentile + collect
  * aggregates, and deterministic sampling.
  *
  * Scale notes: window partitions here are keyed on high-cardinality
  * columns (custkey/suppkey) so partitions stay small; global windows are
  * only used on tiny inputs. Top-k rank patterns compile to Spark's
  * WindowGroupLimit pushdown.
  */
object AnalyticQueries {
  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  val all: Seq[Q] = Seq(
    // ---- row_number / rank / dense_rank per group ----
    Q("q19_window_rank", (s, d) => {
      val wTies = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc)
      val wUniq = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      t(s, d, "customer")
        .select(col("c_mktsegment"), col("c_custkey"),
          row_number().over(wUniq).cast("long").as("rn"),
          rank().over(wTies).cast("long").as("rnk"),
          dense_rank().over(wTies).cast("long").as("drnk"))
        .filter(col("rn") <= 10)
    },
      Some("""SELECT * FROM (
               SELECT c_mktsegment, c_custkey,
                 row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn,
                 rank()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rnk,
                 dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS drnk
               FROM customer) WHERE rn <= 10""")),

    // ---- running total (ROWS UNBOUNDED PRECEDING..CURRENT) ----
    Q("q20_window_running", (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders").filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum("o_totalprice").over(w), 2).as("run_tot"))
    },
      Some("""SELECT o_custkey, o_orderkey,
             round(sum(o_totalprice) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS run_tot
             FROM orders WHERE o_custkey < 100""")),

    // ---- lead / lag ----
    Q("q21_window_leadlag", (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t(s, d, "orders").filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          round(lag("o_totalprice", 1).over(w), 2).as("prev_price"),
          round(lead("o_totalprice", 1).over(w), 2).as("next_price"))
    },
      Some("""SELECT o_custkey, o_orderkey,
             round(lag(o_totalprice,1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),2) AS prev_price,
             round(lead(o_totalprice,1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),2) AS next_price
             FROM orders WHERE o_custkey < 100""")),

    // ---- RANGE (value-based) frame ----
    Q("q22_window_range", (s, d) => {
      Tables.views(s, d, "lineitem")
      s.sql("""SELECT l_orderkey, l_linenumber, l_quantity,
              round(sum(l_extendedprice) OVER (PARTITION BY l_returnflag
                ORDER BY l_quantity RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) * 100) / 100 AS frame_sum
              FROM lineitem WHERE l_orderkey < 300""")
    },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity,
             round(sum(l_extendedprice) OVER (PARTITION BY l_returnflag
               ORDER BY l_quantity RANGE BETWEEN 5 PRECEDING AND CURRENT ROW),2) AS frame_sum
             FROM lineitem WHERE l_orderkey < 300""")),

    // ---- ntile / percent_rank / cume_dist ----
    Q("q23_window_ntile", (s, d) => {
      // the SCALE path, not the literal empty-PARTITION BY window (which
      // Spark plans as one partition — a funnel at 100× supplier): global
      // row numbers from the range-partitioned layout, distribution
      // functions by exact integer arithmetic (operators/GlobalRank.scala).
      // The literal single-partition SQL form stays golden-only (g377).
      GlobalRank.distribution(
        t(s, d, "supplier").select(col("s_suppkey"), col("s_acctbal")),
        Seq(col("s_acctbal").desc, col("s_suppkey").asc),
        Seq(col("s_acctbal"), col("s_suppkey")), Seq(), buckets = 4)
        .select(col("s_suppkey"), col("nt").as("quartile"),
          round(col("pr"), 6).as("pr"), round(col("cd"), 6).as("cd"))
    },
      Some("""SELECT s_suppkey,
             ntile(4) OVER (ORDER BY s_acctbal DESC, s_suppkey) AS quartile,
             round(percent_rank() OVER (ORDER BY s_acctbal DESC, s_suppkey),6) AS pr,
             round(cume_dist() OVER (ORDER BY s_acctbal DESC, s_suppkey),6) AS cd
             FROM supplier""")),

    // ---- first_value / last_value over full-partition frame ----
    Q("q24_window_firstlast", (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders").filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          round(first("o_totalprice").over(w), 2).as("first_price"),
          round(last("o_totalprice").over(w), 2).as("last_price"))
    },
      Some("""SELECT o_custkey, o_orderkey,
             round(first_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),2) AS first_price,
             round(last_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),2) AS last_price
             FROM orders WHERE o_custkey < 100""")),

    // ---- UNION ALL ----
    Q("q25_union_all", (s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey"), lit("high").as("seg"))
        .unionAll(o.filter(col("o_totalprice") < 2000)
          .select(col("o_orderkey"), lit("low").as("seg")))
    },
      Some("""SELECT o_orderkey, 'high' AS seg FROM orders WHERE o_totalprice > 400000
             UNION ALL
             SELECT o_orderkey, 'low' AS seg FROM orders WHERE o_totalprice < 2000""")),

    // ---- UNION DISTINCT (Hive rewrites to UNION ALL + GBY) ----
    Q("q26_union_distinct", (s, d) => {
      val o = t(s, d, "orders")
      o.filter(col("o_totalprice") > 490000).select("o_custkey")
        .union(o.filter(col("o_totalprice") < 1500).select("o_custkey"))
        .distinct()
    },
      Some("""SELECT o_custkey FROM orders WHERE o_totalprice > 490000
             UNION
             SELECT o_custkey FROM orders WHERE o_totalprice < 1500""")),

    // ---- INTERSECT (superset of reference: keyword reserved, unimplemented) ----
    Q("q27_intersect", (s, d) => {
      val c = t(s, d, "customer")
      c.filter(col("c_acctbal") > 9000).select("c_custkey")
        .intersect(c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey"))
    },
      Some("""SELECT c_custkey FROM customer WHERE c_acctbal > 9000
             INTERSECT
             SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'""")),

    // ---- EXCEPT ----
    Q("q28_except", (s, d) => {
      val c = t(s, d, "customer")
      c.filter(col("c_acctbal") > 9000).select("c_custkey")
        .except(c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey"))
    },
      Some("""SELECT c_custkey FROM customer WHERE c_acctbal > 9000
             EXCEPT
             SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'""")),

    // ---- explode (lateral view) + word count ----
    Q("q29_explode", (s, d) =>
      t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 100),
      Some("""SELECT word, count(*) AS cnt
             FROM (SELECT unnest(string_split(text,' ')) AS word FROM documents)
             GROUP BY word HAVING count(*) > 100""")),

    // ---- posexplode ----
    Q("q30_posexplode", (s, d) =>
      t(s, d, "documents").filter(col("doc_id") < 20)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("word")),
      Some("""SELECT doc_id,
             unnest(range(len(string_split(text,' ')))) AS pos,
             unnest(string_split(text,' ')) AS word
             FROM documents WHERE doc_id < 20""")),

    // ---- JSON extraction (get_json_object / json_tuple surface) ----
    Q("q31_json", (s, d) =>
      t(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(round(avg("k"), 4).as("avg_k"), count(lit(1)).as("n")),
      Some("""SELECT event_type,
             round(avg(CAST(json_extract_string(props,'$.k') AS INT)),4) AS avg_k,
             count(*) AS n
             FROM events GROUP BY event_type""")),

    // ---- string function surface ----
    Q("q32_string_funcs", (s, d) =>
      t(s, d, "customer").filter(col("c_custkey") < 100)
        .select(col("c_custkey"),
          upper(col("c_name")).as("uname"),
          substring(col("c_name"), 10, 9).as("id_part"),
          length(col("c_name")).cast("long").as("name_len"),
          concat_ws("|", col("c_mktsegment"), col("c_name")).as("tagged"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
          reverse(col("c_name")).as("rev"),
          regexp_replace(col("c_name"), "Customer", "Cust").as("short_name")),
      Some("""SELECT c_custkey, upper(c_name) AS uname, substring(c_name,10,9) AS id_part,
             length(c_name) AS name_len, concat_ws('|', c_mktsegment, c_name) AS tagged,
             lpad(CAST(c_custkey AS VARCHAR),10,'0') AS padded, reverse(c_name) AS rev,
             replace(c_name,'Customer','Cust') AS short_name
             FROM customer WHERE c_custkey < 100""")),

    // ---- math function surface ----
    Q("q33_math_funcs", (s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 0).as("r0"),
          floor(col("l_extendedprice")).as("fl"),
          ceil(col("l_extendedprice")).as("ce"),
          round(sqrt(col("l_quantity")), 6).as("sq"),
          round(log(col("l_extendedprice")), 6).as("lg"),
          round(pow(col("l_discount"), 2), 6).as("d2"),
          abs(round(col("l_extendedprice") * -1, 2)).as("ab")),
      Some("""SELECT l_orderkey, l_linenumber, round(l_extendedprice,0) AS r0,
             CAST(floor(l_extendedprice) AS BIGINT) AS fl,
             CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
             round(sqrt(l_quantity),6) AS sq, round(ln(l_extendedprice),6) AS lg,
             round(power(l_discount,2),6) AS d2, abs(round(-l_extendedprice,2)) AS ab
             FROM lineitem WHERE l_orderkey < 100""")),

    // ---- date/time function surface ----
    Q("q34_date_funcs", (s, d) =>
      t(s, d, "orders").filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          last_day(col("o_orderdate")).as("month_end"),
          date_add(to_date(col("o_orderdate")), 30).as("ship_by"),
          datediff(lit("2000-01-01").cast("date"), to_date(col("o_orderdate")))
            .cast("long").as("days_to_y2k")),
      Some("""SELECT o_orderkey, year(o_orderdate) AS yr, month(o_orderdate) AS mo,
             day(o_orderdate) AS dom, quarter(o_orderdate) AS qtr,
             last_day(o_orderdate) AS month_end,
             CAST(o_orderdate AS DATE) + 30 AS ship_by,
             date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k
             FROM orders WHERE o_orderkey < 200""")),

    // ---- CASE WHEN ----
    Q("q35_case_when", (s, d) =>
      t(s, d, "orders")
        .select(when(col("o_totalprice") > 300000, "large")
          .when(col("o_totalprice") > 100000, "medium")
          .otherwise("small").as("bucket"), col("o_totalprice"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), round(avg("o_totalprice"), 2).as("avg_price")),
      Some("""SELECT CASE WHEN o_totalprice > 300000 THEN 'large'
                         WHEN o_totalprice > 100000 THEN 'medium'
                         ELSE 'small' END AS bucket,
             count(*) AS n, round(avg(o_totalprice),2) AS avg_price
             FROM orders GROUP BY 1""")),

    // ---- IN subquery ----
    Q("q36_subquery_in", (s, d) => {
      Tables.views(s, d, "orders", "customer")
      s.sql("""SELECT o_orderkey, o_custkey, round(o_totalprice * 100) / 100 AS price
              FROM orders
              WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9500)""")
    },
      Some("""SELECT o_orderkey, o_custkey, round(o_totalprice,2) AS price
             FROM orders
             WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9500)""")),

    // ---- scalar subquery ----
    Q("q37_subquery_scalar", (s, d) => {
      Tables.views(s, d, "orders")
      s.sql("""SELECT o_orderkey, round(o_totalprice * 100) / 100 AS price FROM orders
              WHERE o_totalprice > 1.9 * (SELECT avg(o_totalprice) FROM orders)""")
    },
      Some("""SELECT o_orderkey, round(o_totalprice,2) AS price FROM orders
             WHERE o_totalprice > 1.9 * (SELECT avg(o_totalprice) FROM orders)""")),

    // ---- correlated EXISTS ----
    Q("q38_exists_correlated", (s, d) => {
      Tables.views(s, d, "orders", "customer")
      s.sql("""SELECT c_custkey, c_name FROM customer c
              WHERE EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)""")
    },
      Some("""SELECT c_custkey, c_name FROM customer c
             WHERE EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)""")),

    // ---- statistical aggregates (GenericUDAFVariance/Covariance/Corr) ----
    Q("q39_stats_agg", (s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_pop(col("l_quantity")), 4).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qe"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qe")),
      Some("""SELECT l_returnflag, round(stddev_samp(l_quantity),4) AS sd_qty,
             round(var_pop(l_quantity),4) AS var_qty,
             round(corr(l_quantity, l_extendedprice),4) AS corr_qe,
             round(covar_samp(l_quantity, l_extendedprice),2) AS cov_qe
             FROM lineitem GROUP BY l_returnflag""")),

    // ---- exact percentile (GenericUDAFPercentile; linear interpolation) ----
    Q("q40_percentile", (s, d) =>
      t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(round(expr("percentile(l_quantity, 0.5)"), 4).as("med_qty"),
          round(expr("percentile(l_quantity, 0.9)"), 4).as("p90_qty")),
      Some("""SELECT l_returnflag, round(quantile_cont(l_quantity,0.5),4) AS med_qty,
             round(quantile_cont(l_quantity,0.9),4) AS p90_qty
             FROM lineitem GROUP BY l_returnflag""")),

    // ---- collect_set as canonical sorted string (GenericUDAFCollectSet) ----
    Q("q41_collect", (s, d) =>
      t(s, d, "orders").groupBy("o_orderstatus")
        .agg(array_join(array_sort(collect_set(col("o_orderpriority"))), ",").as("prios")),
      Some("""SELECT o_orderstatus,
             string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS prios
             FROM orders GROUP BY o_orderstatus""")),

    // ---- deterministic bucket sampling (TABLESAMPLE(BUCKET x OUT OF y)) ----
    Q("q42_sample_bucket", (s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") % 7 === 3)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty")),
      Some("""SELECT l_returnflag, count(*) AS n, round(sum(l_quantity),2) AS sum_qty
             FROM lineitem WHERE l_orderkey % 7 = 3 GROUP BY l_returnflag""")),

    // ---- seeded reproducible sample (content-hash Bernoulli) ----
    // Position-based .sample(seed) silently changes its kept set whenever
    // split planning changes (file growth, executor count) — useless as a
    // REPRODUCIBLE 100 TB sample. The scale-correct seeded sample gates on
    // a content hash of the row key (the same principle as the reference's
    // TABLESAMPLE(BUCKET ON col), ql/.../parse/SplitSample.java percent
    // sampling being the non-reproducible alternative), so the kept set is
    // a pure function of the data — and exactly oracle-able through the
    // XxhOracle xxhash64 port (seed 42; 10% keep via pmod 10).
    Q("q43_sample_random", (s, d) =>
      t(s, d, "lineitem")
        .filter(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(10)) === 0)
        .agg(count(lit(1)).as("n"), round(avg("l_quantity"), 2).as("avg_qty")),
      Some(XxhOracle.q43)),

    // ---- top-k bigrams (Hive ngrams UDAF re-expressed with array built-ins) ----
    Q("q44_ngrams", (s, d) =>
      t(s, d, "documents")
        .select(split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(ws)-2), i -> concat(ws[i], ' ', ws[i+1]))")).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("bigram").asc)
        .limit(20),
      Some("""WITH t AS (SELECT doc_id,
                 unnest(range(len(string_split(text,' ')))) AS pos,
                 unnest(string_split(text,' ')) AS word
               FROM documents),
              b AS (SELECT a.word || ' ' || c.word AS bigram
                    FROM t a JOIN t c ON a.doc_id = c.doc_id AND c.pos = a.pos + 1)
             SELECT bigram, count(*) AS cnt FROM b
             GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 20"""))
  )
}
