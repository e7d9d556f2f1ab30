package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{round => _, _}
import graft.queries.Fns.round

/** Third sweep: storage formats (text/csv/json/orc — the reference's
  * serde+fileformat matrix, SURVEY.md §2.1), dynamic-partitioned writes
  * with partition pruning, null-safe join, global ORDER BY, the remaining
  * string/timestamp function surface, exact decimal arithmetic, and
  * embedding-cosine near-dup pairs.
  */
object FormatQueries {
  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  val all: Seq[Q] = Seq(
    // ---- file formats: csv/json/orc round-trips preserve content ----
    Q("q68_formats", (s, d) => {
      val base = graft.tools.Tmp.dir("graft_fmt")
      val src = t(s, d, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
      // r17: the three format writes are independent jobs over the same
      // source scan — overlap them (guide §2.6) instead of serializing;
      // distinct output dirs, result unchanged. r18: on the shared
      // bounded pool, all sinks settled before the first failure rethrows
      graft.tools.Pools.runAll(Seq(
        () => src.write.mode("overwrite").option("header", "true").csv(s"$base/csv"),
        () => src.write.mode("overwrite").json(s"$base/json"),
        () => src.write.mode("overwrite").orc(s"$base/orc")))
      val csv = s.read.option("header", "true")
        .schema("o_orderkey LONG, o_orderstatus STRING, o_totalprice DOUBLE")
        .csv(s"$base/csv")
      val json = s.read.schema("o_orderkey LONG, o_orderstatus STRING, o_totalprice DOUBLE")
        .json(s"$base/json")
      val orc = s.read.orc(s"$base/orc")
      csv.select(lit("csv").as("fmt"), col("o_orderkey"))
        .unionAll(json.select(lit("json").as("fmt"), col("o_orderkey")))
        .unionAll(orc.select(lit("orc").as("fmt"), col("o_orderkey")))
        .groupBy("fmt").agg(count(lit(1)).as("n"),
          sum("o_orderkey").as("key_sum"))
    },
      Some("""SELECT fmt, count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum
             FROM (SELECT 'csv' AS fmt, o_orderkey FROM orders
                   UNION ALL SELECT 'json', o_orderkey FROM orders
                   UNION ALL SELECT 'orc', o_orderkey FROM orders)
             GROUP BY fmt""")),

    // ---- dynamic partitioned write + partition-pruned read ----
    Q("q69_partitioned_write", (s, d) => {
      val base = graft.tools.Tmp.dir("graft_part")
      t(s, d, "events").select("event_id", "user_id", "event_type", "value")
        .write.mode("overwrite").partitionBy("event_type").parquet(base)
      // this read prunes to the click/ and purchase/ directories only
      s.read.parquet(base)
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
    },
      Some("""SELECT event_type, count(*) AS n, round(sum(value),2) AS sum_value
             FROM events WHERE event_type IN ('click','purchase')
             GROUP BY event_type""")),

    // ---- null-safe equality join (Hive <=>) ----
    Q("q70_nullsafe_join", (s, d) => {
      val a = t(s, d, "orders").filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          expr("nullif(o_orderstatus, 'O')").as("k"))
      val b = t(s, d, "orders").filter(col("o_orderkey") < 500)
        .select(col("o_orderkey").as("rk"),
          expr("nullif(o_orderstatus, 'O')").as("k2"))
      a.join(b, col("k") <=> col("k2"))
        .groupBy("k").agg(count(lit(1)).as("n_pairs"))
    },
      Some("""WITH a AS (SELECT o_orderkey, nullif(o_orderstatus,'O') AS k
                         FROM orders WHERE o_orderkey < 500),
                  b AS (SELECT o_orderkey, nullif(o_orderstatus,'O') AS k
                        FROM orders WHERE o_orderkey < 500)
             SELECT a.k, count(*) AS n_pairs
             FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
             GROUP BY a.k""")),

    // ---- global ORDER BY (range-partitioned total sort, no limit) ----
    Q("q71_orderby_global", (s, d) =>
      t(s, d, "orders").filter(col("o_totalprice") > 450000)
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price")),
      Some("""SELECT o_orderkey, round(o_totalprice,2) AS price FROM orders
             WHERE o_totalprice > 450000 ORDER BY o_orderdate, o_orderkey""")),

    // ---- string surface, part 2 ----
    Q("q72_string_funcs2", (s, d) =>
      t(s, d, "customer").filter(col("c_custkey") < 100)
        .select(col("c_custkey"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou").as("tr"),
          instr(col("c_name"), "mer").cast("long").as("pos"),
          levenshtein(col("c_mktsegment"), lit("BUILDING")).cast("long").as("lev"),
          base64(col("c_mktsegment").cast("binary")).as("b64"),
          ascii(col("c_mktsegment")).cast("long").as("asc"),
          repeat(col("c_mktsegment"), 2).as("rep")),
      Some("""SELECT c_custkey, translate(c_mktsegment,'AEIOU','aeiou') AS tr,
             instr(c_name,'mer') AS pos,
             levenshtein(c_mktsegment,'BUILDING') AS lev,
             to_base64(encode(c_mktsegment)) AS b64,
             ascii(c_mktsegment) AS asc, repeat(c_mktsegment,2) AS rep
             FROM customer WHERE c_custkey < 100""")),

    // ---- exact decimal arithmetic (DecimalTypeInfo parity) ----
    // Quantize the double BEFORE the decimal cast (engines disagree on
    // half-ulp double→decimal rounding; scale-0 round always agrees), and
    // emit the terminal sum as STRING: both engines compute the identical
    // DECIMAL(38,2) value (verified), but a decimal-typed result column is
    // read back asymmetrically by the compare harness (Decimal objects on
    // one side, floats on the other), so only the rendered form is stable.
    // Decimal→string is exact and byte-identical in both engines.
    Q("q73_decimal", (s, d) =>
      t(s, d, "orders")
        .select(col("o_orderstatus"),
          round(col("o_totalprice"), 2).cast("decimal(12,2)").as("price_dec"))
        .groupBy("o_orderstatus")
        .agg(sum("price_dec").cast("decimal(38,2)").cast("string").as("sum_dec"),
          count(lit(1)).as("n")),
      Some("""SELECT o_orderstatus,
             CAST(CAST(sum(CAST(round(o_totalprice*100)/100 AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_dec,
             count(*) AS n
             FROM orders GROUP BY o_orderstatus""")),

    // ---- timestamp function surface ----
    Q("q74_timestamp_funcs", (s, d) =>
      t(s, d, "orders").filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
          date_trunc("quarter", col("o_orderdate")).cast("date").as("quarter_start"),
          weekofyear(col("o_orderdate")).cast("long").as("woy")),
      Some("""SELECT o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
             weekofyear(o_orderdate) AS woy
             FROM orders WHERE o_orderkey < 200""")),

    // ---- math surface, part 2: trig / sign / pi / degrees ----
    Q("q76_math_funcs2", (s, d) =>
      t(s, d, "lineitem").filter(col("l_orderkey") < 60)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(sin(col("l_discount")), 6).as("sn"),
          round(cos(col("l_discount")), 6).as("cs"),
          round(atan(col("l_discount")), 6).as("at"),
          round(degrees(col("l_discount")), 6).as("dg"),
          round(radians(col("l_quantity")), 6).as("rd"),
          signum(col("l_discount") - 0.05).as("sg"),
          round(lit(math.Pi), 6).as("pi_c")),
      Some("""SELECT l_orderkey, l_linenumber, round(sin(l_discount),6) AS sn,
             round(cos(l_discount),6) AS cs, round(atan(l_discount),6) AS at,
             round(degrees(l_discount),6) AS dg, round(radians(l_quantity),6) AS rd,
             CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg,
             round(pi(),6) AS pi_c
             FROM lineitem WHERE l_orderkey < 60""")),

    // ---- string surface, part 3: locate / find_in_set / elt / space ----
    Q("q77_string_funcs3", (s, d) =>
      t(s, d, "customer").filter(col("c_custkey") < 100)
        .select(col("c_custkey"),
          locate("mer", col("c_name")).cast("long").as("loc"),
          expr("find_in_set(c_mktsegment, 'BUILDING,AUTOMOBILE,MACHINERY')")
            .cast("long").as("fis"),
          expr("elt(2, 'x', c_mktsegment, 'y')").as("el"),
          concat(expr("space(3)"), col("c_mktsegment")).as("sp")),
      Some("""SELECT c_custkey, strpos(c_name,'mer') AS loc,
             CASE WHEN list_position(string_split('BUILDING,AUTOMOBILE,MACHINERY',','),
                    c_mktsegment) IS NULL THEN 0
                  ELSE list_position(string_split('BUILDING,AUTOMOBILE,MACHINERY',','),
                    c_mktsegment) END AS fis,
             c_mktsegment AS el,
             repeat(' ',3) || c_mktsegment AS sp
             FROM customer WHERE c_custkey < 100""")),

    // ---- xpath family (reference udf/xml/; no DuckDB xpath, so the
    //      oracle derives the same values from the base columns) ----
    Q("q78_xpath", (s, d) =>
      t(s, d, "documents").filter(col("doc_id") < 100)
        .withColumn("xml", concat(lit("<doc><lang>"), col("lang"),
          lit("</lang><src>"), col("source"), lit("</src></doc>")))
        .select(col("doc_id"),
          expr("xpath_string(xml, 'doc/lang')").as("xlang"),
          expr("xpath_string(xml, 'doc/src')").as("xsrc"),
          expr("xpath_boolean(xml, 'doc/lang')").as("has_lang"),
          expr("size(xpath(xml, 'doc/*/text()'))").cast("long").as("n_parts")),
      Some("""SELECT doc_id, lang AS xlang, source AS xsrc, true AS has_lang,
             CAST(2 AS BIGINT) AS n_parts
             FROM documents WHERE doc_id < 100""")),

    // ---- reflect / java_method (reference GenericUDFReflect) ----
    Q("q79_reflect", (s, d) =>
      t(s, d, "orders").filter(col("o_orderkey") < 100)
        .select(col("o_orderkey"),
          expr("reflect('java.lang.String', 'valueOf', o_orderkey)").as("sval"),
          expr("java_method('java.lang.Long', 'bitCount', o_orderkey)")
            .cast("long").as("bits")),
      Some("""SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS sval,
             CAST(bit_count(o_orderkey) AS BIGINT) AS bits
             FROM orders WHERE o_orderkey < 100""")),

    // ---- explicit salted skew join; must equal the plain join exactly ----
    Q("q75_salted_join", (s, d) => {
      val l = t(s, d, "lineitem")
      val o = t(s, d, "orders").select("o_orderkey", "o_orderpriority")
      graft.operators.Salt.saltedEquiJoin(l, o, "l_orderkey", "o_orderkey",
        saltCol = col("l_partkey") * 7 + col("l_linenumber"), saltFactor = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
    },
      Some("""SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity),2) AS sum_qty
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             GROUP BY o_orderpriority""")),

    // ---- Hive's full physical layout: PARTITIONED BY + CLUSTERED BY
    //      (partition dirs for pruning, buckets within for join locality) ----
    Q("q85_part_bucket", (s, d) => {
      s.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
      s.sql("DROP TABLE IF EXISTS graft_tmp.events_pb")
      val loc = graft.tools.Tmp.dir("graft_pb")
      t(s, d, "events").select("event_id", "user_id", "event_type", "value")
        .write.mode("overwrite")
        .option("path", s"$loc/events_pb")
        .partitionBy("event_type")
        .bucketBy(4, "user_id").sortBy("user_id")
        .saveAsTable("graft_tmp.events_pb")
      s.table("graft_tmp.events_pb")
        .filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
    },
      Some("""SELECT user_id, count(*) AS n, round(sum(value),2) AS v
             FROM events WHERE event_type = 'purchase' GROUP BY user_id""")),

    // ---- aggregate FILTER clause ----
    Q("q81_agg_filter", (s, d) => {
      Tables.views(s, d, "orders")
      s.sql("""SELECT o_orderstatus,
              count(*) FILTER (WHERE o_totalprice > 300000) AS n_big,
              count(*) FILTER (WHERE o_totalprice <= 300000) AS n_small,
              count(*) AS n
              FROM orders GROUP BY o_orderstatus""")
    },
      Some("""SELECT o_orderstatus,
             count(*) FILTER (WHERE o_totalprice > 300000) AS n_big,
             count(*) FILTER (WHERE o_totalprice <= 300000) AS n_small,
             count(*) AS n
             FROM orders GROUP BY o_orderstatus""")),

    // ---- min_by / max_by (deterministic composite ordering value) ----
    Q("q82_minmax_by", (s, d) => {
      val key = round(col("o_totalprice") * 100).cast("long") * 100000 + col("o_orderkey")
      t(s, d, "orders").groupBy("o_orderstatus")
        .agg(min_by(col("o_orderkey"), key).as("cheapest"),
          max_by(col("o_orderkey"), key).as("dearest"))
    },
      Some("""SELECT o_orderstatus,
             min_by(o_orderkey, CAST(round(o_totalprice*100) AS BIGINT)*100000 + o_orderkey) AS cheapest,
             max_by(o_orderkey, CAST(round(o_totalprice*100) AS BIGINT)*100000 + o_orderkey) AS dearest
             FROM orders GROUP BY o_orderstatus""")),

    // ---- bool_and / bool_or / sum(DISTINCT) ----
    Q("q83_misc_agg", (s, d) =>
      t(s, d, "orders").groupBy("o_orderstatus")
        .agg(bool_and(col("o_totalprice") > 0).as("all_pos"),
          bool_or(col("o_totalprice") > 490000).as("any_huge"),
          sum_distinct(col("o_custkey")).as("sum_cust")),
      Some("""SELECT o_orderstatus, bool_and(o_totalprice > 0) AS all_pos,
             bool_or(o_totalprice > 490000) AS any_huge,
             CAST(sum(DISTINCT o_custkey) AS BIGINT) AS sum_cust
             FROM orders GROUP BY o_orderstatus""")),

    // ---- regexp_extract / rlike ----
    Q("q84_regex", (s, d) =>
      t(s, d, "customer").filter(col("c_custkey") < 200)
        .filter(col("c_name").rlike("Customer#\\d+"))
        .select(col("c_custkey"),
          regexp_extract(col("c_name"), "Customer#(\\d+)", 1).as("id_digits"),
          regexp_extract(col("c_name"), "(\\d+)$", 1).cast("long").as("id_num")),
      Some("""SELECT c_custkey, regexp_extract(c_name, 'Customer#(\d+)', 1) AS id_digits,
             CAST(regexp_extract(c_name, '(\d+)$', 1) AS BIGINT) AS id_num
             FROM customer
             WHERE c_custkey < 200 AND regexp_matches(c_name, 'Customer#\d+')""")),

    // ---- RANGE frame with time-interval bounds ----
    Q("q86_window_range_interval", (s, d) => {
      Tables.views(s, d, "orders")
      s.sql("""SELECT o_orderkey,
              round(sum(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate
                RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW) * 100) / 100 AS w7d
              FROM orders WHERE o_orderkey < 1000""")
    },
      Some("""SELECT o_orderkey,
             round(sum(o_totalprice) OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW),2) AS w7d
             FROM orders WHERE o_orderkey < 1000""")),

    // ---- LATERAL correlated subquery join (top-n per group) ----
    Q("q87_lateral_join", (s, d) => {
      Tables.views(s, d, "nation", "supplier")
      s.sql("""SELECT n_name, s.s_suppkey FROM nation,
              LATERAL (SELECT s_suppkey FROM supplier
                       WHERE s_nationkey = n_nationkey
                       ORDER BY s_acctbal DESC, s_suppkey LIMIT 2) s""")
    },
      Some("""SELECT n_name, s.s_suppkey FROM nation,
             LATERAL (SELECT s_suppkey FROM supplier
                      WHERE s_nationkey = n_nationkey
                      ORDER BY s_acctbal DESC, s_suppkey LIMIT 2) s""")),

    // ---- bitwise operator surface ----
    Q("q88_bitwise", (s, d) =>
      t(s, d, "orders").filter(col("o_orderkey") < 100)
        .select(col("o_orderkey"),
          col("o_orderkey").bitwiseAND(10).as("ba"),
          col("o_orderkey").bitwiseOR(10).as("bo"),
          col("o_orderkey").bitwiseXOR(10).as("bx"),
          expr("~o_orderkey").as("bn"),
          shiftleft(col("o_orderkey"), 2).cast("long").as("sl"),
          shiftright(col("o_orderkey"), 1).cast("long").as("sr")),
      Some("""SELECT o_orderkey, o_orderkey & 10 AS ba, o_orderkey | 10 AS bo,
             xor(o_orderkey, 10) AS bx, ~o_orderkey AS bn,
             o_orderkey << 2 AS sl, o_orderkey >> 1 AS sr
             FROM orders WHERE o_orderkey < 100""")),

    // ---- interval arithmetic on timestamps ----
    Q("q89_interval_arith", (s, d) =>
      t(s, d, "events").filter(col("event_id") < 100)
        .select(col("event_id"),
          (col("ts") + expr("INTERVAL 3 HOURS")).as("t_plus"),
          (col("ts") - expr("INTERVAL 30 MINUTES")).as("t_minus"),
          hour(col("ts")).cast("long").as("hr")),
      Some("""SELECT event_id, ts + INTERVAL 3 HOUR AS t_plus,
             ts - INTERVAL 30 MINUTE AS t_minus, hour(ts) AS hr
             FROM events WHERE event_id < 100""")),

    // ---- first_value with IGNORE NULLS (Hive first_value(x, true)) ----
    Q("q90_first_ignore_nulls", (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders").filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          first(expr("nullif(o_orderstatus, 'O')"), ignoreNulls = true)
            .over(w).as("first_closed"))
    },
      Some("""SELECT o_custkey, o_orderkey,
             first_value(nullif(o_orderstatus,'O') IGNORE NULLS)
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_closed
             FROM orders WHERE o_custkey < 100""")),

    // ---- array function surface (set ops, slice, flatten) ----
    Q("q91_array_funcs", (s, d) =>
      t(s, d, "documents").filter(col("doc_id") < 50)
        .withColumn("w1", slice(split(col("text"), " "), 1, 8))
        .withColumn("w2", slice(split(col("text"), " "), 5, 8))
        .select(col("doc_id"),
          array_join(array_sort(array_intersect(col("w1"), col("w2"))), ",").as("inter"),
          array_join(array_sort(array_union(col("w1"), col("w2"))), ",").as("uni"),
          array_join(array_sort(array_except(col("w1"), col("w2"))), ",").as("exc"),
          array_join(flatten(array(col("w1"), col("w2"))), ",").as("flat"),
          size(col("w1")).cast("long").as("sz")),
      Some("""WITH b AS (SELECT doc_id, string_split(text,' ')[1:8] AS w1,
                    string_split(text,' ')[5:12] AS w2
                  FROM documents WHERE doc_id < 50)
             SELECT doc_id,
               array_to_string(list_sort(list_intersect(w1, w2)), ',') AS inter,
               array_to_string(list_sort(list_distinct(list_concat(w1, w2))), ',') AS uni,
               array_to_string(list_sort(list_distinct(
                 list_filter(w1, x -> NOT list_contains(w2, x)))), ',') AS exc,
               array_to_string(list_concat(w1, w2), ',') AS flat,
               len(w1) AS sz
             FROM b""")),

    // ---- higher-order array functions (transform/filter/exists/forall/
    //      aggregate) — the codegen'd alternative to UDFs ----
    Q("q92_higher_order", (s, d) =>
      t(s, d, "documents").filter(col("doc_id") < 100)
        .withColumn("ws", split(col("text"), " "))
        .select(col("doc_id"),
          array_join(expr("transform(slice(ws, 1, 5), x -> upper(x))"), ",").as("up5"),
          size(expr("filter(ws, x -> length(x) > 4)")).cast("long").as("n_long"),
          expr("exists(ws, x -> x = 'the')").as("has_the"),
          expr("forall(ws, x -> length(x) >= 1)").as("all_nonempty"),
          expr("aggregate(transform(ws, x -> length(x)), 0, (a, x) -> a + x)")
            .cast("long").as("char_sum")),
      Some("""SELECT doc_id,
             array_to_string(list_transform(string_split(text,' ')[1:5], x -> upper(x)), ',') AS up5,
             len(list_filter(string_split(text,' '), x -> length(x) > 4)) AS n_long,
             len(list_filter(string_split(text,' '), x -> x = 'the')) > 0 AS has_the,
             len(list_filter(string_split(text,' '), x -> NOT (length(x) >= 1))) = 0 AS all_nonempty,
             CAST(list_sum(list_transform(string_split(text,' '), x -> length(x))) AS BIGINT) AS char_sum
             FROM documents WHERE doc_id < 100""")),

    // ---- embedding-cosine near-dup pairs (dedup family, vector flavor) ----
    Q("s03_embed_neardup", (s, d) => {
      val e = graft.operators.Similarity.prep(t(s, d, "embeddings"))
        .filter(col("vec_id") < 200)
      e.select(col("vec_id").as("va"), col("emb").as("a_emb"))
        .crossJoin(e.select(col("vec_id").as("vb"), col("emb").as("b_emb")))
        .filter(col("va") < col("vb"))
        .withColumn("sim", graft.operators.Similarity.cosine("a_emb", "b_emb"))
        .filter(col("sim") >= 0.4)
        .select(col("va"), col("vb"), round(col("sim"), 6).as("sim"))
    },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                         FROM embeddings WHERE vec_id < 200)
             SELECT a.vec_id AS va, b.vec_id AS vb,
               round(list_cosine_similarity(a.emb, b.emb),6) AS sim
             FROM e a JOIN e b ON a.vec_id < b.vec_id
             WHERE list_cosine_similarity(a.emb, b.emb) >= 0.4"""))
  )
}
