package graft.queries

import graft.{Q, Tables}
import graft.operators.{Acid, AsOf, Dedup, Ranges, Sample, UniqueJoin}
import graft.sources.{Avro, SequenceFileText}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{round => _, _}
import graft.queries.Fns.round

/** Round-3 sweep: the Avro source/sink (the last open §2.1 row), plus the
  * time-series / pipeline operators a training-data stack needs beyond the
  * reference surface — as-of join, scale-safe range join, deterministic
  * stratified sampling — and a gate for copy-on-write compaction.
  */
object Round3Queries {
  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  val all: Seq[Q] = Seq(

    // ---- Avro source/sink round-trip (reference: serde2/avro/AvroSerDe).
    //      Writes orders (+ a synthesized array column) to Avro container
    //      files, reads them back, and aggregates. All output columns are
    //      exact (counts, integer sums, min/max pass-throughs), so the gate
    //      proves date/timestamp/array/double fidelity through the Avro
    //      encoding with no float-arithmetic slack. ----
    Q("q111_avro_roundtrip", (s, d) => {
      val dir = graft.tools.Tmp.dir("graft_avro") + "/orders_avro"
      val src = t(s, d, "orders").filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"),
          array(col("o_orderkey"), col("o_custkey")).as("ks"))
      Avro.write(src, dir)
      Avro.read(s, dir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(element_at(col("ks"), 2)).as("sum_cust"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"),
          max("o_orderdate").as("max_date"))
    },
      Some("""SELECT o_orderstatus, count(*) AS n, sum(o_custkey) AS sum_cust,
             min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
             max(o_orderdate) AS max_date
             FROM orders WHERE o_orderkey < 500 GROUP BY o_orderstatus""")),

    // ---- as-of join: each click picks up the value of the user's most
    //      recent purchase at-or-before click time. One shuffle (union +
    //      window), no nested-loop — see AsOf.scala. DuckDB's native ASOF
    //      LEFT JOIN is the oracle, so the >= tie semantics are pinned. ----
    Q("q112_asof_join", (s, d) => {
      val ev = t(s, d, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max("value").as("pval"))
      AsOf.join(clicks, purchases, "user_id", "ts", "ts", Seq("pval"))
    },
      Some("""WITH clicks AS (SELECT event_id, user_id, ts FROM events
                              WHERE event_type = 'click'),
              pur AS (SELECT user_id, ts, max(value) AS pval FROM events
                      WHERE event_type = 'purchase' GROUP BY user_id, ts)
             SELECT c.event_id, c.user_id, c.ts, p.pval
             FROM clicks c ASOF LEFT JOIN pur p
               ON c.user_id = p.user_id AND c.ts >= p.ts""")),

    // ---- range join via value binning: purchase amounts against part
    //      price bands, WITHOUT an equi-key. The operator rewrites the
    //      inequality join as bin-equi-join + residual filter (Ranges.scala)
    //      so the plan is a hash join, not a nested loop — Round3Spec pins
    //      that. Output columns are integers only: bitwise-safe. ----
    Q("q113_range_join", (s, d) => {
      val pts = t(s, d, "events").filter(col("event_type") === "purchase")
        .select(col("event_id"), (col("value") * 4).as("v"))
      val iv = t(s, d, "part").filter(col("p_partkey") <= 200)
        .select(col("p_partkey"), (col("p_retailprice") - 2).as("lo"),
          (col("p_retailprice") + 2).as("hi"))
      Ranges.pointInInterval(pts, "v", iv, "lo", "hi", binWidth = 5.0)
        .select("event_id", "p_partkey")
    },
      Some("""SELECT e.event_id, p.p_partkey
             FROM events e JOIN part p
               ON e.value * 4 >= p.p_retailprice - 2
              AND e.value * 4 <= p.p_retailprice + 2
             WHERE e.event_type = 'purchase' AND p.p_partkey <= 200""")),

    // ---- deterministic stratified sampling: content-hash (md5) quota per
    //      stratum — reproducible on any engine/partitioning, which is
    //      exactly why it CAN be oracled while seeded-RNG sampling (q43)
    //      cannot. Zero-shuffle narrow op. ----
    Q("q114_stratified_sample", (s, d) =>
      Sample.stratified(t(s, d, "events"), col("event_type"), col("event_id"),
        Map("click" -> 0.25, "view" -> 0.5, "purchase" -> 1.0, "signup" -> 0.125))
        .select("event_id", "event_type", "user_id"),
      Some("""SELECT event_id, event_type, user_id FROM events
             WHERE CASE event_type
                     WHEN 'click' THEN substr(md5(CAST(event_id AS VARCHAR)),1,2) < '40'
                     WHEN 'view' THEN substr(md5(CAST(event_id AS VARCHAR)),1,2) < '80'
                     WHEN 'purchase' THEN TRUE
                     WHEN 'signup' THEN substr(md5(CAST(event_id AS VARCHAR)),1,2) < '20'
                     ELSE FALSE END""")),

    // ---- copy-on-write compaction (reference: ql/txn/compactor/Worker):
    //      8 small files in, 2 files out, byte-identical content. The file
    //      count is pinned in Round3Spec; the oracle pins content. ----
    Q("a04_compact", (s, d) => {
      val tbl = graft.tools.Tmp.dir("graft_compact") + "/orders"
      t(s, d, "orders").filter(col("o_orderkey") < 1000)
        .repartition(8).write.mode("overwrite").parquet(tbl)
      Acid.compact(s, tbl, 2)
      s.read.parquet(tbl).select("o_orderkey", "o_orderstatus", "o_totalprice")
    },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice
             FROM orders WHERE o_orderkey < 1000""")),

    // ---- Avro as a registered DataSource V2 format (parity with the
    //      reference's AvroStorageFormatDescriptor registration): write +
    //      read through spark.read.format("graft-avro"), column pruning
    //      pushed into Avro schema resolution (Round3Spec pins the pruned
    //      ReadSchema in the plan). ----
    Q("q117_avro_dsv2", (s, d) => {
      val dir = graft.tools.Tmp.dir("graft_avro_v2") + "/orders_v2"
      t(s, d, "orders").filter(col("o_orderkey") < 800)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .write.format("graft-avro").mode("overwrite").save(dir)
      s.read.format("graft-avro").load(dir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum("o_custkey").as("sum_cust"),
          max("o_orderdate").as("max_date"))
    },
      Some("""SELECT o_orderstatus, count(*) AS n, sum(o_custkey) AS sum_cust,
             max(o_orderdate) AS max_date
             FROM orders WHERE o_orderkey < 800 GROUP BY o_orderstatus""")),

    // ---- STORED AS SEQUENCEFILE round-trip (HiveSequenceFileOutputFormat +
    //      LazySimpleSerDe layout: \x01 separators, \N nulls, ignored key).
    //      Read path re-parses through the csv dialect, sharing coercion
    //      semantics with the textfile gates q106/q107. ----
    Q("q115_sequencefile", (s, d) => {
      val dir = graft.tools.Tmp.dir("graft_seq") + "/nation_seq"
      SequenceFileText.write(
        t(s, d, "nation").select("n_nationkey", "n_name", "n_regionkey"), dir)
      SequenceFileText.read(s, dir,
        org.apache.spark.sql.types.StructType.fromDDL(
          "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT"))
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n"), max("n_name").as("max_name"))
    },
      Some("""SELECT n_regionkey, count(*) AS n, max(n_name) AS max_name
             FROM nation GROUP BY n_regionkey""")),

    // ---- UNIQUEJOIN (HiveParser KW_UNIQUEJOIN / JoinDesc.UNIQUE_JOIN):
    //      PRESERVE customer- and supplier-side per-nation aggregates; the
    //      (filtered) nation table is NOT preserved, so its exclusive keys
    //      drop out while preserved unmatched keys survive with NULLs —
    //      which is why the oracle is FULL JOIN + LEFT JOIN. ----
    Q("q116_uniquejoin", (s, d) => {
      val c = t(s, d, "customer").filter(col("c_custkey") < 500)
        .groupBy("c_nationkey").agg(count(lit(1)).as("nc"))
      val sup = t(s, d, "supplier").filter(col("s_suppkey") < 30)
        .groupBy("s_nationkey").agg(count(lit(1)).as("ns"))
      val n = t(s, d, "nation").filter(col("n_nationkey") < 20)
        .select("n_nationkey", "n_name")
      UniqueJoin(Seq(
        (c, col("c_nationkey"), true),
        (sup, col("s_nationkey"), true),
        (n, col("n_nationkey"), false)))
        .select(col("k").cast("long").as("k"), col("nc"), col("ns"), col("n_name"))
    },
      Some("""WITH c AS (SELECT c_nationkey AS ck, count(*) AS nc FROM customer
                         WHERE c_custkey < 500 GROUP BY 1),
              s AS (SELECT s_nationkey AS sk, count(*) AS ns FROM supplier
                    WHERE s_suppkey < 30 GROUP BY 1),
              n AS (SELECT n_nationkey AS nk, n_name FROM nation
                    WHERE n_nationkey < 20)
             SELECT CAST(COALESCE(ck, sk) AS BIGINT) AS k, nc, ns, n_name
             FROM c FULL JOIN s ON ck = sk
                    LEFT JOIN n ON COALESCE(ck, sk) = nk""")),

    // ---- Gopher-style document quality rules (beyond-reference pipeline
    //      op): mean word length band, stopword floor, alpha-word ratio —
    //      the heuristic battery large-corpus curation applies before
    //      training. All metrics exact-arithmetic; shared split semantics
    //      with the d06 chain. ----
    // ---- benchmark decontamination (test-set leakage filter): documents
    //      sharing any 4-gram with the "benchmark" slice (doc_id >= 480)
    //      are dropped; broadcast semi/anti joins, zero corpus shuffle. ----
    Q("d07_decontaminate", (s, d) => {
      val all = t(s, d, "documents")
      Dedup.decontaminate(
        all.filter(col("doc_id") < 480).select("doc_id", "text", "source"),
        all.filter(col("doc_id") >= 480), n = 4)
        .select("doc_id", "source")
    },
      Some("""WITH d AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
              grams AS (SELECT doc_id,
                          array_to_string(list_slice(w, i, i+3), ' ') AS gram
                        FROM (SELECT doc_id, w,
                                unnest(range(1, greatest(len(w)-2, 1))) AS i
                              FROM d)),
              bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id >= 480),
              cont AS (SELECT DISTINCT g.doc_id FROM grams g
                       JOIN bench b USING (gram) WHERE g.doc_id < 480)
             SELECT doc_id, source FROM documents
             WHERE doc_id < 480 AND doc_id NOT IN (SELECT doc_id FROM cont)""")),

    Q("t08_gopher_rules", (s, d) =>
      t(s, d, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars2"),
          size(split(col("text"), " ")).cast("long").as("n_words"),
          expr("size(filter(split(text,' '), w -> w IN ('the','and','of','to','a')))")
            .cast("long").as("stop_cnt"),
          expr("size(filter(split(text,' '), w -> w rlike '^[a-z]+$'))")
            .cast("long").as("alpha_cnt"))
        // mean word length over single-space text = (chars - (n-1)) / n;
        // multiply-round-divide keeps the double oracle-stable (Fns.round)
        .withColumn("mean_word_len",
          round((col("n_chars2") - col("n_words") + lit(1)).cast("double") / col("n_words"), 2))
        .withColumn("pass",
          col("mean_word_len").between(3.0, 10.0) &&
            col("stop_cnt") >= 1 &&
            (col("alpha_cnt").cast("double") / col("n_words")) >= 0.5)
        .drop("n_chars2"),
      Some("""SELECT doc_id,
             len(string_split(text,' ')) AS n_words,
             len(list_filter(string_split(text,' '),
                 w -> w IN ('the','and','of','to','a'))) AS stop_cnt,
             len(list_filter(string_split(text,' '),
                 w -> regexp_full_match(w, '^[a-z]+$'))) AS alpha_cnt,
             round((length(text) - len(string_split(text,' ')) + 1)
                   / len(string_split(text,' ')) * 100) / 100 AS mean_word_len,
             (round((length(text) - len(string_split(text,' ')) + 1)
                    / len(string_split(text,' ')) * 100) / 100 BETWEEN 3.0 AND 10.0)
               AND len(list_filter(string_split(text,' '),
                       w -> w IN ('the','and','of','to','a'))) >= 1
               AND (CAST(len(list_filter(string_split(text,' '),
                        w -> regexp_full_match(w, '^[a-z]+$'))) AS DOUBLE)
                    / len(string_split(text,' '))) >= 0.5 AS pass
             FROM documents WHERE doc_id < 300""")))
}

