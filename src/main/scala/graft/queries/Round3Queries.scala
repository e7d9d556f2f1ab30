package graft.queries

import graft.{Q, Tables}
import graft.operators.{Acid, AsOf, Ranges, Sample}
import graft.sources.Avro
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{round => _, _}

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
             FROM orders WHERE o_orderkey < 1000""")))
}
