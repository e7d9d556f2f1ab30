package graft.queries

import graft.{Q, Tables}
import graft.functions.Bitmap
import graft.operators.{Dedup, GlobalRank}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{round => _, _}
import graft.queries.Fns.round

/** Round-4 sweep: duplicate-cluster connected components (the transitive
  * closure the pair-based keep-list cannot express), plus the remaining
  * round-4 operators.
  */
object Round4Queries {
  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  /** DuckDB mirror of the d06/d08 confirmed-pair set: exact token-set
    * jaccard >= 0.85 over documents with doc_id < 150 (at fixture scale the
    * LSH chain is exact, which is what lets these be oracled at all).
    */
  private val pairsCte =
    """toks AS (SELECT DISTINCT doc_id, unnest(string_split(text,' ')) AS w
                FROM documents WHERE doc_id < 150),
       sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
       pairs AS (SELECT da, db FROM (
                   SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
                   FROM toks a JOIN toks b ON a.w = b.w AND a.doc_id < b.doc_id
                   GROUP BY 1,2) i
                 JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
                 WHERE round(inter/(sa.sz + sb.sz - inter),4) >= 0.85),
       edges AS (SELECT da AS u, db AS v FROM pairs
                 UNION SELECT db, da FROM pairs),
       reach(node, r) AS (SELECT DISTINCT u, u FROM edges
                          UNION
                          SELECT e.u, re.r FROM edges e JOIN reach re ON e.v = re.node),
       comp AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)"""

  val all: Seq[Q] = Seq(

    // ---- duplicate-cluster connected components: every document labeled
    //      with the min doc_id reachable through confirmed near-dup pairs.
    //      Spark side is Dedup.clusters — min-label propagation with
    //      pointer-doubling shortcuts, O(log n) shuffle rounds, no
    //      all-pairs stage. The oracle computes the same transitive
    //      closure with a recursive CTE. ----
    Q("d08_dedup_cluster", (s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 150)
      val comp = Dedup.clusters(Dedup.confirmedPairs(docs))
      docs.join(comp, docs("doc_id") === comp("node"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    },
      Some(s"""WITH RECURSIVE $pairsCte
             SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
             FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
             WHERE d.doc_id < 150""")),

    // ---- cluster-correct dedup resolution: keep exactly ONE doc (min id)
    //      per connected component. Differs from the pair-based keep-list
    //      (d06) exactly on transitive chains — Round4Spec pins a chain
    //      where the two disagree. ----
    Q("d09_dedup_resolve_cc", (s, d) =>
      Dedup.resolveByCluster(t(s, d, "documents").filter(col("doc_id") < 150)),
      Some(s"""WITH RECURSIVE $pairsCte
             SELECT d.doc_id
             FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
             WHERE d.doc_id < 150
               AND (c.node IS NULL OR c.cluster_id = d.doc_id)""")),

    // ---- ewah_bitmap family (GenericUDAFEWAHBitmap + EWAHBitmapAnd/Or/
    //      Empty): per-orderstatus bitmap of custkey buckets, pairwise
    //      AND/OR cardinalities and emptiness. The combine ops are pure
    //      zip_with/aggregate lambdas over the word array — codegen'd, no
    //      custom expression needed. Oracle = distinct-set arithmetic. ----
    Q("q123_bitmap", (s, d) => {
      val bm = t(s, d, "orders").filter(col("o_orderkey") < 2000)
        .groupBy("o_orderstatus")
        .agg(Bitmap.bitmapAgg(col("o_custkey") % 1024).as("bm"))
      bm.as("a").join(bm.as("b"), col("a.o_orderstatus") < col("b.o_orderstatus"))
        .select(col("a.o_orderstatus").as("sa"), col("b.o_orderstatus").as("sb"),
          col("a.bm").as("bma"), col("b.bm").as("bmb"))
        .select(col("sa"), col("sb"),
          Bitmap.bitmapCount(col("bma")).as("ca"),
          Bitmap.bitmapCount(col("bmb")).as("cb"),
          Bitmap.bitmapCount(Bitmap.bitmapAnd(col("bma"), col("bmb"))).as("c_and"),
          Bitmap.bitmapCount(Bitmap.bitmapOr(col("bma"), col("bmb"))).as("c_or"),
          Bitmap.bitmapEmpty(Bitmap.bitmapAnd(col("bma"), col("bmb"))).as("empty_and"))
    },
      Some("""WITH s AS (SELECT DISTINCT o_orderstatus AS st, o_custkey % 1024 AS v
                         FROM orders WHERE o_orderkey < 2000),
              c AS (SELECT st, count(*) AS n FROM s GROUP BY st),
              i AS (SELECT x.st AS sa, y.st AS sb, count(*) AS n
                    FROM s x JOIN s y ON x.v = y.v AND x.st < y.st GROUP BY 1,2)
             SELECT ca.st AS sa, cb.st AS sb, ca.n AS ca, cb.n AS cb,
                    COALESCE(i.n, 0) AS c_and,
                    ca.n + cb.n - COALESCE(i.n, 0) AS c_or,
                    COALESCE(i.n, 0) = 0 AS empty_and
             FROM c ca JOIN c cb ON ca.st < cb.st
             LEFT JOIN i ON i.sa = ca.st AND i.sb = cb.st""")),

    // ---- scalable global ORDER BY rank (HiveTotalOrderPartitioner +
    //      PartitionKeySampler parity): row_number/rank over a total order
    //      with NO single-partition WindowExec — range repartition, local
    //      row numbers, metadata-sized offset broadcast. Oracle = the
    //      plain window functions. Round4Spec pins that the result stays
    //      multi-partition. ----
    Q("q124_global_rank", (s, d) => {
      val c = t(s, d, "customer")
        .select("c_custkey", "c_acctbal")
      GlobalRank.rank(c, Seq(col("c_acctbal").desc), Seq(col("c_acctbal")),
        Seq(col("c_custkey").asc))
        .select(col("c_custkey"), col("rn"), col("rk"))
    },
      Some("""SELECT c_custkey,
             row_number() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rn,
             rank() OVER (ORDER BY c_acctbal DESC) AS rk
             FROM customer""")),

    // ---- int8 scalar-quantized ANN rerank (the memory-bound scale path:
    //      8× smaller hot index, integer candidate scoring, exact cosine
    //      only on candFactor*k survivors). The oracle mirrors the whole
    //      index logic, s02-style; the candidate cut is bit-reproducible
    //      because it uses only integer dots and exact max-abs scales. ----
    Q("s06_ann_quantized", (s, d) => {
      val e = graft.operators.Similarity.prep(t(s, d, "embeddings"))
      graft.operators.Similarity.quantizedTopK(e, e.filter(col("vec_id") < 5), k = 10)
    },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
              m AS (SELECT vec_id, emb,
                      list_max(list_transform(emb, x -> abs(x))) AS mx FROM e),
              qz AS (SELECT vec_id, emb, mx,
                       list_transform(emb, x -> CAST(floor(x / mx * 127 + 0.5) AS INTEGER)) AS qv
                     FROM m),
              q AS (SELECT vec_id AS q_id, emb AS q_emb, mx AS q_mx, qv AS q_qv
                    FROM qz WHERE vec_id < 5),
              scored AS (SELECT q.q_id, c.vec_id, q.q_emb, c.emb,
                  CAST(list_sum(list_transform(list_zip(q.q_qv, c.qv),
                         p -> CAST(p[1] * p[2] AS BIGINT))) AS DOUBLE)
                    * q.q_mx * c.mx AS ord
                FROM q, qz c WHERE q.q_id <> c.vec_id),
              cand AS (SELECT *, row_number() OVER (PARTITION BY q_id
                         ORDER BY ord DESC, vec_id) AS crn FROM scored),
              r AS (SELECT q_id, vec_id AS neighbor_id,
                      round(list_cosine_similarity(q_emb, emb), 6) AS sim,
                      row_number() OVER (PARTITION BY q_id
                        ORDER BY list_cosine_similarity(q_emb, emb) DESC, vec_id) AS rn
                    FROM cand WHERE crn <= 40)
             SELECT q_id, neighbor_id, sim, rn FROM r WHERE rn <= 10""")),

    // ---- EXPORT TABLE / IMPORT (ExportSemanticAnalyzer +
    //      ImportSemanticAnalyzer + CopyTask): snapshot to a movable dir
    //      with a _metadata descriptor, recreate as a catalog table via a
    //      byte copy of the data files (no rewrite). ----
    Q("a06_export_import", (s, d) => {
      val base = graft.tools.Tmp.dir("graft_export")
      val src = t(s, d, "supplier").filter(col("s_suppkey") < 100)
        .select("s_suppkey", "s_name", "s_acctbal")
      graft.operators.ExportImport.exportTable(src, base + "/exp")
      s.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
      s.sql("DROP TABLE IF EXISTS graft_tmp.imported_sup")
      graft.operators.ExportImport.importTable(
        s, base + "/exp", "graft_tmp.imported_sup", base + "/tbl")
    },
      Some("""SELECT s_suppkey, s_name, s_acctbal
             FROM supplier WHERE s_suppkey < 100""")),

    // ---- reduce-side TRANSFORM script (ScriptOperator after the shuffle —
    //      the reference's genReduceSinkPlan + genScriptPlan idiom). The
    //      awk script counts rows per key with a per-partition END block:
    //      per-key counts are only globally correct because DISTRIBUTE BY
    //      routes every occurrence of a key to exactly ONE partition — so
    //      this gate FAILS if reduce-side grouping semantics break. ----
    Q("q127_reduce_transform", (s, d) => {
      Tables.views(s, d, "orders")
      val sh = graft.tools.Tmp.dir("graft_rtrans") + "/cnt.sh"
      java.nio.file.Files.writeString(java.nio.file.Paths.get(sh),
        "#!/bin/sh\nexec awk '{c[$1]++} END {for (k in c) print k\"\\t\"c[k]}'\n")
      // shipped as a job resource (ADD FILE / distributed-cache parity) —
      // the USING command resolves the executor-local copy, never a
      // driver-only absolute path
      val cmd = graft.tools.Scripts.ship(s, sh)
      // the output ROW FORMAT is explicit: Spark's no-serde TRANSFORM
      // defaults to \u0001 field delimiters, not Hive's script-transform
      // tab convention the awk script emits
      s.sql(s"""SELECT CAST(k AS BIGINT) AS o_custkey, CAST(cnt AS BIGINT) AS cnt
               FROM (SELECT TRANSFORM(o_custkey) USING '$cmd' AS (k STRING, cnt STRING)
                     ROW FORMAT DELIMITED FIELDS TERMINATED BY '\t'
                     FROM (SELECT o_custkey FROM orders DISTRIBUTE BY o_custkey) t) o""")
    },
      Some("""SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey""")),

    // ---- global distribution functions at scale: ntile / percent_rank /
    //      cume_dist from GlobalRank's offset machinery + ONE total count
    //      (a driver-side long) — q23 keeps the reference's literal
    //      global-window semantics on dimension-sized input; this is the
    //      shape a 100 TB global ranking must route through. percent_rank
    //      and cume_dist carry REAL tie groups (keys = acctbal only). ----
    Q("q126_global_distribution", (s, d) => {
      val sup = t(s, d, "supplier").select("s_suppkey", "s_acctbal")
      GlobalRank.distribution(sup, Seq(col("s_acctbal").desc),
        Seq(col("s_acctbal")), Seq(col("s_suppkey").asc), buckets = 4)
        .select(col("s_suppkey"), col("rn"), col("rk"), col("nt"),
          round(col("pr"), 6).as("pr"), round(col("cd"), 6).as("cd"))
    },
      Some("""SELECT s_suppkey,
             row_number() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS rn,
             rank() OVER (ORDER BY s_acctbal DESC) AS rk,
             ntile(4) OVER (ORDER BY s_acctbal DESC, s_suppkey) AS nt,
             round(percent_rank() OVER (ORDER BY s_acctbal DESC) * 1000000) / 1000000 AS pr,
             round(cume_dist() OVER (ORDER BY s_acctbal DESC) * 1000000) / 1000000 AS cd
             FROM supplier""")),

    // ---- character-entropy quality signal (beyond-reference pipeline op):
    //      Shannon entropy of the per-document character distribution — a
    //      cheap perplexity proxy that flags mojibake/boilerplate (too low)
    //      and binary junk (too high). One explode + two hash aggregates,
    //      all narrow per doc_id; log2 via ln/ln(2) so both engines compute
    //      the identical expression tree. ----
    Q("t09_char_entropy", (s, d) => {
      val chars = t(s, d, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
        .filter(length(col("ch")) === 1)
      val freq = chars.groupBy("doc_id", "ch").agg(count(lit(1)).as("cnt"))
      val tot = chars.groupBy("doc_id").agg(count(lit(1)).as("n"))
      freq.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(round(-sum((col("cnt") / col("n")) *
          log(col("cnt") / col("n")) / log(lit(2.0))), 4).as("entropy"),
          countDistinct(col("ch")).as("alphabet"))
    },
      Some("""WITH chars AS (SELECT doc_id, unnest(string_split_regex(text, '')) AS ch
                             FROM documents WHERE doc_id < 300),
              ok AS (SELECT doc_id, ch FROM chars WHERE length(ch) = 1),
              freq AS (SELECT doc_id, ch, count(*) AS cnt FROM ok GROUP BY 1,2),
              tot AS (SELECT doc_id, count(*) AS n FROM ok GROUP BY 1)
             SELECT f.doc_id,
                    round(-sum((cnt / n) * ln(cnt / n) / ln(2.0)) * 10000) / 10000 AS entropy,
                    count(DISTINCT ch) AS alphabet
             FROM freq f JOIN tot t ON f.doc_id = t.doc_id
             GROUP BY f.doc_id""")),

    // ---- repetition-ratio filter (Gopher repetition rules): fraction of
    //      all token positions covered by occurrences of the single most
    //      frequent trigram. High ratio = template/boilerplate text. Per-doc
    //      narrow aggregation; ties on trigram count resolved by max, so
    //      the ratio (not the gram) is the output — engine-stable. ----
    Q("t10_repetition", (s, d) => {
      val docs = t(s, d, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .filter(size(col("ws")) >= 3)
      val grams = docs.select(col("doc_id"), size(col("ws")).cast("long").as("n_tok"),
        explode(expr(
          "transform(sequence(0, size(ws)-3), i -> concat_ws(' ', slice(ws, i+1, 3)))"
        )).as("gram"))
      grams.groupBy("doc_id", "n_tok", "gram").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id", "n_tok").agg(max(col("cnt")).as("top_cnt"))
        .select(col("doc_id"),
          round(col("top_cnt") * 3 / col("n_tok").cast("double"), 4).as("rep_ratio"),
          (round(col("top_cnt") * 3 / col("n_tok").cast("double"), 4) > 0.2).as("flagged"))
    },
      Some("""WITH d AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents
                         WHERE doc_id < 300 AND len(string_split(text,' ')) >= 3),
              grams AS (SELECT doc_id, len(ws) AS n_tok,
                          array_to_string(list_slice(ws, i, i+2), ' ') AS gram
                        FROM (SELECT doc_id, ws, unnest(range(1, len(ws)-1)) AS i FROM d)),
              cnts AS (SELECT doc_id, n_tok, gram, count(*) AS cnt
                       FROM grams GROUP BY 1,2,3),
              tops AS (SELECT doc_id, n_tok, max(cnt) AS top_cnt
                       FROM cnts GROUP BY 1,2)
             SELECT doc_id,
                    round(top_cnt * 3 / CAST(n_tok AS DOUBLE) * 10000) / 10000 AS rep_ratio,
                    round(top_cnt * 3 / CAST(n_tok AS DOUBLE) * 10000) / 10000 > 0.2 AS flagged
             FROM tops""")),

    // ---- scalar registry stragglers, sweep 6: conv (base conversion),
    //      assert_true (NULL on pass — Hive GenericUDFAssertTrue), and
    //      current_database (FunctionRegistry misc). conv is mirrored via
    //      DuckDB to_hex/bin; assert_true's NullType output is cast to
    //      string so parquet can carry it. ----
    Q("q125_funcs_gap3", (s, d) =>
      t(s, d, "customer").filter(col("c_custkey") <= 100)
        .select(col("c_custkey"),
          conv(col("c_custkey").cast("string"), 10, 16).as("hex_conv"),
          conv(col("c_custkey").cast("string"), 10, 2).as("bin_conv"),
          conv(conv(col("c_custkey").cast("string"), 10, 16), 16, 10).as("rt_conv"),
          assert_true(col("c_custkey") >= 0).cast("string").as("assert_null"),
          current_database().as("dbname")),
      Some("""SELECT c_custkey,
             upper(to_hex(c_custkey)) AS hex_conv,
             bin(c_custkey) AS bin_conv,
             CAST(c_custkey AS VARCHAR) AS rt_conv,
             CAST(NULL AS VARCHAR) AS assert_null,
             'default' AS dbname
             FROM customer WHERE c_custkey <= 100""")))
}
