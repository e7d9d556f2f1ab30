package graft.queries

import graft.{Q, Tables}
import graft.operators.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{round => _, _}
import graft.queries.Fns.round

/** Event-time windowing (the Structured-Streaming-shaped extension; these
  * run the same plans in batch so the DuckDB oracle can check them) plus the
  * training-data-pipeline operators: dedup family, similarity search, text
  * analysis, multimodal plumbing.
  */
object PipelineQueries {
  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  private val stopwords = Seq("the", "a", "of", "and", "in", "is", "to")

  val all: Seq[Q] = Seq(
    // ---- tumbling event-time window (readStream-compatible plan) ----
    Q("q45_events_tumbling", (s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_value")),
      Some("""SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
             count(*) AS n, round(sum(value),2) AS sum_value
             FROM events GROUP BY 1, 2""")),

    // ---- sliding/hopping window (1h window, 30m hop) ----
    Q("q46_events_hopping", (s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("event_type"), col("n")),
      Some("""WITH wv AS (
               SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws, event_type FROM events
               UNION ALL
               SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', event_type
               FROM events)
             SELECT ws, event_type, count(*) AS n FROM wv GROUP BY 1, 2""")),

    // ---- sessionization (30-min inactivity gap), gaps-and-islands form ----
    Q("q47_events_session", (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, d, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("new_s",
          when(col("prev_us").isNull || col("us") - col("prev_us") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum("new_s").as("n_sessions"))
    },
      Some("""WITH flagged AS (
               SELECT user_id,
                 CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          > 1800000000 THEN 1 ELSE 0 END AS new_s
               FROM events)
             SELECT user_id, count(*) AS n_events, CAST(sum(new_s) AS BIGINT) AS n_sessions
             FROM flagged GROUP BY user_id""")),

    // ---- exact dedup by content hash ----
    Q("d01_dedup_exact", (s, d) =>
      t(s, d, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies")),
      Some("""SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
             FROM documents GROUP BY md5(text)""")),

    // ---- MinHash+LSH near-dup candidates (full oracle: XxhOracle
    //      reimplements Spark's xxhash64 in DuckDB SQL, so the band
    //      candidates + estimated jaccard check exactly; the LSH
    //      band-join is the 100TB-scale path) ----
    Q("d02_dedup_minhash", (s, d) =>
      Dedup.minhashPairs(t(s, d, "documents").filter(col("doc_id") < 300)),
      Some(XxhOracle.d02)),

    // ---- SimHash near-dup pairs (full oracle via the same xxhash64
    //      reimplementation) ----
    Q("d03_dedup_simhash", (s, d) =>
      Dedup.simhashPairs(t(s, d, "documents").filter(col("doc_id") < 300), maxHamming = 16),
      Some(XxhOracle.d03)),

    // ---- exact token-set Jaccard over a bounded candidate set ----
    Q("d04_dedup_jaccard", (s, d) =>
      Dedup.tokenJaccardPairs(t(s, d, "documents").filter(col("doc_id") < 150))
        .filter(col("jac") >= 0.85),
      Some("""WITH toks AS (SELECT DISTINCT doc_id, unnest(string_split(text,' ')) AS w
                            FROM documents WHERE doc_id < 150),
              sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
              i AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
                    FROM toks a JOIN toks b ON a.w = b.w AND a.doc_id < b.doc_id
                    GROUP BY 1, 2)
             SELECT da, db, round(inter/(sa.sz + sb.sz - inter),4) AS jac
             FROM i JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
             WHERE round(inter/(sa.sz + sb.sz - inter),4) >= 0.85""")),

    // ---- exact brute-force cosine top-k (ANN baseline) ----
    Q("s01_cosine_topk", (s, d) => {
      val e = Similarity.prep(t(s, d, "embeddings"))
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5), k = 10)
    },
      Some("""WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
                         FROM embeddings WHERE vec_id < 5),
              c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              sims AS (SELECT q_id, vec_id, list_cosine_similarity(qe, e) AS sim
                       FROM q, c WHERE q_id <> vec_id),
              r AS (SELECT q_id, vec_id AS neighbor_id, round(sim,6) AS sim,
                      row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
                    FROM sims)
             SELECT q_id, neighbor_id, sim, rn FROM r WHERE rn <= 10""")),

    // ---- IVF-bucketed ANN (scale path; oracle mirrors the index logic) ----
    Q("s02_ann_ivf", (s, d) => {
      val e = Similarity.prep(t(s, d, "embeddings"))
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 5),
        centroids = e.filter(col("vec_id") < 8), k = 5, nProbe = 2)
    },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
              cent AS (SELECT vec_id AS c_id, emb AS c_emb FROM e WHERE vec_id < 8),
              assign AS (
                SELECT vec_id, emb, c_id AS cluster_id FROM (
                  SELECT v.vec_id, v.emb, c.c_id,
                    row_number() OVER (PARTITION BY v.vec_id
                      ORDER BY list_cosine_similarity(v.emb, c.c_emb) DESC, c.c_id) AS crn
                  FROM e v, cent c) WHERE crn = 1),
              probes AS (
                SELECT q_id, q_emb, c_id AS cluster_id FROM (
                  SELECT q.vec_id AS q_id, q.emb AS q_emb, c.c_id,
                    row_number() OVER (PARTITION BY q.vec_id
                      ORDER BY list_cosine_similarity(q.emb, c.c_emb) DESC, c.c_id) AS crn
                  FROM e q, cent c WHERE q.vec_id < 5) WHERE crn <= 2),
              cand AS (
                SELECT p.q_id, a.vec_id, list_cosine_similarity(p.q_emb, a.emb) AS sim
                FROM probes p JOIN assign a ON p.cluster_id = a.cluster_id
                WHERE p.q_id <> a.vec_id),
              r AS (SELECT q_id, vec_id AS neighbor_id, round(sim,6) AS sim,
                      row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
                    FROM cand)
             SELECT q_id, neighbor_id, sim, rn FROM r WHERE rn <= 5""")),

    // ---- language-ID heuristic (stopword fraction) ----
    Q("t01_langid", (s, d) => {
      val toks = t(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      toks.groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"),
          sum(when(col("w").isin(stopwords: _*), 1L).otherwise(0L)).as("sw_tok"))
        .withColumn("sw_frac", round(col("sw_tok") / col("n_tok"), 4))
        .withColumn("lang_pred", when(col("sw_frac") > 0.05, "en").otherwise("other"))
    },
      Some(s"""WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents)
              SELECT doc_id, count(*) AS n_tok,
                CAST(sum(CASE WHEN w IN (${stopwords.map("'" + _ + "'").mkString(",")})
                     THEN 1 ELSE 0 END) AS BIGINT) AS sw_tok,
                round(CAST(sum(CASE WHEN w IN (${stopwords.map("'" + _ + "'").mkString(",")})
                     THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS sw_frac,
                CASE WHEN round(CAST(sum(CASE WHEN w IN (${stopwords.map("'" + _ + "'").mkString(",")})
                     THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) > 0.05
                     THEN 'en' ELSE 'other' END AS lang_pred
              FROM tok GROUP BY doc_id""")),

    // ---- document quality scoring ----
    Q("t02_quality", (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          round(length(translate(col("text"), " ", "")) /
            size(split(col("text"), " ")).cast("double"), 4).as("avg_tok_len"),
          round(size(array_distinct(split(col("text"), " "))) /
            size(split(col("text"), " ")).cast("double"), 4).as("distinct_ratio")),
      Some("""SELECT doc_id, length(text) AS n_chars,
             len(string_split(text,' ')) AS n_tokens,
             round(CAST(length(replace(text,' ','')) AS DOUBLE)
                   / len(string_split(text,' ')), 4) AS avg_tok_len,
             round(CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
                   / len(string_split(text,' ')), 4) AS distinct_ratio
             FROM documents""")),

    // ---- token counting (whitespace + BPE-ish chars/4 estimate) ----
    Q("t03_tokens", (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          ceil(length(col("text")) / lit(4.0)).cast("long").as("approx_bpe"),
          length(col("text")).cast("long").as("n_chars")),
      Some("""SELECT doc_id, len(string_split(text,' ')) AS n_tokens,
             CAST(ceil(length(text)/4.0) AS BIGINT) AS approx_bpe,
             length(text) AS n_chars
             FROM documents""")),

    // ---- normalized content fingerprint ----
    Q("t04_fingerprint", (s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp")),
      Some("""SELECT doc_id, md5(regexp_replace(lower(text),'\s+',' ','g')) AS fp
             FROM documents""")),

    // ---- near-dup dedup resolution: drop the higher doc_id of each pair ----
    Q("d05_dedup_keep", (s, d) => {
      val scope = t(s, d, "documents").filter(col("doc_id") < 150)
      val dupIds = Dedup.tokenJaccardPairs(scope)
        .filter(col("jac") >= 0.85)
        .select(col("db")).distinct()
      scope.join(dupIds, scope("doc_id") === dupIds("db"), "left_anti")
        .select(col("doc_id"))
    },
      Some("""WITH toks AS (SELECT DISTINCT doc_id, unnest(string_split(text,' ')) AS w
                            FROM documents WHERE doc_id < 150),
              sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
              dup AS (SELECT DISTINCT db FROM (
                        SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
                        FROM toks a JOIN toks b ON a.w = b.w AND a.doc_id < b.doc_id
                        GROUP BY 1,2) i
                      JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
                      WHERE round(inter/(sa.sz + sb.sz - inter),4) >= 0.85)
             SELECT doc_id FROM documents
             WHERE doc_id < 150 AND doc_id NOT IN (SELECT db FROM dup)""")),

    // ---- end-to-end corpus preprocessing: quality gate -> corpus stats ----
    Q("t05_corpus_pipeline", (s, d) => {
      val toks = t(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val stats = toks.groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"),
          countDistinct("w").as("nd_tok"),
          sum(when(col("w").isin(stopwords: _*), 1L).otherwise(0L)).as("sw_tok"))
      stats
        .filter(col("n_tok") >= 20 &&
          col("nd_tok") / col("n_tok") >= 0.4 &&
          col("sw_tok") / col("n_tok") > 0.02)
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").as("total_tokens"),
          round(avg(col("nd_tok") / col("n_tok")), 4).as("avg_distinct_ratio"))
    },
      Some(s"""WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
              stats AS (SELECT doc_id, count(*) AS n_tok, count(DISTINCT w) AS nd_tok,
                          sum(CASE WHEN w IN (${stopwords.map("'" + _ + "'").mkString(",")})
                              THEN 1 ELSE 0 END) AS sw_tok
                        FROM toks GROUP BY doc_id)
             SELECT count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tokens,
               round(avg(CAST(nd_tok AS DOUBLE)/n_tok), 4) AS avg_distinct_ratio
             FROM stats
             WHERE n_tok >= 20 AND CAST(nd_tok AS DOUBLE)/n_tok >= 0.4
               AND CAST(sw_tok AS DOUBLE)/n_tok > 0.02""")),

    // ---- null semantics through outer joins and aggregates ----
    Q("q80_null_semantics", (s, d) => {
      val o = t(s, d, "orders")
      val rich = t(s, d, "customer").filter(col("c_acctbal") > 9900)
        .select(col("c_custkey"), col("c_acctbal"))
      o.join(rich, o("o_custkey") === rich("c_custkey"), "left")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_all"),
          count(rich("c_custkey")).as("n_matched"),
          round(sum(coalesce(rich("c_acctbal"), lit(0.0))), 2).as("bal_tot"),
          countDistinct(rich("c_custkey")).as("nd_cust"))
    },
      Some("""SELECT o_orderstatus, count(*) AS n_all, count(c_custkey) AS n_matched,
             round(sum(coalesce(c_acctbal, 0)),2) AS bal_tot,
             count(DISTINCT c_custkey) AS nd_cust
             FROM orders LEFT JOIN (SELECT c_custkey, c_acctbal FROM customer
                                    WHERE c_acctbal > 9900) r
               ON o_custkey = c_custkey
             GROUP BY o_orderstatus""")),

    // ---- multimodal decode, now REAL byte parsing: synthesize valid
    //      PNG/JPEG headers per doc (dims a closed form of doc_id), then
    //      decode them by walking the actual container structure (PNG
    //      chunks → IHDR, JPEG marker segments → SOF0). The oracle is the
    //      closed form — a parser bug (endianness, offset, segment skip)
    //      breaks the hash match. The stub featurizer stays spec-gated. ----
    Q("m01_multimodal", (s, d) => {
      val media = Multimodal.synthImage(s, t(s, d, "documents"))
      Multimodal.decodeImageMeta(s, media).toDF()
        .select(col("doc_id"), col("mime"), col("width"), col("height"),
          col("n_bytes"))
    },
      Some("""SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'image/jpeg' END AS mime,
             CAST(16 + doc_id % 640 AS BIGINT) AS width,
             CAST(16 + (doc_id * 7) % 480 AS BIGINT) AS height,
             CAST(CASE WHEN doc_id % 2 = 0 THEN 45 ELSE 41 END AS BIGINT) AS n_bytes
             FROM documents"""))
  )
}
