package graft.queries

import graft.Q
import graft.operators.Multimodal
import org.apache.spark.sql.functions.{round => _, _}
import graft.queries.Fns.round

/** Round-11 verify gates: real pixel decode (the former multimodal stub
  * seam — javax.imageio is in the JDK, so pixels are now genuinely
  * decoded, resized and featurized).
  */
object Round11Queries {

  private def t = graft.Tables.t _

  val all: Seq[Q] = Seq(

    // ---- m05: pixel-level image decode. Payloads are real PNGs from a
    //      HAND-ROLLED encoder (Deflater+CRC32 chunks — independent of
    //      the ImageIO decoder under test) carrying a coordinate-gradient
    //      pattern (r=x, g=y, b=doc_id%256). The gate emits per-channel
    //      means over EVERY pixel and the 8x8 nearest-neighbor grayscale
    //      thumbnail's sum (the resize+featurize step); the oracle
    //      recomputes both in closed form from the pattern — a single
    //      wrong pixel, sample point, or channel order breaks the hash. ----
    Q("m05_pixel_decode", (s, d) => {
      val media = Multimodal.synthPng(s,
        t(s, d, "documents").filter(col("doc_id") < 200))
      Multimodal.decodePixelStats(s, media).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          round(col("mean_r"), 4).as("mean_r"),
          round(col("mean_g"), 4).as("mean_g"),
          round(col("mean_b"), 4).as("mean_b"),
          col("gray_sum"))
    },
      Some("""WITH d AS (
                SELECT doc_id,
                       8 + doc_id % 9 AS w,
                       8 + (doc_id * 3) % 7 AS h,
                       doc_id % 256 AS b
                FROM documents WHERE doc_id < 200),
              thumb AS (
                SELECT d.doc_id,
                       sum(((i * d.w) // 8 + (j * d.h) // 8 + d.b) // 3) AS gray_sum
                FROM d,
                     (SELECT unnest(range(0, 8)) AS i) ii,
                     (SELECT unnest(range(0, 8)) AS j) jj
                GROUP BY d.doc_id)
              SELECT d.doc_id, CAST(d.w AS BIGINT) AS width,
                     CAST(d.h AS BIGINT) AS height,
                     round((d.w - 1) / 2.0, 4) AS mean_r,
                     round((d.h - 1) / 2.0, 4) AS mean_g,
                     round(CAST(d.b AS DOUBLE), 4) AS mean_b,
                     thumb.gray_sum
              FROM d JOIN thumb ON d.doc_id = thumb.doc_id""")),

    // ---- m06: sample-level audio decode — real 16-bit LE PCM values
    //      read out of RIFF/WAV data chunks (m04 stopped at the header).
    //      Payload samples follow a closed-form pattern, so the oracle
    //      recomputes sum/count/peak value-by-value: an endianness flip,
    //      off-by-one data offset, or sign error breaks the hash. ----
    Q("m06_audio_samples", (s, d) => {
      val media = Multimodal.synthWavPcm(s,
        t(s, d, "documents").filter(col("doc_id") < 300))
      Multimodal.decodeAudioStats(s, media).toDF()
        .select("doc_id", "channels", "sample_rate", "n_values",
          "sample_sum", "max_abs")
    },
      Some("""WITH d AS (
                SELECT doc_id,
                       1 + doc_id % 2 AS ch,
                       CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                            ELSE 32000 END AS rate,
                       (doc_id % 100) * 10 * (1 + doc_id % 2) AS nvals
                FROM documents WHERE doc_id < 300),
              s AS (
                SELECT d.doc_id,
                       unnest(range(0, d.nvals)) AS k
                FROM d),
              v AS (
                SELECT s.doc_id,
                       ((s.k * (s.doc_id + 3)) % 65536) - 32768 AS val
                FROM s)
              SELECT d.doc_id, CAST(d.ch AS BIGINT) AS channels,
                     CAST(d.rate AS BIGINT) AS sample_rate,
                     CAST(d.nvals AS BIGINT) AS n_values,
                     COALESCE(sum(v.val), 0) AS sample_sum,
                     COALESCE(max(abs(v.val)), 0) AS max_abs
              FROM d LEFT JOIN v ON d.doc_id = v.doc_id
              GROUP BY d.doc_id, d.ch, d.rate, d.nvals""")),

    // ---- t18: per-domain document cap — keep the top-3 docs per source
    //      by quality (distinct-token ratio, doc_id tiebreak), the
    //      "no domain dominates the corpus" guard a crawl pipeline runs
    //      before mixing. The window partitions by SOURCE, so work
    //      scales with per-domain data, never the corpus; a
    //      pathologically hot domain is the one place a bounded-heap
    //      aggregate would replace it. ----
    Q("t18_domain_cap", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      t(s, d, "documents")
        .withColumn("quality",
          round(size(array_distinct(split(col("text"), " "))) /
            size(split(col("text"), " ")).cast("double"), 4))
        .withColumn("rn", row_number().over(Window.partitionBy("source")
          .orderBy(col("quality").desc, col("doc_id"))))
        .filter(col("rn") <= 3)
        .select(col("source"), col("doc_id"), col("quality"), col("rn"))
    },
      Some("""WITH q AS (
                SELECT source, doc_id,
                       round(CAST(len(list_distinct(string_split(text,' ')))
                             AS DOUBLE) / len(string_split(text,' ')), 4)
                         AS quality
                FROM documents),
              r AS (
                SELECT source, doc_id, quality,
                       row_number() OVER (PARTITION BY source
                         ORDER BY quality DESC, doc_id) AS rn
                FROM q)
              SELECT source, doc_id, quality, rn FROM r WHERE rn <= 3""")),

    // ---- t19: mixture balancing to the smallest source — downsample
    //      every source to the minimum source's token count
    //      (rate_s = min_total / total_s), each doc kept by the same
    //      overflow-safe multiplicative hash as t11, so the sample is
    //      reproducible with zero extra state. Plan shape: one 20-row
    //      aggregate, a broadcast of the per-source rates back onto the
    //      corpus, a narrow filter — no window, no corpus shuffle. ----
    Q("t19_mixture_sample", (s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("ntok", size(split(col("text"), " ")).cast("long"))
      val totals = docs.groupBy("source")
        .agg(sum("ntok").as("total"))
      val rates = totals
        .crossJoin(broadcast(totals.agg(min("total").as("mn"))))
        .select(col("source"),
          least(lit(1.0), col("mn").cast("double") / col("total"))
            .as("rate"))
      docs.join(broadcast(rates), "source")
        .withColumn("u",
          ((col("doc_id") % lit(1048576L)) * lit(489905L) % lit(1048576L))
            / lit(1048576.0))
        .filter(col("u") < col("rate"))
        .select(col("doc_id"), col("source"), round(col("rate"), 6).as("rate"))
    },
      Some("""WITH tok AS (
                SELECT doc_id, source,
                       len(string_split(text,' ')) AS ntok
                FROM documents),
              tot AS (SELECT source, sum(ntok) AS total
                      FROM tok GROUP BY source),
              m AS (SELECT min(total) AS mn FROM tot),
              r AS (SELECT source,
                           least(1.0, CAST(mn AS DOUBLE) / total) AS rate
                    FROM tot, m)
              SELECT tok.doc_id, tok.source, round(r.rate, 6) AS rate
              FROM tok JOIN r USING (source)
              WHERE (tok.doc_id % 1048576 * 489905 % 1048576) / 1048576.0
                    < r.rate"""))
  )
}
