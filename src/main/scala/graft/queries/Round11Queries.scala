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
              FROM d JOIN thumb ON d.doc_id = thumb.doc_id"""))
  )
}
