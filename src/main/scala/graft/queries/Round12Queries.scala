package graft.queries

import graft.{Q, Tables}
import graft.operators.Multimodal
import org.apache.spark.sql.functions.{round => _, _}

/** Round-12 additions: video as a first-class multimodal column — a real
  * ISO-BMFF (MP4) box walk (the video face of the PNG chunk walk and the
  * RIFF/WAV walk), oracled through closed-form synthesis parameters.
  */
object Round12Queries {
  private def t(s: org.apache.spark.sql.SparkSession, d: String, n: String) =
    Tables.t(s, d, n)

  val all: Seq[Q] = Seq(

    // ---- m09: MP4 container decode — a from-scratch big-endian box walk
    //      (ftyp/moov/mvhd/trak/mdia/minf/stbl/stsz/mdat with genuine
    //      nesting) over synthesized files whose parameters are closed
    //      forms of doc_id. The gate emits mvhd duration normalized
    //      through its own timescale, the trak count, the mdat size, and
    //      the stsz frame table, plus a sizes_ok cross-check — a wrong
    //      offset, endianness flip, or nesting bug breaks the hash. ----
    Q("m09_video_boxes", (s, d) => {
      val media = Multimodal.synthMp4(s,
        t(s, d, "documents").filter(col("doc_id") < 400))
      Multimodal.decodeVideoMeta(s, media).toDF()
        .select("doc_id", "duration_ms", "n_tracks", "mdat_bytes",
          "frame_size", "n_frames", "sizes_ok")
    },
      Some("""SELECT doc_id,
             CAST(500 + (doc_id % 97) * 40 AS BIGINT) AS duration_ms,
             CAST(1 + doc_id % 3 AS BIGINT) AS n_tracks,
             CAST((10 + doc_id % 50) * (16 + doc_id % 17) AS BIGINT) AS mdat_bytes,
             CAST(16 + doc_id % 17 AS BIGINT) AS frame_size,
             CAST(10 + doc_id % 50 AS BIGINT) AS n_frames,
             TRUE AS sizes_ok
             FROM documents WHERE doc_id < 400""")),

    // ---- m10: stride frame sampling out of the REAL mdat+stsz layout —
    //      every 4th frame's byte range located via the sample-size
    //      table and checksummed (the decode-to-tensor stand-in; frame
    //      bytes follow (k*31 + j*7 + id) mod 256, so the oracle
    //      recomputes every sampled frame byte-by-byte). ----
    Q("m10_video_frames", (s, d) => {
      val media = Multimodal.synthMp4(s,
        t(s, d, "documents").filter(col("doc_id") < 200))
      Multimodal.sampleVideoFrames(s, media, stride = 4).toDF()
        .select("doc_id", "frame_idx", "frame_sum")
    },
      Some("""WITH d AS (
                SELECT doc_id, 16 + doc_id % 17 AS fs, 10 + doc_id % 50 AS nf
                FROM documents WHERE doc_id < 200),
              f AS (
                SELECT d.doc_id, d.fs, unnest(range(0, d.nf, 4)) AS k FROM d),
              b AS (
                SELECT f.doc_id, f.k, f.fs, unnest(range(0, f.fs)) AS j
                FROM f)
              SELECT b.doc_id, CAST(b.k AS BIGINT) AS frame_idx,
                     CAST(sum((b.k * 31 + b.j * 7 + b.doc_id) % 256)
                          AS BIGINT) AS frame_sum
              FROM b GROUP BY b.doc_id, b.k""")),

    // ---- m11: video-level dedup from DECODED frame content (the video
    //      face of m07's image dedup) — every frame of every candidate is
    //      read out of the real mdat+stsz layout, the per-video signature
    //      is the xxhash64 of the ordered frame checksums, and duplicate
    //      signatures keep only the globally-first doc_id. The dup fixture
    //      synthesizes content from doc_id mod 100, so the keeper set is
    //      a closed form; the join is a signature equi-join (blocked,
    //      never all-pairs — the 100 TB shape). ----
    Q("m11_video_dedup", (s, d) => {
      val media = Multimodal.synthMp4Dups(s,
        t(s, d, "documents").filter(col("doc_id") < 400), mod = 100)
      val sigs = Multimodal.sampleVideoFrames(s, media, stride = 1).toDF()
        .groupBy("doc_id")
        .agg(xxhash64(concat_ws(",",
          sort_array(collect_list(struct(col("frame_idx"), col("frame_sum"))))
            .cast("array<string>")))
          .as("sig"))
      val keep = sigs.groupBy("sig").agg(min("doc_id").as("doc_id"))
      keep.select(col("doc_id")).orderBy("doc_id")
    },
      Some("""SELECT doc_id FROM documents
             WHERE doc_id < 100 ORDER BY doc_id""")),

    // ---- m12: audio-level dedup from DECODED PCM content — the audio
    //      face of m11: the per-clip signature hashes the decoded 16-bit
    //      sample stream (sum, count, max_abs as the cheap exact triple —
    //      collision-safe here because the dup fixture makes equal-seed
    //      clips byte-identical and different-seed clips differ in
    //      length or content), duplicate signatures keep the first
    //      doc_id. Same equi-join blocking as m11. ----
    Q("m12_audio_dedup", (s, d) => {
      val media = Multimodal.synthWavPcmDups(s,
        t(s, d, "documents").filter(col("doc_id") < 400), mod = 100)
      val sigs = Multimodal.decodeAudioStats(s, media).toDF()
        .select(col("doc_id"),
          xxhash64(col("channels"), col("sample_rate"), col("n_values"),
            col("sample_sum"), col("max_abs")).as("sig"))
      sigs.groupBy("sig").agg(min("doc_id").as("doc_id"))
        .select("doc_id").orderBy("doc_id")
    },
      Some("""SELECT doc_id FROM documents
             WHERE doc_id < 100 ORDER BY doc_id"""))
  )
}
