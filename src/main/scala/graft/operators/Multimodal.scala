package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata
  * struct, with a per-partition batched "decode/featurize" stage.
  *
  * The decode itself is STUBBED (no image/audio codecs in this container) by
  * a deterministic fake featurizer, but everything Spark-side is real:
  * schema (payload binary + meta struct), partition-level batching via
  * mapPartitions (the Scala analog of mapInPandas — one iterator per
  * partition, amortizing model/codec setup cost), and a declared output
  * schema.
  *
  * Scale design: featurization is a narrow map — zero shuffle; repartition
  * upstream only to right-size batches for the (real) decoder's memory, and
  * persist features columnar so downstream ANN reads only the vectors.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)
  case class FeatureRow(doc_id: Long, n_bytes: Long, dim: Int, checksum: Long,
                        feature: Array[Float])

  /** Attach a binary payload + metadata struct to each document. */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
      struct(length(col("text")).cast("long").as("n_bytes"),
        lit("text/plain").as("mime"),
        col("source").as("origin")).as("meta"))

  /** STUB decoder: stands in for image decode / audio frame extraction.
    * Deterministic: feature[i] = f(bytes, i). Replace with a real codec
    * call per batch in production; the batching shape is what matters.
    */
  private def stubFeature(payload: Array[Byte], dim: Int): Array[Float] = {
    val base = payload.foldLeft(1469598103934665603L)((h, b) => (h ^ b) * 1099511628211L)
    Array.tabulate(dim)(i => (((base >>> (i % 56)) & 0xFF).toFloat - 128f) / 128f)
  }

  /** Frame sampling: one output row per fixed-stride "frame" of the
    * payload — the video frame-extraction shape with a stub codec (frame k
    * is the byte slice [k·stride, (k+1)·stride)). Pure built-in
    * expressions (sequence → transform → posexplode → substring), so
    * sampling runs inside whole-stage codegen: no UDF, zero shuffle, and
    * the real frame decoder drops in by replacing the slice lambda.
    */
  def frameSample(media: DataFrame, stride: Int): DataFrame =
    media
      .withColumn("n_frames",
        ceil(col("meta.n_bytes") / lit(stride.toDouble)).cast("int"))
      .select(col("doc_id"), col("n_frames"),
        // CASE guard: sequence(0, -1) would DESCEND ([0,-1]), turning an
        // empty payload into two phantom frames
        posexplode(expr(
          s"""CASE WHEN n_frames > 0
             THEN transform(sequence(0, n_frames - 1), k -> substring(payload, k * $stride + 1, $stride))
             ELSE CAST(array() AS array<binary>) END"""))
          .as(Seq("frame_id", "frame")))

  /** Stub resize: truncate the payload to `targetBytes` and update the
    * metadata — the image-resize shape (real resize swaps the substring
    * for a codec call; the schema contract and narrow-map shape stay).
    */
  def resize(media: DataFrame, targetBytes: Int): DataFrame =
    media.select(col("doc_id"),
      substring(col("payload"), 1, targetBytes).as("payload"),
      struct(least(col("meta.n_bytes"), lit(targetBytes.toLong)).as("n_bytes"),
        col("meta.mime"), col("meta.origin")).as("meta"))

  /** Batched featurize: one setup per partition, streaming over rows. */
  def featurize(spark: SparkSession, media: DataFrame, dim: Int = 16): Dataset[FeatureRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"), col("meta.mime").as("mime"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition "codec init" would go here (once, not per row)
        rows.map { r =>
          val f = stubFeature(r.payload, dim)
          FeatureRow(r.doc_id, r.payload.length.toLong, dim,
            f.foldLeft(0L)((a, v) => a * 31 + java.lang.Float.floatToIntBits(v)), f)
        }
      }
  }
}
