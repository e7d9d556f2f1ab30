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

  /** Attach a binary payload + metadata struct to each document.
    * n_bytes counts the payload's UTF-8 OCTETS (octet_length), not the
    * string's characters — the two differ for any non-ASCII text, and
    * frame-sample/resize arithmetic downstream runs on bytes. */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
      struct(octet_length(col("text")).cast("long").as("n_bytes"),
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

  case class ImageMeta(doc_id: Long, mime: String, width: Long, height: Long,
                       n_bytes: Long)

  /** Deterministic synthetic image payloads (one per doc): structurally
    * valid PNG (even doc_id) or JPEG (odd) headers whose dimensions derive
    * from doc_id — the container has no image fixtures, so the payload
    * generator doubles as the oracle's closed form while the DECODE side
    * (below) does real byte parsing.
    */
  def synthImage(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .map(id => (id, synthPayload(id)))
      .toDF("doc_id", "payload")
  }

  private[graft] def synthPayload(docId: Long): Array[Byte] = {
    val w = 16 + (docId % 640).toInt
    val h = 16 + ((docId * 7) % 480).toInt
    if (docId % 2 == 0) pngBytes(w, h) else jpegBytes(w, h)
  }

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(45) // sig 8 + IHDR chunk 25 + IEND 12
    bb.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    bb.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h)
    bb.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    bb.putInt(0) // CRC not validated by header readers
    bb.putInt(0).put("IEND".getBytes("US-ASCII")).putInt(0)
    bb.array()
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(41) // SOI 2 + APP0 18 + SOF0 19 + EOI 2
    bb.put(0xFF.toByte).put(0xD8.toByte)
    bb.put(0xFF.toByte).put(0xE0.toByte).putShort(16)
      .put("JFIF".getBytes("US-ASCII")).put(0.toByte)
      .put(1.toByte).put(1.toByte).put(0.toByte)
      .putShort(1).putShort(1).put(0.toByte).put(0.toByte)
    bb.put(0xFF.toByte).put(0xC0.toByte).putShort(17).put(8.toByte)
      .putShort(h.toShort).putShort(w.toShort).put(3.toByte)
      .put(Array(1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1).map(_.toByte))
    bb.put(0xFF.toByte).put(0xD9.toByte)
    bb.array()
  }

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)
  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)

  /** REAL header decode — pure-JVM byte parsing, no codec library: PNG
    * chunk walk to IHDR (big-endian width/height at data offsets 0/4),
    * JPEG marker-segment walk to the first SOFn frame header (height then
    * width after the precision byte). This is the honest subset of "image
    * decode" that needs no native codecs; pixel decode would slot into the
    * same per-partition loop.
    */
  private[graft] def parseImage(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b.length >= 24 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') {
      // chunk length through LONG arithmetic: a corrupt 4-byte length
      // (e.g. 0xFFFFFFF4) read as Int goes negative and would stall or
      // reverse the walk forever (the same bug class parseWav guards)
      var off = 8L
      while (off + 8 <= b.length) {
        val len = be32(b, off.toInt)
        val typ = new String(b, off.toInt + 4, 4, "US-ASCII")
        if (typ == "IHDR" && len >= 8 && off + 16 <= b.length)
          return Some(("image/png",
            be32(b, off.toInt + 8).toInt, be32(b, off.toInt + 12).toInt))
        off += 8 + len + 4
      }
      None
    } else if (b.length >= 4 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) {
      var off = 2
      while (off + 4 <= b.length && (b(off) & 0xFF) == 0xFF) {
        // the spec allows any number of 0xFF FILL bytes before a marker
        // id; consume them or a padded JPEG misreads padding as a length
        if ((b(off + 1) & 0xFF) == 0xFF) { off += 1 }
        else {
          val mk = b(off + 1) & 0xFF
          if (mk >= 0xC0 && mk <= 0xCF && mk != 0xC4 && mk != 0xC8 && mk != 0xCC) {
            if (off + 9 <= b.length)
              return Some(("image/jpeg", be16(b, off + 7), be16(b, off + 5)))
            else return None
          } else if (mk == 0xDA || mk == 0xD9) return None // into scan/EOI: no SOF
          else if (mk >= 0xD0 && mk <= 0xD7) off += 2      // standalone RSTn
          else off += 2 + be16(b, off + 2)                 // payload segment
        }
      }
      None
    } else None
  }

  /** Batched decode over a media frame: one (real) parser per partition
    * iterator — the same mapPartitions shape as `featurize`, now with the
    * decode step genuinely reading bytes. Unparseable payloads yield
    * mime "unknown" with -1 dims rather than dropping rows.
    */
  def decodeImageMeta(spark: SparkSession, media: DataFrame): Dataset[ImageMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          parseImage(payload) match {
            case Some((mime, w, h)) =>
              ImageMeta(id, mime, w.toLong, h.toLong, payload.length.toLong)
            case None => ImageMeta(id, "unknown", -1L, -1L, payload.length.toLong)
          }
        }
      }
  }

  case class WavMeta(doc_id: Long, mime: String, channels: Long,
                     sample_rate: Long, bits: Long, n_samples: Long)

  /** Deterministic synthetic WAV payloads (one per doc): a structurally
    * complete RIFF container — RIFF header, 16-byte PCM fmt chunk, data
    * chunk of zero samples — whose audio parameters derive from doc_id.
    * The audio face of `synthImage`: the generator doubles as the oracle's
    * closed form while `decodeWavMeta` does real little-endian byte
    * parsing (PNG/JPEG above exercise the big-endian walk).
    */
  def synthWav(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .map(id => (id, wavBytes(id)))
      .toDF("doc_id", "payload")
  }

  private[graft] def wavBytes(docId: Long): Array[Byte] = {
    val channels = 1 + (docId % 2).toInt
    val sampleRate = 8000 << (docId % 3).toInt
    val bits = 16
    val blockAlign = channels * bits / 8
    val nSamples = (docId % 100).toInt * 10
    val dataSize = nSamples * blockAlign
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort)
      .putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    bb.array() // sample bytes stay zero — silence
  }

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  /** REAL RIFF/WAV header decode — chunk walk to `fmt ` (PCM params) and
    * `data` (sample count = data size / block align). Little-endian
    * throughout, chunk sizes pad to even offsets per the RIFF spec.
    */
  private[graft] def parseWav(b: Array[Byte]): Option[(Int, Long, Int, Long)] = {
    if (b.length < 12 ||
      new String(b, 0, 4, "US-ASCII") != "RIFF" ||
      new String(b, 8, 4, "US-ASCII") != "WAVE") return None
    // Offset math stays in Long: a corrupt declared chunk length near
    // 2^32 would wrap negative through .toInt and stall or reverse the
    // walk, hanging the executor task. In Long the advance is always
    // >= 8, so the walk is monotonic and terminates; a truncated file
    // simply runs off the end and yields None (mime "unknown").
    var off = 12L
    var fmt: Option[(Int, Long, Int, Int)] = None
    var dataSize = -1L
    while (off + 8 <= b.length && (fmt.isEmpty || dataSize < 0)) {
      val o = off.toInt
      val id = new String(b, o, 4, "US-ASCII")
      val len = le32(b, o + 4)
      if (id == "fmt " && len >= 16 && off + 8 + 16 <= b.length)
        fmt = Some((le16(b, o + 10), le32(b, o + 12),
          le16(b, o + 22), le16(b, o + 20)))
      else if (id == "data") dataSize = len
      off += 8L + len + (len & 1L) // RIFF chunks pad to even
    }
    fmt.flatMap { case (channels, rate, bits, blockAlign) =>
      if (dataSize >= 0 && blockAlign > 0)
        Some((channels, rate, bits, dataSize / blockAlign))
      else None
    }
  }

  /** Batched WAV decode: same per-partition parser shape as
    * `decodeImageMeta`; unparseable payloads yield mime "unknown".
    */
  def decodeWavMeta(spark: SparkSession, media: DataFrame): Dataset[WavMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          parseWav(payload) match {
            case Some((ch, rate, bits, n)) =>
              WavMeta(id, "audio/wav", ch.toLong, rate, bits.toLong, n)
            case None => WavMeta(id, "unknown", -1L, -1L, -1L, -1L)
          }
        }
      }
  }

  // -------------------------------------------------------------------
  // REAL pixel decode (round 11): javax.imageio is in the JDK — no
  // native codecs, zero egress — so the "documented stub seam" narrows
  // to: pixels are genuinely decoded, resized (nearest-neighbor), and
  // featurized; only exotic codecs stay out of scope.
  // -------------------------------------------------------------------

  /** Hand-rolled PNG encoder (8-bit RGB, filter 0, single IDAT) over
    * java.util.zip Deflater/CRC32 — deliberately INDEPENDENT of
    * javax.imageio, so the decode path is tested against a second
    * implementation of the format, not against itself. */
  private[graft] def pngEncodeRgb(w: Int, h: Int,
      rgb: (Int, Int) => Int): Array[Byte] = {
    val raw = new Array[Byte](h * (1 + 3 * w))
    var i = 0
    var y = 0
    while (y < h) {
      raw(i) = 0 // filter type None per scanline
      i += 1
      var x = 0
      while (x < w) {
        val p = rgb(x, y)
        raw(i) = ((p >> 16) & 0xFF).toByte
        raw(i + 1) = ((p >> 8) & 0xFF).toByte
        raw(i + 2) = (p & 0xFF).toByte
        i += 3; x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val out = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) out.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Deterministic DECODABLE synthetic images: a coordinate-gradient
    * pattern (r = x, g = y, b = doc_id mod 256) in small real PNGs.
    * Lossless format + closed-form pattern = the oracle can recompute
    * every pixel statistic independently in SQL. */
  def synthPng(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = 8 + (id % 9).toInt
      val h = 8 + ((id * 3) % 7).toInt
      val b = (id % 256).toInt
      (id, pngEncodeRgb(w, h, (x, y) => (x << 16) | (y << 8) | b))
    }.toDF("doc_id", "payload")
  }

  case class PixelStats(doc_id: Long, width: Long, height: Long,
      mean_r: Double, mean_g: Double, mean_b: Double, gray_sum: Long,
      feature: Array[Float])

  /** Real pixel decode + resize + featurize: ImageIO.read (PNG/JPEG, in
    * the JDK) → per-channel means over EVERY pixel → a nearest-neighbor
    * 8x8 grayscale thumbnail whose values double as a 64-dim feature
    * (the aHash input shape). Narrow per-partition map, zero shuffle;
    * unparseable payloads yield (-1, -1) dims rather than dropped rows.
    */
  def decodePixelStats(spark: SparkSession, media: DataFrame): Dataset[PixelStats] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            catch { case _: Exception => null }
          if (img == null)
            PixelStats(id, -1L, -1L, -1.0, -1.0, -1.0, -1L, Array.empty[Float])
          else {
            val w = img.getWidth; val h = img.getHeight
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            // nearest-neighbor 8x8 grayscale thumbnail: sample point
            // (i*w/8, j*h/8), integer gray = (r+g+b)/3 — the resize +
            // featurize step on real pixels
            val gray = new Array[Float](64)
            var graySum = 0L
            var j = 0
            while (j < 8) {
              var i = 0
              while (i < 8) {
                val p = img.getRGB(i * w / 8, j * h / 8)
                val g = (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / 3
                gray(j * 8 + i) = g.toFloat
                graySum += g
                i += 1
              }
              j += 1
            }
            PixelStats(id, w.toLong, h.toLong,
              sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, graySum, gray)
          }
        }
      }
  }

  /** aHash from the decode's 8x8 grayscale feature: bit k set when
    * gray(k) >= mean(gray) — the standard perceptual fingerprint, now on
    * real pixels. */
  def aHash(feature: Array[Float]): Long = {
    if (feature.length != 64) return -1L
    val mean = feature.sum / 64f
    feature.zipWithIndex.foldLeft(0L) { case (acc, (g, k)) =>
      if (g >= mean) acc | (1L << k) else acc
    }
  }

  /** Deterministic WAV payloads WITH real PCM content: 16-bit LE samples
    * following sample[k] = ((k * (doc_id + 3)) mod 65536) - 32768 across
    * the interleaved channel stream — closed-form, so the sample-level
    * decoder below is oracled value-by-value (the audio face of
    * [[synthPng]]; [[synthWav]] stays the silent header-only fixture). */
  def synthWavPcm(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val base = wavBytes(id)
      val bb = java.nio.ByteBuffer.wrap(base)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val nVals = (base.length - 44) / 2
      var k = 0
      while (k < nVals) {
        bb.putShort(44 + 2 * k, ((k * (id + 3)) % 65536 - 32768).toShort)
        k += 1
      }
      (id, base)
    }.toDF("doc_id", "payload")
  }

  /** Like [[synthWavPcm]] but with header AND samples derived from
    * `id % mod`: every `mod`-th document carries byte-identical audio,
    * the duplicate-upload shape audio dedup (m12) runs against. */
  def synthWavPcmDups(spark: SparkSession, docs: DataFrame, mod: Long): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val seed = id % mod
      val base = wavBytes(seed)
      val bb = java.nio.ByteBuffer.wrap(base)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val nVals = (base.length - 44) / 2
      var k = 0
      while (k < nVals) {
        bb.putShort(44 + 2 * k, ((k * (seed + 3)) % 65536 - 32768).toShort)
        k += 1
      }
      (id, base)
    }.toDF("doc_id", "payload")
  }

  case class AudioStats(doc_id: Long, channels: Long, sample_rate: Long,
      n_values: Long, sample_sum: Long, max_abs: Long)

  /** Sample-level WAV decode: the RIFF walk of [[parseWav]] locates the
    * data chunk, then every 16-bit LE PCM value is read — sum, count and
    * peak over the real bytes (the audio analogue of
    * [[decodePixelStats]]). Narrow per-partition map; unparseable
    * payloads yield -1 dims. */
  def decodeAudioStats(spark: SparkSession, media: DataFrame): Dataset[AudioStats] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, b) =>
          val hdr = parseWav(b)
          val dataOff = findDataChunk(b)
          (hdr, dataOff) match {
            case (Some((ch, rate, bits, _)), Some((off, len))) if bits == 16 =>
              val n = math.min(len, b.length.toLong - off) / 2
              var (sum, maxAbs) = (0L, 0L)
              var k = 0
              while (k < n) {
                val v = ((b(off + 2 * k) & 0xFF) |
                  (b(off + 2 * k + 1) << 8)).toShort.toLong
                sum += v
                val a = math.abs(v)
                if (a > maxAbs) maxAbs = a
                k += 1
              }
              AudioStats(id, ch.toLong, rate, n, sum, maxAbs)
            case _ => AudioStats(id, -1L, -1L, -1L, 0L, 0L)
          }
        }
      }
  }

  case class AudioQuality(doc_id: Long, n_values: Long, sum_sq: Long,
      n_silent: Long)

  /** Audio quality gates over the decoded PCM: total signal power
    * (sum of squares — exact integers, so the gate is bit-exact across
    * engines; no transcendental dB math on the comparison path) and the
    * silent-sample count under `silenceThreshold` — the inputs to the
    * two standard corpus filters (drop near-silent clips, drop clipped /
    * overdriven clips). Narrow per-partition map, one pass per payload. */
  def decodeAudioQuality(spark: SparkSession, media: DataFrame,
      silenceThreshold: Int = 512): Dataset[AudioQuality] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, b) =>
          val hdr = parseWav(b)
          val dataOff = findDataChunk(b)
          (hdr, dataOff) match {
            case (Some((_, _, bits, _)), Some((off, len))) if bits == 16 =>
              val n = math.min(len, b.length.toLong - off) / 2
              var (sumSq, silent) = (0L, 0L)
              var k = 0
              while (k < n) {
                val v = ((b(off + 2 * k) & 0xFF) |
                  (b(off + 2 * k + 1) << 8)).toShort.toLong
                sumSq += v * v
                if (math.abs(v) < silenceThreshold) silent += 1
                k += 1
              }
              AudioQuality(id, n, sumSq, silent)
            case _ => AudioQuality(id, -1L, 0L, 0L)
          }
        }
      }
  }

  /** (offset, declared length) of the RIFF data chunk's payload. */
  private def findDataChunk(b: Array[Byte]): Option[(Int, Long)] = {
    if (b.length < 12 || new String(b, 0, 4, "US-ASCII") != "RIFF") return None
    var off = 12L
    while (off + 8 <= b.length) {
      val o = off.toInt
      val id = new String(b, o, 4, "US-ASCII")
      val len = le32(b, o + 4)
      if (id == "data") return Some((o + 8, len))
      off += 8L + len + (len & 1L)
    }
    None
  }

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

// ---------------------------------------------------------------------
  // Video: real ISO-BMFF (MP4) container structure — length-prefixed
  // big-endian boxes, nested containers (moov/trak/mdia/minf/stbl), mvhd
  // timescale+duration, per-track tkhd, a real stsz sample-size table,
  // and an mdat carrying fixed-size frames. The synth writes a genuine
  // box tree with closed-form parameters of doc_id; the decoder is a
  // from-scratch box walk (the video face of the PNG chunk walk and the
  // RIFF walk), so every extracted field is oracled in SQL. Frame
  // CONTENT decode stays a deterministic byte pattern (no video codec in
  // the container-walk scope); the box/stsz/mdat plumbing is real.

  /** Deterministic MP4-like payloads: ftyp + moov[mvhd, trak[tkhd,
    * mdia[minf[stbl[stsz]]]] x nTracks] + mdat. Track 1's stsz declares
    * the real frame size/count; frame k's byte j = (k*31+j*7+id) % 256. */
  def synthMp4(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      (id, mp4Bytes(id))
    }.toDF("doc_id", "payload")
  }

  /** Like [[synthMp4]] but with the CONTENT derived from `id % mod`:
    * every `mod`-th document carries byte-identical frames, the
    * duplicate-upload shape video dedup (m11) runs against. */
  def synthMp4Dups(spark: SparkSession, docs: DataFrame, mod: Long): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      (id, mp4Bytes(id % mod))
    }.toDF("doc_id", "payload")
  }

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ typ.getBytes("US-ASCII") ++ payload

  private[graft] def mp4Bytes(id: Long): Array[Byte] = {
    val timescale = 1000L
    val duration = 500L + (id % 97) * 40
    val nTracks = 1 + (id % 3).toInt
    val frameSize = 16 + (id % 17).toInt
    val nFrames = 10 + (id % 50).toInt
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(0) ++ "iso2mp41".getBytes("US-ASCII"))
    val mvhd = box("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration) ++
        be32(0x00010000L) ++ Array.fill[Byte](2)(0) /* volume */ ++
        Array.fill[Byte](10)(0) ++ Array.fill[Byte](36)(0) /* matrix */ ++
        Array.fill[Byte](24)(0) ++ be32(nTracks + 1L))
    val traks = (1 to nTracks).map { tid =>
      val tkhd = box("tkhd",
        be32(7) /* v0 + enabled flags */ ++ be32(0) ++ be32(0) ++
          be32(tid.toLong) ++ be32(0) ++ be32(duration) ++
          Array.fill[Byte](60)(0))
      val stsz = box("stsz",
        be32(0) ++ be32(if (tid == 1) frameSize.toLong else 0L) ++
          be32(if (tid == 1) nFrames.toLong else 0L))
      box("trak", tkhd ++ box("mdia", box("minf", box("stbl", stsz))))
    }.reduce(_ ++ _)
    val moov = box("moov", mvhd ++ traks)
    val frames = new Array[Byte](nFrames * frameSize)
    var k = 0
    while (k < nFrames) {
      var j = 0
      while (j < frameSize) {
        frames(k * frameSize + j) = ((k * 31 + j * 7 + id) % 256).toByte
        j += 1
      }
      k += 1
    }
    ftyp ++ moov ++ box("mdat", frames)
  }

  case class VideoMeta(doc_id: Long, duration_ms: Long, n_tracks: Long,
      mdat_bytes: Long, frame_size: Long, n_frames: Long, sizes_ok: Boolean)

  private val containerBoxes = Set("moov", "trak", "mdia", "minf", "stbl")

  /** Generic box walk: (type, payloadStart, payloadLen) in document
    * order, recursing into container boxes. Handles all three ISO-BMFF
    * size encodings (ISO 14496-12 §4.2): a plain 32-bit size, size==1
    * (64-bit largesize after the type — real-world mdat boxes over 4 GiB
    * use this), and size==0 (box extends to the end of the enclosing
    * range). Size arithmetic stays in Long so a 32-bit-unsigned size
    * can't truncate negative; corrupt sizes stop the walk instead of
    * throwing (decode emits -1 dims, m01 convention). */
  private def walkBoxes(b: Array[Byte], from: Int, until: Int,
      out: scala.collection.mutable.ArrayBuffer[(String, Int, Int)]): Unit = {
    var off = from
    while (off + 8 <= until) {
      val size32 = beAt(b, off)
      val typ = new String(b, off + 4, 4, "US-ASCII")
      val (size, hdr) =
        if (size32 == 1L) {
          if (off + 16 > until) return
          ((beAt(b, off + 8) << 32) | beAt(b, off + 12), 16)
        } else if (size32 == 0L) ((until - off).toLong, 8)
        else (size32, 8)
      if (size < hdr || off + size > until) return
      out += ((typ, off + hdr, (size - hdr).toInt))
      if (containerBoxes(typ)) walkBoxes(b, off + hdr, off + size.toInt, out)
      off += size.toInt
    }
  }

  private def beAt(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

  /** Container metadata from the box tree: mvhd duration normalized to
    * ms through its own timescale, trak count, mdat size, and the first
    * non-zero stsz (frame size/count), cross-checked against mdat. */
  def decodeVideoMeta(spark: SparkSession, media: DataFrame): Dataset[VideoMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, b) =>
          val boxes = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
          walkBoxes(b, 0, b.length, boxes)
          val isMp4 = boxes.headOption.exists(_._1 == "ftyp")
          if (!isMp4) VideoMeta(id, -1, -1, -1, -1, -1, sizes_ok = false)
          else {
            val mvhd = boxes.find(_._1 == "mvhd")
            val (ts, dur) = mvhd.map { case (_, o, _) =>
              (beAt(b, o + 12), beAt(b, o + 16)) }.getOrElse((1L, -1L))
            val nTracks = boxes.count(_._1 == "trak").toLong
            val mdat = boxes.find(_._1 == "mdat").map(_._3.toLong).getOrElse(-1L)
            val stsz = boxes.filter(_._1 == "stsz")
              .map { case (_, o, _) => (beAt(b, o + 4), beAt(b, o + 8)) }
              .find(_._1 > 0)
            val (fs, nf) = stsz.getOrElse((-1L, -1L))
            VideoMeta(id, if (ts > 0) dur * 1000 / ts else -1, nTracks,
              mdat, fs, nf, sizes_ok = fs > 0 && fs * nf == mdat)
          }
        }
      }
  }

  case class FrameRow(doc_id: Long, frame_idx: Long, frame_sum: Long)

  /** Stride frame sampling out of the REAL mdat+stsz layout: every
    * `stride`-th frame's byte range is located via the stsz table and
    * reduced to a checksum (the decode-to-tensor stand-in; a real codec
    * would decode the same byte range). One narrow pass, no shuffle. */
  def sampleVideoFrames(spark: SparkSession, media: DataFrame,
      stride: Int): Dataset[FrameRow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        val boxes = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
        walkBoxes(b, 0, b.length, boxes)
        val stsz = boxes.filter(_._1 == "stsz")
          .map { case (_, o, _) => (beAt(b, o + 4), beAt(b, o + 8)) }
          .find(_._1 > 0)
        val mdatOff = boxes.find(_._1 == "mdat").map(_._2)
        (stsz, mdatOff) match {
          case (Some((fs, nf)), Some(off)) =>
            (0L until nf by stride.toLong).iterator.map { k =>
              var sum = 0L
              var j = 0
              while (j < fs) {
                sum += b(off + (k * fs).toInt + j) & 0xFF
                j += 1
              }
              FrameRow(id, k, sum)
            }
          case _ => Iterator.empty
        }
      }
  }
}
