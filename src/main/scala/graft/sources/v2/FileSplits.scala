package graft.sources.v2

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Byte-range split planning for the graft DSv2 container sources.
  *
  * The reference splits these formats by HDFS block via
  * FileInputFormat.getSplits — SequenceFile and RCFile carry sync
  * markers precisely so a reader can seek to a split boundary
  * (ql/src/java/org/apache/hadoop/hive/ql/io/RCFile.java sync machinery;
  * RCFileInputFormat/SequenceFileInputFormat extend FileInputFormat), and
  * uncompressed text splits on newline (LineRecordReader's
  * first-partial-line-discard convention). Without splits, a table with a
  * few 10 GB files becomes a few straggler tasks; with them it runs
  * ~len/target parallel range readers per file.
  *
  * Planning happens on the driver where SQLConf is in scope: the target
  * is Spark's own scan knob (spark.sql.files.maxPartitionBytes), so the
  * graft sources parallelize like a parquet scan does. Suffix-compressed
  * files (gzip text — standard Hive practice) are never split; a
  * byte-range seek into a gzip stream is meaningless.
  */
object FileSplits {

  /** Driver-side only (SQLConf is thread-local to the planning thread). */
  def targetBytes: Long =
    org.apache.spark.sql.internal.SQLConf.get.filesMaxPartitionBytes

  /** The session-faithful Hadoop conf for driver-side planning/listing.
    * A bare `new Configuration()` drops every `spark.hadoop.*` setting —
    * S3A credentials, custom FS impls — so split planning would fail on
    * object stores where the rest of the engine works. Falls back to a
    * default conf only when no session is active (unit-test contexts). */
  def hadoopConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** Executor-side readers can't see the SparkSession; capture the
    * session Hadoop conf at planning time as a plain serializable map
    * (diffed against defaults so only real settings travel) and rebuild
    * an equivalent conf inside the reader. Catches both launch-time
    * `--conf spark.hadoop.*` and runtime `spark.conf.set` entries. */
  def confOverlay(): Map[String, String] =
    org.apache.spark.sql.SparkSession.getActiveSession.map { s =>
      import scala.jdk.CollectionConverters._
      val session = s.sessionState.newHadoopConf()
      val defaults = new Configuration()
      session.iterator().asScala
        .map(e => e.getKey -> e.getValue)
        .filter { case (k, v) => defaults.get(k) != v }
        .toMap
    }.getOrElse(Map.empty)

  def buildConf(overlay: Map[String, String]): Configuration = {
    val c = new Configuration()
    overlay.foreach { case (k, v) => c.set(k, v) }
    c
  }

  private val unsplittableSuffixes =
    Seq(".gz", ".gzip", ".bz2", ".deflate", ".zst", ".lz4", ".snappy")

  def isSplittable(file: String): Boolean = {
    val lower = file.toLowerCase
    !unsplittableSuffixes.exists(lower.endsWith)
  }

  /** Byte ranges (start, length) covering [0, len). Mirrors
    * FileInputFormat: target-size splits, with the tail merged into the
    * last split when it is under SPLIT_SLOP (10%) of a target — a 1.05×
    * remainder is one task, not a full task plus a sliver. */
  def ranges(len: Long, target: Long): Seq[(Long, Long)] =
    if (len <= 0) Seq((0L, Long.MaxValue))
    else {
      val t = math.max(target, 1L)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var pos = 0L
      while (len - pos > (t * 11) / 10) { out += ((pos, t)); pos += t }
      out += ((pos, len - pos))
      out.toSeq
    }

  /** Split one file: a single whole-file range when unsplittable or
    * small, byte ranges otherwise. */
  def forFile(file: String, len: Long, target: Long): Seq[(Long, Long)] =
    if (!isSplittable(file) || len <= target) Seq((0L, if (len <= 0) Long.MaxValue else len))
    else ranges(len, target)

  /** Flat-directory listing with lengths (the split planner's input). */
  def listFilesWithLen(dir: String): Seq[(String, Long)] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(hadoopConf())
    Option(fs.listStatus(root)).toSeq.flatten
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(st => st.getPath.toString -> st.getLen).sortBy(_._1)
  }
}
