package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Hive's `ewah_bitmap` UDAF family: aggregate a set of non-negative ints
  * into a bitmap, combine bitmaps with AND/OR, test emptiness, count bits.
  *
  * Reference: /root/reference/ql/src/java/org/apache/hadoop/hive/ql/udf/
  * generic/GenericUDAFEWAHBitmap.java and udf/generic/
  * GenericUDFEWAHBitmapAnd/Or/Empty.java (EWAH word-run compression over
  * a javaewah library bitmap). Spark-first re-expression: the aggregate is
  * a typed `Aggregator` whose buffer is a BitSet — map-side partials merge
  * as word-wise OR, so the shuffle carries one bitmap per partition, and
  * the output is the raw `array<bigint>` word vector. The combine/test
  * operators are NOT custom code at all: word-wise `zip_with`/`aggregate`
  * lambdas over that array, fully codegen'd, executable anywhere in a
  * projection. (EWAH's run-length compression is a wire-format detail of
  * the reference's Writable serialization, not part of the semantics;
  * Tungsten arrays are already compact and the word vector is bounded by
  * maxBits/64.)
  */
class BitmapAggregator(maxBits: Int = 1 << 22)
    extends Aggregator[Long, scala.collection.mutable.BitSet, Array[Long]] {

  override def zero: scala.collection.mutable.BitSet =
    scala.collection.mutable.BitSet.empty

  override def reduce(buf: scala.collection.mutable.BitSet, v: Long): scala.collection.mutable.BitSet = {
    require(v >= 0 && v < maxBits,
      s"ewah_bitmap input $v outside [0, $maxBits) — remap keys first")
    buf += v.toInt
    buf
  }

  override def merge(a: scala.collection.mutable.BitSet, b: scala.collection.mutable.BitSet): scala.collection.mutable.BitSet =
    a |= b

  override def finish(buf: scala.collection.mutable.BitSet): Array[Long] = {
    val words = buf.toBitMask
    // canonical form: no trailing zero words, so equal sets hash equal
    var n = words.length
    while (n > 0 && words(n - 1) == 0L) n -= 1
    words.take(n)
  }

  override def bufferEncoder: Encoder[scala.collection.mutable.BitSet] =
    Encoders.kryo[scala.collection.mutable.BitSet]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object Bitmap {
  /** ewah_bitmap(v): bitmap of the group's values as array<bigint> words. */
  def bitmapAgg(v: Column, maxBits: Int = 1 << 22): Column =
    udaf(new BitmapAggregator(maxBits)).apply(v)

  import org.apache.spark.sql.functions.{aggregate, bit_count, coalesce, lit, slice, struct, when, zip_with}

  /** Re-canonicalize a word vector: drop trailing zero words, so combined
    * bitmaps stay hash/group-by comparable with aggregated ones (AND of
    * disjoint high words would otherwise leave an all-zero tail — same set,
    * different encoding). One codegen'd aggregate + slice, no UDF.
    */
  private def trimmed(r: Column): Column = {
    val last = aggregate(r,
      struct(lit(0).as("i"), lit(0).as("n")),
      (acc, w) => struct(
        (acc("i") + 1).as("i"),
        when(w =!= 0L, acc("i") + 1).otherwise(acc("n")).as("n")))("n")
    slice(r, lit(1), last)
  }

  /** ewah_bitmap_and: word-wise intersection (shorter side zero-padded),
    * trimmed back to canonical form. */
  def bitmapAnd(a: Column, b: Column): Column = trimmed(
    zip_with(a, b, (x, y) => coalesce(x, lit(0L)).bitwiseAND(coalesce(y, lit(0L)))))

  /** ewah_bitmap_or: word-wise union, trimmed back to canonical form. */
  def bitmapOr(a: Column, b: Column): Column = trimmed(
    zip_with(a, b, (x, y) => coalesce(x, lit(0L)).bitwiseOR(coalesce(y, lit(0L)))))

  /** Cardinality: sum of per-word popcounts. */
  def bitmapCount(a: Column): Column =
    aggregate(a, lit(0L), (acc, w) => acc + bit_count(w).cast("long"))

  /** ewah_bitmap_empty: true iff no bit is set. */
  def bitmapEmpty(a: Column): Column = bitmapCount(a) === 0L
}
