package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Hive's `ngrams(array<string>, n, k)` UDAF: top-k most frequent word
  * n-grams with their frequencies.
  *
  * Reference: /root/reference/ql/src/java/org/apache/hadoop/hive/ql/udf/
  * generic/GenericUDAFnGrams.java (no Spark built-in). Implemented as a
  * typed `Aggregator` — map-side partial maps merge associatively, so the
  * shuffle carries at most one (ngram → count) map per partition, trimmed
  * to a bounded size for 100 TB-safety.
  */
case class NGramFreq(ngram: String, freq: Long)

class NGramsAggregator(n: Int, k: Int, maxPartialSize: Int = 100000)
    extends Aggregator[Seq[String], Map[String, Long], Seq[NGramFreq]] {

  override def zero: Map[String, Long] = Map.empty

  private def trim(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= maxPartialSize) m
    // keep the heaviest entries; bounded error like space-saving sketches
    else m.toSeq.sortBy { case (g, f) => (-f, g) }.take(maxPartialSize).toMap

  override def reduce(buf: Map[String, Long], words: Seq[String]): Map[String, Long] =
    if (words == null || words.length < n) buf
    else trim(words.sliding(n).map(_.mkString(" "))
      .foldLeft(buf)((m, g) => m.updated(g, m.getOrElse(g, 0L) + 1L)))

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    trim(b.foldLeft(a) { case (m, (g, f)) => m.updated(g, m.getOrElse(g, 0L) + f) })

  override def finish(buf: Map[String, Long]): Seq[NGramFreq] =
    buf.toSeq.sortBy { case (g, f) => (-f, g) }.take(k)
      .map { case (g, f) => NGramFreq(g, f) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Seq[NGramFreq]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[NGramFreq]]()
}

object NGrams {
  /** ngrams(tokensCol, n, k) as an untyped column aggregate. */
  def ngrams(tokens: Column, n: Int, k: Int): Column =
    udaf(new NGramsAggregator(n, k)).apply(tokens)

  /** The space-joined n-gram windows of one token array, as a column —
    * shared by the sentence-nested variants below and context_ngrams. */
  private def ngramWindows(tokens: Column, n: Int): Column = {
    import org.apache.spark.sql.functions._
    transform(
      filter(sequence(lit(0), greatest(size(tokens) - lit(n), lit(0))),
        i => i <= size(tokens) - lit(n)),
      i => concat_ws(" ", slice(tokens, i + lit(1), lit(n))))
  }

  /** Hive's ngrams also accepts `array<array<string>>` — the `sentences()`
    * shape (GenericUDAFnGrams nested-list mode): n-grams are counted
    * WITHIN each inner sentence, never across sentence boundaries.
    * Composition: precompute each sentence's windows column-side, flatten,
    * and count the windows with the 1-gram aggregator.
    */
  def ngramsSentences(sents: Column, n: Int, k: Int): Column = {
    import org.apache.spark.sql.functions._
    udaf(new NGramsAggregator(1, k)).apply(
      flatten(transform(sents, s => ngramWindows(s, n))))
  }

  /** Hive `context_ngrams(tokens, context, k)` (GenericUDAFContextNGrams):
    * top-k fillers for a context pattern, where None marks the wildcard
    * slots. Composition: carve context-matching windows out of each token
    * array with built-ins (filter/transform over start offsets), then
    * reuse the ngrams aggregator to count the wildcard fillers.
    *
    * @param tokensCol name of an array<string> column
    */
  def contextNGrams(tokensCol: String, context: Seq[Option[String]], k: Int): Column = {
    import org.apache.spark.sql.functions.col
    contextNGrams(col(tokensCol), context, k)
  }

  /** Column-based overload (same semantics) — lets the SQL-name
    * registration in `Engine.install` accept an arbitrary tokens
    * EXPRESSION (e.g. `context_ngrams(split(text, ' '), ...)`), not just
    * a column name.
    */
  def contextNGrams(tokens: Column, context: Seq[Option[String]], k: Int): Column =
    udaf(new NGramsAggregator(1, k)).apply(contextWindows(tokens, context))

  /** Sentence-nested variant (`sentences()` input): the context is matched
    * within each inner sentence only, mirroring ngramsSentences. */
  def contextNGramsSentences(sents: Column,
      context: Seq[Option[String]], k: Int): Column = {
    import org.apache.spark.sql.functions._
    udaf(new NGramsAggregator(1, k)).apply(
      flatten(transform(sents, s => contextWindows(s, context))))
  }

  private def contextWindows(tokens: Column,
      context: Seq[Option[String]]): Column = {
    import org.apache.spark.sql.functions._
    val n = context.length
    require(context.exists(_.isEmpty), "context needs at least one wildcard (None)")
    // i <= size-n guards short arrays (sequence upper bound is clamped >=0)
    val cond: Column => Column = i =>
      context.zipWithIndex.collect { case (Some(w), j) =>
        get(tokens, i + lit(j)) === lit(w)
      }.foldLeft(i <= size(tokens) - lit(n))(_ && _)
    val fillers: Column => Column = i => concat_ws(" ",
      context.zipWithIndex.collect { case (None, j) => get(tokens, i + lit(j)) }: _*)
    transform(
      filter(sequence(lit(0), greatest(size(tokens) - lit(n), lit(0))), cond),
      fillers)
  }
}
