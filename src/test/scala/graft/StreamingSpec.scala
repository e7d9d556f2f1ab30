package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming parity: the same event-time plans run as true
  * streams (memory sink + processAllAvailable drives the micro-batches
  * synchronously over the parquet fixture).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  // the streaming file source needs a directory; the fixture is one file
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_events_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("part-00000.parquet"))
    dir.toString
  }

  test("micro-batch ingest appends the full source exactly once") {
    val sink = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val q = EventStreams.ingest(spark, eventsDir, sink, ckpt)
    q.awaitTermination()
    val streamed = spark.read.parquet(sink).count()
    val batch = Tables.t(spark, sf, "events").count()
    assert(streamed == batch)
  }

  test("streaming tumbling window equals the batch plan") {
    val stream = EventStreams.tumblingCounts(EventStreams.readEvents(spark, eventsDir))
    val q = stream.writeStream.format("memory").queryName("tumbling_out")
      .outputMode(OutputMode.Append).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("tumbling_out")
      .select("ws", "event_type", "n").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val want = Tables.t(spark, sf, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    // watermark in append mode may hold back the tail window; everything
    // emitted must match batch, and coverage must be near-complete
    assert(got.subsetOf(want))
    assert(got.size >= want.size - 10)
  }

  test("session windows produce per-user sessions") {
    val stream = EventStreams.sessionCounts(EventStreams.readEvents(spark, eventsDir))
    val q = stream.writeStream.format("memory").queryName("session_out")
      .outputMode(OutputMode.Append).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("session_out")
    assert(got.count() > 0)
    assert(got.groupBy("user_id").count().count() > 1)
  }

  test("streaming dedup emits at most one row per key within the watermark") {
    val stream = EventStreams.dedupStream(EventStreams.readEvents(spark, eventsDir))
    val q = stream.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dedup_out")
    val perKey = got.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count()
    assert(perKey == 0, "duplicate key emitted")
    assert(got.count() > 0)
  }

  test("stream-stream join matches the equivalent batch join") {
    val stream = EventStreams.clickToPurchase(EventStreams.readEvents(spark, eventsDir))
    val q = stream.writeStream.format("memory").queryName("ssj_out")
      .outputMode(OutputMode.Append).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("ssj_out")
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = Tables.t(spark, sf, "events")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"), col("ts").as("pts"))
    val want = c.join(p, col("user_id") === col("pu") &&
        col("pts") >= col("cts") && col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"))
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // append-mode inner join may withhold tail rows until watermark passes
    assert(got.subsetOf(want))
    assert(got.size >= (want.size * 0.9).toInt)
    assert(got.nonEmpty)
  }

  test("foreachBatch fan-out routes each batch through MultiInsert") {
    val hi = java.nio.file.Files.createTempDirectory("fan_hi").toString
    val lo = java.nio.file.Files.createTempDirectory("fan_lo").toString
    val ck = java.nio.file.Files.createTempDirectory("fan_ck").toString
    val q = EventStreams.fanOutStream(
      EventStreams.readEvents(spark, eventsDir), hi, lo, ck)
    q.awaitTermination()
    val nHi = spark.read.parquet(hi).count()
    val nLo = spark.read.parquet(lo).count()
    val src = Tables.t(spark, sf, "events")
    assert(nHi == src.filter(col("value") > 10).count())
    assert(nLo == src.filter(col("value") <= 10).count())
  }

  test("fan-out batch write is idempotent under at-least-once replay") {
    val hi = java.nio.file.Files.createTempDirectory("fan_hi2").toString
    val lo = java.nio.file.Files.createTempDirectory("fan_lo2").toString
    val batch = Tables.t(spark, sf, "events").limit(50)
    EventStreams.fanOutBatch(batch, hi, lo, 7L)
    val nHi = spark.read.parquet(hi).count()
    val nLo = spark.read.parquet(lo).count()
    // foreachBatch may re-deliver batch 7 if the sink write finished but
    // the checkpoint commit did not — the second delivery must be a no-op
    EventStreams.fanOutBatch(batch, hi, lo, 7L)
    assert(spark.read.parquet(hi).count() == nHi)
    assert(spark.read.parquet(lo).count() == nLo)
    // a genuinely new batch still lands (per-batch subdir, not truncate-all)
    EventStreams.fanOutBatch(batch, hi, lo, 8L)
    assert(spark.read.parquet(hi).count() == 2 * nHi)
    // a FRESH checkpoint renumbers from 0: batch 0 sweeps the previous
    // run's generations, so restarting over an existing dir never dupes
    EventStreams.fanOutBatch(batch, hi, lo, 0L)
    assert(spark.read.parquet(hi).count() == nHi)
    assert(spark.read.parquet(lo).count() == nLo)
  }

  test("flatMapGroupsWithState emits exactly the completed sessions") {
    val stream = EventStreams.completedSessions(spark,
      EventStreams.readEvents(spark, eventsDir))
    val q = stream.toDF().writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("sess_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // batch truth: gaps-and-islands sessions. Every session closed by a
    // FOLLOWING event must be emitted; a user's last session may be
    // emitted too iff its gap expired before the final watermark
    // (EventTimeTimeout flush — the state-hygiene path), so `got` sits
    // between `closed` and `all`.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("us")
    val gap = 30L * 60L * 1000000L
    val flagged = Tables.t(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag("us", 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("us") - col("prev") > gap, 1).otherwise(0))
      .withColumn("sid", sum("new_s")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sess = flagged.groupBy("user_id", "sid")
      .agg(min("us").as("start_us"), max("us").as("end_us"),
        count(lit(1)).as("n_events"))
    val last = sess.groupBy("user_id").agg(max("sid").as("maxsid"))
    def toSet(df: org.apache.spark.sql.DataFrame) = df
      .select("user_id", "start_us", "end_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val all = toSet(sess.join(last, Seq("user_id")))
    val closed = toSet(sess.join(last, Seq("user_id"))
      .filter(col("sid") =!= col("maxsid")))
    assert(closed.subsetOf(got), s"missing ${(closed -- got).size} closed sessions")
    assert(got.subsetOf(all), s"${(got -- all).size} emitted sessions not in batch truth")
    // the timeout path must actually fire: every last session whose gap
    // expired well before the final watermark has to be flushed
    val maxUs = flagged.agg(max("us")).head().getLong(0)
    val wmUs = maxUs - 10L * 60L * 1000000L // watermark delay
    val mustFlush = toSet(sess.join(last, Seq("user_id"))
      .filter(col("sid") === col("maxsid"))
      .filter(col("end_us") + gap < wmUs - 60L * 1000000L))
    assert(mustFlush.subsetOf(got),
      s"${(mustFlush -- got).size} expired open sessions never flushed by timeout")
    assert(got.nonEmpty)
  }

  test("stream-static broadcast join enriches every micro-batch row") {
    val dim = Tables.t(spark, sf, "events")
      .groupBy("user_id").agg(count(lit(1)).as("user_total"))
    val stream = EventStreams.enrichWithDim(
      EventStreams.readEvents(spark, eventsDir), dim, "user_id")
    val q = stream.select("user_id", "event_id", "user_total")
      .writeStream.format("memory").queryName("enrich_out").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("enrich_out")
    assert(got.count() == Tables.t(spark, sf, "events").count())
    // every row carries its user's dim attribute (left join, full dim)
    assert(got.filter(col("user_total").isNull).count() == 0)
    val mismatched = got.groupBy("user_id")
      .agg(count(lit(1)).as("n"), max("user_total").as("ut"))
      .filter(col("n") =!= col("ut")).count()
    assert(mismatched == 0)
  }

  test("mapGroupsWithState keeps running per-user counts") {
    val stream = EventStreams.runningUserStats(spark,
      EventStreams.readEvents(spark, eventsDir))
    val q = stream.toDF().writeStream.format("memory").queryName("state_out")
      .outputMode(OutputMode.Update).start()
    q.processAllAvailable(); q.stop()
    val finalCounts = spark.table("state_out")
      .groupBy("user_id").agg(max("n_events").as("n"))
    val batchCounts = Tables.t(spark, sf, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val joined = finalCounts.as("a")
      .join(batchCounts.as("b"), col("a.user_id") === col("b.user_id"))
      .filter(col("a.n") =!= col("b.n")).count()
    assert(joined == 0)
  }

  test("streaming corpus ingest admits each fingerprint exactly once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val out = EventStreams.corpusIngest(spark,
      mem.toDF().toDF("doc_id", "text"), 0.5)
    val q = out.toDF().writeStream.format("memory").queryName("ingest_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: two admissible docs + a low-quality one (distinct-token
      // ratio 1/6 < 0.5) that the gate must drop
      mem.addData((1L, "alpha beta gamma delta"), (2L, "one two three four"),
        (3L, "spam spam spam spam spam spam"))
      q.processAllAvailable()
      // batch 2: a cross-batch duplicate of doc 1 (different id, must be
      // refused), a new doc, and an intra-batch duplicate pair where the
      // SMALLER doc_id must win
      mem.addData((10L, "alpha beta gamma delta"), (11L, "five six seven"),
        (13L, "eight nine ten"), (12L, "eight nine ten"))
      q.processAllAvailable()
      // batch 3: same content again, including a case+whitespace variant
      // that must normalize onto batch 1's fingerprint
      mem.addData((20L, "five six seven"), (21L, "ALPHA  beta gamma delta"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ingest_out").collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L, 11L, 12L),
      rows.mkString(";"))
    assert(rows.map(_.getString(1)).distinct.length == 4)
    assert(rows.forall(_.getDouble(2) >= 0.5))
  }
}
