package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming surface. The reference has no continuous engine — its only
  * streaming is the hcatalog micro-batch ingest API (SURVEY.md §2.10:
  * HiveEndPoint/TransactionBatch appending into tables). `ingest` is that
  * capability on Structured Streaming; the windowed/sessionized/stateful
  * transforms are the new-capability extension for the events table.
  *
  * Scale: all operators here are keyed-state streaming aggregations —
  * state is partitioned by group key across executors, watermarks bound
  * state size, and sinks are exactly-once via checkpointing.
  */
object EventStreams {

  /** Schema-stable streaming read of an events directory. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchSchema = spark.read.parquet(dir).schema
    val raw = spark.readStream.schema(batchSchema).parquet(dir)
    // integer `div` — see Tables.t: float division loses µs precision
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Micro-batch append ingest (HiveEndPoint/TransactionBatch parity):
    * stream a source directory into a parquet table with checkpointed
    * exactly-once batches.
    */
  def ingest(spark: SparkSession, srcDir: String, sinkDir: String,
             checkpointDir: String): StreamingQuery =
    readEvents(spark, srcDir).writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Tumbling event-time window with watermark (bounds state). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_value"))

  /** Session windows keyed by user with a 30-minute gap. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))

  /** Stream-stream join: clicks joined to the same user's purchases within
    * one hour (event-time range condition). Both sides carry watermarks so
    * join state is bounded; Spark co-partitions both streams on user_id.
    */
  def clickToPurchase(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Streaming multi-sink fan-out via foreachBatch: each micro-batch is
    * routed through the batch MultiInsert operator (one cached pass, N
    * sinks) — the streaming face of Hive's multi-insert.
    *
    * Idempotent under at-least-once replay: foreachBatch may re-deliver a
    * batch whose sink write completed but whose checkpoint commit did not.
    * Each batch therefore lands in its own `batch_id=<id>` subdirectory
    * with OVERWRITE — a replay rewrites the same subdirectory instead of
    * appending a duplicate copy. Readers see the union transparently via
    * parquet partition discovery (`spark.read.parquet(dir)` — the extra
    * `batch_id` partition column identifies provenance).
    */
  def fanOutStream(events: DataFrame, highDir: String, lowDir: String,
                   checkpointDir: String): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        fanOutBatch(batch.toDF(), highDir, lowDir, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** One fan-out micro-batch write — exposed so replay idempotency is
    * testable (calling twice with the same batchId must be a no-op).
    *
    * Batch 0 first clears any stale `batch_id=*` subdirectories: a stream
    * restarted with a FRESH checkpoint over an existing output directory
    * renumbers from 0, and without the sweep the previous run's batches
    * would survive alongside the new ones (every row duplicated). Replay
    * of batch 0 within one checkpoint lineage is still idempotent — a
    * replayed 0 means no later batch committed, so the sweep only ever
    * removes dead generations.
    */
  private[graft] def fanOutBatch(batch: DataFrame, highDir: String,
                                 lowDir: String, batchId: Long): Unit = {
    if (batchId == 0) {
      val hconf = batch.sparkSession.sessionState.newHadoopConf()
      Seq(highDir, lowDir).foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        val fs = p.getFileSystem(hconf)
        if (fs.exists(p))
          Option(fs.listStatus(p)).toSeq.flatten
            .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch_id="))
            .foreach(st => fs.delete(st.getPath, true))
      }
    }
    graft.operators.MultiInsert.fanOut(batch, Seq(
      s"$highDir/batch_id=$batchId" -> ((df: DataFrame) => df.filter(col("value") > 10)),
      s"$lowDir/batch_id=$batchId" -> ((df: DataFrame) => df.filter(col("value") <= 10))))
  }

  /** Streaming upsert sink: every micro-batch MERGEs into a copy-on-write
    * parquet table — the CDC-into-lakehouse pattern. Each batch is first
    * reduced to one row per key (latest by `ordCol`) to satisfy MERGE's
    * unique-source-key precondition; `Acid.mergeInto` then rewrites only
    * the files containing matched keys. Exactly-once: the checkpoint
    * replays at-least-once and the per-key merge is idempotent for a
    * given batch, so replayed batches converge to the same table.
    */
  def upsertStream(updates: DataFrame, tableDir: String, keys: Seq[String],
                   setFromSource: Seq[String], ordCol: String,
                   checkpointDir: String): StreamingQuery =
    updates.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // deterministic tiebreak after ordCol: equal-timestamp updates for
        // one key must pick the SAME row on a replayed batch or the
        // at-least-once replay would not converge to the same table
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*)
          .orderBy((col(ordCol).desc +:
            setFromSource.map(c => col(c).desc)): _*)
        val latest = batch.toDF().withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        // Bootstrap check must go through the Hadoop FileSystem (like
        // Acid.swapIn) — java.io.File only answers for local paths, and on
        // HDFS/S3 it would say "missing" forever, making every batch
        // overwrite the table instead of merging.
        val hconf = batch.sparkSession.sessionState.newHadoopConf()
        val p = new org.apache.hadoop.fs.Path(tableDir)
        if (!p.getFileSystem(hconf).exists(p))
          latest.write.mode("overwrite").parquet(tableDir) // bootstrap batch
        else
          graft.operators.Acid.mergeInto(batch.sparkSession, tableDir,
            latest, keys, setFromSource)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming exact-dedup: watermark-bounded state keyed on the dedup
    * columns (the streaming face of the batch keep-first dedup q61).
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Long)
  case class SessState(start_us: Long, last_us: Long, n: Long)

  /** Completed-session emission via flatMapGroupsWithState — the custom
    * sessionizer `session_window` can't express: a session row is emitted
    * exactly once, when its gap closes (the next event for the user
    * arrives more than `gapMinutes` later); the open session stays in
    * keyed state across micro-batches. The Append-mode variable-arity
    * output (0..n completed sessions per key per batch) is what
    * distinguishes flatMapGroupsWithState from mapGroupsWithState
    * (`runningUserStats` above).
    *
    * Scale: state is one (start, last, n) triple per active user,
    * partitioned by user_id across executors; events are sorted per
    * key per batch only (micro-batch-sized, never global). The
    * watermark + EventTimeTimeout pair is what bounds state for the
    * long tail of churned users: when the watermark passes a session's
    * gap expiry the open session is flushed and its state removed —
    * without it every user who ever appeared would pin state forever
    * and their final session would never be emitted.
    */
  def completedSessions(spark: SparkSession, events: DataFrame,
                        gapMinutes: Int = 30): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    // the watermarked TIMESTAMP column itself must reach the stateful
    // operator (its event-time tag does not survive a unix_micros
    // projection); micros conversion happens inside the function
    events.select(col("user_id"), col("ts"))
      .withWatermark("ts", "10 minutes")
      .as[(Long, java.time.Instant)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[(Long, java.time.Instant)], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // gap expired with no new events — the open session is complete
            val out = state.getOption
              .map(s => SessionOut(uid, s.start_us, s.last_us, s.n)).iterator
            state.remove()
            out
          } else {
            val out = Seq.newBuilder[SessionOut]
            var st = state.getOption
            rows.map(p => p._2.getEpochSecond * 1000000L + p._2.getNano / 1000L)
              .toArray.sorted.foreach { t =>
              st match {
                case Some(s) if t - s.last_us > gapUs =>
                  out += SessionOut(uid, s.start_us, s.last_us, s.n)
                  st = Some(SessState(t, t, 1L))
                case Some(s) =>
                  // a late cross-batch event (t inside the current session
                  // but older than its last) must never move the session
                  // boundary backwards
                  st = Some(SessState(math.min(s.start_us, t),
                    math.max(s.last_us, t), s.n + 1))
                case None =>
                  st = Some(SessState(t, t, 1L))
              }
            }
            st.foreach { s =>
              state.update(s)
              // flush + expire once the watermark passes the gap end
              state.setTimeoutTimestamp(s.last_us / 1000L + gapMinutes * 60000L)
            }
            out.result().iterator
          }
      }
  }

  /** Stream-static enrichment: each micro-batch joins the static
    * dimension with no streaming state at all (the dimension is re-read
    * per batch, so slowly-changing dims pick up updates between batches).
    * Broadcast keeps the stream side shuffle-free — the standard
    * fact-stream × dim-table shape.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  case class UserEvent(user_id: Long, event_type: String)
  case class UserStat(user_id: Long, n_events: Long, last_type: String)

  /** Arbitrary stateful processing (mapGroupsWithState): running per-user
    * event count + last event type, emitted each micro-batch.
    *
    * State is one small record per DISTINCT user and never expires —
    * that is the operator's contract (a lifetime counter loses data if
    * evicted), identical to a streaming `groupBy(user).count()`. If the
    * key space is open-ended (e.g. anonymous session ids), wrap with
    * ProcessingTimeTimeout idle eviction instead, like completedSessions
    * does with EventTimeTimeout.
    */
  def runningUserStats(spark: SparkSession, events: DataFrame): Dataset[UserStat] = {
    import spark.implicits._
    events.select(col("user_id"), col("event_type")).as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[UserEvent], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(uid, 0L, ""))
          val next = evs.foldLeft(prev)((st, e) => UserStat(uid, st.n_events + 1, e.event_type))
          state.update(next)
          next
      }
  }

  case class IngestedDoc(doc_id: Long, fp: String, quality: Double)

  /** Streaming corpus ingestion — the continuous-crawl front door of the
    * batch pipeline suite: a document stream is quality-gated (distinct-
    * token ratio, the t02/t11 scorer) and deduplicated against EVERY
    * previously admitted fingerprint, not just a watermark window: the
    * first arrival of a fingerprint is admitted exactly once, later
    * copies are dropped forever — `dropDuplicatesWithinWatermark` cannot
    * express unbounded first-wins, so this is flatMapGroupsWithState
    * with one Boolean per admitted fingerprint.
    *
    * Scale: state is 16 bytes of md5 key + a Boolean per DISTINCT
    * admitted document, hash-partitioned across executors — the same
    * budget a batch exact-dedup's shuffle would use, amortized over the
    * stream's lifetime (with RocksDB state store off-heaping it in
    * production). Within a micro-batch the winner is the smallest
    * doc_id, so replays are deterministic.
    */
  def corpusIngest(spark: SparkSession, docs: DataFrame,
                   minQuality: Double = 0.5): Dataset[IngestedDoc] = {
    import spark.implicits._
    docs
      .withColumn("fp", md5(regexp_replace(lower(col("text")), "\\s+", " ")))
      .withColumn("quality",
        size(array_distinct(split(col("text"), " "))) /
          size(split(col("text"), " ")).cast("double"))
      .filter(col("quality") >= minQuality)
      .select(col("doc_id").cast("long"), col("fp"), col("quality"))
      .as[(Long, String, Double)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (fp: String, rows: Iterator[(Long, String, Double)],
         state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val first = rows.minBy(_._1)
            Iterator.single(IngestedDoc(first._1, fp, first._3))
          }
      }
  }
}
