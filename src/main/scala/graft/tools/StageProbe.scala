package graft.tools

import org.apache.spark.sql.functions._

/** Per-stage shuffle decomposition for one operator run — the measurement
  * behind "which exchange owns the records" claims (guide §1/§7.2). The
  * ScaleBoard prints one whole-query record count; this prints every
  * stage's shuffle read/write records + bytes so an optimization can be
  * aimed at the exchange that actually dominates.
  *
  * Usage: SPARK_GRAFT_SCALE=30 SPARK_GRAFT_CPUS=32
  *   sbt "runMain graft.tools.StageProbe d11"
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("d11")
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE", "30").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Engine.session(s"local[$cpus]", "graft-stageprobe", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, Long, Long, Long, Long, Long, Long)]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val m = si.taskMetrics
          if (m != null) rows += ((si.stageId, si.name.takeWhile(_ != '\n').take(60),
            m.shuffleReadMetrics.recordsRead, m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.recordsWritten, m.shuffleWriteMetrics.bytesWritten,
            m.inputMetrics.recordsRead, m.inputMetrics.bytesRead))
        }
      })
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    def mat(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    which match {
      case "d11" =>
        val corpus = Soak.scaleDocs(docs.filter(col("doc_id") < 250), n)
        val batch = Soak.scaleDocs(docs.filter(col("doc_id") >= 250), n)
        mat(graft.operators.Dedup.dedupIncrement(corpus, batch)): Unit
      case "d06" =>
        val d = Soak.scaleDocs(docs.filter(col("doc_id") < 150), n)
        mat(graft.operators.Dedup.resolve(d)): Unit
      case "d08" =>
        val d = Soak.scaleDocs(docs.filter(col("doc_id") < 150), n)
        mat(graft.operators.Dedup.clusters(
          graft.operators.Dedup.confirmedPairs(d))): Unit
      case q if q.startsWith("q:") =>
        // any registered bench query, at sf0.1 (table-level phase probe)
        mat(graft.SparkEntry.queries(q.drop(2))(spark, "/root/testdata/sf0.1")): Unit
      case other => sys.error(s"unknown probe $other")
    }
    Checkpoints.sweep()
    println(f"${"stage"}%6s ${"read_recs"}%12s ${"read_MB"}%9s " +
      f"${"write_recs"}%12s ${"write_MB"}%9s ${"scan_recs"}%12s ${"scan_MB"}%9s  name")
    rows.sortBy(_._1).foreach { case (id, name, rr, rb, wr, wb, ir, ib) =>
      if (rr > 0 || wr > 0 || ir > 0)
        println(f"$id%6d $rr%12d ${rb / 1e6}%9.1f $wr%12d ${wb / 1e6}%9.1f " +
          f"$ir%12d ${ib / 1e6}%9.1f  $name")
    }
    val totR = rows.map(_._3).sum
    val totI = rows.map(_._7).sum
    println(f"[probe] total shuffle records read: ${totR / 1e6}%.2fM " +
      f"across ${rows.size} stages; total scan records: ${totI / 1e6}%.2fM " +
      f"(${rows.map(_._8).sum / 1e6}%.1f MB)")
    spark.stop()
  }
}
