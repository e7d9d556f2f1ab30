package graft

import graft.operators.{Dedup, Similarity}
import graft.tools.Checkpoints
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Round-6 pins: the self-join double-scan is gone (dedup confirm chain and
  * embedding near-dup read a checkpoint, not a second corpus scan), variable
  * substitution matches the reference's VariableSubstitution semantics, and
  * concurrent multi-insert statements keep separate shared-scan views.
  */
class Round6Spec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("confirmedPairs scans the corpus once — join sides read the checkpoint") {
    val docs = Tables.t(spark, sf, "documents")
    val pairs = Dedup.confirmedPairs(docs)
    // the one parquet scan happened while materializing the token-set
    // checkpoint; the returned plan (band self-join + two tset joins) must
    // hold NO parquet scan — every leg reads the checkpointed RDDs
    val plan = planOf(pairs)
    assert(!plan.contains("Scan parquet"), plan)
    assert(pairs.columns.toSeq == Seq("da", "db"))
    pairs.limit(1).collect()
    Checkpoints.sweep()
  }

  test("neardupIVF scans embeddings once — assignment is checkpointed") {
    val emb = Similarity.prep(Tables.t(spark, sf, "embeddings"))
    val cent = emb.orderBy("vec_id").limit(5)
    val nd = Similarity.neardupIVF(emb, cent, 0.9)
    val plan = planOf(nd)
    assert(!plan.contains("Scan parquet"), plan)
    nd.limit(1).collect()
    Checkpoints.sweep()
  }

  test("variable substitution: namespaced, bare, nested, unknown-verbatim") {
    assert(Engine.substitute("a=${hivevar:x} b=${x} c=${y}", Map("x" -> "1"))
      == "a=1 b=1 c=${y}")
    assert(Engine.substitute("${a}", Map("a" -> "${b}", "b" -> "7")) == "7")
    assert(Engine.substitute("no vars here", Map("x" -> "1")) == "no vars here")
    // self-referencing definition must terminate (fixpoint/40-pass cap)
    assert(Engine.substitute("${a}", Map("a" -> "${a}")) == "${a}")
  }

  test("script: SET hivevar/hiveconf define in-script vars; caller seeds them") {
    val df = Engine.script(spark, sf,
      """SET hivevar:maxkey=5;
        |SET hiveconf:nm=n_name;
        |SELECT n_nationkey, ${hiveconf:nm} FROM nation
        |WHERE n_nationkey < ${maxkey};""".stripMargin)
    assert(df.columns.toSeq == Seq("n_nationkey", "n_name"))
    assert(df.count() == 5)
    // caller-seeded vars (the CLI's -d/--hivevar equivalent)
    assert(Engine.script(spark, sf,
      "SELECT n_nationkey FROM nation WHERE n_nationkey < ${hivevar:k};",
      vars = Map("k" -> "3")).count() == 3)
    // plain SET (no namespace) still reaches Spark as a conf statement
    Engine.script(spark, sf, "SET spark.sql.cbo.enabled=true;")
    assert(spark.conf.get("spark.sql.cbo.enabled") == "true")
  }

  test("script: SOURCE inlines a file; its variable definitions persist") {
    val inner = java.nio.file.Files.createTempFile("graft_src", ".sql")
    java.nio.file.Files.writeString(inner,
      "SET hivevar:cap=4;\nSELECT n_name FROM nation WHERE n_nationkey < 2;")
    // sourced SELECT runs (becomes `last` unless the outer script follows
    // up), and hivevar:cap defined INSIDE the file scopes the outer query
    val df = Engine.script(spark, sf,
      s"SOURCE ${inner.toString};\n" +
        "SELECT n_nationkey FROM nation WHERE n_nationkey < ${cap};")
    assert(df.count() == 4)
    // quoted path form; the sourced statement is the script's last
    val df2 = Engine.script(spark, sf, s"SOURCE '${inner.toString}';")
    assert(df2.count() == 2)
    // ADD FILE / LIST FILES pass through to Spark's resource commands
    val res = java.nio.file.Files.createTempFile("graft_res", ".txt")
    Engine.script(spark, sf, s"ADD FILE ${res.toString};")
    val listed = Engine.script(spark, sf, "LIST FILES;")
      .collect().map(_.getString(0))
    assert(listed.exists(_.contains(res.getFileName.toString)), listed.mkString(","))
  }

  test("concurrent multi-insert statements keep separate shared-scan views") {
    for (i <- 1 to 2) {
      spark.sql(s"DROP TABLE IF EXISTS g_mi_conc_$i")
      spark.sql(s"CREATE TABLE g_mi_conc_$i (k BIGINT, n BIGINT) USING parquet")
    }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { i =>
      new Thread(() => {
        try Engine.sql(spark, sf,
          s"""FROM orders
              INSERT OVERWRITE TABLE g_mi_conc_$i
                SELECT o_orderkey, count(*) GROUP BY o_orderkey""")
        catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errs.isEmpty, errs)
    val n1 = spark.table("g_mi_conc_1").count()
    assert(n1 > 0 && n1 == spark.table("g_mi_conc_2").count())
    // no shared-scan view leaked
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("graft_mi_src")))
  }

  test("splitStatements: literal-, escape- and comment-aware") {
    assert(Engine.splitStatements("a; b;\n c") == Seq("a", "b", "c"))
    // semicolons inside single/double/backtick literals survive, even
    // across lines; backslash-escaped quotes don't close the literal
    assert(Engine.splitStatements("select 'x;\ny'; select \"a;b\"")
      == Seq("select 'x;\ny'", "select \"a;b\""))
    assert(Engine.splitStatements("select 'don\\'t; stop'; next")
      == Seq("select 'don\\'t; stop'", "next"))
    assert(Engine.splitStatements("select `a;b` from t") == Seq("select `a;b` from t"))
    // `;` inside a -- comment doesn't split; pure-comment segments drop
    assert(Engine.splitStatements("select 1 -- trailing; note\n; select 2")
      == Seq("select 1 -- trailing; note", "select 2"))
    assert(Engine.splitStatements("-- only a comment\n; select 2") == Seq("select 2"))
  }

  test("script: multi-line string literal containing ';' survives the split") {
    val df = Engine.script(spark, sf,
      "SELECT 'a;\nb' AS s, n_nationkey FROM nation WHERE n_nationkey < 2;\n" +
        "SELECT n_nationkey FROM nation WHERE n_nationkey < 3;")
    assert(df.count() == 3)
  }

  test("DROP PARTITION comparators mirror drop_partitions_filter.q") {
    val base = tools.Tmp.dir("dpf_spec")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    spark.sql("DROP TABLE IF EXISTS graft_tmp.dpf_spec_t")
    new java.io.File(base + "/t").mkdirs()
    spark.sql(s"""CREATE TABLE graft_tmp.dpf_spec_t (a INT)
                 USING parquet PARTITIONED BY (c STRING, d STRING) LOCATION '$base/t'""")
    for ((c, dd) <- Seq("US" -> 1, "US" -> 2, "Uganda" -> 2, "Germany" -> 2,
        "Canada" -> 3, "Russia" -> 3, "Greece" -> 2, "India" -> 3, "France" -> 4))
      Engine.ddl(spark,
        s"ALTER TABLE graft_tmp.dpf_spec_t ADD PARTITION (c='$c', d='$dd')")
    def partsLeft: Set[String] =
      spark.sql("SHOW PARTITIONS graft_tmp.dpf_spec_t")
        .collect().map(_.getString(0)).toSet
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.dpf_spec_t DROP PARTITION (c='US', d<'2')")
    assert(!partsLeft.contains("c=US/d=1") && partsLeft.contains("c=US/d=2"))
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.dpf_spec_t DROP PARTITION (c>='US', d<='2')")
    assert(!partsLeft.contains("c=US/d=2") && !partsLeft.contains("c=Uganda/d=2"))
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.dpf_spec_t DROP PARTITION (c>'India')")
    assert(!partsLeft.contains("c=Russia/d=3"))
    Engine.ddl(spark,
      """ALTER TABLE graft_tmp.dpf_spec_t DROP PARTITION (c>='India'),
         PARTITION (c='Greece', d='2')""")
    assert(!partsLeft.contains("c=India/d=3") && !partsLeft.contains("c=Greece/d=2"))
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.dpf_spec_t DROP PARTITION (c != 'France')")
    assert(partsLeft == Set("c=France/d=4"))
    // no match without IF EXISTS = error (ignorenonexistent=false parity).
    // Exact specs ride Spark's native command (NoSuchPartitionsException);
    // comparator specs go through the filter path (RuntimeException).
    intercept[Exception] {
      Engine.ddl(spark, "ALTER TABLE graft_tmp.dpf_spec_t DROP PARTITION (c='US')")
    }
    intercept[RuntimeException] {
      Engine.ddl(spark, "ALTER TABLE graft_tmp.dpf_spec_t DROP PARTITION (c<'Aa')")
    }
    // with IF EXISTS: silent
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.dpf_spec_t DROP IF EXISTS PARTITION (c='US')")
    assert(partsLeft == Set("c=France/d=4"))
  }

  test("RENAME PARTITION passes through natively") {
    val base = tools.Tmp.dir("renp_spec")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    spark.sql("DROP TABLE IF EXISTS graft_tmp.renp_t")
    new java.io.File(base + "/t").mkdirs()
    spark.sql(s"""CREATE TABLE graft_tmp.renp_t (a INT)
                 USING parquet PARTITIONED BY (p INT) LOCATION '$base/t'""")
    spark.sql("INSERT INTO graft_tmp.renp_t PARTITION (p=1) VALUES (10), (20)")
    Engine.ddl(spark,
      "ALTER TABLE graft_tmp.renp_t PARTITION (p=1) RENAME TO PARTITION (p=9)")
    val parts = spark.sql("SHOW PARTITIONS graft_tmp.renp_t")
      .collect().map(_.getString(0)).toSet
    assert(parts == Set("p=9"))
    assert(spark.table("graft_tmp.renp_t").filter(col("p") === 9).count() == 2)
  }

  test("sharedSpanPairs: finds the quoted span, drops boilerplate, one scan") {
    import spark.implicits._
    val quote = (1 to 10).map("q" + _).mkString(" ")
    val boiler = (1 to 10).map("b" + _).mkString(" ")
    val docs = (Seq(
      0L -> s"alpha beta $quote gamma",
      1L -> s"$quote delta epsilon zeta eta theta iota kappa") ++
      (2L to 30L).map(i => i -> s"$boiler unique$i")).toDF("doc_id", "text")
    val pairs = Dedup.sharedSpanPairs(docs, n = 10, maxDf = 20)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the 29-doc boilerplate header is over the df cap — no pair from it;
    // the quoted span yields exactly (0,1) sharing one surviving gram
    assert(got.toSet == Set((0L, 1L, 1L)), got.mkString(","))
    Checkpoints.sweep()
    // plan shape on the real table: the gram table is checkpointed, so the
    // df-filter leg and both self-join legs read it — no parquet rescans
    val plan = planOf(Dedup.sharedSpanPairs(
      Tables.t(spark, sf, "documents"), n = 10))
    assert(!plan.contains("Scan parquet"), plan)
    Checkpoints.sweep()
  }

  test("dedupIncrement: drops batch near-dups of the corpus, keeps novel docs") {
    import spark.implicits._
    val base = (0L to 9L).map(i => i -> (1 to 40).map(t => s"w${i}_$t").mkString(" "))
    val corpus = base.toDF("doc_id", "text")
    val batch = Seq(
      100L -> base(3)._2, // exact copy of corpus doc 3 → jac 1.0, dropped
      101L -> ((1 to 40).map(t => s"w0_$t").mkString(" ") + " extra1 extra2"),
      // 40/42 = 0.952 vs corpus doc 0 → dropped
      102L -> (1 to 40).map(t => s"z$t").mkString(" ") // novel → kept
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupIncrement(corpus, batch).collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(102L), kept.mkString(","))
    Checkpoints.sweep()
    // corpus AND batch parquet are each scanned once (checkpoint build);
    // the returned plan reads only checkpointed RDDs
    val docs = Tables.t(spark, sf, "documents")
    val plan = planOf(Dedup.dedupIncrement(
      docs.filter(col("doc_id") < 250), docs.filter(col("doc_id") >= 250)))
    assert(!plan.contains("Scan parquet"), plan)
    Checkpoints.sweep()
  }

  test("dedupIncrement edges: empty batch, empty corpus, empty-text docs") {
    import spark.implicits._
    val corpus = Seq(1L -> "a b c d e f g h").toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // empty batch → empty result; empty corpus → whole batch kept
    assert(Dedup.dedupIncrement(corpus, empty).count() == 0)
    assert(Dedup.dedupIncrement(empty, corpus).collect().map(_.getLong(0)).toSeq
      == Seq(1L))
    // an empty-text batch doc has a one-token ("") set: never a near-dup
    // of real text, still present in the output
    val batch = Seq(10L -> "", 11L -> "a b c d e f g h").toDF("doc_id", "text")
    val kept = Dedup.dedupIncrement(corpus, batch).collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L), kept.mkString(","))
    Checkpoints.sweep()
  }

  test("lshTopK: reranked sims are exact, ordered, and overlap brute force") {
    val e = Similarity.prep(Tables.t(spark, sf, "embeddings"))
    val qs = e.filter(col("vec_id") < 5)
    val planes = e.filter(col("vec_id") >= 8 && col("vec_id") < 24)
    val got = Similarity.lshTopK(e, qs, planes, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.nonEmpty)
    // per query: rn consecutive from 1, sims non-increasing
    got.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to sorted.length).toSeq, s"q=$q rns")
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sortBy(-_).toSeq, s"q=$q order")
    }
    // rerank exactness: reported sim equals the exact cosine of the pair
    val embMap = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.lazyZip(b).map(_ * _).sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    got.foreach { case (q, n, sim, _) =>
      assert(math.abs(sim - cos(embMap(q), embMap(n))) < 1e-4, s"($q,$n)")
    }
    // candidates come from bucket collisions — overlap with the exact
    // brute-force top-5 must be non-trivial on this data
    val exact = Similarity.bruteForceTopK(e, qs, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = got.map(t => (t._1, t._2)).count(exact.contains)
    assert(overlap > 0, s"no overlap with brute force (got ${got.length} rows)")
  }

  test("persisted MinHash band index: partition-pruned reads per band") {
    // the incremental-dedup scale story made concrete: the corpus
    // signature/band table is written ONCE partitioned by band; an
    // increment probing one band must read only that band's directory
    val docs = Tables.t(spark, sf, "documents").filter(col("doc_id") < 100)
    val tsets = docs.select(col("doc_id"),
      expr("array_distinct(transform(split(text, ' '), t -> xxhash64(t)))")
        .as("tset"))
    val sig = Dedup.minhashSignatures(
      tsets.select(col("doc_id"), explode(col("tset")).as("shingle")), 64)
    val bandCols = (0 until 16).map { b =>
      struct(lit(b).as("band"),
        hash((b * 4 until (b + 1) * 4).map(i => col(s"mh$i")): _*).as("bh"))
    }
    val banded = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val idx = tools.Tmp.dir("lsh_idx")
    banded.write.partitionBy("band").mode("overwrite").parquet(idx)
    val probe = spark.read.parquet(idx).filter(col("band") === 3)
    val plan = probe.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: [isnotnull(band"), plan)
    assert(probe.count() == 100) // one row per doc in the probed band
    // on-disk layout really is one directory per band
    val dirs = new java.io.File(idx).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("band=")).sorted
    assert(dirs.length == 16, dirs.mkString(","))
  }

  test("lshTopK/tfidf plan shapes: broadcast joins, no cartesian product") {
    val e = Similarity.prep(Tables.t(spark, sf, "embeddings"))
    val lsh = Similarity.lshTopK(e, e.filter(col("vec_id") < 5),
      planes = e.filter(col("vec_id") >= 8 && col("vec_id") < 24), k = 5)
    val lshPlan = planOf(lsh)
    // candidates come from the (band, bucket) equi-join with the query
    // side broadcast — an all-pairs fallback would surface as a cartesian
    assert(lshPlan.contains("BroadcastHashJoin"), lshPlan)
    assert(!lshPlan.contains("CartesianProduct"), lshPlan)
    // vocab build: the top-20 cut is a distributed TakeOrderedAndProject
    // (never a full-vocabulary single-partition sort) and the checkpointed
    // vocabulary aggregate means the corpus parquet is scanned once
    val vocab = Registry.byName("t12_vocab_build").fn(spark, sf)
    val vPlan = planOf(vocab)
    assert(vPlan.contains("TakeOrderedAndProject"), vPlan)
    assert(!vPlan.contains("Scan parquet"), vPlan)
    vocab.limit(1).collect()
    Checkpoints.sweep()
    val tfidf = Registry.byName("t13_tfidf_keywords").fn(spark, sf)
    val tfPlan = planOf(tfidf)
    // vocabulary-sized df broadcasts onto tf (hash join); the 1-row doc
    // count rides a broadcast nested loop, never a cartesian shuffle
    assert(tfPlan.contains("BroadcastHashJoin"), tfPlan)
    assert(!tfPlan.contains("CartesianProduct"), tfPlan)
  }

  test("WAV: synth → parse round trip, odd-chunk padding, unknown payload") {
    // closed-form round trip (doc 7: 2ch, 16 kHz, 16-bit, 70 samples)
    assert(operators.Multimodal.parseWav(operators.Multimodal.wavBytes(7L))
      .contains((2, 16000L, 16, 70L)))
    assert(operators.Multimodal.parseWav(operators.Multimodal.wavBytes(0L))
      .contains((1, 8000L, 16, 0L)))
    // an odd-length chunk before fmt must be skipped with RIFF even-padding
    val bb = java.nio.ByteBuffer.allocate(12 + 8 + 4 + 24 + 8 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(0).put("WAVE".getBytes("US-ASCII"))
    bb.put("LIST".getBytes("US-ASCII")).putInt(3).put(Array[Byte](1, 2, 3, 0))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(44100).putInt(88200).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(8)
    assert(operators.Multimodal.parseWav(bb.array()).contains((1, 44100L, 16, 4L)))
    assert(operators.Multimodal.parseWav("not a wav at all".getBytes).isEmpty)
  }

  test("UPDATE/DELETE without WHERE rewrite every row") {
    val base = tools.Tmp.dir("nw_spec")
    Tables.t(spark, sf, "nation").select("n_nationkey", "n_name")
      .write.parquet(base + "/t")
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    spark.sql("DROP TABLE IF EXISTS graft_tmp.nw_spec_t")
    spark.sql(s"""CREATE TABLE graft_tmp.nw_spec_t (n_nationkey INT, n_name STRING)
                 USING parquet LOCATION '$base/t'""")
    Engine.ddl(spark, "UPDATE graft_tmp.nw_spec_t SET n_name = upper(n_name)")
    val t = spark.table("graft_tmp.nw_spec_t")
    assert(t.filter(col("n_name") =!= upper(col("n_name"))).count() == 0)
    assert(t.count() == 25)
    Engine.ddl(spark, "DELETE FROM graft_tmp.nw_spec_t")
    assert(spark.table("graft_tmp.nw_spec_t").count() == 0)
  }
}
