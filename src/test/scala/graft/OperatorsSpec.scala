package graft

import graft.operators.{Dedup, MatchPath, Multimodal, Similarity}
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("minhash LSH finds near-duplicates, skips unrelated docs") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 38).map(i => s"w$i").mkString(" ") + " x1 x2"
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val pairs = Dedup.minhashPairs(docs(0L -> base, 1L -> nearDup, 2L -> other),
      minEstJaccard = 0.3).collect()
    assert(pairs.exists(r => r.getLong(0) == 0L && r.getLong(1) == 1L))
    assert(!pairs.exists(r => r.getLong(1) == 2L))
  }

  test("simhash: identical docs at hamming 0, unrelated docs far apart") {
    val a = (1 to 40).map(i => s"w$i").mkString(" ")
    val b = (100 to 140).map(i => s"v$i").mkString(" ")
    val sig = Dedup.simhash(docs(0L -> a, 1L -> a, 2L -> b))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(0L) == sig(1L))
    assert(java.lang.Long.bitCount(sig(0L) ^ sig(2L)) > 10)
  }

  test("brute-force cosine top-k: identical vector ranks first") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.001f, 0.0f)),   // near-copy of 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val e = Similarity.prep(emb)
    val top = Similarity.bruteForceTopK(e, e.filter($"vec_id" === 0), k = 2).collect()
    assert(top.head.getLong(1) == 1L && top.head.getLong(3) == 1L)
  }

  test("IVF ANN returns the brute-force top result when probing its cluster") {
    val emb = Similarity.prep(Tables.t(spark, sf, "embeddings"))
    val q = emb.filter($"vec_id" < 3)
    val cents = emb.filter($"vec_id" < 8)
    val brute = Similarity.bruteForceTopK(emb, q, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Similarity.ivfTopK(emb, q, cents, k = 5, nProbe = 3).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // recall@5 with 3 probes should usually contain the true top-1; assert
    // at least one query achieves it (heuristic index, not exact)
    assert(brute.exists { case (qid, nn) => ivf(qid).contains(nn) })
  }

  test("matchPath finds ordered symbol sequences per partition") {
    val ev = Seq(
      (1L, 1L, "click"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      (1L, 4L, "view"), (2L, 5L, "purchase"), (2L, 6L, "click")
    ).toDF("user_id", "event_id", "ts_ord")
      .withColumnRenamed("ts_ord", "event_type")
    val m = MatchPath.matchPath(spark, ev,
      col("user_id"), col("event_id"), col("event_id"),
      Seq('c' -> (col("event_type") === "click"),
        'p' -> (col("event_type") === "purchase")), "c+p")
      .collect()
    assert(m.length == 1)
    assert(m.head.getString(0) == "1" && m.head.getString(3) == "ccp")
  }

  test("dedup operators tolerate empty and single-token inputs") {
    val edge = docs(0L -> "", 1L -> "one", 2L -> "a b c d e")
    // shingle width 3: docs 0 and 1 are too short and simply drop out
    assert(Dedup.minhashPairs(edge, minEstJaccard = 0.0).collect().length == 0)
    val sigs = Dedup.simhash(edge).collect()
    assert(sigs.map(_.getLong(0)).toSet == Set(2L))
  }

  test("salted join with saltFactor=1 degenerates to the plain join") {
    val l = Tables.t(spark, sf, "lineitem").limit(500)
    val o = Tables.t(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    val salted = graft.operators.Salt
      .saltedEquiJoin(l, o, "l_orderkey", "o_orderkey", col("l_partkey"), 1)
      .count()
    val plain = l.join(o, l("l_orderkey") === o("o_orderkey")).count()
    assert(salted == plain)
  }

  test("matchPath yields nothing when no symbols match") {
    val ev = Seq((1L, 1L, "view"), (1L, 2L, "view"))
      .toDF("user_id", "event_id", "event_type")
    val m = MatchPath.matchPath(spark, ev,
      col("user_id"), col("event_id"), col("event_id"),
      Seq('c' -> (col("event_type") === "click")), "c+").collect()
    assert(m.isEmpty)
  }

  test("bruteForceTopK with k larger than corpus returns all neighbors ranked") {
    val emb = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)), (2L, Array(1f, 1f)))
      .toDF("vec_id", "embedding")
    val e = Similarity.prep(emb)
    val top = Similarity.bruteForceTopK(e, e.filter($"vec_id" === 0), k = 99).collect()
    assert(top.length == 2)
    assert(top.map(_.getLong(3)).toSeq.sorted == Seq(1L, 2L))
  }

  test("multimodal featurize is deterministic with declared shape") {
    val media = Multimodal.asMedia(Tables.t(spark, sf, "documents").limit(50))
    val f1 = Multimodal.featurize(spark, media).collect().sortBy(_.doc_id)
    val f2 = Multimodal.featurize(spark, media).collect().sortBy(_.doc_id)
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    assert(f1.forall(_.feature.length == 16))
    assert(f1.forall(r => r.n_bytes > 0))
  }
}
