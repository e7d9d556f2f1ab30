package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.Tables.t

/** Retrieval-quality gate for the ANN family: the shape/determinism specs
  * prove the plans, this one proves the indexes actually FIND the
  * neighbors. Ground truth is exact brute-force cosine top-10 (s01's
  * path); recall@10 is measured over 20 query vectors on the fixture
  * embeddings (500 × 64d) at each index's documented probe settings.
  */
class RecallSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  // the cache is suite-local: the JVM-shared session's cache manager
  // substitutes InMemoryRelation into ANY later query over the same prep
  // projection, which would break PlanSpec's parquet-pushdown pins
  override def afterAll(): Unit = {
    emb.unpersist(blocking = true)
    super.afterAll()
  }

  private val K = 10
  private val NQ = 20

  private lazy val emb = Similarity.prep(t(spark, sf, "embeddings")).cache()
  private lazy val queries = emb.filter(col("vec_id") < NQ)
  private lazy val truth: Map[Long, Set[Long]] = topkSets(
    Similarity.bruteForceTopK(emb, queries, K))

  private def topkSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select(col("q_id").cast("long"), col("neighbor_id").cast("long"))
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private def recallAt10(ann: DataFrame): Double = {
    val got = topkSets(ann)
    val hits = truth.toSeq.map { case (q, ts) =>
      got.getOrElse(q, Set.empty).count(ts.contains)
    }.sum
    hits.toDouble / (truth.size * K)
  }

  test("IVF recall@10 >= 0.9 (kmeans k=8, nProbe=5)") {
    val cents = Similarity.kmeansCentroids(emb, k = 8, iters = 3)
    val r = recallAt10(Similarity.ivfTopK(emb, queries, cents, K, nProbe = 5))
    info(f"ivf recall@10 = $r%.3f")
    assert(r >= 0.9, f"IVF recall@10 $r%.3f < 0.9")
  }

  test("int8-quantized recall@10 >= 0.9 (candFactor=4)") {
    val r = recallAt10(Similarity.quantizedTopK(emb, queries, K))
    info(f"quantized recall@10 = $r%.3f")
    assert(r >= 0.9, f"quantized recall@10 $r%.3f < 0.9")
  }

  test("LSH recall@10 >= 0.9 (96 planes, 4-bit bands)") {
    val planes = emb.filter(col("vec_id") >= 100 && col("vec_id") < 196)
    val r = recallAt10(Similarity.lshTopK(emb, queries, planes, K,
      bitsPerBand = 4))
    info(f"lsh recall@10 = $r%.3f")
    assert(r >= 0.9, f"LSH recall@10 $r%.3f < 0.9")
  }
}
