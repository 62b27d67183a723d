package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("bruteTopK returns the exact nearest neighbors on a known example") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteTopK(vecs.filter($"vec_id" === 0L), vecs,
        "vec_id", "embedding", 2)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L)) // closest then orthogonal
    assert(out.map(_.getLong(3)).toSeq == Seq(1L, 2L))
  }

  test("ivfTopK probes nearest cells and achieves useful recall") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter($"vec_id" < 10)
    val brute = Similarity.bruteTopK(q, e, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(q, e, "vec_id", "embedding", 5, nCentroids = 16, nProbe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.size == 50)
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall=$recall")
  }

  test("lshTopK achieves high recall vs brute force on real embeddings") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter($"vec_id" < 10)
    val brute = Similarity.bruteTopK(q, e, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(q, e, "vec_id", "embedding", 5, tables = 8, planes = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall=$recall") // approximate, but far above chance
    assert(lsh.size == 50) // k results for every query
  }
}
