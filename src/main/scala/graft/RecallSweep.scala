package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

import graft.engine.GraftSession
import graft.operators.{Dedup, Similarity}

/** Developer diagnostic for the ANN recall claims (bench/SCALING_r19.md)
  * — the measurement loop behind a12/a13: aggregate recall@k of each
  * approximate path against exact brute force, swept over the knobs a
  * deployment actually turns. Two sweeps:
  *
  *  1. quantization grid: plain `ivfpq` at several (m, kCodes) — the
  *     knob that needs a full re-encode (an index re-land) to turn;
  *  2. refine factor: `ivfpq_refine` at refine ∈ {2, 4, 8, 16} over the
  *     CHEAPEST quantization — the knob that needs nothing re-landed
  *     (the a12/a13 point: the pool grows per query, the index stands).
  *
  * `runMain graft.RecallSweep <embsDir> [queryN] [k]`
  *
  * Prints one JSON line per row: method, params, recall (mean n_hit/k
  * over the sampled queries). nCentroids follows the corpus
  * ([[Dedup.ivfCellsFor]]) and nProbe = 4 everywhere — the a10/st14
  * production settings — so the rows isolate the compression knobs.
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RecallSweep <embsDir> [queryN] [k]")
    val embsDir = args(0)
    val queryN = if (args.length > 1) args(1).toInt else 50
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.local()
    val embs = graft.sources.Tables.embeddings(spark, embsDir)
      .select("vec_id", "embedding").localCheckpoint()
    val n = embs.count()
    val nCents = Dedup.ivfCellsFor(n)
    val queries = embs.filter(col("vec_id") < queryN)
    val nQ = queries.count()
    def hitSet(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = hitSet(Similarity.bruteTopK(queries, embs, "vec_id", "embedding", k))
    def recall(appr: Set[(Long, Long)]): Double =
      (exact & appr).size.toDouble / (nQ * k)
    def row(method: String, params: String, t0: Long, appr: Set[(Long, Long)]): Unit =
      println(f"""{"corpus": $n, "n_cents": $nCents, "k": $k, "queries": $nQ, """ +
        f""""method": "$method", $params, "recall": ${recall(appr)}%.4f, """ +
        f""""sec": ${(System.nanoTime() - t0) / 1e9}%.1f}""")

    // sweep 1: the re-land knob — quantization resolution
    for ((m, kCodes) <- Seq((4, 16), (8, 64), (8, 256), (16, 256))) {
      val t0 = System.nanoTime()
      row("ivfpq", s""""m": $m, "k_codes": $kCodes, "refine": null""", t0,
        hitSet(Similarity.ivfPqTopK(queries, embs, "vec_id", "embedding",
          k, nCents, nProbe = 4, m, kCodes)))
    }
    // sweep 2: the per-query knob — refine over the CHEAPEST codes
    for (refine <- Seq(2, 4, 8, 16)) {
      val t0 = System.nanoTime()
      row("ivfpq_refine", s""""m": 4, "k_codes": 16, "refine": $refine""", t0,
        hitSet(Similarity.ivfPqRefineTopK(queries, embs, "vec_id", "embedding",
          k, nCents, nProbe = 4, m = 4, kCodes = 16, refine = refine)))
    }
    // context rows: the uncompressed paths under the same probe budget
    locally {
      val t0 = System.nanoTime()
      row("ivf", """"m": null, "k_codes": null, "refine": null""", t0,
        hitSet(Similarity.ivfTopK(queries, embs, "vec_id", "embedding",
          k, nCents, nProbe = 4)))
    }
    locally {
      val t0 = System.nanoTime()
      row("pq", """"m": 4, "k_codes": 16, "refine": null""", t0,
        hitSet(Similarity.pqAdcTopK(queries, embs, "vec_id", "embedding",
          k, m = 4, kCodes = 16)))
    }
    spark.stop()
  }
}
