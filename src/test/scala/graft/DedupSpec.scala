package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog again and again until done"
  private lazy val docs = Seq(
    (0L, base),
    (1L, base), // exact dup of 0
    (2L, base.replace("lazy", "sleepy")), // near dup of 0
    (3L, "completely different content about spark query engines and shuffles here"),
    (4L, "another unrelated document mentioning parquet column pruning and pushdown")
  ).toDF("doc_id", "text")

  test("exactDedup groups identical content and keeps min id") {
    val out = Dedup.exactDedup(docs, "doc_id", "text")
      .orderBy("keep_id").collect()
    assert(out.length == 4)
    val byId = out.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(byId(0L) == 2L) // docs 0 and 1 collapse onto keep_id 0
    assert(Seq(2L, 3L, 4L).forall(byId(_) == 1L))
  }

  test("ngramJaccardPairs finds exact and near duplicates, no false pairs") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((0L, 1L), (0L, 2L), (1L, 2L)))
    val exact = pairs.find(p => p._1 == 0L && p._2 == 1L).get
    assert(exact._3 == 1.0)
  }

  test("minhashLshPairs recovers the same duplicate pairs as exact Jaccard") {
    val got = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3, k = 64,
        bands = 16, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L), (0L, 2L), (1L, 2L)))
  }

  test("simhashPairs links near-identical docs only") {
    val got = Dedup.simhashPairs(docs, "doc_id", "text", blocks = 4, maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 1L)))
    assert(!got.exists(p => p._2 >= 3L)) // unrelated docs never pair
  }

  test("embeddingDedupPairs finds high-cosine pairs within LSH buckets") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.1f, 0.0f, 0.2f)),
      (1L, Array(0.99f, 0.11f, 0.01f, 0.19f)), // ~same direction as 0
      (2L, Array(-1.0f, 0.5f, 0.3f, -0.2f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Dedup.embeddingDedupPairs(vecs, "vec_id", "embedding",
        tables = 8, planes = 2, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L)))
  }

  test("repetitionScore measures within-doc n-gram repetition") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "a b a b a b"),              // 4 3-grams, 2 distinct -> 0.5
      (2L, "x y"),                      // shorter than the window -> zeros
      (3L, "one two three four")        // all distinct -> 0.0
    ).toDF("doc_id", "text")
    val (total, dist, rep) = TextAnalysis.repetitionScore(
      TextAnalysis.wsTokens(col("text")), 3)
    val out = df.select(col("doc_id"), total.as("t"), dist.as("d"), rep.as("r"))
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 4L && out(0).getLong(2) == 2L && out(0).getDouble(3) == 0.5)
    assert(out(1).getLong(1) == 0L && out(1).getLong(2) == 0L && out(1).getDouble(3) == 0.0)
    assert(out(2).getDouble(3) == 0.0)
  }

  test("benchmarkContamination flags corpus docs sharing an 8-gram with the benchmark") {
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text") // 9 tokens -> two 8-grams
    val corpus = Seq(
      (1L, "prefix words the quick brown fox jumps over the lazy dog suffix"),
      (2L, "completely unrelated text with eight or more words in this row")
    ).toDF("doc_id", "text")
    val out = Dedup.benchmarkContamination(corpus, bench, "doc_id", "text", 8)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L)) // only the leaking doc
    assert(out.head.getLong(1) == 2L) // both benchmark 8-grams collide
  }

  test("dedupClusters computes transitive components with min-id labels") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (3L, 4L))
      .toDF("id_a", "id_b")
    val got = Dedup.dedupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 8L -> 8L, 9L -> 8L))
  }

  test("frame sampling emits every k-th frame per decoded doc") {
    val withPayload = Multimodal.withPayloadMeta(docs, "doc_id", "text")
    val decoded = Multimodal.decodeBatch(withPayload, "doc_id", "payload")
    val frames = Multimodal.sampleFrames(decoded, everyKth = 2).collect()
    val nFrames = decoded.collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    val byDoc = frames.groupBy(_.getLong(0))
    nFrames.foreach { case (id, n) =>
      assert(byDoc(id).length == (n + 1) / 2, s"doc $id n=$n")
      assert(byDoc(id).map(_.getInt(1)).sorted.toSeq == (0 until n by 2).toSeq)
    }
  }

  test("multimodal stub decode is deterministic and preserves row count") {
    val withPayload = Multimodal.withPayloadMeta(docs, "doc_id", "text")
    val out = Multimodal.decodeBatch(withPayload, "doc_id", "payload")
      .orderBy("doc_id").collect()
    assert(out.length == 5)
    // identical payloads decode identically
    assert(out(0).toSeq.drop(1) == out(1).toSeq.drop(1))
    assert(out.forall(r => r.getInt(1) >= 64 && r.getInt(2) >= 64))
  }
}
