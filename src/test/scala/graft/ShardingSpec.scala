package graft

import graft.operators.Sharding

class ShardingSpec extends SparkSpec {

  test("shuffleShard: contiguous deterministic permutation cut into exact shards") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val n = docs.count()
    def run(seed: String) =
      Sharding.shuffleShard(spark, docs, "doc_id", seed, shardSize = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val a = run("42")
    // pos is a contiguous permutation of [0, n): the zipWithIndex offsets
    // are seamless across range-partition boundaries
    assert(a.map(_._2).sorted.toSeq == (0L until n).toSeq)
    // shard/slot are pure arithmetic on pos
    a.foreach { case (_, pos, shard, slot) =>
      assert(shard == pos / 64 && slot == pos % 64) }
    // every shard except the last is exactly full
    val sizes = a.groupBy(_._3).view.mapValues(_.length).toMap
    val last = sizes.keys.max
    sizes.foreach { case (sh, sz) => if (sh != last) assert(sz == 64, s"shard $sh size $sz") }
    // the shuffle shuffles: seeded order must not be id order
    assert(a.sortBy(_._2).map(_._1).toSeq != a.map(_._1).sorted.toSeq)
    // determinism: an independent re-run reproduces the layout bit-for-bit
    assert(run("42").toSet == a.toSet)
    // seed sensitivity: a different seed is a different permutation
    assert(run("7").toSet != a.toSet)
  }

  test("writeShards materializes one slot-ordered file per shard") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val dir = graft.sources.Spool.tempRoot("shards_spec")
    Sharding.writeShards(spark, docs, "doc_id", seed = "42",
      shardSize = 16, dir = dir)
    val layout = Sharding.shuffleShard(spark, docs, "doc_id", "42", 16)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    val shardDirs = Files.list(Paths.get(dir)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("shard=")).toSeq
    assert(shardDirs.size == layout.map(_._2).distinct.length)
    shardDirs.foreach { sd =>
      val files = Files.list(sd).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toSeq
      assert(files.size == 1, s"$sd has ${files.size} files")
      val shardNo = sd.getFileName.toString.stripPrefix("shard=").toLong
      val rows = spark.read.parquet(files.head.toString)
        .select("doc_id", "slot").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // slot-ordered within the file, and exactly the layout's docs
      assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
      val want = layout.filter(_._2 == shardNo).sortBy(_._3)
        .map(t => (t._1, t._3)).toSeq
      assert(rows.toSeq == want)
    }
  }
}
