package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.HashKernels

/** Multimodal-column plumbing (SURVEY.md §2.3 m1/m2).
  *
  * Media payloads are opaque `binary` columns with typed metadata. The
  * Spark-side plumbing — schema, batch iteration, partition shape — is
  * real; the actual codec is STUBBED with a deterministic fake (image/
  * audio libraries are not in this container). Swap [[StubDecoder.decode]]
  * for a real decoder at deployment; everything around it is unchanged.
  */
object Multimodal {

  /** Typed metadata over an opaque payload: byte length, content digest,
    * and a sniffed kind from the leading byte — all native, codegen'd
    * column functions (SQL-expressible for the oracle).
    */
  def withPayloadMeta(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      col(textCol).cast("binary").as("payload"),
      // fake "magic byte" sniff on the leading character — stands in for
      // a real container-format probe, SQL-expressible for the oracle
      when(substring(col(textCol), 1, 1) < "n", "image").otherwise("audio").as("kind"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("byte_len"),
        sha2(col("payload"), 256).as("content_sha"),
        col("kind"),
        col("payload"))

  /** DETERMINISTIC FAKE DECODER — stands in for an image/audio codec.
    * Output dimensions are a pure function of the payload digest, so the
    * pipeline is testable end-to-end without media libraries.
    */
  object StubDecoder {
    final case class Decoded(width: Int, height: Int, nFrames: Int, meanLuma: Double)
    def decode(payload: Array[Byte]): Decoded = {
      val h = HashKernels.fnv1a64Bytes(payload)
      val w = 64 + (java.lang.Long.remainderUnsigned(h, 1024L)).toInt
      val ht = 64 + (java.lang.Long.remainderUnsigned(h >>> 11, 1024L)).toInt
      val nf = 1 + (java.lang.Long.remainderUnsigned(h >>> 22, 16L)).toInt
      val luma = (java.lang.Long.remainderUnsigned(h >>> 26, 256L)).toDouble / 255.0
      Decoded(w, ht, nf, luma)
    }
  }

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false)))

  /** Aspect-preserving resize planning: given source dimensions, compute
    * the target box fit inside `box`×`box` (floor semantics, never
    * upscale). Pure column arithmetic — at scale this feeds the actual
    * pixel resize (stubbed here like the codec), and the dimension math
    * is the part an engine must get deterministically right.
    */
  def resizePlan(df: DataFrame, widthCol: String, heightCol: String, box: Int): DataFrame = {
    val w = col(widthCol).cast("double")
    val h = col(heightCol).cast("double")
    val scale = least(lit(box.toDouble) / w, lit(box.toDouble) / h, lit(1.0))
    df.withColumn("out_w", floor(w * scale).cast("long"))
      .withColumn("out_h", floor(h * scale).cast("long"))
  }

  /** Frame sampling over decoded media: one row per sampled frame with a
    * deterministic frame fingerprint — the batch shape of a video
    * pipeline (decode → sample every k-th frame → per-frame features).
    * The frame "content" is stubbed (a 60-bit md5 prefix over
    * "doc:frame:WxH"); md5 rather than an engine-internal hash so the
    * fingerprint is reproducible by any engine (the m3 oracle recomputes
    * it in SQL). The explode/partitioning plumbing is the real
    * deliverable.
    */
  def sampleFrames(decoded: DataFrame, everyKth: Int): DataFrame =
    decoded
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyKth))))
      .withColumn("frame_fp",
        conv(substring(md5(concat_ws(":",
          col("doc_id"), col("frame_idx"), col("width"), col("height")).cast("binary")),
          1, 15), 16, 10).cast("long"))
      .select("doc_id", "frame_idx", "frame_fp")

  /** Batched feature extraction over (id, payload) rows. `mapPartitions`
    * keeps the decoder amortized per partition (one decoder instance, no
    * per-row setup) — the same shape a real Arrow-batched media UDF has.
    * Partition count follows the scan, so a 100 TB corpus fans out across
    * executors with no shuffle at all.
    */
  def decodeBatch(docs: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = docs.sparkSession
    val input = docs.select(col(idCol).cast("long").as("doc_id"),
      col(payloadCol).cast("binary").as("payload"))
    val rdd = input.queryExecution.toRdd.mapPartitions { iter =>
      // one decoder per partition — setup cost amortized across the batch;
      // null ids/payloads are skipped (nothing decodable, and getLong on a
      // null would silently read 0)
      iter.flatMap { ir =>
        if (ir.isNullAt(0) || ir.isNullAt(1)) None
        else {
          val d = StubDecoder.decode(ir.getBinary(1))
          Some(Row(ir.getLong(0), d.width, d.height, d.nFrames, d.meanLuma))
        }
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }
}
