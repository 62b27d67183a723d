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

  final case class Decoded(width: Int, height: Int, nFrames: Int, meanLuma: Double)

  /** DETERMINISTIC FAKE DECODER — stands in for an image/audio codec.
    * Output dimensions are a pure function of the payload digest, so the
    * pipeline is testable end-to-end without media libraries, and the
    * DuckDB oracle can replay the arithmetic (the m2 oracle twin). It
    * accepts ANY byte payload, which is what makes it the oracle-side
    * decoder; [[ImageIoDecoder]] is the real-codec leg behind the same
    * contract.
    */
  object StubDecoder {
    def decode(payload: Array[Byte]): Option[Decoded] = {
      val h = HashKernels.fnv1a64Bytes(payload)
      val w = 64 + (java.lang.Long.remainderUnsigned(h, 1024L)).toInt
      val ht = 64 + (java.lang.Long.remainderUnsigned(h >>> 11, 1024L)).toInt
      val nf = 1 + (java.lang.Long.remainderUnsigned(h >>> 22, 16L)).toInt
      val luma = (java.lang.Long.remainderUnsigned(h >>> 26, 256L)).toDouble / 255.0
      Some(Decoded(w, ht, nf, luma))
    }
  }

  /** REAL image decoder over the JDK's public `javax.imageio` — the
    * deployment leg of the [[decodeBatch]] contract for PNG/JPEG/GIF/BMP
    * payloads (the formats the JDK ships readers for; a cluster image
    * pipeline swaps in its codec here and nothing around it changes):
    *
    *  - dimensions and frame count come from the container (GIF frame
    *    sequences report every frame via `getNumImages`);
    *  - `meanLuma` is the Rec.601 luma of the FIRST frame averaged over
    *    all pixels, normalized to [0, 1] — a real pixel statistic, so
    *    the spec can assert it against independently computed values;
    *  - undecodable bytes (no registered reader / truncated stream)
    *    return None and the row is SKIPPED by [[decodeBatch]] — a media
    *    pipeline drops what it cannot decode rather than dying mid-scan.
    */
  object ImageIoDecoder {
    /** First frame + container frame count, or None for anything
      * undecodable — the shared read behind [[decode]] and
      * [[Multimodal.dhash64]].
      */
    private[operators] def firstFrame(payload: Array[Byte])
        : Option[(java.awt.image.BufferedImage, Int)] = {
      import javax.imageio.ImageIO
      val in = ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(payload))
      try {
        val readers = ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(in, false, true)
            val nFrames = math.max(1, reader.getNumImages(true))
            Some((reader.read(0), nFrames))
          } finally reader.dispose()
        }
      } catch {
        // NonFatal, not just IOException: imageio readers throw
        // RuntimeExceptions (IllegalArgument, ArrayIndexOutOfBounds,
        // NegativeArraySize) on malformed-but-recognized payloads, and
        // the contract is "drop what it cannot decode", not die mid-scan
        case scala.util.control.NonFatal(_) => None
      } finally in.close()
    }

    def decode(payload: Array[Byte]): Option[Decoded] =
      firstFrame(payload).map { case (img, nFrames) =>
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        Decoded(w, h, nFrames, sum / (w.toLong * h) / 255.0)
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
    *
    * `decoder` is the swap point: [[StubDecoder.decode]] (default — the
    * deterministic oracle twin) or [[ImageIoDecoder.decode]] (real JDK
    * codec) or a deployment's own; rows whose payload the decoder
    * rejects (None) are dropped, like null ids/payloads.
    */
  def decodeBatch(docs: DataFrame, idCol: String, payloadCol: String,
                  decoder: Array[Byte] => Option[Decoded] = StubDecoder.decode)
      : DataFrame = {
    val spark = docs.sparkSession
    val input = docs.select(col(idCol).cast("long").as("doc_id"),
      col(payloadCol).cast("binary").as("payload"))
    val rdd = input.queryExecution.toRdd.mapPartitions { iter =>
      // one decoder per partition — setup cost amortized across the batch;
      // null ids/payloads are skipped (nothing decodable, and getLong on a
      // null would silently read 0)
      iter.flatMap { ir =>
        if (ir.isNullAt(0) || ir.isNullAt(1)) None
        else decoder(ir.getBinary(1)).map(d =>
          Row(ir.getLong(0), d.width, d.height, d.nFrames, d.meanLuma))
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** m5: perceptual-hash near-dup pairs over media payloads — the image
    * dedup stage of a multimodal pipeline (LAION-style dHash/pHash
    * dedup): each payload maps to a 64-bit perceptual signature and
    * pairs within `maxHamming` bits surface through the d4 pigeonhole
    * block machinery ([[graft.operators.Dedup.hammingPairs]] — block
    * join, salting, singleton pruning, popcount verify; never
    * all-pairs, so at 100 TB of images the candidate space stays
    * bucket-bounded exactly like text SimHash).
    *
    * The signature is the operator's swap point, like [[decodeBatch]]'s
    * decoder: a real deployment computes dHash over the decoded luma
    * grid (gradient sign bits — the container libs this sandbox lacks);
    * the stub signature is the codegen fnv61 of the payload bytes,
    * which keeps the whole pipeline — signature, blocks, candidates,
    * verify — real, deterministic and oracle-replayable (identical FNV
    * in DuckDB). Under the stub, near-dups at maxHamming > 0 arise only
    * from genuinely colliding signatures (exact payload dups are
    * hamming 0); the spec drives the BLOCK machinery with crafted
    * signatures at every boundary instead. The production signature is
    * [[dhashNearDup]] — same machinery, real dHash over decoded luma.
    */
  def phashNearDup(docs: DataFrame, idCol: String, payloadCol: String,
                   blocks: Int = 4, maxHamming: Int = 3): DataFrame =
    graft.operators.Dedup.hammingPairs(
      docs.select(col(idCol).as("id"),
        // hash the payload BYTES (not a string cast — non-UTF8 image
        // bytes have no contracted string round-trip; r16 ADVICE)
        graft.functions.HashExpressions.fnv61Bytes(
          col(payloadCol).cast("binary")).as("sig")),
      blocks, maxHamming, tag = "m5")

  /** 64-bit dHash over the decoded first frame's Rec.601 luma — m5's
    * PRODUCTION signature (the fnv61 stub stays the oracle twin): the
    * frame resamples to a 9×8 luma grid by box-averaging exact integer
    * source rectangles (floor partition arithmetic, nonempty by
    * construction at any dimensions — no interpolation library, so the
    * same bytes hash identically on every JVM), and bit (row·8 + col)
    * is set iff the cell to the RIGHT is strictly brighter — 64
    * horizontal gradient signs, the perceptual invariant that survives
    * rescaling, recompression and global exposure shifts. Undecodable
    * payloads return None (the [[decodeBatch]] drop contract).
    */
  def dhash64(payload: Array[Byte]): Option[Long] =
    ImageIoDecoder.firstFrame(payload).map { case (img, _) =>
      val w = img.getWidth
      val h = img.getHeight
      val cells = Array.ofDim[Double](8, 9)
      var cy = 0
      while (cy < 8) {
        val y0 = cy * h / 8
        val y1 = math.max((cy + 1) * h / 8, y0 + 1)
        var cx = 0
        while (cx < 9) {
          val x0 = cx * w / 9
          val x1 = math.max((cx + 1) * w / 9, x0 + 1)
          var sum = 0.0
          var n = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              sum += 0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              n += 1
              x += 1
            }
            y += 1
          }
          cells(cy)(cx) = sum / n
          cx += 1
        }
        cy += 1
      }
      var sig = 0L
      cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 8) {
          if (cells(cy)(cx + 1) > cells(cy)(cx)) sig |= 1L << (cy * 8 + cx)
          cx += 1
        }
        cy += 1
      }
      sig
    }

  /** m5's production leg: [[phashNearDup]] with the REAL [[dhash64]]
    * signature — one decoder pass per partition over the payload column
    * (the [[decodeBatch]] mapPartitions shape; undecodable payloads are
    * dropped, never fatal), signatures fed through the same
    * signature-agnostic pigeonhole machinery
    * ([[graft.operators.Dedup.hammingPairs]]). Spec-pinned on generated
    * images: byte-identical payloads pair at hamming 0, a one-cell
    * luma perturbation pairs at hamming 1, a reversed gradient shares
    * no block and correctly never surfaces.
    */
  def dhashNearDup(docs: DataFrame, idCol: String, payloadCol: String,
                   blocks: Int = 4, maxHamming: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    val input = docs.select(col(idCol).cast("long").as("id"),
      col(payloadCol).cast("binary").as("payload"))
    val rdd = input.queryExecution.toRdd.mapPartitions { iter =>
      iter.flatMap { ir =>
        if (ir.isNullAt(0) || ir.isNullAt(1)) None
        else dhash64(ir.getBinary(1)).map(s => Row(ir.getLong(0), s))
      }
    }
    val sigs = spark.createDataFrame(rdd, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("sig", LongType, nullable = false))))
    graft.operators.Dedup.hammingPairs(sigs, blocks, maxHamming, tag = "m5")
  }
}
