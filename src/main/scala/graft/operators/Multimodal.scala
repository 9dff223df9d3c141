package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions._

/** Multimodal column plumbing: opaque binary payloads with typed
  * metadata, plus a batched per-partition "decode / feature-extract"
  * stage with the batch shape a real decoder (image/audio codec,
  * vision-tower featurizer) would need.
  *
  * Two decode tiers. The IMAGE path is REAL as of r11: payloads are
  * actual PNG bytes (javax.imageio lives in the JDK — no external
  * codec jar needed) and [[decodeImages]] reads format, dimensions
  * and pixels back from the bytes alone. The audio/video paths keep
  * a DETERMINISTIC STUB (no codec in the container), but everything
  * Spark-side is real: schema, encoders, partition-local batching,
  * and the typed mapPartitions boundary where a JNI/ONNX call would
  * sit. Swap `decodeStub` for a real codec and nothing else changes.
  */
object Multimodal {

  /** A media asset: binary payload + typed metadata. */
  case class MediaAsset(
    doc_id: Long, format: String, width: Int, height: Int,
    payload: Array[Byte])

  /** Decoder output: per-asset feature row. */
  case class MediaFeatures(
    doc_id: Long, format: String, width: Int, height: Int,
    n_bytes: Long, checksum: Long, feat0: Double)

  /** Attach a synthetic binary payload + metadata to each document.
    * The payload is the utf-8 text bytes standing in for an encoded
    * image; format / dimensions are md5-derived so they're stable. */
  def withMediaColumns(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("jpeg"), lit("png"), lit("webp")),
        (hash60(col("source")) % 3 + 1).cast("int")).as("format"),
      (hash60(col("text")) % 1024 + 64).cast("int").as("width"),
      (hash60(concat(col("text"), lit("#h"))) % 1024 + 64).cast("int").as("height"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder: deterministic fake features. A real implementation
    * decodes `payload` with a codec and runs a featurizer over the
    * whole batch (the batch boundary is why mapPartitions + grouped
    * exists — codec/model init is amortized per batch, not per row). */
  private def decodeStub(batch: Seq[MediaAsset]): Seq[MediaFeatures] =
    batch.map { a =>
      val checksum = a.payload.foldLeft(0L)((acc, b) => (acc * 131 + (b & 0xff)) % 1000000007L)
      MediaFeatures(a.doc_id, a.format, a.width, a.height,
        a.payload.length.toLong, checksum,
        checksum.toDouble / 1000000007.0)
    }

  /** Batched feature extraction over the typed Dataset: partition-local
    * batches of `batchSize` through the decode boundary. No shuffle —
    * decoding is embarrassingly parallel; partition sizing (via
    * spark.sql.files.maxPartitionBytes) controls memory per executor
    * when payloads are real images. */
  def extractFeatures(assets: Dataset[MediaAsset],
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => decodeStub(b))
    }
  }

  def multimodalMetaQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val assets = withMediaColumns(Tables.documents(spark, dir)).as[MediaAsset]
    extractFeatures(assets).toDF()
      .select(col("doc_id"), col("format"), col("width"), col("height"),
        col("n_bytes"), col("checksum"), round(col("feat0"), 6).as("feat0"))
      .orderBy(col("doc_id"))
  }

  /** A real-bytes image asset: `payload` is an actual encoded PNG. */
  case class PngAsset(doc_id: Long, width: Int, height: Int,
                      payload: Array[Byte])

  /** Decoded-image facts, every field read back from the BYTES (the
    * generation metadata is never consulted): container format from
    * the ImageIO reader, dimensions and the exact gray-pixel sum from
    * the decoded raster, mean luminance in integer basis points of
    * full-scale ((sum*10000) DIV (w*h*255)). */
  case class DecodedImage(doc_id: Long, format: String, width: Int,
                          height: Int, px_sum: Long, mean_bp: Long)

  /** Deterministic gray fill for pixel (x, y) of document d — the
    * rule the DuckDB oracle reproduces arithmetically, which is what
    * makes a REAL codec round-trip oracle-checkable: PNG is lossless,
    * so decode must recover exactly these values. */
  private def grayAt(d: Long, x: Int, y: Int): Int =
    ((x * 31L + y * 17L + d * 7L) % 256L).toInt

  /** Generate real PNG payloads: a TYPE_BYTE_GRAY image of
    * md5-derived dimensions filled by [[grayAt]], encoded through
    * javax.imageio. Encoder init is per partition (the reason the
    * decode boundary is mapPartitions, not a per-row UDF). */
  def withPngPayloads(docs: DataFrame): Dataset[PngAsset] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"),
        (hash60(col("text")) % 32 + 16).cast("int").as("width"),
        (hash60(concat(col("text"), lit("#h"))) % 32 + 16).cast("int").as("height"))
      .as[(Long, Int, Int)]
      .mapPartitions { it =>
        it.map { case (d, w, h) =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { raster.setSample(x, y, 0, grayAt(d, x, y)); x += 1 }
            y += 1
          }
          // explicit MEMORY-cache output stream: the OutputStream
          // overload would wrap a file-cache stream (one /tmp file per
          // encode) under the default useCache
          val bos = new java.io.ByteArrayOutputStream()
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          try javax.imageio.ImageIO.write(img, "png", ios)
          finally ios.close()
          PngAsset(d, w, h, bos.toByteArray)
        }
      }
  }

  /** REAL image decode at the same partition-batched boundary as
    * [[extractFeatures]]: javax.imageio sniffs the container from the
    * byte stream, and dimensions + pixel sum come from the decoded
    * raster — nothing is copied from generation metadata. An
    * undecodable payload degrades to a ("error", -1, ...) row instead
    * of failing the partition (a 100 TB crawl always contains corrupt
    * files; one bad payload must not kill the stage). */
  /** In-memory ImageIO stream over a payload. MEMORY cache, explicitly:
    * the default file cache writes one /tmp cache file PER IMAGE and —
    * combined with an unclosed stream — exhausts the process fd limit
    * on wide scans (the 16x ScaleProbe found exactly this: ~20k
    * concurrent decodes died on "Too many open files"). Bytes are
    * already in memory, so the disk cache bought nothing. Callers must
    * still close() the stream. */
  private def memStream(payload: Array[Byte]): javax.imageio.stream.ImageInputStream =
    new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))

  def decodeImages(assets: Dataset[PngAsset],
                   batchSize: Int = 64): Dataset[DecodedImage] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { a =>
          val iis = memStream(a.payload)
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext)
              DecodedImage(a.doc_id, "error", -1, -1, -1L, -1L)
            else {
              val r = readers.next()
              try {
                r.setInput(iis)
                val img = r.read(0)
                val (w, h) = (img.getWidth, img.getHeight)
                val raster = img.getRaster
                var sum = 0L
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
                  y += 1
                }
                DecodedImage(a.doc_id, r.getFormatName.toLowerCase, w, h,
                  sum, sum * 10000L / (w.toLong * h * 255L))
              } catch {
                case scala.util.control.NonFatal(_) =>
                  DecodedImage(a.doc_id, "error", -1, -1, -1L, -1L)
              } finally r.dispose()
            }
          } finally iis.close()
        }
      }
    }
  }

  def multimodalDecodePngQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeImages(withPngPayloads(Tables.documents(spark, dir))).toDF()
      .orderBy(col("doc_id"))
  }

  /** Generate real JPEG payloads — the second REAL codec tier (r13
    * verdict #5): same md5 dimension rule and [[grayAt]] fill as the
    * PNG path, encoded through the JDK's JPEG writer at an explicit
    * high quality (MODE_EXPLICIT, 0.95 — the default 0.75 wastes
    * fidelity the decode-error spec would then have to absorb).
    * Reuses the PngAsset shape: the payload column is opaque bytes
    * whatever the codec — exactly the multimodal column contract.
    *
    * JPEG is LOSSY, which changes what is oracle-checkable: the
    * container format and dimensions survive exactly (pinned by the
    * multimodal_decode_jpeg oracle), but pixel values do not, so the
    * pixel-sum check moves to a TOLERANCE-BANDED spec
    * (MultimodalJpegSpec bounds the mean per-pixel reconstruction
    * error) — the row-78 approx-percentile precedent. */
  def withJpegPayloads(docs: DataFrame,
                       quality: Float = 0.95f): Dataset[PngAsset] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"),
        (hash60(col("text")) % 32 + 16).cast("int").as("width"),
        (hash60(concat(col("text"), lit("#h"))) % 32 + 16).cast("int").as("height"))
      .as[(Long, Int, Int)]
      .mapPartitions { it =>
        it.map { case (d, w, h) =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { raster.setSample(x, y, 0, grayAt(d, x, y)); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          val writer = javax.imageio.ImageIO
            .getImageWritersByFormatName("jpeg").next()
          try {
            val p = writer.getDefaultWriteParam
            p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
            p.setCompressionQuality(quality)
            writer.setOutput(ios)
            writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
          } finally { writer.dispose(); ios.close() }
          PngAsset(d, w, h, bos.toByteArray)
        }
      }
  }

  /** multimodal_decode_jpeg: the REAL JPEG round-trip through the same
    * [[decodeImages]] boundary. The oracle pins what a lossy codec
    * must still preserve exactly — container format (sniffed from the
    * bytes) and dimensions (from the decoded raster); pixel fidelity
    * is spec-bounded, not hash-pinned. */
  def multimodalDecodeJpegQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeImages(withJpegPayloads(Tables.documents(spark, dir))).toDF()
      .select("doc_id", "format", "width", "height")
      .orderBy(col("doc_id"))
  }

  /** Perceptual hash of a decoded image: (doc_id, dims, 64-bit dHash).
    * Error rows carry (-1, -1, -1). */
  case class ImageHash(doc_id: Long, width: Int, height: Int, dhash: Long)

  /** Difference hash (dHash — the classic perceptual near-dup
    * fingerprint): sample the decoded raster on a 9×8 nearest-neighbor
    * grid (gx = c·w div 9, gy = r·h div 8 — integer math, no
    * interpolation, so the oracle can recompute every sampled pixel
    * arithmetically from the known fill rule) and set bit r·8+c when
    * the left sample is darker than its right neighbor. Gradient
    * signs survive brightness shifts and re-encoding — the property
    * that makes Hamming-close dHashes an image near-dup signal where
    * byte equality sees nothing.
    *
    * Same REAL-codec posture as [[decodeImages]]: the hash is computed
    * from bytes through javax.imageio at the partition-batched
    * boundary, undecodable payloads degrade to (-1, -1, -1) rows, and
    * the oracle never sees the bytes — it recomputes the expected
    * samples from the generation rule, so a green gate proves the
    * codec round-trip preserved every sampled pixel. Downstream,
    * hashes pair by the same 4×16-bit pigeonhole banding as SimHash
    * ([[phashPairs]]): Hamming ≤ 3 forces one exact piece match. */
  def imageDHash(assets: Dataset[PngAsset],
                 batchSize: Int = 64): Dataset[ImageHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { a =>
          val iis = memStream(a.payload)
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) ImageHash(a.doc_id, -1, -1, -1L)
            else {
              val r = readers.next()
              try {
                r.setInput(iis)
                val img = r.read(0)
                val (w, h) = (img.getWidth, img.getHeight)
                val raster = img.getRaster
                var hash = 0L
                var row = 0
                while (row < 8) {
                  val gy = row * h / 8
                  var c = 0
                  while (c < 8) {
                    val p1 = raster.getSample(c * w / 9, gy, 0)
                    val p2 = raster.getSample((c + 1) * w / 9, gy, 0)
                    if (p1 < p2) hash |= 1L << (row * 8 + c)
                    c += 1
                  }
                  row += 1
                }
                ImageHash(a.doc_id, w, h, hash)
              } catch {
                case scala.util.control.NonFatal(_) =>
                  ImageHash(a.doc_id, -1, -1, -1L)
              } finally r.dispose()
            }
          } finally iis.close()
        }
      }
    }
  }

  /** Image near-dup pairs at Hamming ≤ maxHamming over 64-bit dHashes
    * — Dedup.simhashPairs' pigeonhole banding on the image tier: 4
    * pieces of 16 bits, Hamming ≤ 3 guarantees an exact piece match,
    * candidates equi-join on (piece, value), popcount filters BEFORE
    * the pair distinct. */
  def phashPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4x16 banding guarantees recall only to Hamming 3")
    val pieces = 4
    val pieceBits = 16
    val pieceStructs = array((0 until pieces).map { i =>
      struct(lit(i).as("pi"),
        shiftright(col("dhash"), i * pieceBits)
          .bitwiseAND(lit((1L << pieceBits) - 1)).as("pv"))
    }: _*)
    val banded = hashes.filter(col("width") > 0)
      .select(col("doc_id"), col("dhash"), explode(pieceStructs).as("p"))
      .select(col("doc_id"), col("dhash"), col("p.pi").as("pi"), col("p.pv").as("pv"))
    val x = banded.toDF("doc_a", "ha", "pi_a", "pv_a")
    val y = banded.toDF("doc_b", "hb", "pi_b", "pv_b")
    x.join(y, x("pi_a") === y("pi_b") && x("pv_a") === y("pv_b") &&
        x("doc_a") < y("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(ha ^ hb)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  def multimodalPhashQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    imageDHash(withPngPayloads(Tables.documents(spark, dir))).toDF()
      .orderBy(col("doc_id"))
  }

  /** The pair-mining half wired end to end: REAL decode → dHash →
    * pigeonhole banding → Hamming ≤ 3 pairs. The oracle's truth set is
    * the EXHAUSTIVE all-pairs popcount over the analytically-derived
    * hashes, so a green gate proves both the codec round-trip AND that
    * the banding missed nothing (its ≤ 3 recall guarantee, verified
    * rather than asserted). */
  def multimodalPhashPairsQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    phashPairs(imageDHash(withPngPayloads(Tables.documents(spark, dir))).toDF())
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Resize planning: fit each asset into a square `target` box
    * preserving aspect ratio. floor((side*target)/longSide): the
    * operands are small exact ints, IEEE division is correctly
    * rounded, so the floor is bit-identical across engines. This is
    * the metadata half of a real resize; the pixel half lives behind
    * the decode stub. */
  def resizePlan(assets: DataFrame, target: Int): DataFrame = {
    val longSide = greatest(col("width"), col("height"))
    def scaled(c: org.apache.spark.sql.Column) =
      greatest(lit(1L), floor((c * target) / longSide)).cast("int")
    assets.select(
      col("doc_id"), col("width"), col("height"),
      scaled(col("width")).as("out_w"),
      scaled(col("height")).as("out_h"))
  }

  def multimodalResizeQuery(spark: SparkSession, dir: String): DataFrame =
    resizePlan(withMediaColumns(Tables.documents(spark, dir)), target = 224)
      .orderBy(col("doc_id"))

  /** ViT-style patch-grid planning on top of the resize plan: how many
    * `patch`-sized tiles cover the resized image (partial tiles padded
    * up), and the sequence length the vision tower sees (grid + one
    * class token). All small exact ints through correctly-rounded IEEE
    * division, so floor is bit-identical across engines — same
    * argument as resizePlan. */
  def patchGridPlan(assets: DataFrame, target: Int, patch: Int): DataFrame = {
    require(patch >= 1, s"patch must be >= 1, got $patch")
    def grid(c: org.apache.spark.sql.Column) =
      floor((c + (patch - 1)) / patch).cast("int")
    resizePlan(assets, target).select(
      col("doc_id"), col("out_w"), col("out_h"),
      grid(col("out_w")).as("grid_w"),
      grid(col("out_h")).as("grid_h"),
      (grid(col("out_w")) * grid(col("out_h"))).as("n_patches"),
      (grid(col("out_w")) * grid(col("out_h")) + 1).as("seq_len"))
  }

  def multimodalPatchGridQuery(spark: SparkSession, dir: String): DataFrame =
    patchGridPlan(withMediaColumns(Tables.documents(spark, dir)),
        target = 224, patch = 16)
      .orderBy(col("doc_id"))

  /** Frame sampling for "video" assets: a deterministic synthetic
    * frame count per doc, then every `stride`-th frame index capped at
    * `maxFrames` — the uniform-sampling schedule a video pipeline
    * feeds its decoder. Emitted as a joined string for engine-neutral
    * comparison. */
  def frameSamplePlan(docs: DataFrame, stride: Int, maxFrames: Int): DataFrame = {
    val nFrames = (hash60(concat(col("text"), lit("#v"))) % 300 + 30).cast("int")
    val idx = slice(sequence(lit(0), nFrames - 1, lit(stride)), 1, maxFrames)
    docs.select(
      col("doc_id"),
      nFrames.as("n_frames"),
      size(idx).as("n_sampled"),
      array_join(idx, ",").as("frame_idx"))
  }

  def multimodalFrameSampleQuery(spark: SparkSession, dir: String): DataFrame =
    frameSamplePlan(Tables.documents(spark, dir), stride = 30, maxFrames = 8)
      .orderBy(col("doc_id"))

  /** Audio chunking schedule: synthetic (sample_rate, duration) per
    * doc, then the number of fixed-length windows with overlap that an
    * ASR/audio-tower pipeline feeds its encoder — the audio analog of
    * frame sampling. ceil via (a + b - 1) div b on exact ints; a
    * clip shorter than one window still yields one chunk. */
  def audioChunkPlan(docs: DataFrame, windowSec: Int, hopSec: Int): DataFrame = {
    require(hopSec >= 1 && windowSec >= hopSec,
      s"need windowSec >= hopSec >= 1, got window=$windowSec hop=$hopSec")
    val rate = element_at(array(lit(16000), lit(22050), lit(44100)),
      (hash60(concat(col("text"), lit("#r"))) % 3 + 1).cast("int"))
    val durSec = (hash60(concat(col("text"), lit("#d"))) % 600 + 5).cast("int")
    // chunks start every hop until the last window start < duration:
    // ceil(max(dur - window, 0) / hop) + 1
    val tail = greatest(col("dur_sec") - windowSec, lit(0))
    docs.select(col("doc_id"), rate.as("sample_rate"), durSec.as("dur_sec"))
      .withColumn("n_samples",
        col("sample_rate").cast("long") * col("dur_sec"))
      .withColumn("n_chunks",
        (floor((tail + (hopSec - 1)) / hopSec) + 1).cast("int"))
  }

  def multimodalAudioChunkQuery(spark: SparkSession, dir: String): DataFrame =
    audioChunkPlan(Tables.documents(spark, dir), windowSec = 30, hopSec = 25)
      .orderBy(col("doc_id"))

  // ------------------------------------------------------- WAV decode tier

  /** Audio asset: opaque WAV container bytes + the generation facts
    * (consulted ONLY by specs — the decoder reads everything back
    * from the payload). */
  case class WavAsset(doc_id: Long, sample_rate: Int, n_samples: Int,
                      payload: Array[Byte])

  /** Decoded-audio facts, every field read back from the BYTES:
    * container type from the javax.sound sniffer, rate/channels/bits
    * from the decoded AudioFormat, the sample count and EXACT integer
    * sample sum from the decoded PCM frames (WAV is lossless — the
    * pixel-sum discipline transfers verbatim), and the chunk schedule
    * computed from the DECODED duration (r15 verdict #5: the r12
    * chunker planned over synthetic metadata; this one plans over
    * what the codec actually recovered). */
  case class DecodedWav(doc_id: Long, format: String, sample_rate: Int,
                        channels: Int, bits: Int, n_samples: Long,
                        sample_sum: Long, n_chunks: Long)

  /** Deterministic int16 sample i of document d — the rule the DuckDB
    * oracle reproduces arithmetically (grayAt's audio twin). */
  private def sampleAt(d: Long, i: Int): Short =
    (((i * 37L + d * 11L) % 65536L) - 32768L).toShort

  /** Generate REAL WAV payloads: 16-bit signed mono little-endian PCM
    * of md5-derived rate and length, containerized through
    * javax.sound.sampled (in the JDK — the PNG/JPEG posture, no codec
    * jar). Encoder runs at the partition-batched boundary. */
  def withWavPayloads(docs: DataFrame): Dataset[WavAsset] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"),
        element_at(array(lit(8000), lit(16000)),
          (hash60(concat(col("text"), lit("#wr"))) % 2 + 1).cast("int"))
          .as("sample_rate"),
        (hash60(concat(col("text"), lit("#wn"))) % 801 + 200).cast("int")
          .as("n_samples"))
      .as[(Long, Int, Int)]
      .mapPartitions { it =>
        it.map { case (d, rate, n) =>
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = sampleAt(d, i)
            pcm(i * 2) = (s & 0xff).toByte
            pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            rate.toFloat, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          try javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          finally ais.close()
          WavAsset(d, rate, n, bos.toByteArray)
        }
      }
  }

  /** REAL WAV decode at the partition-batched boundary: the container
    * type is sniffed from the bytes, format facts come from the
    * decoded AudioFormat, the sample sum from the decoded frames, and
    * the chunk schedule (ceil((n − window)⁺ / hop) + 1 — exact ints,
    * audioChunkPlan's formula in SAMPLES) from the DECODED length. An
    * undecodable/truncated payload degrades to an ("error", -1, …)
    * row instead of failing the partition (decodeImages' contract). */
  def decodeWav(assets: Dataset[WavAsset], windowSamples: Int = 256,
                hopSamples: Int = 200,
                batchSize: Int = 64): Dataset[DecodedWav] = {
    require(hopSamples >= 1 && windowSamples >= hopSamples)
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { a =>
          try {
            // ByteArrayInputStream supports mark/reset — no buffering
            // wrapper, no temp files (the memStream lesson)
            val bis = new java.io.ByteArrayInputStream(a.payload)
            val ftype = javax.sound.sampled.AudioSystem
              .getAudioFileFormat(bis).getType.toString.toLowerCase
            bis.reset()
            val ais = javax.sound.sampled.AudioSystem
              .getAudioInputStream(bis)
            try {
              val f = ais.getFormat
              val declared = ais.getFrameLength // header's frame count
              val bytes = ais.readAllBytes()
              // TRUNCATION is an integrity failure, not a short clip:
              // the header declares the frame count, and a torn body
              // recovers fewer — javax.sound silently clamps to whole
              // frames, so the declared-vs-recovered compare is the
              // only tell (both read from the bytes alone)
              if (f.getSampleSizeInBits != 16 || f.getChannels != 1
                  || f.isBigEndian || bytes.length % 2 != 0
                  || (declared >= 0 && bytes.length / 2 != declared))
                DecodedWav(a.doc_id, "error", -1, -1, -1, -1L, -1L, -1L)
              else {
                val n = bytes.length / 2
                var sum = 0L
                var i = 0
                while (i < n) {
                  sum += (((bytes(i * 2 + 1) & 0xff) << 8)
                    | (bytes(i * 2) & 0xff)).toShort
                  i += 1
                }
                val chunks =
                  (math.max(n - windowSamples, 0) + hopSamples - 1) /
                    hopSamples + 1
                DecodedWav(a.doc_id, ftype, f.getSampleRate.toInt,
                  f.getChannels, f.getSampleSizeInBits, n.toLong, sum,
                  chunks.toLong)
              }
            } finally ais.close()
          } catch {
            case scala.util.control.NonFatal(_) =>
              DecodedWav(a.doc_id, "error", -1, -1, -1, -1L, -1L, -1L)
          }
        }
      }
    }
  }

  def multimodalDecodeWavQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeWav(withWavPayloads(Tables.documents(spark, dir))).toDF()
      .orderBy(col("doc_id"))
  }

  /** The stub decoder's outputs are all deterministic functions of the
    * payload bytes (ASCII text, so bytes == codepoints), which makes
    * even the mapPartitions path oracle-checkable: metadata from
    * md5-derived hashes, checksum as the same left-fold rolling hash
    * via list_reduce. */
  /** multimodal_decode_wav oracle: WAV is LOSSLESS, so the decoded
    * facts replay arithmetically from the generation rule — rate and
    * length from the md5 hashes, the EXACT sample sum over
    * ((i·37 + d·11) mod 65536) − 32768, the chunk count from the
    * decoded length (window 256 / hop 200 samples). A green row
    * proves the javax.sound round-trip recovered every frame. */
  private val decodeWavOracle: String =
    """SELECT doc_id, 'wave' AS format, sample_rate,
      | CAST(1 AS INTEGER) AS channels, CAST(16 AS INTEGER) AS bits,
      | CAST(n AS BIGINT) AS n_samples,
      | CAST(list_sum(list_transform(range(0, n),
      |   i -> (i * 37 + doc_id * 11) % 65536 - 32768)) AS BIGINT)
      |  AS sample_sum,
      | CAST((greatest(n - 256, 0) + 199) // 200 + 1 AS BIGINT) AS n_chunks
      |FROM (
      | SELECT doc_id,
      |  [8000, 16000][CAST(CAST('0x'||substr(md5(text||'#wr'),1,15) AS BIGINT) % 2 + 1 AS INTEGER)] AS sample_rate,
      |  CAST(CAST('0x'||substr(md5(text||'#wn'),1,15) AS BIGINT) % 801 + 200 AS INTEGER) AS n
      | FROM documents)
      |ORDER BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "multimodal_decode_wav" -> decodeWavOracle,
    "multimodal_meta" ->
      """SELECT doc_id, format, width, height, n_bytes, checksum,
        | round(checksum / 1000000007.0, 6) AS feat0
        |FROM (
        | SELECT doc_id,
        |  ['jpeg','png','webp'][CAST(CAST('0x'||substr(md5(source),1,15) AS BIGINT) % 3 + 1 AS INTEGER)] AS format,
        |  CAST(CAST('0x'||substr(md5(text),1,15) AS BIGINT) % 1024 + 64 AS INTEGER) AS width,
        |  CAST(CAST('0x'||substr(md5(text||'#h'),1,15) AS BIGINT) % 1024 + 64 AS INTEGER) AS height,
        |  CAST(length(text) AS BIGINT) AS n_bytes,
        |  list_reduce(
        |   list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(1, length(text)+1),
        |     i -> CAST(ord(substr(text, i, 1)) AS BIGINT))),
        |   (a, b) -> (a * 131 + b) % 1000000007) AS checksum
        | FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // the REAL-decode path: the oracle never sees the PNG bytes — it
    // recomputes what a lossless round-trip of the deterministic gray
    // fill MUST decode to (dimensions from the md5 rule, pixel sum by
    // direct summation), so it checks that the engine's ImageIO
    // encode→decode actually recovered every pixel
    "multimodal_decode_png" ->
      """WITH dims AS (
        | SELECT doc_id,
        |  CAST(CAST('0x'||substr(md5(text),1,15) AS BIGINT) % 32 + 16 AS INTEGER) AS width,
        |  CAST(CAST('0x'||substr(md5(text||'#h'),1,15) AS BIGINT) % 32 + 16 AS INTEGER) AS height
        | FROM documents),
        |px AS (
        | SELECT doc_id, width, height,
        |  CAST(sum((xx.x*31 + yy.y*17 + doc_id*7) % 256) AS BIGINT) AS px_sum
        | FROM dims, UNNEST(range(0, width)) xx(x), UNNEST(range(0, height)) yy(y)
        | GROUP BY doc_id, width, height)
        |SELECT doc_id, 'png' AS format, width, height, px_sum,
        | (px_sum * 10000) // (width * height * 255) AS mean_bp
        |FROM px ORDER BY doc_id""".stripMargin,
    // dHash samples recomputed arithmetically from the fill rule; the
    // sign bit (r=7,c=7) adds the BIGINT min literal because DuckDB
    // rejects 1<<63
    "multimodal_phash" ->
      """WITH dims AS (
        | SELECT doc_id,
        |  CAST(CAST('0x'||substr(md5(text),1,15) AS BIGINT) % 32 + 16 AS INTEGER) AS width,
        |  CAST(CAST('0x'||substr(md5(text||'#h'),1,15) AS BIGINT) % 32 + 16 AS INTEGER) AS height
        | FROM documents),
        |bits AS (
        | SELECT doc_id, width, height, rr.r AS r, cc.c AS c,
        |  (((cc.c * width) // 9) * 31 + ((rr.r * height) // 8) * 17
        |    + doc_id * 7) % 256 AS p1,
        |  ((((cc.c + 1) * width) // 9) * 31 + ((rr.r * height) // 8) * 17
        |    + doc_id * 7) % 256 AS p2
        | FROM dims, UNNEST(range(0, 8)) rr(r), UNNEST(range(0, 8)) cc(c))
        |SELECT doc_id, width, height,
        | CAST(sum(CASE WHEN p1 < p2 THEN
        |   CASE WHEN r * 8 + c = 63 THEN -9223372036854775807 - 1
        |        ELSE (1::BIGINT << CAST(r * 8 + c AS INTEGER)) END
        |  ELSE 0 END) AS BIGINT) AS dhash
        |FROM bits GROUP BY doc_id, width, height
        |ORDER BY doc_id""".stripMargin,
    // exhaustive all-pairs popcount over the analytic hashes — the
    // banding operator must find exactly this set (recall proof)
    "multimodal_phash_pairs" ->
      """WITH dims AS (
        | SELECT doc_id,
        |  CAST(CAST('0x'||substr(md5(text),1,15) AS BIGINT) % 32 + 16 AS INTEGER) AS width,
        |  CAST(CAST('0x'||substr(md5(text||'#h'),1,15) AS BIGINT) % 32 + 16 AS INTEGER) AS height
        | FROM documents),
        |bits AS (
        | SELECT doc_id, rr.r AS r, cc.c AS c,
        |  (((cc.c * width) // 9) * 31 + ((rr.r * height) // 8) * 17
        |    + doc_id * 7) % 256 AS p1,
        |  ((((cc.c + 1) * width) // 9) * 31 + ((rr.r * height) // 8) * 17
        |    + doc_id * 7) % 256 AS p2
        | FROM dims, UNNEST(range(0, 8)) rr(r), UNNEST(range(0, 8)) cc(c)),
        |dh AS (
        | SELECT doc_id, CAST(sum(CASE WHEN p1 < p2 THEN
        |   CASE WHEN r * 8 + c = 63 THEN -9223372036854775807 - 1
        |        ELSE (1::BIGINT << CAST(r * 8 + c AS INTEGER)) END
        |  ELSE 0 END) AS BIGINT) AS dhash
        | FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
        |FROM dh a JOIN dh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    // lossy codec: the oracle pins the exactly-preserved fields only
    // (format sniffed from bytes, dims from the decoded raster); the
    // pixel-sum fidelity check is tolerance-banded in MultimodalJpegSpec
    "multimodal_decode_jpeg" ->
      """SELECT doc_id, 'jpeg' AS format,
        | CAST(CAST('0x'||substr(md5(text),1,15) AS BIGINT) % 32 + 16 AS INTEGER) AS width,
        | CAST(CAST('0x'||substr(md5(text||'#h'),1,15) AS BIGINT) % 32 + 16 AS INTEGER) AS height
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "multimodal_resize" ->
      """SELECT doc_id, width, height,
        | CAST(greatest(1, floor((width*224) / greatest(width, height))) AS INTEGER) AS out_w,
        | CAST(greatest(1, floor((height*224) / greatest(width, height))) AS INTEGER) AS out_h
        |FROM (
        | SELECT doc_id,
        |  CAST(CAST('0x'||substr(md5(text),1,15) AS BIGINT) % 1024 + 64 AS INTEGER) AS width,
        |  CAST(CAST('0x'||substr(md5(text||'#h'),1,15) AS BIGINT) % 1024 + 64 AS INTEGER) AS height
        | FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "multimodal_audiochunks" ->
      """SELECT doc_id, sample_rate, dur_sec,
        | CAST(sample_rate AS BIGINT) * dur_sec AS n_samples,
        | CAST(floor((greatest(dur_sec - 30, 0) + 24) / 25) + 1 AS INTEGER) AS n_chunks
        |FROM (
        | SELECT doc_id,
        |  [16000, 22050, 44100][CAST(CAST('0x'||substr(md5(text||'#r'),1,15) AS BIGINT) % 3 + 1 AS INTEGER)] AS sample_rate,
        |  CAST(CAST('0x'||substr(md5(text||'#d'),1,15) AS BIGINT) % 600 + 5 AS INTEGER) AS dur_sec
        | FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "multimodal_patchgrid" ->
      """SELECT doc_id, out_w, out_h,
        | CAST(floor((out_w + 15) / 16) AS INTEGER) AS grid_w,
        | CAST(floor((out_h + 15) / 16) AS INTEGER) AS grid_h,
        | CAST(floor((out_w + 15) / 16) * floor((out_h + 15) / 16) AS INTEGER) AS n_patches,
        | CAST(floor((out_w + 15) / 16) * floor((out_h + 15) / 16) + 1 AS INTEGER) AS seq_len
        |FROM (
        | SELECT doc_id,
        |  CAST(greatest(1, floor((width*224) / greatest(width, height))) AS INTEGER) AS out_w,
        |  CAST(greatest(1, floor((height*224) / greatest(width, height))) AS INTEGER) AS out_h
        | FROM (
        |  SELECT doc_id,
        |   CAST(CAST('0x'||substr(md5(text),1,15) AS BIGINT) % 1024 + 64 AS INTEGER) AS width,
        |   CAST(CAST('0x'||substr(md5(text||'#h'),1,15) AS BIGINT) % 1024 + 64 AS INTEGER) AS height
        |  FROM documents))
        |ORDER BY doc_id""".stripMargin,
    "multimodal_framesample" ->
      """SELECT doc_id, n_frames,
        | CAST(len(idx) AS INTEGER) AS n_sampled,
        | array_to_string(idx, ',') AS frame_idx
        |FROM (
        | SELECT doc_id, n_frames,
        |  (range(0, n_frames, 30))[1:8] AS idx
        | FROM (
        |  SELECT doc_id,
        |   CAST(CAST('0x'||substr(md5(text||'#v'),1,15) AS BIGINT) % 300 + 30 AS INTEGER) AS n_frames
        |  FROM documents))
        |ORDER BY doc_id""".stripMargin,
  )
}
