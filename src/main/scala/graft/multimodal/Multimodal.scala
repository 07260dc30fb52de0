package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: opaque `binary` payloads + typed metadata, with
  * decode/feature-extract/resize/frame-sample as partition-batched
  * transforms.
  *
  * No reference analog (the reference is text/KV only); this is the
  * value-add surface mandated by the build plan. The Spark-side plumbing —
  * schema, batching shape, partitioning, column pruning (metadata-only
  * queries never touch payload bytes) — is real and tested. The decode
  * seam ([[MediaCodec]]) ships real-JDK implementations where the JDK
  * bundles a codec: [[ImageIoCodec]] for images (`javax.imageio`,
  * PNG/BMP/GIF/JPEG), [[WavCodec]] for audio (`javax.sound.sampled`), and
  * [[GifFrames]] for multi-frame video sampling (animated GIF). Other
  * video containers use the deterministic [[StubCodec]] — the JDK bundles
  * no general video codec; swap in a JNI/FFI decoder without touching any
  * plumbing.
  *
  * Scale notes:
  *  - payloads stay in `binary` columns end-to-end (Parquet keeps them
  *    row-grouped and compressed; column pruning skips them unless asked);
  *  - transforms run per-partition with an explicit batch size so peak
  *    memory is `batchSize * avgPayload` regardless of partition size;
  *  - derived features land in narrow typed columns so downstream
  *    analytics never rescan payloads.
  */
object Multimodal {

  /** The pluggable decode seam: implement this against a real codec
    * (javax.imageio / JNI ffmpeg / FFI) and pass it to
    * [[extractFeatures]]/[[resize]] — every Spark-side concern
    * (schema, batching, partitioning, payload pruning) is codec-agnostic.
    * Implementations must be Serializable (they ship to executors) and
    * return (width, height, channels, durationMs).
    */
  trait MediaCodec extends Serializable {
    def decode(payload: Array[Byte], modality: String): (Int, Int, Int, Long)
  }

  /** media table schema: id + modality + payload + sidecar metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  final case class MediaFeatures(
    media_id: Long, modality: String, byte_len: Long,
    width: Int, height: Int, channels: Int, duration_ms: Long,
    checksum: String)

  /** STUB codec (the default [[MediaCodec]]): a deterministic fake that
    * parses "dimensions" from the payload bytes (first 8 bytes as two
    * big-endian ints, clamped) so the pipeline has real data-dependent
    * outputs to test partitioning/pruning against. It is an
    * IMPLEMENTATION of the seam, not the API — production swaps in a real
    * codec without touching any plumbing.
    */
  object StubCodec extends MediaCodec {
    override def decode(payload: Array[Byte], modality: String): (Int, Int, Int, Long) =
      decodeStub(payload, modality)
  }

  /** REAL image decode via the JDK's own `javax.imageio` — PNG/BMP/GIF/
    * JPEG readers ship with the JDK, so the image modality needs no
    * external codec library: width/height from the decoded raster,
    * channels from the color model. Audio/video stay on the stub (the
    * JDK bundles no audio/video codecs). An undecodable image payload
    * fails loudly — route through
    * [[graft.ops.Reliability.routeBadRecords]] upstream when the corpus
    * may contain corrupt files (the quarantine pattern).
    */
  object ImageIoCodec extends MediaCodec {
    override def decode(payload: Array[Byte], modality: String): (Int, Int, Int, Long) =
      modality match {
        case "image" =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
          require(img != null,
            "payload is not a decodable image (ImageIO found no reader)")
          (img.getWidth, img.getHeight, img.getColorModel.getNumComponents, 0L)
        case other => StubCodec.decode(payload, other)
      }
  }

  /** REAL audio decode via the JDK's own `javax.sound.sampled` — the WAV
    * (RIFF/PCM) reader ships with the JDK, so the audio modality needs no
    * external codec library either. Field mapping for the (w, h, c, d)
    * tuple, since images and audio share the features row:
    * width = sample rate (Hz), height = bits per sample,
    * channels = channel count, duration from frameLength/frameRate.
    * An undecodable payload fails loudly (quarantine upstream via
    * [[graft.ops.Reliability.routeBadRecords]] for dirty corpora).
    */
  object WavCodec extends MediaCodec {
    override def decode(payload: Array[Byte], modality: String): (Int, Int, Int, Long) =
      modality match {
        case "audio" =>
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(payload))
          try {
            val fmt = in.getFormat
            val durMs =
              if (in.getFrameLength >= 0 && fmt.getFrameRate > 0)
                (in.getFrameLength * 1000.0 / fmt.getFrameRate).toLong
              else 0L
            (fmt.getSampleRate.toInt, fmt.getSampleSizeInBits,
              fmt.getChannels, durMs)
          } finally in.close()
        case other => StubCodec.decode(payload, other)
      }
  }

  /** Best-real-available composite: image via [[ImageIoCodec]], audio via
    * [[WavCodec]] — both pure-JDK — video via [[StubCodec]] (the JDK
    * bundles no video codec; that seam is where a JNI/FFI decoder plugs
    * in).
    */
  object JdkCodec extends MediaCodec {
    override def decode(payload: Array[Byte], modality: String): (Int, Int, Int, Long) =
      modality match {
        case "image" => ImageIoCodec.decode(payload, modality)
        case "audio" => WavCodec.decode(payload, modality)
        case other   => StubCodec.decode(payload, other)
      }
  }

  def decodeStub(payload: Array[Byte], modality: String): (Int, Int, Int, Long) = {
    def beInt(off: Int): Int =
      if (payload.length < off + 4) 0
      else ((payload(off) & 0xff) << 24) | ((payload(off + 1) & 0xff) << 16) |
        ((payload(off + 2) & 0xff) << 8) | (payload(off + 3) & 0xff)
    val w = math.floorMod(beInt(0), 4096) + 1
    val h = math.floorMod(beInt(4), 4096) + 1
    val channels = modality match {
      case "image" => 3
      case "audio" => 2
      case _       => 3
    }
    val durationMs = if (modality == "image") 0L
      else math.floorMod(beInt(0).toLong, 600000L)
    (w, h, channels, durationMs)
  }

  /** Decode + feature-extract, partition-batched. The iterator is consumed
    * in `batchSize` groups so a 10 GB partition of 100 KB payloads never
    * materializes at once.
    */
  def extractFeatures(media: DataFrame, batchSize: Int = 64,
                      codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "modality", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // batch boundary = where a real codec would init/reuse buffers
          batch.iterator.map { case (id, modality, payload) =>
            val (w, h, c, d) = codec.decode(payload, modality)
            val md5 = java.security.MessageDigest.getInstance("MD5")
              .digest(payload).map("%02x".format(_)).mkString
            MediaFeatures(id, modality, payload.length.toLong, w, h, c, d, md5)
          }
        }
      }
  }

  /** Resize stub: emits a new payload of the target "resolution" (fake:
    * truncated/padded bytes) + updated metadata — demonstrates
    * payload-rewriting transforms keep the binary column shape.
    */
  def resizeStub(media: DataFrame, maxDim: Int,
                 codec: MediaCodec = StubCodec): DataFrame = {
    val resize = udf { (payload: Array[Byte], modality: String) =>
      val (w, h, _, _) = codec.decode(payload, modality)
      val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
      val newLen = math.max(8, (payload.length * scale * scale).toInt)
      java.util.Arrays.copyOf(payload, newLen)
    }
    media.withColumn("payload", resize(col("payload"), col("modality")))
  }

  /** REAL multi-frame decode for the GIF container via the JDK's ImageIO
    * GIF reader — the one video-ish container the JDK can open without an
    * external codec, which makes [[sampleFrames]] real for it. Frames are
    * returned as stored (no disposal/compositing replay — feature
    * pipelines hash/measure the patch, they don't replay an animation);
    * per-frame delay comes from the GraphicControlExtension (centiseconds;
    * 0 normalized to the de-facto 100 ms, as renderers do).
    */
  object GifFrames {
    def isGif(payload: Array[Byte]): Boolean =
      payload.length >= 4 && payload(0) == 'G' && payload(1) == 'I' &&
        payload(2) == 'F' && payload(3) == '8'

    /** (startMs, delayMs, frame) for every stored frame, start times
      * cumulative from 0.
      */
    def decode(payload: Array[Byte]): Seq[(Long, Long, java.awt.image.BufferedImage)] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, "payload is not a readable GIF")
      val reader = readers.next()
      try {
        reader.setInput(iis, false, false) // keep metadata: delays live there
        val n = reader.getNumImages(true)
        var ts = 0L
        (0 until n).map { i =>
          val img = reader.read(i)
          val delay = frameDelayMs(reader.getImageMetadata(i))
          val start = ts
          ts += delay
          (start, delay, img)
        }
      } finally { reader.dispose(); iis.close() }
    }

    private def frameDelayMs(meta: javax.imageio.metadata.IIOMetadata): Long = {
      val root = meta.getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val gce = root.getElementsByTagName("GraphicControlExtension")
      val centis = if (gce.getLength == 0) 10L
        else gce.item(0).asInstanceOf[org.w3c.dom.Element]
          .getAttribute("delayTime").toLong
      if (centis == 0L) 100L else centis * 10L
    }

    /** PNG-encode a decoded frame (a self-contained payload downstream
      * image ops can decode independently).
      */
    def toPng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
  }

  /** Frame sampling for video: the frame visible at each instant
    * `0, everyMs, 2·everyMs, …` of the clip's duration — a 1→N generator
    * keeping media_id lineage. GIF payloads decode for REAL through
    * [[GifFrames]] (frames PNG-encoded); other containers fall back to the
    * deterministic stub (the JDK bundles no other video codec — that seam
    * is where a JNI/FFI decoder plugs in).
    */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.where(col("modality") === "video")
      .select("media_id", "modality", "payload").as[(Long, String, Array[Byte])]
      .flatMap { case (id, modality, payload) =>
        if (GifFrames.isGif(payload)) {
          val frames = GifFrames.decode(payload)
          val totalMs = frames.lastOption.map { case (s, d, _) => s + d }.getOrElse(0L)
          // same 1000-sample budget as the stub path: GCE delays go up to
          // 65535 cs/frame, so an unclamped totalMs/everyMs would amplify
          // one payload into millions of PNG rows inside a single flatMap
          val instants = (0L until math.max(1L, totalMs) by everyMs).take(1000)
          instants.flatMap { t =>
            frames.find { case (s, d, _) => t >= s && t < s + d }
              .map { case (_, _, img) => (id, t, GifFrames.toPng(img)) }
          }
        } else {
          val (_, _, _, durMs) = decodeStub(payload, modality)
          val n = math.max(1, (durMs / everyMs).toInt)
          (0 until math.min(n, 1000)).map { f =>
            (id, f.toLong * everyMs, java.util.Arrays.copyOfRange(
              payload, 0, math.min(payload.length, 64)))
          }
        }
      }.toDF("media_id", "frame_ms", "frame_payload")
  }

  /** Deterministic synthetic media table (tests / demos): payload bytes
    * derived from the id via md5 expansion.
    */
  /** 60-bit difference-hash (dHash) over the stub pixel grid, as FOUR
    * 15-bit band columns `b0..b3` — the perceptual-dedup signature for
    * the image/video side of a corpus. Classic dHash compares adjacent
    * cells of a downsampled grayscale grid; the stub path reads the
    * payload's leading bytes as that grid (6 rows × 11 cells, 10
    * comparisons per row — no comparison straddles a row boundary),
    * indexed modulo the payload length so the hash is total on any
    * input. Swap the byte reads for real resampled pixels at the
    * [[MediaCodec]] seam and nothing downstream changes. 60 bits (not
    * 64) keeps every band value and the assembled hash inside signed
    * 64-bit range on ANY engine — DuckDB errors on BIGINT overflow, so
    * the oracle could not replay a bit-63 hash.
    *
    * Takes the payload rendered as a string (`ascii`/`substring` are
    * string ops; the ASCII-soup test corpus and any UTF-8-safe
    * rendering of real bytes both work) — pure codegen, no UDF.
    */
  def dHashStubBands(payloadText: org.apache.spark.sql.Column)
      : Seq[org.apache.spark.sql.Column] = {
    val g = greatest(length(payloadText) - 1, lit(1))
    def bit(k: Int): org.apache.spark.sql.Column = {
      val idx = lit((k / 10) * 11 + k % 10) % g
      ascii(payloadText.substr(idx + lit(1), lit(1))) >
        ascii(payloadText.substr(idx + lit(2), lit(1)))
    }
    (0 until 4).map { b =>
      (0 until 15).map { j =>
        when(bit(15 * b + j), lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
  }

  /** Perceptual near-duplicate media pairs: [[dHashStubBands]] signatures
    * through the SAME pigeonhole band self-join as the text SimHash path
    * ([[graft.dedup.Dedup]] `bandedHammingPairs`) — lossless at total
    * Hamming ≤ 3 over the 4 bands, `maxBucket` guarding degenerate
    * buckets (identical boilerplate thumbnails), never all pairs.
    * Output: (media_a, media_b, hamming ≤ maxHamming).
    */
  def mediaNearDups(media: DataFrame, maxHamming: Int = 3,
                    maxBucket: Int = 1000,
                    payloadText: String = "payload_text",
                    id: String = "media_id"): DataFrame = {
    require(maxHamming <= 3,
      "4-band pigeonhole only guarantees recall for Hamming <= 3")
    val bands = dHashStubBands(col(payloadText))
    val sig = media.select(col(id) +:
      bands.zipWithIndex.map { case (b, k) => b.as(s"b$k") }: _*)
    graft.dedup.Dedup.bandedHammingPairs(sig, nBands = 4,
        maxHamming = maxHamming, maxBucket = maxBucket, id = id)
      .withColumnRenamed("doc_a", "media_a")
      .withColumnRenamed("doc_b", "media_b")
  }

  /** REAL-pixel 60-bit dHash for ImageIO-decodable payloads — the
    * "swap real resampled pixels in at the seam" step
    * [[dHashStubBands]]'s doc promises: decode, box-average down to the
    * same 6×11 grayscale grid (integer-quantized luma so the grid is
    * bit-deterministic), compare adjacent cells — identical band layout,
    * so the banded join, the pigeonhole guarantee and every downstream
    * consumer are unchanged. Returns None for undecodable payloads
    * (quarantine upstream for dirty corpora). Runs inside
    * [[dHashReal]]'s mapPartitions — decode work stays in the scan
    * stage, only the 4 band longs per image ever shuffle.
    */
  def dHashRealBands(payload: Array[Byte]): Option[Seq[Long]] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null || img.getWidth < 1 || img.getHeight < 1) None
    else {
      val gw = 11; val gh = 6
      val grid = Array.ofDim[Long](gh, gw) // 1000×-quantized mean luma
      var gy = 0
      while (gy < gh) {
        var gx = 0
        while (gx < gw) {
          val x0 = gx * img.getWidth / gw
          val x1 = math.max(x0 + 1, (gx + 1) * img.getWidth / gw)
          val y0 = gy * img.getHeight / gh
          val y1 = math.max(y0 + 1, (gy + 1) * img.getHeight / gh)
          var s = 0L; var c = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              // integer Rec.601 luma ×1000 — no float in the grid
              s += ((rgb >> 16) & 0xFF) * 299L + ((rgb >> 8) & 0xFF) * 587L +
                (rgb & 0xFF) * 114L
              c += 1; x += 1
            }
            y += 1
          }
          grid(gy)(gx) = s / c
          gx += 1
        }
        gy += 1
      }
      Some((0 until 4).map { b =>
        (0 until 15).map { j =>
          val k = 15 * b + j
          val row = k / 10; val c0 = k % 10
          if (grid(row)(c0) > grid(row)(c0 + 1)) 1L << j else 0L
        }.sum
      })
    }
  }

  /** (media_id, b0..b3) real-pixel signature table — the drop-in
    * replacement for the stub signature select in [[mediaNearDups]].
    * Undecodable payloads are dropped (count them upstream if the
    * corpus is dirty).
    */
  def dHashReal(media: DataFrame, payload: String = "payload",
                id: String = "media_id"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(id).cast("long"), col(payload))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (i, p) =>
        dHashRealBands(p).map(bs => (i, bs(0), bs(1), bs(2), bs(3)))
      })
      .toDF(id, "b0", "b1", "b2", "b3")
  }

  /** [[mediaNearDups]] over REAL decoded pixels: same pigeonhole band
    * join, same lossless Hamming ≤ 3 guarantee, real signatures.
    */
  def mediaNearDupsReal(media: DataFrame, maxHamming: Int = 3,
                        maxBucket: Int = 1000, payload: String = "payload",
                        id: String = "media_id"): DataFrame = {
    require(maxHamming <= 3,
      "4-band pigeonhole only guarantees recall for Hamming <= 3")
    graft.dedup.Dedup.bandedHammingPairs(dHashReal(media, payload, id),
        nBands = 4, maxHamming = maxHamming, maxBucket = maxBucket, id = id)
      .withColumnRenamed("doc_a", "media_a")
      .withColumnRenamed("doc_b", "media_b")
  }

  /** Deterministic REAL-PNG corpus for the real-pixel dHash path:
    * `n` images in groups of 3 — a base horizontal gradient whose wrap
    * point shifts per group, a one-grid-cell +40 luma nudge of it (a
    * planted near-dup: the nudge flips at most the two adjacent-cell
    * comparisons bordering the cell), and its inversion (every
    * comparison flipped — never pairs with its base). Pixels are a pure
    * integer function of `media_id` and PNG is lossless, so the decoded
    * grid — and therefore [[dHashRealBands]] — is bit-reproducible:
    * that determinism is what lets the committed
    * `fixtures/media_real_bands.parquet` stand in for the decode step
    * on the DuckDB oracle side (decode runs in the harness; everything
    * downstream of it replays in SQL). Gradient wrap points repeat
    * every 11 groups, so identical-pattern images across groups pair at
    * hamming 0 — deliberate: the exact-dup limb of the output.
    */
  def syntheticRealImages(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val g = (i / 3).toInt; val v = (i % 3).toInt
      val w = 110; val h = 60
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var p = (((x + 10 * g) % w) * 255) / (w - 1)
          if (v == 2) p = 255 - p
          if (v == 1 && x >= 40 && x < 50 && y >= 20 && y < 30)
            p = math.min(255, p + 40)
          img.setRGB(x, y, (p << 16) | (p << 8) | p)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      (i, bos.toByteArray)
    }.toDF("media_id", "payload")
  }

  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val seed = md.digest(s"media$i".getBytes("UTF-8"))
      val payload = Array.tabulate((i % 500 + 64).toInt)(j => seed((j + i.toInt) % 16))
      val modality = Seq("image", "audio", "video")(i.toInt % 3)
      (i, modality, payload, s"application/x-fake-$modality",
        Map("source" -> s"synth${i % 4}"))
    }.toDF("media_id", "modality", "payload", "mime", "meta")
  }
}
