package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  lazy val media = Multimodal.syntheticMedia(spark, 300)

  test("feature extraction: one row per media, stable across partitionings") {
    val f1 = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(7), batchSize = 5)
      .collect().map(f => f.media_id -> f).toMap
    assert(f1.size == 300 && f2.size == 300)
    assert(f1 == f2) // batch size / partitioning never changes results
    // images have no duration; all payloads checksummed
    f1.values.foreach { f =>
      if (f.modality == "image") assert(f.duration_ms == 0L)
      assert(f.checksum.length == 32)
      assert(f.width >= 1 && f.height >= 1)
    }
  }

  test("metadata-only query prunes the payload column from the scan") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString + "/t"
    media.write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).groupBy("modality").count()
    val scanSchema = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(scanSchema.contains("modality"))
    assert(!scanSchema.contains("payload"), "payload must be pruned from metadata queries")
  }

  test("resize stub shrinks payloads but keeps schema") {
    val resized = Multimodal.resizeStub(media, maxDim = 64)
    assert(resized.schema("payload").dataType.typeName == "binary")
    val before = media.agg(sum(length(col("payload")))).head().getLong(0)
    val after = resized.agg(sum(length(col("payload")))).head().getLong(0)
    assert(after <= before)
  }

  test("frame sampling generates frames only for video with lineage") {
    val frames = Multimodal.sampleFrames(media, everyMs = 60000)
    val mods = frames.join(media, "media_id").select("modality").distinct()
      .collect().map(_.getString(0)).toSet
    assert(mods == Set("video"))
    assert(frames.count() >= media.where(col("modality") === "video").count())
  }

  test("animated GIF: sampleFrames decodes the actual frames, one per instant") {
    import spark.implicits._
    val gif = MultimodalSpec.animatedGif(nFrames = 5, delayCs = 100) // 5 x 1000ms
    // raw multi-frame decode: actual frame count + accumulated timestamps
    val decoded = Multimodal.GifFrames.decode(gif)
    assert(decoded.length == 5, s"expected 5 stored frames, got ${decoded.length}")
    assert(decoded.map(_._1) == Seq(0L, 1000L, 2000L, 3000L, 4000L))
    val media = Seq(
      (1L, "video", gif, "image/gif", Map("src" -> "test")),
      (2L, "image", gif, "image/gif", Map("src" -> "test")) // non-video: excluded
    ).toDF("media_id", "modality", "payload", "mime", "meta")
    // 5s clip sampled at 1s -> the 5 real frames, PNG-encoded
    val perSec = Multimodal.sampleFrames(media, everyMs = 1000).collect()
    assert(perSec.length == 5)
    assert(perSec.map(_.getLong(1)).sorted.toSeq ==
      Seq(0L, 1000L, 2000L, 3000L, 4000L))
    val pngs = perSec.map(_.getAs[Array[Byte]](2))
    pngs.foreach { p =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
      assert(img != null && img.getWidth == 16, "frame payload must be a decodable image")
    }
    // frames differ (each was painted a different color)
    assert(pngs.map(_.toSeq).distinct.length == 5, "sampled frames should be distinct")
    // coarser sampling picks fewer frames: instants 0 and 2500 of a 5s clip
    assert(Multimodal.sampleFrames(media, everyMs = 2500).count() == 2)
  }

  test("ImageIoCodec decodes real PNG and BMP payloads end-to-end") {
    import java.awt.image.BufferedImage
    def imageBytes(w: Int, h: Int, fmt: String, imgType: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, imgType)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    import spark.implicits._
    val rows = Seq(
      (1L, "image", imageBytes(17, 9, "png", BufferedImage.TYPE_INT_RGB),
        "image/png", Map.empty[String, String]),
      (2L, "image", imageBytes(33, 21, "bmp", BufferedImage.TYPE_3BYTE_BGR),
        "image/bmp", Map.empty[String, String]),
      (3L, "audio", Array.tabulate[Byte](64)(_.toByte),
        "application/x-fake-audio", Map.empty[String, String]))
    val df = rows.toDF("media_id", "modality", "payload", "mime", "meta")
    val f = Multimodal.extractFeatures(df, batchSize = 2,
      codec = Multimodal.ImageIoCodec).collect().map(x => x.media_id -> x).toMap
    // real decoded dimensions, not stub arithmetic
    assert(f(1L).width == 17 && f(1L).height == 9 && f(1L).channels == 3)
    assert(f(1L).duration_ms == 0L)
    assert(f(2L).width == 33 && f(2L).height == 21 && f(2L).channels == 3)
    // non-image modalities still flow through the stub
    val (sw, sh, sc, sd) = Multimodal.decodeStub(
      Array.tabulate[Byte](64)(_.toByte), "audio")
    assert(f(3L).width == sw && f(3L).height == sh
      && f(3L).channels == sc && f(3L).duration_ms == sd)
    // a corrupt "image" fails loudly instead of fabricating dimensions
    assertThrows[org.apache.spark.SparkException] {
      Seq((9L, "image", Array[Byte](1, 2, 3), "image/png",
        Map.empty[String, String]))
        .toDF("media_id", "modality", "payload", "mime", "meta")
        .transform(d => Multimodal.extractFeatures(d,
          codec = Multimodal.ImageIoCodec).toDF)
        .collect()
    }
  }

  test("WavCodec decodes a real RIFF/PCM WAV via javax.sound (pure JDK)") {
    import javax.sound.sampled._
    def wavBytes(sampleRate: Float, channels: Int, frames: Int): Array[Byte] = {
      val fmt = new AudioFormat(sampleRate, 16, channels, true, false)
      val pcm = Array.tabulate[Byte](frames * 2 * channels)(i => (i * 7).toByte)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    import spark.implicits._
    val df = Seq(
      (1L, "audio", wavBytes(8000f, 1, 4000), "audio/wav",
        Map.empty[String, String]),
      (2L, "audio", wavBytes(16000f, 2, 8000), "audio/wav",
        Map.empty[String, String]),
      (3L, "video", Array.tabulate[Byte](64)(_.toByte), "video/fake",
        Map.empty[String, String]))
      .toDF("media_id", "modality", "payload", "mime", "meta")
    val f = Multimodal.extractFeatures(df, batchSize = 2,
      codec = Multimodal.JdkCodec).collect().map(x => x.media_id -> x).toMap
    // real header fields: width=sampleRate, height=bitsPerSample,
    // duration from frame count (4000 frames @ 8kHz = 8000 @ 16kHz = 500ms)
    assert(f(1L).width == 8000 && f(1L).height == 16 && f(1L).channels == 1
      && f(1L).duration_ms == 500L)
    assert(f(2L).width == 16000 && f(2L).channels == 2
      && f(2L).duration_ms == 500L)
    // video still flows through the stub under the composite codec
    val (sw, sh, sc, sd) = Multimodal.decodeStub(
      Array.tabulate[Byte](64)(_.toByte), "video")
    assert(f(3L).width == sw && f(3L).height == sh && f(3L).channels == sc
      && f(3L).duration_ms == sd)
    // corrupt audio fails loudly instead of fabricating a header
    assertThrows[org.apache.spark.SparkException] {
      Seq((9L, "audio", Array[Byte](1, 2, 3), "audio/wav",
        Map.empty[String, String]))
        .toDF("media_id", "modality", "payload", "mime", "meta")
        .transform(d => Multimodal.extractFeatures(d,
          codec = Multimodal.JdkCodec).toDF)
        .collect()
    }
  }

  test("codec seam: a non-stub decoder plugs in without plumbing changes") {
    // fake "real" codec: fixed dims per modality — proves extractFeatures
    // is codec-agnostic (the stub is an implementation, not the API)
    object FixedCodec extends Multimodal.MediaCodec {
      override def decode(payload: Array[Byte], modality: String): (Int, Int, Int, Long) =
        modality match {
          case "image" => (640, 480, 3, 0L)
          case "audio" => (0, 0, 2, 42000L)
          case _       => (1920, 1080, 3, 90000L)
        }
    }
    val f = Multimodal.extractFeatures(media, batchSize = 16, codec = FixedCodec)
      .collect()
    assert(f.length == 300)
    f.foreach { r =>
      r.modality match {
        case "image" => assert(r.width == 640 && r.height == 480 && r.duration_ms == 0L)
        case "audio" => assert(r.channels == 2 && r.duration_ms == 42000L)
        case _       => assert(r.width == 1920 && r.duration_ms == 90000L)
      }
      // payload-derived fields still flow from the real pipeline
      assert(r.byte_len > 0 && r.checksum.length == 32)
    }
  }

  test("mediaNearDups: byte-identical payloads at hamming 0, a one-cell " +
    "perturbation nearby, unrelated media absent") {
    import spark.implicits._
    val base = "The quick brown fox jumps over the lazy dog while seven " +
      "wizards mix a potion of zinc and quartz for the king's breakfast"
    // flip ONE grid cell (position 30, a space) to '~' (above every
    // letter) — both adjacent comparisons invert, so exactly 2 of 60
    // bits move
    val tweaked = base.updated(30, '~')
    val other = (1 to 130).map(i => ('a' + (i * 7) % 26).toChar).mkString
    val media = Seq((1L, base), (2L, base), (3L, tweaked), (4L, other))
      .toDF("media_id", "payload_text")
    val got = graft.multimodal.Multimodal.mediaNearDups(media)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 2L)) == 0L)                       // exact dup
    assert(got.get((1L, 3L)).exists(h => h >= 1 && h <= 3)) // near dup
    assert(!got.keySet.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated
  }

  test("dHashStubBands: bands are 15-bit and deterministic across " +
    "partitionings") {
    import spark.implicits._
    val rows = (1 to 300).map(i =>
      (i.toLong, (0 until 80).map(j => ('!' + (i * 13 + j * j) % 90).toChar).mkString))
    def sigs(parts: Int) = rows.toDF("media_id", "payload_text")
      .repartition(parts)
      .select(col("media_id") +: graft.multimodal.Multimodal
        .dHashStubBands(col("payload_text")).zipWithIndex
        .map { case (b, k) => b.as(s"b$k") }: _*)
      .collect().map(r => r.getLong(0) ->
        (1 to 4).map(r.getLong).toSeq).toMap
    val a = sigs(1)
    assert(a == sigs(11))
    assert(a.values.flatten.forall(v => v >= 0 && v < 32768))
  }

  test("real-pixel dHash: identical images hash equal, a local brightness " +
    "nudge stays within hamming 3, an inverted image does not pair") {
    import java.awt.image.BufferedImage
    def gradient(invert: Boolean, nudge: Boolean): Array[Byte] = {
      val w = 110; val h = 60
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) {
        // strong horizontal gradient → decisive adjacent-cell comparisons
        var v = (x * 255) / (w - 1)
        if (invert) v = 255 - v
        // brighten ONE grid cell (row 2, col 4 spans x 40..49, y 20..29)
        if (nudge && x >= 40 && x < 50 && y >= 20 && y < 30)
          v = math.min(255, v + 40)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    import spark.implicits._
    val media = Seq(
      (1L, gradient(invert = false, nudge = false)),
      (2L, gradient(invert = false, nudge = false)), // byte-identical twin
      (3L, gradient(invert = false, nudge = true)),  // one-cell nudge
      (4L, gradient(invert = true, nudge = false)),  // reversed comparisons
      (5L, "not an image".getBytes("UTF-8"))         // undecodable → dropped
    ).toDF("media_id", "payload")
    val sig = graft.multimodal.Multimodal.dHashReal(media)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong).toSeq).toMap
    assert(sig.keySet == Set(1L, 2L, 3L, 4L), "undecodable row must drop")
    assert(sig(1L) == sig(2L))
    val pairs = graft.multimodal.Multimodal.mediaNearDupsReal(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(pairSet.contains((1L, 2L)), "identical twins must pair at 0")
    assert(pairs.find(p => p._1 == 1L && p._2 == 2L).get._3 == 0L)
    // the nudge flips at most the two comparisons bordering the cell
    assert(pairSet.contains((1L, 3L)), s"nudged copy must pair: $pairs")
    assert(!pairSet.exists(p => p._2 == 4L && p._1 != 4L),
      s"inverted gradient must not pair with the originals: $pairs")
  }

  test("committed media-bands fixture is bit-equal to a live " +
    "generate→decode→hash pass") {
    // the q_media_dedup_real oracle starts from this fixture in place
    // of the ImageIO decode DuckDB can't do; a generator or dHash
    // change without a fixture regen (or vice versa) fails here
    import graft.multimodal.Multimodal
    val live = Multimodal
      .dHashReal(Multimodal.syntheticRealImages(spark, 200))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq.sorted
    val fixture = spark.read.parquet("fixtures/media_real_bands.parquet")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq.sorted
    assert(live.size == 200)
    assert(live == fixture)
    // planted structure present: every base (id % 3 == 0) pairs with
    // its one-cell nudge (id + 1) at hamming ≤ 2
    val pairs = Multimodal
      .mediaNearDupsReal(Multimodal.syntheticRealImages(spark, 12))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    (0L until 12L by 3).foreach { base =>
      val p = pairs.find(p => p._1 == base && p._2 == base + 1)
      assert(p.nonEmpty && p.get._3 <= 2,
        s"base $base must pair with its nudge: ${pairs.toList}")
    }
  }
}

object MultimodalSpec {

  /** Write a real animated GIF with `nFrames` frames of `delayCs`
    * centiseconds each (the delay rides each frame's
    * GraphicControlExtension, exactly where GifFrames reads it back).
    */
  def animatedGif(nFrames: Int, delayCs: Int, size: Int = 16): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    import java.awt.image.BufferedImage
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until nFrames).foreach { i =>
      val img = new BufferedImage(size, size, BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color((i * 47) % 256, (i * 83) % 256, (i * 131) % 256))
      g.fillRect(0, 0, size, size)
      g.dispose()
      val meta = writer.getDefaultImageMetadata(
        ImageTypeSpecifier.createFromBufferedImageType(BufferedImage.TYPE_INT_RGB),
        writer.getDefaultWriteParam)
      val fmt = meta.getNativeMetadataFormatName // javax_imageio_gif_image_1.0
      val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      val gce = new IIOMetadataNode("GraphicControlExtension")
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", delayCs.toString)
      gce.setAttribute("transparentColorIndex", "0")
      root.appendChild(gce)
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new IIOImage(img, null, meta), null)
    }
    writer.endWriteSequence()
    ios.close()
    bos.toByteArray
  }
}
