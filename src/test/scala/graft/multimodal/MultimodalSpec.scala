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
}
