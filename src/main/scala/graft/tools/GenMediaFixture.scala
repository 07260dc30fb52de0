package graft.tools

import graft.GraftSession

/** Writes the real-pixel dHash band signatures of the deterministic
  * PNG corpus ([[graft.multimodal.Multimodal.syntheticRealImages]],
  * n = 200 — the q_media_dedup_real corpus) to
  * `fixtures/media_real_bands.parquet` (one plain parquet file,
  * committed). The ImageIO DECODE happens here, in the harness; the
  * DuckDB oracle reads these bands and replays everything downstream
  * (band bucketing, pigeonhole join, popcount verify) in SQL.
  * MultimodalSpec pins the fixture bit-equal to a live
  * generate→decode→hash pass.
  * Usage: dev/run.sh graft.tools.GenMediaFixture
  */
object GenMediaFixture {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("graft-media-fixture", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.multimodal.Multimodal
    val bands = Multimodal.dHashReal(Multimodal.syntheticRealImages(spark, 200))
    val tmp = java.nio.file.Files.createTempDirectory("media_fixture").toString
    bands.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    val dest = java.nio.file.Paths.get("fixtures/media_real_bands.parquet")
    java.nio.file.Files.createDirectories(dest.getParent)
    java.nio.file.Files.move(part.toPath, dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote ${bands.count()} signatures to $dest")
    spark.stop()
  }
}
