package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Compression-codec round trips — the reference's codec family
  * (`/root/reference/src/core/org/apache/hadoop/io/compress/GzipCodec.java:31`,
  * `BZip2Codec.java:38`, `LzmaCodec.java:38`) mapped to Spark codec
  * options per SURVEY §1.4: gzip/bzip2 for text (bzip2 block-splittable,
  * like the reference's), zstd/snappy for parquet. The semantics under
  * test: rows survive the codec bit-for-bit, files actually carry the
  * codec extension, and compressed text still reads through the same
  * KVText first-separator contract.
  */
class CodecsSpec extends SparkSpec {

  private def kv = graft.Tables.load(spark, sfDir, "orders")
    .select(col("o_orderkey").cast("string").as("key"),
      col("o_orderstatus").as("value"))

  private def roundTripText(codec: String, ext: String): Unit = {
    val out = s"/tmp/graft_test/codec_$codec"
    val expect = kv.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    kv.select(concat_ws("\t", col("key"), col("value")).as("value"))
      .write.mode("overwrite").option("compression", codec).text(out)
    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.getName.endsWith(ext)),
      s"expected all part files to end in $ext")
    val back = KVText.readKV(spark, out)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back == expect)
  }

  test("gzip text round trip (.gz parts, same rows through readKV)") {
    roundTripText("gzip", ".gz")
  }

  test("bzip2 text round trip (splittable codec, like the reference's)") {
    roundTripText("bzip2", ".bz2")
  }

  test("xz text round trip (the reference's added LZMA codec, re-expressed)") {
    XzCodec.register(spark)
    val out = "/tmp/graft_test/codec_xz"
    val expect = kv.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    kv.select(concat_ws("\t", col("key"), col("value")).as("value"))
      .write.mode("overwrite")
      .option("compression", classOf[XzCodec].getName).text(out)
    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.getName.endsWith(".xz")),
      "part files must carry the .xz extension")
    // the bytes are a real xz container, not just a renamed file
    val magic = java.nio.file.Files.readAllBytes(parts.head.toPath).take(6)
    assert(magic.sameElements(Array(0xFD, '7', 'z', 'X', 'Z', 0x00).map(_.toByte)),
      s"missing xz magic, got ${magic.map("%02x".format(_)).mkString(" ")}")
    val back = KVText.readKV(spark, out)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back == expect)
  }

  test("parquet zstd round trip preserves every column exactly") {
    val out = "/tmp/graft_test/codec_zstd_parquet"
    val src = graft.Tables.load(spark, sfDir, "supplier")
    src.write.mode("overwrite").option("compression", "zstd").parquet(out)
    val parts = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts.nonEmpty && parts.forall(_.getName.contains(".zstd.")),
      "part files must carry the zstd codec tag")
    val back = spark.read.parquet(out)
    assert(back.schema == src.schema)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }
}
