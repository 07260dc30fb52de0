package graft.sources

import java.io.{InputStream, OutputStream}

import org.apache.hadoop.conf.{Configurable, Configuration}
import org.apache.hadoop.io.compress.{CompressionCodec, CompressionInputStream, CompressionOutputStream, Compressor, Decompressor}
import org.apache.spark.sql.SparkSession
import org.tukaani.xz.{LZMA2Options, XZInputStream, XZOutputStream}

/** XZ (LZMA2) compression codec — the re-expression of the one codec the
  * reference ADDED to stock Hadoop, its Facebook LZMA codec
  * (`/root/reference/src/core/org/apache/hadoop/io/compress/LzmaCodec.java:38`):
  * SURVEY §1.4 maps it to the xz container, whose LZMA2 is the same
  * algorithm family. Spark bundles the `org.tukaani.xz` streams (for
  * parquet's LZMA page codec) but ships no Hadoop codec over them — this
  * class is that bridge, so `option("compression",
  * classOf[XzCodec].getName)` works on any text/csv/json sink and
  * `.xz` files read back through the normal line readers once
  * [[XzCodec.register]] adds the codec to the Hadoop codec factory.
  *
  * Non-splittable, like the reference's LZMA codec (and gzip): one file =
  * one input split, so at 100 TB the writer — not a split planner — sizes
  * the files. The Compressor/Decompressor surfaces are stream-backed
  * stubs: Hadoop's line readers only pull a pooled decompressor to hand
  * it straight back to `createInputStream`, which here wraps the raw
  * stream in [[XZInputStream]] directly (same approach as Hadoop codecs
  * that predate the native pool).
  */
class XzCodec extends CompressionCodec with Configurable {

  private var conf: Configuration = new Configuration(false)
  override def setConf(c: Configuration): Unit = conf = c
  override def getConf: Configuration = conf

  override def getDefaultExtension: String = ".xz"

  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new CompressionOutputStream(out) {
      private val xz = new XZOutputStream(out, new LZMA2Options(XzCodec.Preset))
      private var finished = false
      override def write(b: Int): Unit = xz.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        xz.write(b, off, len)
      // close() in the superclass calls finish() then closes the raw
      // stream; finish() writes the xz index + stream footer
      override def finish(): Unit =
        if (!finished) { finished = true; xz.finish() }
      override def flush(): Unit = xz.flush()
      override def resetState(): Unit =
        throw new UnsupportedOperationException("xz: resetState unsupported")
    }

  override def createOutputStream(out: OutputStream, c: Compressor): CompressionOutputStream =
    createOutputStream(out)

  override def createInputStream(in: InputStream): CompressionInputStream =
    new CompressionInputStream(in) {
      private val xz = new XZInputStream(in)
      override def read(): Int = xz.read()
      override def read(b: Array[Byte], off: Int, len: Int): Int =
        xz.read(b, off, len)
      override def available(): Int = xz.available()
      override def resetState(): Unit =
        throw new UnsupportedOperationException("xz: resetState unsupported")
    }

  override def createInputStream(in: InputStream, d: Decompressor): CompressionInputStream =
    createInputStream(in)

  override def getCompressorType: Class[_ <: Compressor] = classOf[XzCodec.StreamCompressor]
  override def createCompressor(): Compressor = new XzCodec.StreamCompressor
  override def getDecompressorType: Class[_ <: Decompressor] = classOf[XzCodec.StreamDecompressor]
  override def createDecompressor(): Decompressor = new XzCodec.StreamDecompressor
}

object XzCodec {

  /** LZMA2 preset 6 — xz's own default; the reference's codec likewise
    * shipped a fixed mid-level preset.
    */
  val Preset: Int = 6

  /** Append this codec to the Hadoop codec factory so `.xz` files are
    * transparently decoded by extension on read (the factory otherwise
    * knows only the stock codecs).
    */
  def register(spark: SparkSession): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val key = "io.compression.codecs"
    val cls = classOf[XzCodec].getName
    val cur = Option(conf.get(key)).filter(_.nonEmpty)
    if (!cur.exists(_.split(",").map(_.trim).contains(cls)))
      conf.set(key, (cur.toSeq ++ defaultCodecs :+ cls).distinct.mkString(","))
  }

  /** Defensive only: `CompressionCodecFactory.getCodecClasses` APPENDS
    * conf-listed classes to its ServiceLoader discoveries, so the stock
    * codecs stay registered either way — re-listing them just keeps the
    * factory's behavior explicit if a deployment ships a stripped
    * ServiceLoader manifest.
    */
  private val defaultCodecs = Seq(
    "org.apache.hadoop.io.compress.DefaultCodec",
    "org.apache.hadoop.io.compress.GzipCodec",
    "org.apache.hadoop.io.compress.BZip2Codec",
    "org.apache.hadoop.io.compress.DeflateCodec",
    "org.apache.hadoop.io.compress.Lz4Codec",
    "org.apache.hadoop.io.compress.SnappyCodec")

  /** Pool-compatible stubs: the data path never touches them (both
    * `createInputStream`/`createOutputStream` overloads wrap the raw
    * stream directly), but `CodecPool.getDecompressor` instantiates and
    * recycles one per reader, so construction, `reset`, and `end` must
    * be cheap no-ops.
    */
  final class StreamCompressor extends Compressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = unsupported()
    override def needsInput(): Boolean = unsupported()
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = unsupported()
    override def getBytesRead: Long = 0L
    override def getBytesWritten: Long = 0L
    override def finish(): Unit = unsupported()
    override def finished(): Boolean = unsupported()
    override def compress(b: Array[Byte], off: Int, len: Int): Int = unsupported()
    override def reset(): Unit = ()
    override def end(): Unit = ()
    override def reinit(conf: Configuration): Unit = ()
  }

  final class StreamDecompressor extends Decompressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = unsupported()
    override def needsInput(): Boolean = unsupported()
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = unsupported()
    override def needsDictionary(): Boolean = unsupported()
    override def finished(): Boolean = unsupported()
    override def decompress(b: Array[Byte], off: Int, len: Int): Int = unsupported()
    override def getRemaining: Int = 0
    override def reset(): Unit = ()
    override def end(): Unit = ()
  }

  private def unsupported(): Nothing = throw new UnsupportedOperationException(
    "XzCodec is stream-backed; use createInputStream/createOutputStream")
}
