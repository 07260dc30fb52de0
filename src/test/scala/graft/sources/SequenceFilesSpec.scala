package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SequenceFilesSpec extends SparkSpec {

  test("Text/Text SequenceFile round-trip") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("seq").toString + "/kv"
    val df = Seq(("k1", "v1"), ("k2", "v2"), ("k3", "v3")).toDF("key", "value")
    SequenceFiles.writeKV(df, dir)
    val back = SequenceFiles.readKV(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(back == Set("k1" -> "v1", "k2" -> "v2", "k3" -> "v3"))
  }

  test("SequenceFile of a real table survives the bridge") {
    val dir = java.nio.file.Files.createTempDirectory("seq2").toString + "/nation"
    val nation = graft.Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    SequenceFiles.writeKV(nation, dir)
    val back = SequenceFiles.readKV(spark, dir)
    assert(back.count() == nation.count())
    val pairs = back.collect().map(r => (r.getString(0).toInt, r.getString(1))).toSet
    val orig = nation.collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(pairs == orig)
  }

  test("named multi-output writes each subset with counts") {
    val dir = java.nio.file.Files.createTempDirectory("multi").toString
    val ev = graft.Tables.load(spark, sfDir, "events")
    val counts = MultiOutput.writeNamed(ev, "event_type", dir, Seq("click", "error"))
    assert(counts.keySet == Set("click", "error"))
    val clicks = spark.read.parquet(s"$dir/click")
    assert(clicks.count() == counts("click"))
    assert(clicks.select("event_type").distinct().head().getString(0) == "click")
    val total = ev.where(col("event_type").isin("click", "error")).count()
    assert(counts.values.sum == total)
  }
}
