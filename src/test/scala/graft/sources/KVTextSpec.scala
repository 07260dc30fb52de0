package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class KVTextSpec extends SparkSpec {

  test("writeKV then readKV round-trips (first-separator split)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("kvtext").toString + "/out"
    val df = Seq(("k1", "v1"), ("k2", "v with spaces"), ("k3", "v\twith\ttabs"))
      .toDF("key", "value")
    KVText.writeKV(df, dir)
    val back = KVText.readKV(spark, dir)
    val got = back.collect().map(r => (r.getString(0), r.getString(1))).toSet
    // tab-containing value splits at FIRST tab only — rest stays in value
    assert(got == Set("k1" -> "v1", "k2" -> "v with spaces", "k3" -> "v\twith\ttabs"))
  }

  test("readKV: line without separator → (line, empty)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("kvtext2").toString + "/out"
    Seq("noseparator", "a\tb").toDF("value").write.text(dir)
    val got = KVText.readKV(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set("noseparator" -> "", "a" -> "b"))
  }

  test("sampling filters: md5 variants are deterministic and partition-independent") {
    import graft.ops.Sampling
    val li = graft.Tables.load(spark, sfDir, "lineitem")
    val n1 = li.where(Sampling.md5Filter(col("l_orderkey"), 16)).count()
    val n2 = li.repartition(13).where(Sampling.md5Filter(col("l_orderkey"), 16)).count()
    assert(n1 == n2)
    // ~1/16 of rows, loose bounds
    val total = li.count()
    assert(n1 > total / 40 && n1 < total / 6)
  }
}
