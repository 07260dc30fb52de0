package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ReliabilitySpec extends SparkSpec {

  test("bad records route to quarantine, good records transform") {
    import spark.implicits._
    val df = Seq("1", "2", "boom", "4", "alsoboom").toDF("v")
    val r = Reliability.routeBadRecords(df, col("v"),
      s => (s.toInt * 10).toString)
    val good = r.good.select("out").as[String].collect().toSet
    assert(good == Set("10", "20", "40"))
    val bad = r.bad.select("v", "error").collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    assert(bad.keySet == Set("boom", "alsoboom"))
    assert(bad("boom").contains("NumberFormatException"))
  }

  test("quarantine sink round-trips (the _logs/skip analog)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("quarantine").toString + "/bad"
    val df = Seq("ok", "7", "bad!").toDF("v")
    val r = Reliability.routeBadRecords(df, col("v"), { s =>
      if (s.forall(_.isDigit)) s else sys.error(s"unparseable: $s")
    })
    r.bad.write.parquet(dir)
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("observed counters ride the action without extra passes") {
    import spark.implicits._
    val df = Seq(1, 2, 3, 4, 5).toDF("n")
    val m = Reliability.withCounters(df,
      "rows" -> count(lit(1)), "total" -> sum(col("n"))) { d =>
      d.write.format("noop").mode("overwrite").save()
    }
    assert(m("rows") == 5L)
    assert(m("total") == 15L)
  }
}
