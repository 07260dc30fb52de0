package graft.cli

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamCliSpec extends SparkSpec {
  import spark.implicits._

  private def writeInput(lines: Seq[String], name: String): String = {
    val dir = s"/tmp/graft_test/streamcli/$name"
    lines.toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    dir
  }

  test("flag parsing covers the StreamJob surface") {
    val c = Stream.parse(Seq(
      "-input", "/in", "-output", "/out", "-mapper", "tr a-z A-Z",
      "-reducer", "aggregate", "-numReduceTasks", "3",
      "-cmdenv", "K=V", "-cmdenv", "X=1=2",
      "-separator", ",", "-outputseparator", "\t", "-numKeyFields", "2"))
    assert(c.input == "/in" && c.output == "/out")
    assert(c.mapper == "tr a-z A-Z" && c.reducer == "aggregate")
    assert(c.numReduceTasks == 3)
    assert(c.cmdenv == Map("K" -> "V", "X" -> "1=2")) // split on FIRST '='
    assert(c.separator == "," && c.outSeparator == "\t" && c.numKeyFields == 2)
    assertThrows[IllegalArgumentException](Stream.parse(Seq("-bogus", "x")))
  }

  test("mapper-only job pipes through a real subprocess") {
    val in = writeInput(Seq("a\tcat", "b\tdog"), "maponly")
    val got = Stream.plan(spark,
      Stream.parse(Seq("-input", in, "-mapper", "tr a-z A-Z")))
      .as[(String, String)].collect().sorted
    assert(got.toSeq == Seq(("A", "CAT"), ("B", "DOG")))
  }

  test("map + subprocess reducer sees keys co-located and sorted") {
    // reducer = `cat`: output order within each partition proves the
    // shuffle/sort contract (uniq-style streaming reducers depend on it)
    val in = writeInput(
      Seq("b\t1", "a\t1", "b\t2", "c\t1", "a\t2", "b\t3"), "mapreduce")
    val c = Stream.parse(Seq("-input", in, "-mapper", "NONE",
      "-reducer", "cat", "-numReduceTasks", "2"))
    val out = Stream.plan(spark, c)
    // each key appears in exactly one partition, and within a partition
    // records arrive key-sorted (verify via a per-partition scan)
    val perPart = out.withColumn("pid", spark_partition_id())
    val keyParts = perPart.groupBy("key").agg(countDistinct("pid").as("np"))
      .where(col("np") > 1).count()
    assert(keyParts == 0, "a key straddled reducer partitions")
    val rows = perPart.as[(String, String, Int)].collect()
    rows.groupBy(_._3).foreach { case (_, part) =>
      val keys = part.map(_._1).toSeq
      assert(keys == keys.sorted, s"partition not key-sorted: $keys")
    }
    assert(out.count() == 6)
  }

  test("-reducer aggregate folds the type:id protocol end-to-end") {
    val in = writeInput(Seq(
      "LongValueSum:x\t2", "LongValueSum:x\t3", "LongValueSum:y\t5"), "agg")
    val c = Stream.parse(Seq("-input", in, "-mapper", "cat", "-reducer", "aggregate"))
    val got = Stream.plan(spark, c).as[(String, String)].collect().toMap
    assert(got == Map("LongValueSum:x" -> "5.0", "LongValueSum:y" -> "5.0"))
  }

  test("comma -separator + unset -outputseparator: output splits on tab") {
    // the reference defaults the OUTPUT separator to '\t' independently of
    // -separator (PipeMapper.java:73-74): a comma-separated input fed to a
    // tab-emitting mapper must parse on tab, not comma
    val in = writeInput(Seq("a,cat x", "b,dog y"), "sepdefault")
    val c = Stream.parse(Seq("-input", in,
      "-mapper", "sed s/,/\\t/", "-separator", ","))
    val got = Stream.plan(spark, c).as[(String, String)].collect().sorted
    assert(got.toSeq == Seq(("a", "cat x"), ("b", "dog y")))
  }

  test("-cmdenv reaches the subprocess environment") {
    val in = writeInput(Seq("k\tv"), "env")
    // awk prints the env var: output line "k<tab>HELLO"
    val c = Stream.Conf(input = in,
      mapper = "awk {print(\"k\\t\"ENVIRON[\"GRAFT_X\"])}",
      cmdenv = Map("GRAFT_X" -> "HELLO"))
    val got = Stream.plan(spark, c).as[(String, String)].collect()
    assert(got.toSeq == Seq(("k", "HELLO")))
  }
}
