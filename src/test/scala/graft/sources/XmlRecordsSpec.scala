package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class XmlRecordsSpec extends SparkSpec {

  test("extracts begin/end-delimited records spanning lines") {
    val dir = Files.createTempDirectory("xml")
    Files.writeString(dir.resolve("a.xml"),
      """<doc><id>1</id>
        |<body>first
        |record</body></doc>
        |garbage between records
        |<doc><id>2</id><body>second</body></doc>""".stripMargin)
    Files.writeString(dir.resolve("b.xml"),
      "<doc><id>3</id><body>third</body></doc>")
    val df = XmlRecords.read(spark, dir.toString + "/*.xml", "<doc>", "</doc>")
    assert(df.count() == 3)
    val ids = df.select(XmlRecords.tagText(col("record"), "id").cast("int"))
      .collect().map(_.getInt(0)).toSet
    assert(ids == Set(1, 2, 3))
    // records include delimiters and span lines
    val rec1 = df.where(XmlRecords.tagText(col("record"), "id") === "1")
      .head().getString(1)
    assert(rec1.startsWith("<doc>") && rec1.endsWith("</doc>"))
    assert(rec1.contains("first\nrecord"))
  }

  test("readSplittable: one multi-block file, >1 task, identical records") {
    val dir = Files.createTempDirectory("xmlsplit")
    // one single file, multi-line bodies, garbage between records —
    // large enough that a small splitBytes slices it into many ranges
    val recs = (1 to 40).map(i =>
      s"<doc><id>$i</id>\n<body>line one of $i\nline two of $i</body></doc>")
    Files.writeString(dir.resolve("big.xml"),
      recs.mkString("\nnoise between\n"))
    val whole = XmlRecords.read(spark, dir.toString + "/*.xml", "<doc>", "</doc>")
      .select("record").collect().map(_.getString(0)).sorted.toSeq
    val split = XmlRecords.readSplittable(spark, dir.toString + "/*.xml",
      "<doc>", "</doc>", splitBytes = 256)
    assert(split.rdd.getNumPartitions > 1,
      "a multi-block file must become multiple scan tasks")
    val got = split.select("record").collect().map(_.getString(0)).sorted.toSeq
    assert(got == whole, "boundary-scan records must equal the per-file read")
    assert(got.size == 40)
  }

  test("readSplittable: every split size yields the same records " +
    "(boundary-straddling tags, ranges opening mid-record)") {
    val dir = Files.createTempDirectory("xmlsweep")
    // records LARGER than the smallest split size, so some ranges hold
    // no begin tag at all and begin/end tags straddle range boundaries
    // at many alignments across the sweep
    val recs = (1 to 12).map(i => s"<doc><id>$i</id><body>${"x" * 17}</body></doc>")
    Files.writeString(dir.resolve("s.xml"), recs.mkString("-"))
    val expect = recs.sorted
    for (sb <- Seq(3L, 17L, 64L, 1000000L)) {
      val got = XmlRecords.readSplittable(spark, dir.toString + "/*.xml",
          "<doc>", "</doc>", splitBytes = sb)
        .select("record").collect().map(_.getString(0)).sorted.toSeq
      assert(got == expect, s"splitBytes=$sb diverged")
    }
  }

  test("readSplittable fails fast on bad inputs: self-overlapping begin, " +
    "empty patterns, missing path") {
    val dir = Files.createTempDirectory("xmlval")
    Files.writeString(dir.resolve("a.xml"), "<doc>x</doc>")
    val path = dir.toString + "/*.xml"
    // "aa" has a border (prefix "a" == suffix "a"): occurrences can
    // overlap, so range ownership would be ambiguous — rejected on the
    // driver with the reason, not silently duplicated across tasks
    val e1 = intercept[IllegalArgumentException] {
      XmlRecords.readSplittable(spark, path, "aa", "zz")
    }
    assert(e1.getMessage.contains("overlaps itself"))
    intercept[IllegalArgumentException] {
      XmlRecords.readSplittable(spark, path, "", "</doc>")
    }
    intercept[IllegalArgumentException] {
      XmlRecords.readSplittable(spark, path, "<doc>", "")
    }
    // nonexistent non-glob path: a named error, not a bare NPE
    val e2 = intercept[java.io.FileNotFoundException] {
      XmlRecords.readSplittable(spark, dir.toString + "/nope-dir", "<doc>", "</doc>")
    }
    assert(e2.getMessage.contains("nope-dir"))
    // real XML tags are borderless: accepted
    assert(XmlRecords.readSplittable(spark, path, "<doc>", "</doc>").count() == 1)
  }

  test("readSplittable: a lost end tag fails loudly, not silently") {
    val dir = Files.createTempDirectory("xmlbad")
    Files.writeString(dir.resolve("bad.xml"),
      "<doc><id>1</id>" + ("y" * 500)) // begin with no end, oversized
    val ex = intercept[Exception] {
      XmlRecords.readSplittable(spark, dir.toString + "/*.xml",
        "<doc>", "</doc>", splitBytes = 1024, maxRecordBytes = 100).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("exceeds")), s"unexpected: $ex")
  }
}
