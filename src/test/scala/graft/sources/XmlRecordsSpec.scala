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
}
