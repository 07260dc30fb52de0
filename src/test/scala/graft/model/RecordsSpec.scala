package graft.model

import graft.SparkSpec

class RecordsSpec extends SparkSpec {

  val sample = Seq(
    RecRecord1(boolVal = true, byteVal = 1, intVal = 42, longVal = 1L << 40,
      floatVal = 1.5f, doubleVal = math.Pi, stringVal = "héllo\tworld",
      bufferVal = Array[Byte](0, 1, 2), vectorVal = Seq("a", "b"),
      mapVal = Map("k1" -> "v1", "k2" -> "v2"),
      recordVal = RecRecord0("nested")),
    RecRecord1(boolVal = false, byteVal = -1, intVal = -7, longVal = -1,
      floatVal = 0f, doubleVal = 0, stringVal = "",
      bufferVal = Array.empty, vectorVal = Nil, mapVal = Map.empty,
      recordVal = RecRecord0("")))

  // Array[Byte] in a case class compares by reference; project to
  // fully-value-comparable shape
  private def normalize(r: RecRecord1) =
    (r.boolVal, r.byteVal, r.intVal, r.longVal, r.floatVal, r.doubleVal,
      r.stringVal, r.bufferVal.toSeq, r.vectorVal.toList,
      r.mapVal.toSeq.sorted, r.recordVal)
  private def buffers(rs: Seq[RecRecord1]) = rs.map(_.bufferVal.toSeq)

  test("binary (parquet/Tungsten) round trip preserves all field types") {
    val dir = java.nio.file.Files.createTempDirectory("rec").toString + "/bin"
    val ds = Records.dataset(spark, sample)
    Records.writeBinary(ds, dir)
    val back = Records.readBinary(spark, dir).collect().sortBy(_.intVal)
    val orig = sample.sortBy(_.intVal)
    assert(back.map(normalize).toSeq == orig.map(normalize))
    assert(buffers(back.toSeq) == buffers(orig))
  }

  test("text (json) round trip preserves nested record/vector/map") {
    val dir = java.nio.file.Files.createTempDirectory("rec").toString + "/txt"
    val ds = Records.dataset(spark, sample)
    Records.writeText(ds, dir)
    val back = Records.readText(spark, dir).collect().sortBy(_.intVal)
    val orig = sample.sortBy(_.intVal)
    assert(back.map(normalize).toSeq == orig.map(normalize))
    assert(buffers(back.toSeq) == buffers(orig))
  }

  test("xml round trip preserves nested record/vector/map") {
    val dir = java.nio.file.Files.createTempDirectory("rec").toString + "/xml"
    val ds = Records.dataset(spark, sample)
    Records.writeXml(ds, dir)
    val back = Records.readXml(spark, dir).collect().sortBy(_.intVal)
    val orig = sample.sortBy(_.intVal)
    assert(back.map(normalize).toSeq == orig.map(normalize))
    assert(buffers(back.toSeq) == buffers(orig))
  }

  test("csv round trip preserves all fields, incl. escapes and empty elements") {
    val dir = java.nio.file.Files.createTempDirectory("rec").toString + "/csv"
    // add an escape-heavy record: delimiter chars in the string, a
    // comma-bearing map key, and an EMPTY vector element (the
    // element-presence case XML cannot represent)
    val rows = sample :+ RecRecord1(boolVal = true, byteVal = 7, intVal = 99,
      longVal = 5L, floatVal = 2.5f, doubleVal = 0.125,
      stringVal = "a,b%c}d\ne", bufferVal = Array[Byte](10, -1),
      vectorVal = Seq("x", "", "y,z"), mapVal = Map("k,1" -> "v}2"),
      recordVal = RecRecord0("n,{}"))
    Records.writeCsv(Records.dataset(spark, rows), dir)
    val back = Records.readCsv(spark, dir).collect().sortBy(_.intVal)
    val orig = rows.sortBy(_.intVal)
    assert(back.map(normalize).toSeq == orig.map(normalize))
    assert(buffers(back.toSeq) == buffers(orig))
  }

  test("csv wire format matches the reference CsvRecordOutput byte-for-byte") {
    val dir = java.nio.file.Files.createTempDirectory("rec").toString + "/wire"
    val one = RecRecord1(boolVal = true, byteVal = 1, intVal = 42,
      longVal = 100L, floatVal = 1.5f, doubleVal = 0.25,
      stringVal = "a,b%c}d", bufferVal = Array[Byte](0x0a, -1),
      vectorVal = Seq("x", ""), mapVal = Map("k" -> "v"),
      recordVal = RecRecord0("n"))
    Records.writeCsv(Records.dataset(spark, Seq(one)), dir)
    val line = spark.read.text(dir).collect().map(_.getString(0)).toSeq
    // hand-assembled from CsvRecordOutput.java + Utils.toCSVString/
    // toCSVBuffer: T/F bool, decimal ints, float printed through double,
    // 'quoted %XX-escaped string, #lowercase-hex buffer, v{}/m{}/s{}
    assert(line == Seq(
      "T,1,42,100,1.5,0.25,'a%2Cb%25c%7Dd,#0aff,v{'x,'},m{'k,'v},s{'n}"))
  }
}
