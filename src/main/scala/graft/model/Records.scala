package graft.model

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** The record-DDL analog (SURVEY.md §1.3).
  *
  * The reference compiles `.jr` DDL files into `Record` subclasses with
  * binary/CSV/XML serializations
  * (`/root/reference/src/core/org/apache/hadoop/record/compiler/`,
  * example DDL `src/test/ddl/test.jr:1-24` — nested record,
  * `vector<ustring>`, `map<ustring,ustring>`). In Spark the DDL *is* the
  * case class: `Encoders.product` derives the Catalyst schema, Tungsten
  * is the binary serialization, and the CSV/JSON writers are the text
  * serializations — no code generator needed.
  *
  * [[RecRecord1]]/[[RecRecord0]] mirror `test.jr`'s shapes as the
  * demonstration pair.
  */
final case class RecRecord0(stringVal: String)

final case class RecRecord1(
  boolVal: Boolean,
  byteVal: Byte,
  intVal: Int,
  longVal: Long,
  floatVal: Float,
  doubleVal: Double,
  stringVal: String,
  bufferVal: Array[Byte],
  vectorVal: Seq[String],
  mapVal: Map[String, String],
  recordVal: RecRecord0)

object Records {
  implicit val rec1Encoder: Encoder[RecRecord1] = Encoders.product[RecRecord1]

  /** Typed dataset from records — the `Dataset[T]` IS the "DDL-defined
    * record stream".
    */
  def dataset(spark: SparkSession, rows: Seq[RecRecord1]): Dataset[RecRecord1] = {
    import spark.implicits._
    spark.createDataset(rows)
  }

  /** Binary round trip = parquet (Tungsten-encoded columnar). */
  def writeBinary(ds: Dataset[RecRecord1], path: String): Unit =
    ds.write.mode("overwrite").parquet(path)

  def readBinary(spark: SparkSession, path: String): Dataset[RecRecord1] = {
    import spark.implicits._
    spark.read.parquet(path).as[RecRecord1]
  }

  /** Text serialization analog of the record CSV writer: JSON lines
    * (CSV can't hold nested vectors/maps; the reference used custom
    * escaping — JSON is the faithful modern equivalent).
    */
  def writeText(ds: Dataset[RecRecord1], path: String): Unit =
    ds.write.mode("overwrite").json(path)

  def readText(spark: SparkSession, path: String): Dataset[RecRecord1] = {
    import spark.implicits._
    spark.read.schema(rec1Encoder.schema).json(path).as[RecRecord1]
  }

  /** XML serialization — the record compiler's third wire format
    * (`record/compiler/JRecord` emits an XML writer alongside binary/CSV;
    * serialized form in `record/XmlRecordOutput.java`). Spark 4 ships a
    * native XML source, so the round trip is declarative like the other
    * two: one row element per record, nested record/vector/map as nested
    * elements.
    */
  def writeXml(ds: Dataset[RecRecord1], path: String): Unit =
    ds.write.mode("overwrite").format("xml")
      .option("rowTag", "record").save(path)

  /** XML reader. Absent elements parse as null (XML cannot distinguish an
    * empty collection/string from a missing one), but record DDL has no
    * null concept — every field is always present — so absent maps back
    * to empty, which is exactly the reference reader's behavior.
    */
  def readXml(spark: SparkSession, path: String): Dataset[RecRecord1] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.read.schema(rec1Encoder.schema).format("xml")
      .option("rowTag", "record").load(path)
      .withColumn("stringVal", coalesce(col("stringVal"), lit("")))
      .withColumn("bufferVal",
        coalesce(col("bufferVal"), lit(Array.empty[Byte])))
      .withColumn("vectorVal",
        coalesce(col("vectorVal"), array().cast("array<string>")))
      .withColumn("mapVal",
        coalesce(col("mapVal"), map().cast("map<string,string>")))
      .withColumn("recordVal", struct(
        coalesce(col("recordVal.stringVal"), lit("")).as("stringVal")))
      .as[RecRecord1]
  }
}
