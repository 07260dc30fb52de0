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

  /** Text serialization, modern form: JSON lines (self-describing
    * nesting). The reference's own CSV wire format — custom escaping for
    * nested vectors/maps — is implemented faithfully by
    * [[writeCsv]]/[[readCsv]] below.
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
    * to empty, which is exactly the reference reader's behavior. The
    * normalization is per ELEMENT too: an empty string inside a vector or
    * a map value serializes as an empty XML element and reads back null,
    * so elements are coalesced to "" the same way whole columns are.
    */
  def readXml(spark: SparkSession, path: String): Dataset[RecRecord1] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.read.schema(rec1Encoder.schema).format("xml")
      .option("rowTag", "record").load(path)
      .withColumn("stringVal", coalesce(col("stringVal"), lit("")))
      .withColumn("bufferVal",
        coalesce(col("bufferVal"), lit(Array.empty[Byte])))
      .withColumn("vectorVal", transform(
        coalesce(col("vectorVal"), array().cast("array<string>")),
        x => coalesce(x, lit(""))))
      .withColumn("mapVal", transform_values(
        coalesce(col("mapVal"), map().cast("map<string,string>")),
        (_, v) => coalesce(v, lit(""))))
      .withColumn("recordVal", struct(
        coalesce(col("recordVal.stringVal"), lit("")).as("stringVal")))
      .as[RecRecord1]
  }

  // ------------------------------------------------------------- CSV wire

  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions._

  /** `Utils.toCSVString` escaping (`record/Utils.java:108`): a leading
    * `'`, then %XX for NUL, LF, CR, comma, `}` and `%`. `%` is escaped
    * FIRST so escape-introduced percents are never re-escaped.
    */
  private def csvEsc(c: Column): Column = concat(lit("'"),
    Seq("\u0000" -> "%00", "\n" -> "%0A", "\r" -> "%0D",
        "," -> "%2C", "}" -> "%7D")
      .foldLeft(replace(c, lit("%"), lit("%25"))) {
        case (acc, (from, to)) => replace(acc, lit(from), lit(to))
      })

  /** Inverse of [[csvEsc]] minus the quote (stripped by the caller):
    * `%25` is decoded LAST so decoded percents can't fabricate escapes.
    */
  private def csvUnesc(c: Column): Column =
    replace(
      Seq("%00" -> "\u0000", "%0A" -> "\n", "%0D" -> "\r",
          "%2C" -> ",", "%7D" -> "}")
        .foldLeft(c) { case (acc, (from, to)) =>
          replace(acc, lit(from), lit(to))
        },
      lit("%25"), lit("%"))

  /** CSV serialization — the record compiler's second wire format
    * (`record/CsvRecordOutput.java`): `T`/`F` booleans, decimal
    * integers, float written through double, `'`-prefixed escaped
    * strings, `#hex` buffers (lowercase — `Buffer.java:221`), `v{...}`
    * vectors, `m{k,v,...}` maps flattened in key order (the reference
    * serializes a TreeMap), `s{...}` nested records; fields comma-joined,
    * one record per line. The whole serialization is one codegen'd
    * Column expression over the dataset — no per-row Scala.
    */
  def writeCsv(ds: Dataset[RecRecord1], path: String): Unit = {
    val line = concat_ws(",",
      when(col("boolVal"), "T").otherwise("F"),
      col("byteVal").cast("long").cast("string"),
      col("intVal").cast("long").cast("string"),
      col("longVal").cast("string"),
      col("floatVal").cast("double").cast("string"),
      col("doubleVal").cast("string"),
      csvEsc(col("stringVal")),
      concat(lit("#"), lower(hex(col("bufferVal")))),
      concat(lit("v{"),
        array_join(transform(col("vectorVal"), csvEsc _), ","), lit("}")),
      concat(lit("m{"),
        array_join(flatten(transform(array_sort(map_entries(col("mapVal"))),
          e => array(csvEsc(e.getField("key")), csvEsc(e.getField("value"))))),
          ","), lit("}")),
      concat(lit("s{"), csvEsc(col("recordVal.stringVal")), lit("}")))
    ds.toDF().select(line.as("value")).write.mode("overwrite").text(path)
  }

  /** CSV reader (`record/CsvRecordInput.java`): structural `,`/`}` are
    * unambiguous because payload occurrences are %-escaped, so one
    * anchored regex splits the line and pure Column transforms decode the
    * nested vector/map/record groups. Empty string ELEMENTS round-trip
    * (`v{'}` is a one-element vector holding "") — the element-presence
    * semantics the reference reader guarantees.
    */
  def readCsv(spark: SparkSession, path: String): Dataset[RecRecord1] = {
    import spark.implicits._
    val P = "^([TF]),(-?\\d+),(-?\\d+),(-?\\d+),([^,]+),([^,]+)," +
      "'([^,]*),#([0-9a-f]*),v\\{([^}]*)\\},m\\{([^}]*)\\},s\\{'([^}]*)\\}$"
    def g(i: Int) = regexp_extract(col("value"), P, i)
    // split a group payload into its `'`-prefixed elements ("" → none)
    def els(payload: Column): Column =
      when(payload === "", array().cast("array<string>"))
        .otherwise(split(payload, ","))
    def unescEl(e: Column): Column = csvUnesc(e.substr(lit(2), length(e)))
    val mapEls = els(g(10))
    spark.read.text(path).select(
      (g(1) === "T").as("boolVal"),
      g(2).cast("byte").as("byteVal"),
      g(3).cast("int").as("intVal"),
      g(4).cast("long").as("longVal"),
      g(5).cast("float").as("floatVal"),
      g(6).cast("double").as("doubleVal"),
      csvUnesc(g(7)).as("stringVal"),
      unhex(g(8)).as("bufferVal"),
      transform(els(g(9)), unescEl _).as("vectorVal"),
      map_from_arrays(
        transform(filter(mapEls, (_, i) => i % 2 === 0), unescEl _),
        transform(filter(mapEls, (_, i) => i % 2 === 1), unescEl _))
        .as("mapVal"),
      struct(csvUnesc(g(11)).as("stringVal")).as("recordVal")
    ).as[RecRecord1]
  }
}
