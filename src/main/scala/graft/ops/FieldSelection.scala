package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Unix-`cut`-style field selection, compiled to Catalyst `Column`s.
  *
  * Re-expresses the reference's `FieldSelectionMapReduce`
  * (`/root/reference/src/mapred/org/apache/hadoop/mapred/lib/FieldSelectionMapReduce.java:35-64`):
  * input lines are separator-split fields (0-based); a spec
  * `"keyList:valueList"` selects fields for the output key and value, where
  * each list is comma-separated entries of a single index (`5`), an inclusive
  * range (`2-5`), or an open range (`3-` — value side only) meaning "field 3
  * through the last field".
  *
  * Spark-first design: instead of a per-record Java loop, the spec compiles
  * once into `split` + element_at + `concat_ws` Column expressions that stay
  * inside whole-stage codegen — no UDF, fully vectorizable, and the split is
  * shared across key and value via a single projected array column.
  */
object FieldSelection {

  /** One side of a spec: explicit 0-based indices plus an optional
    * open-range start ("all fields from N on").
    */
  final case class FieldList(indices: Seq[Int], allFrom: Option[Int])

  final case class Spec(key: FieldList, value: FieldList)

  /** Parse `"4,3,0,1:6,5,1-3,7-"` → Spec. Mirrors the reference grammar:
    * entries are `n`, `a-b` (inclusive), or `a-` (open; recorded in
    * `allFrom`, ignored on the key side like the reference does).
    */
  def parse(spec: String): Spec = {
    val (k, v) = spec.indexOf(':') match {
      case -1 => (spec, "")
      case i  => (spec.substring(0, i), spec.substring(i + 1))
    }
    Spec(parseList(k), parseList(v))
  }

  private def parseList(list: String): FieldList = {
    val entries = list.split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq
    val idx = Seq.newBuilder[Int]
    var allFrom: Option[Int] = None
    entries.foreach { e =>
      val dash = e.indexOf('-')
      if (dash < 0) idx += e.toInt
      else {
        val lo = e.substring(0, dash).toInt
        val hi = e.substring(dash + 1)
        if (hi.isEmpty) allFrom = allFrom.orElse(Some(lo))
        else idx ++= (lo to hi.toInt)
      }
    }
    FieldList(idx.result(), allFrom)
  }

  /** Compile one side to a Column over a pre-split `fields` array column:
    * selected fields re-joined with the separator (the reference emits
    * `Text` key/value joined the same way).
    */
  def selectSide(fields: Column, side: FieldList, sep: String): Column = {
    // get() is 0-based like the spec, and null-safe on missing fields
    // (ANSI mode's element_at throws on out-of-bounds).
    val explicit = side.indices.map(i => coalesce(get(fields, lit(i)), lit("")))
    val cols = side.allFrom match {
      case None => explicit
      case Some(from) =>
        // the open tail (field `from` to last) as one joined column
        val len = greatest(size(fields) - from, lit(0))
        val tail = array_join(slice(fields, lit(from + 1), len), sep)
        explicit :+ tail
    }
    if (cols.isEmpty) lit("") else concat_ws(sep, cols: _*)
  }

  /** Full operator: line column → (key, value) columns per the spec. */
  def keyValue(line: Column, spec: String, sep: String = "\t"): (Column, Column) = {
    val s = parse(spec)
    // -1 limit keeps trailing empty fields, matching Java String.split(sep, -1)
    // used by the reference's Text field splitting.
    val fields = split(line, java.util.regex.Pattern.quote(sep), -1)
    (selectSide(fields, s.key, sep), selectSide(fields, s.value, sep))
  }
}
