package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Unix `sort -k` key-spec compiler → Catalyst sort `Column`s.
  *
  * Re-expresses the reference's `KeyFieldBasedComparator` /
  * `KeyFieldBasedPartitioner` spec language
  * (`/root/reference/src/mapred/org/apache/hadoop/mapred/lib/KeyFieldBasedComparator.java:46-65`,
  * `KeyFieldHelper.java`): specs like `-k2,2nr` mean "sort on field 2 only,
  * numeric, reversed"; `-k1,2` means "fields 1 through 2"; fields are
  * 1-based, separator-split.
  *
  * Spark-first: each `-k` spec compiles to one sort Column (string or
  * numeric-prefix double), with `asc`/`desc` per spec. Sorting happens via
  * `orderBy` → Spark RangePartitioner does the sampled total-order
  * partitioning that the reference needed `TotalOrderPartitioner` +
  * `InputSampler` for. Partitioning on a field subset (the reference's
  * `KeyFieldBasedPartitioner`) is `repartition(n, cols)` on the same
  * compiled columns.
  */
object KeyFieldSpec {

  /** One `-k` spec: 1-based start/end fields (end=None → to end of line),
    * with optional 1-based char offsets (`-k2.3,2.5`; endChar 0 = end of
    * field, GNU sort semantics), numeric compare, reverse order.
    */
  final case class Spec(startField: Int, endField: Option[Int],
                        numeric: Boolean, reverse: Boolean,
                        startChar: Int = 1, endChar: Int = 0)

  /** Parse a spec string of space-separated `-kPOS1[,POS2][FLAGS]` entries,
    * e.g. `"-k2,2nr -k1,1"`. Flags `n` (numeric) and `r` (reverse) may
    * trail either position, matching GNU sort / the reference parser.
    */
  def parse(spec: String): Seq[Spec] =
    spec.trim.split("\\s+").iterator.filter(_.nonEmpty).map { tok =>
      require(tok.startsWith("-k"), s"bad key spec: $tok")
      val body = tok.drop(2)
      val parts = body.split(",", 2)
      def splitFlags(s: String): (String, String) = {
        val i = s.indexWhere(c => !c.isDigit && c != '.')
        if (i < 0) (s, "") else (s.substring(0, i), s.substring(i))
      }
      val (p1, f1) = splitFlags(parts(0))
      val (p2, f2) = if (parts.length > 1) splitFlags(parts(1)) else ("", "")
      val flags = f1 + f2
      def fieldChar(p: String, defChar: Int): (Int, Int) = {
        val fp = p.split("\\.")
        (fp(0).toInt, if (fp.length > 1 && fp(1).nonEmpty) fp(1).toInt else defChar)
      }
      val (sf, sc) = fieldChar(p1, 1)
      val (ef, ec) = if (p2.nonEmpty) {
        val (f, c) = fieldChar(p2, 0); (Some(f), c)
      } else (None, 0)
      Spec(sf, ef, flags.contains('n'), flags.contains('r'), sc, ec)
    }.toSeq

  /** Longest-numeric-prefix parse as a Column, mirroring the reference's
    * byte-wise numeric compare (leading blanks, sign, digits, decimal
    * point); non-numeric → 0 like the reference's empty-digit case.
    */
  def numericPrefix(c: Column): Column = {
    val m = regexp_extract(c, "^\\s*([-+]?[0-9]+(?:\\.[0-9]*)?|[-+]?\\.[0-9]+)", 1)
    // guard the cast: ANSI mode errors on casting '' (no numeric prefix)
    when(m === "", lit(0.0)).otherwise(m.cast("double"))
  }

  /** Raw (unordered) key Column per `-k` spec — exposed for tests and for
    * partitioning on the same derivation.
    */
  def keyColumns(line: Column, spec: String, sep: String = "\t"): Seq[Column] = {
    val fields = split(line, java.util.regex.Pattern.quote(sep), -1)
    parse(spec).map { s =>
      val segment = s.endField match {
        case Some(e) if e == s.startField =>
          coalesce(get(fields, lit(s.startField - 1)), lit(""))
        case Some(e) =>
          array_join(slice(fields, lit(s.startField), lit(e - s.startField + 1)), sep)
        case None => // to end of line
          array_join(slice(fields, lit(s.startField),
            greatest(size(fields) - (s.startField - 1), lit(0))), sep)
      }
      // char offsets (GNU sort / KeyFieldHelper): key starts at startChar
      // of the first field and, when endChar > 0, ends at endChar of the
      // last field of the segment.
      val afterStart =
        if (s.startChar <= 1) segment
        else substring(segment, s.startChar, Int.MaxValue)
      val raw = (s.endField, s.endChar) match {
        case (Some(e), q) if q > 0 =>
          // chars of the segment up to char q of field e: length of the
          // joined fields startField..e-1 (+1 sep) + q, minus start offset
          val prefixLen =
            if (e == s.startField) lit(0)
            else length(array_join(slice(fields, lit(s.startField),
              lit(e - s.startField)), sep)) + lit(sep.length)
          val endPos = prefixLen + lit(q)
          afterStart.substr(lit(1), greatest(endPos - lit(s.startChar - 1), lit(0)))
        case _ => afterStart
      }
      if (s.numeric) numericPrefix(raw) else raw
    }
  }

  /** Compile specs over a line column into sort Columns (with asc/desc
    * baked in) ready for `df.orderBy(cols: _*)`.
    */
  def sortColumns(line: Column, spec: String, sep: String = "\t"): Seq[Column] =
    parse(spec).zip(keyColumns(line, spec, sep)).map { case (s, key) =>
      if (s.reverse) key.desc else key.asc
    }

  /** Partition-key columns (no ordering) for the
    * `KeyFieldBasedPartitioner` analog: `df.repartition(n, cols: _*)`.
    */
  def partitionColumns(line: Column, spec: String, sep: String = "\t"): Seq[Column] = {
    val fields = split(line, java.util.regex.Pattern.quote(sep), -1)
    parse(spec).map { s =>
      val end = s.endField.getOrElse(s.startField)
      if (end == s.startField) coalesce(get(fields, lit(s.startField - 1)), lit(""))
      else array_join(slice(fields, lit(s.startField), lit(end - s.startField + 1)), sep)
    }
  }
}
