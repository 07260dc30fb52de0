package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Compaction

/** Change-data-capture application — the warehouse MERGE/upsert the
  * reference era ran as daily "delta load" jobs (reference analog: the
  * reduce-side override join that lets the rightmost source win,
  * `/root/reference/src/contrib/data_join/` — a CDC apply IS an override
  * join of the change log onto the base table, plus delete handling).
  *
  * Semantics: the change log carries full replacement rows tagged with a
  * monotone sequence and an op (`upsert` | `delete`). Per key, the
  * highest-sequence change wins; an `upsert` replaces/inserts the row, a
  * `delete` removes it; keys with no change pass through untouched.
  *
  * Scale shape (100 TB base, GB-scale deltas): the change log is reduced
  * to one winner per key with a single shuffle over the CHANGES only —
  * the base table is never shuffled. The untouched side is a
  * broadcast anti-join (the winner keys ride to every base scan task),
  * so the whole merge is one pass over the base at scan speed. For
  * change logs too large to broadcast, `broadcastChanges = false` falls
  * back to a shuffled anti-join on the key.
  */
object Cdc {

  /** Apply a change log to a base table, last-writer-wins per key.
    *
    * Contract: `changes` has every column of `base` (replacement rows)
    * plus `seqCol` and `opCol`; `(key, seq)` pairs are unique (a
    * duplicate sequence for one key has no deterministic winner).
    *
    * @param opCol values: `upsert` (replace-or-insert) or `delete`.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
                   seqCol: String = "seq", opCol: String = "op",
                   broadcastChanges: Boolean = true): DataFrame = {
    val keys: Seq[Column] = keyCols.map(col)
    // one winner per key: single shuffle over the (small) change log
    val w = Window.partitionBy(keys: _*).orderBy(col(seqCol).desc)
    val latest = changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    val touched = latest.select(keys: _*)
    val untouched = base.join(
      if (broadcastChanges) broadcast(touched) else touched,
      keyCols, "left_anti")
    val applied = latest
      .filter(col(opCol) =!= lit("delete"))
      .select(base.columns.map(col).toIndexedSeq: _*)
    untouched.unionByName(applied)
  }

  /** MERGE INTO a versioned table root ([[Compaction.writeVersioned]]
    * lineage): resolve the live version, apply the change log, publish
    * the merged frame as the next immutable `v=N+1`. Readers flip to the
    * merged table atomically via the commit marker; concurrent scans of
    * the superseded version finish inside the `grace` window.
    *
    * @return the published version number.
    */
  def mergeVersioned(root: String, changes: DataFrame, keyCols: Seq[String],
                     seqCol: String = "seq", opCol: String = "op",
                     broadcastChanges: Boolean = true, grace: Int = 1): Long = {
    val spark = changes.sparkSession
    val base = spark.read.parquet(Compaction.resolve(spark, root))
    val merged = applyChanges(base, changes, keyCols, seqCol, opCol, broadcastChanges)
    Compaction.publishNext(merged, root, grace)
  }

  /** Slowly-changing-dimension type-2 history from a keyed change log:
    * one row per VALUE EPISODE, `[from, to)` half-open on the log's
    * order columns, open `to` (nulls) + `is_current = true` on the last
    * episode per key. Consecutive changes that do not alter the tracked
    * attributes are collapsed into their episode (the classic SCD2
    * no-change-update suppression).
    *
    * Contract: `orderCols` is a unique total order within each key (add
    * a sequence tie-break to a timestamp, as every total sort here
    * requires). Output: keys, attrs, `from_<c>`/`to_<c>` per order
    * column, `is_current`.
    *
    * Scale shape: two window passes over the SAME (key) partitioning and
    * (order) sort — Catalyst plans one exchange + one sort, both windows
    * ride it; nothing is broadcast or collected, so the log can be any
    * size.
    */
  def scd2History(changes: DataFrame, keyCols: Seq[String],
                  orderCols: Seq[String], attrCols: Seq[String]): DataFrame = {
    val keys: Seq[Column] = keyCols.map(col)
    val ord: Seq[Column] = orderCols.map(col)
    val attrs = struct(attrCols.map(col): _*)
    val w = Window.partitionBy(keys: _*).orderBy(ord: _*)
    // episode starts: first change per key, or attrs differ from previous
    val episodes = changes
      .select((keyCols ++ orderCols ++ attrCols).map(col).toIndexedSeq: _*)
      .withColumn("_prev", lag(attrs, 1).over(w))
      .filter(!(col("_prev") <=> attrs))
      .drop("_prev")
    // close each episode at the next episode's start (same window shape)
    val withTo = orderCols.foldLeft(episodes) { (df, c) =>
      df.withColumn(s"to_$c", lead(col(c), 1).over(w))
    }
    val outCols =
      keyCols.map(col) ++ attrCols.map(col) ++
        orderCols.map(c => col(c).as(s"from_$c")) ++
        orderCols.map(c => col(s"to_$c")) :+
        orderCols.map(c => col(s"to_$c").isNull).reduce(_ && _).as("is_current")
    withTo.select(outCols.toIndexedSeq: _*)
  }

  /** Content-hash diff of two corpus snapshots — the daily-crawl report
    * (what entered, what left, what changed) that drives incremental
    * re-tokenization: only `added`/`changed` keys flow downstream, so a
    * 100 TB corpus with 1% churn re-processes 1%, not 100%.
    *
    * Each side is reduced map-side to (key, md5 fingerprint over
    * `compareCols`) riding its scan — the full-width rows are never
    * shuffled — then one co-partitioned full outer join on the key
    * classifies every key as `added` (new only), `removed` (old only)
    * or `changed` (both, fingerprints differ); unchanged keys are
    * dropped before anything else happens, so the output is bounded by
    * churn, not corpus size. The fingerprint is unambiguous across
    * column boundaries: each compare column contributes its own md5
    * (32 hex chars) or the single char `-` for NULL — `-` is not a hex
    * digit, so the concatenation is uniquely decodable (no value can
    * shift content across a column boundary, and NULL can never collide
    * with any literal string, including a literal NUL).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    def fp(df: DataFrame, as: String): DataFrame =
      df.select(keyCols.map(col) :+ md5(concat(
        compareCols.map(c => when(col(c).isNull, lit("-"))
          .otherwise(md5(col(c).cast("string")))): _*))
        .as(as): _*)
    val o = fp(oldSnap, "_fp_old")
    val n = fp(newSnap, "_fp_new")
    o.join(n, keyCols, "full_outer")
      .where(col("_fp_old").isNull || col("_fp_new").isNull ||
        col("_fp_old") =!= col("_fp_new"))
      .select(keyCols.map(col) :+
        when(col("_fp_old").isNull, lit("added"))
          .when(col("_fp_new").isNull, lit("removed"))
          .otherwise(lit("changed")).as("status"): _*)
  }
}
