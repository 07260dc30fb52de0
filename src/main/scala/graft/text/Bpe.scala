package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Checkpoints

/** Byte-pair-encoding merge training over a corpus (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * tokenizer-training workload of an LLM data pipeline, done Spark-first.
  *
  * Training loop: start from the per-word character sequence; each step
  * counts ADJACENT symbol pairs weighted by word frequency, picks the
  * most frequent pair (ties broken lexicographically — fully
  * deterministic), and rewrites every word's symbol sequence with that
  * pair merged greedily left-to-right. The learned artifact is the
  * ordered merge list, exactly what a BPE tokenizer ships.
  *
  * Scale shape (100 TB): the corpus is touched ONCE — [[wordCounts]] is
  * one explode + one map-side-combined groupBy, after which every
  * iteration runs on the VOCABULARY-sized (word, cnt, syms) table:
  * pair counting is an explode + partial-agg shuffle over vocab rows,
  * the winning pair is a 1-row `TakeOrderedAndProject` collected as
  * driver metadata (the kmeans-centroid discipline), and the rewrite is
  * a pure Column fold riding the vocab scan. Per-step checkpoints with
  * superseded-generation release (the dedupClusters hygiene) keep the
  * plan and pinned storage O(1) in the step count. A 100 TB corpus with
  * a 100 M-word vocabulary pays one corpus pass plus steps × vocab-sized
  * work — never steps × corpus.
  *
  * Greedy-rewrite determinism: the fold compares the accumulator's LAST
  * symbol with the incoming one, so overlapping occurrences ("aaa" under
  * merge (a,a)) resolve left-to-right to [aa, a] — the canonical BPE
  * choice — identically on any engine replaying the fold.
  */
object Bpe {

  /** One corpus pass: whitespace words with frequencies. */
  def wordCounts(docs: DataFrame, text: String = "text"): DataFrame =
    docs.select(explode(split(col(text), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Character-split start state: (word, cnt, syms: array<string>). */
  def initSymbols(words: DataFrame): DataFrame =
    words.withColumn("syms",
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))

  /** Adjacent-pair frequencies of the current symbol table:
    * (a, b, c = Σ word cnt). One explode + one partial-agg shuffle,
    * both vocab-sized.
    */
  def pairCounts(symTable: DataFrame): DataFrame =
    symTable.where(size(col("syms")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
          "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("c"))

  /** Greedy left-to-right merge of adjacent (a, b) into a+b inside a
    * symbol array — a pure Column fold (no UDF; data-derived strings
    * enter only as `lit`s, never spliced into SQL text).
    */
  def mergeFold(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** One learned merge: step is 1-based rank order. */
  final case class Merge(step: Long, pair_left: String, pair_right: String,
                         merged: String, pair_count: Long)

  /** Train `steps` merges. Stops early if no pair remains (vocabulary of
    * single-symbol words). Returns the ordered merge table.
    */
  def trainMerges(docs: DataFrame, steps: Int,
                  text: String = "text"): Seq[Merge] = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    var cur = Checkpoints.truncateTracked(
      initSymbols(wordCounts(docs, text)), eager = true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 0
    var done = false
    while (step < steps && !done) {
      val best = pairCounts(cur.df)
        .orderBy(col("c").desc, col("a"), col("b")).limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        step += 1
        merges += Merge(step.toLong, a, b, a + b, c)
        val updated = Checkpoints.truncateTracked(
          cur.df.withColumn("syms", mergeFold(col("syms"), a, b)),
          eager = true)
        cur.release() // the new generation is materialized; drop the old
        cur = updated
      }
    }
    cur.release()
    merges.toSeq
  }

  /** Apply an ordered merge list to a symbol array — the ENCODE side:
    * the merges are tiny driver metadata interpolated as literals, so
    * encoding rides the corpus scan with zero shuffles.
    */
  def applyMerges(syms: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(syms)((c, m) => mergeFold(c, m.pair_left, m.pair_right))

  /** Per-document BPE token counts under a learned merge list:
    * (doc_id, words, chars, bpe_tokens). `bpe_tokens` is the summed
    * post-merge symbol count — the number a token-budgeted batcher
    * would consume. Pure scan-stage Columns (nested folds per word).
    */
  def encodeCounts(docs: DataFrame, merges: Seq[Merge],
                   text: String = "text", id: String = "doc_id"): DataFrame = {
    val words = filter(split(col(text), " "), w => length(w) > 0)
    val chars = expr("transform(sequence(1, length(_w)), i -> substring(_w, i, 1))")
    docs.select(col(id),
      explode(words).as("_w"))
      .select(col(id), size(applyMerges(chars, merges)).as("_n"),
        length(col("_w")).as("_len"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("words"),
        sum(col("_len")).cast("long").as("chars"),
        sum(col("_n")).cast("long").as("bpe_tokens"))
  }
}
