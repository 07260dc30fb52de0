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

  /** The space-carrying pre-token stream, ONE definition for training
    * and encode (a divergence here is exactly the train/encode
    * vocabulary mismatch q_bpe_bytes_encode's oracle exists to catch):
    * split on single spaces, every word after the first CARRIES ITS
    * LEADING SPACE (" world"), empties dropped — so concatenating a
    * document's pre-tokens reproduces its text byte-for-byte (runs of
    * spaces become bare " " pre-tokens). `keep` columns (e.g. the doc
    * id) ride along; output column is `word`.
    */
  private def byteTokens(docs: DataFrame, text: String,
                         keep: Seq[Column]): DataFrame =
    docs.select(keep :+ posexplode(split(col(text), " ")): _*)
      .select(keep :+ when(col("pos") === 0, col("col"))
        .otherwise(concat(lit(" "), col("col"))).as("word"): _*)
      .where(length(col("word")) > 0)

  /** The 2-hex-digit byte-symbol split of hex column `_h` — shared by
    * [[byteSymbols]] and [[byteEncodeCounts]].
    */
  private val hexSymsSql =
    "transform(sequence(1, length(_h) DIV 2), i -> substring(_h, 2*i - 1, 2))"

  /** GPT-2-style byte-level pre-tokens with frequencies — see
    * [[byteTokens]] for the (lossless) pre-token rule; learned merges
    * can contain the space byte, the space-prefixed vocabulary (" the")
    * word-level BPE cannot express.
    */
  def byteWordCounts(docs: DataFrame, text: String = "text"): DataFrame =
    byteTokens(docs, text, Nil)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Byte-split start state: each UTF-8 byte of the pre-token as a
    * 2-hex-digit symbol ("C3","A9" for "é"). Hex pairs are the
    * engine-portable rendering of GPT-2's byte alphabet (both Spark and
    * DuckDB produce identical uppercase `hex(encode(word))`), merges
    * concatenate to longer hex strings, and there is no unknown symbol
    * by construction — every input is SOME byte sequence.
    */
  def byteSymbols(words: DataFrame): DataFrame =
    words
      .withColumn("_h", hex(encode(col("word"), "UTF-8")))
      .withColumn("syms", expr(hexSymsSql))
      .drop("_h")

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
    * symbol array, with COLUMN pair operands — the building block both
    * the literal-interpolated and broadcast-fold encode forms share
    * (no UDF; pure Column fold).
    */
  def mergeFoldCol(syms: Column, a: Column, b: Column): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === a && x === b,
        concat(slice(acc, lit(1), size(acc) - 1), array(concat(a, b))))
        .otherwise(concat(acc, array(x))))

  /** [[mergeFoldCol]] with one known merge pair as literals. */
  def mergeFold(syms: Column, a: String, b: String): Column =
    mergeFoldCol(syms, lit(a), lit(b))

  /** One learned merge: step is 1-based rank order. */
  final case class Merge(step: Long, pair_left: String, pair_right: String,
                         merged: String, pair_count: Long)

  /** Train `steps` merges from the character-split word vocabulary
    * (Sennrich). Stops early if no pair remains. Returns the ordered
    * merge table.
    */
  def trainMerges(docs: DataFrame, steps: Int,
                  text: String = "text"): Seq[Merge] =
    trainFromInit(initSymbols(wordCounts(docs, text)), steps)

  /** Train `steps` merges from the BYTE-split pre-token vocabulary
    * (GPT-2-style byte-level BPE): same driver-metadata merge loop as
    * [[trainMerges]] — only the seed symbols change, to the hex-pair
    * byte alphabet of [[byteSymbols]]. Merge pairs and merged symbols
    * are hex strings ("20","74" → "2074" = " t").
    */
  def trainByteMerges(docs: DataFrame, steps: Int,
                      text: String = "text"): Seq[Merge] =
    trainFromInit(byteSymbols(byteWordCounts(docs, text)), steps)

  /** The shared merge-training loop over any (word, cnt, syms) start
    * state — vocabulary-sized work per step, 1-row argmax collects,
    * O(1) plan depth via superseded-generation checkpoints.
    */
  private def trainFromInit(init: DataFrame, steps: Int): Seq[Merge] = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    var cur = Checkpoints.truncateTracked(init, eager = true)
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

  /** Production-vocab merge training in BATCHED generations: each
    * generation ranks the current state's adjacent-pair counts ONCE
    * (count desc, then pair — a deterministic total order), takes the
    * top `batch` pairs as the next `batch` merges, and applies them in
    * rank order with one vocabulary fold. `steps` merges cost
    * ceil(steps/batch) driver round-trips instead of `steps` — the only
    * way a 50k-merge tokenizer trains on a 100 TB corpus, where
    * [[trainByteMerges]]'s one-argmax-per-merge loop would be 50k
    * corpus-aggregate barriers.
    *
    * Approximation vs strict Sennrich: ranks within a generation come
    * from the generation-START counts, so merge k does not see merges
    * k-1's effect until the next generation (within a batch a pair may
    * even have been consumed — the fold then no-ops). Merge batching is
    * the standard large-corpus BPE trade; the merge LIST semantics are
    * unchanged (an ordered pair list applied greedily left-to-right).
    */
  def batchedByteMerges(docs: DataFrame, steps: Int, batch: Int = 128,
                        text: String = "text"): Seq[Merge] = {
    require(steps >= 1 && batch >= 1, "steps/batch must be >= 1")
    var cur = Checkpoints.truncateTracked(
      byteSymbols(byteWordCounts(docs, text)), eager = true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (merges.size < steps && !done) {
      val take = math.min(batch, steps - merges.size)
      val best = pairCounts(cur.df)
        .orderBy(col("c").desc, col("a"), col("b")).limit(take).collect()
      if (best.isEmpty) done = true
      else {
        val gen = best.zipWithIndex.map { case (r, i) =>
          Merge(merges.size + i + 1L, r.getString(0), r.getString(1),
            r.getString(0) + r.getString(1), r.getLong(2))
        }.toSeq
        val updated = Checkpoints.truncateTracked(
          applyMergeBatch(cur.df, gen), eager = true)
        cur.release()
        cur = updated
        merges ++= gen
      }
    }
    cur.release()
    merges.toSeq
  }

  /** One vocabulary fold applying `merges` in order to the `syms`
    * column — literal nesting when small, the broadcast merge-array
    * dispatch past [[MaxLiteralMerges]] (same rule as the encode path).
    */
  private def applyMergeBatch(tbl: DataFrame, merges: Seq[Merge]): DataFrame =
    if (merges.size <= MaxLiteralMerges)
      tbl.withColumn("syms", applyMerges(col("syms"), merges))
    else {
      val spark = tbl.sparkSession
      import spark.implicits._
      val mrow = broadcast(
        Seq(merges.map(m => (m.pair_left, m.pair_right))).toDF("__bpe_merges"))
      tbl.crossJoin(mrow)
        .withColumn("syms", aggregate(col("__bpe_merges"), col("syms"),
          (acc, m) => mergeFoldCol(acc, m.getField("_1"), m.getField("_2"))))
        .drop("__bpe_merges")
    }

  /** Apply an ordered merge list to a symbol array as nested literal
    * folds. Fine for bounded merge lists; past [[MaxLiteralMerges]] the
    * nested-expression plan itself becomes the problem — use the
    * broadcast dispatch inside [[encodeCounts]]/[[byteEncodeCounts]],
    * which keeps plan size O(1) in the step count.
    */
  def applyMerges(syms: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(syms)((c, m) => mergeFold(c, m.pair_left, m.pair_right))

  /** Above this many merges the encode folds over ONE broadcast
    * merge-array row instead of nesting literal folds — same dispatch
    * discipline (and reserved-column hygiene) as `Pq.encode`'s
    * codebook forms: a production 50k-merge tokenizer must not build a
    * 50k-deep expression tree.
    */
  val MaxLiteralMerges = 64

  /** The merge fold over a distinct-word vocabulary: input (word `_w`,
    * plus whatever grouping context), output + `_n` = post-merge symbol
    * count. `symsOf` builds the seed symbol array from `_w`.
    */
  private def encodedVocab(vocab: DataFrame, symsOf: Column,
                           merges: Seq[Merge]): DataFrame =
    if (merges.size <= MaxLiteralMerges)
      vocab.withColumn("_n", size(applyMerges(symsOf, merges)))
    else {
      val spark = vocab.sparkSession
      import spark.implicits._
      val mrow = broadcast(
        Seq(merges.map(m => (m.pair_left, m.pair_right))).toDF("__bpe_merges"))
      vocab.crossJoin(mrow)
        .withColumn("_n", size(aggregate(col("__bpe_merges"), symsOf,
          (acc, m) => mergeFoldCol(acc, m.getField("_1"), m.getField("_2")))))
        .drop("__bpe_merges")
    }

  /** Per-document BPE token counts under a learned merge list:
    * (doc_id, words, chars, bpe_tokens). `bpe_tokens` is the summed
    * post-merge symbol count — the number a token-budgeted batcher
    * would consume.
    *
    * Scale shape: the fold runs ONCE PER DISTINCT WORD, not once per
    * occurrence — "the" appears a billion times in a 100 TB corpus and
    * pays one fold — then a broadcast join maps occurrences to their
    * counts (measured 3.5x on q_bpe_encode at sf0.1 vs folding every
    * occurrence in the scan). Vocabularies are Zipf-bounded, so the
    * broadcast side stays small while occurrences grow; a corpus whose
    * DISTINCT-word set outgrows broadcast would swap this for a
    * word-keyed shuffle join — same semantics, co-located by the
    * aggregation's own key.
    */
  def encodeCounts(docs: DataFrame, merges: Seq[Merge],
                   text: String = "text", id: String = "doc_id"): DataFrame = {
    val words = filter(split(col(text), " "), w => length(w) > 0)
    val occ = docs.select(col(id), explode(words).as("_w"))
    val chars = expr("transform(sequence(1, length(_w)), i -> substring(_w, i, 1))")
    val enc = encodedVocab(occ.select("_w").distinct(), chars, merges)
      .select(col("_w"), col("_n"), length(col("_w")).cast("long").as("_len"))
    occ.join(broadcast(enc), "_w")
      .groupBy(col(id))
      .agg(count(lit(1)).as("words"),
        sum(col("_len")).cast("long").as("chars"),
        sum(col("_n")).cast("long").as("bpe_tokens"))
  }

  /** Per-document BYTE-level BPE token counts under a learned byte merge
    * list: (doc_id, pretokens, bytes, bpe_tokens). Same
    * vocab-fold + broadcast-join shape as [[encodeCounts]], over
    * space-carrying pre-tokens and the hex byte alphabet; `bytes` is the
    * document's exact UTF-8 length (pre-tokens are lossless), the
    * ceiling `bpe_tokens` converges down from as merges are learned.
    */
  def byteEncodeCounts(docs: DataFrame, merges: Seq[Merge],
                       text: String = "text", id: String = "doc_id"): DataFrame = {
    val occ = byteTokens(docs, text, Seq(col(id)))
      .withColumnRenamed("word", "_w")
    val vocab = occ.select("_w").distinct()
      .withColumn("_h", hex(encode(col("_w"), "UTF-8")))
    val enc = encodedVocab(vocab, expr(hexSymsSql), merges)
      .select(col("_w"), col("_n"), expr("length(_h) DIV 2").cast("long").as("_len"))
    occ.join(broadcast(enc), "_w")
      .groupBy(col(id))
      .agg(count(lit(1)).as("pretokens"),
        sum(col("_len")).cast("long").as("bytes"),
        sum(col("_n")).cast("long").as("bpe_tokens"))
  }
}
