package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale training-data deduplication operators.
  *
  * The reference has no dedup operators (distinct is user-level reduce —
  * SURVEY.md §2.6); these are the scale path for a 100 TB document corpus.
  * All hashing is md5-based and engine-portable on purpose: the same
  * pipeline is reproducible from Spark, DuckDB, or Python — which is also
  * what makes the DuckDB correctness oracle possible.
  *
  * Scale design notes (100 TB):
  *  - every stage is a single shuffle on a well-distributed hash key;
  *  - MinHash signatures compute in ONE pass over exploded shingles with
  *    `numPerms` agg columns (map-side partial min per permutation), not
  *    one shuffle per permutation;
  *  - LSH banding self-joins on (band, bandKey) — bucket sizes are
  *    bounded by banding probability, and a `maxBucket` guard drops
  *    degenerate buckets (all-identical boilerplate docs) instead of
  *    letting one bucket produce O(n²) pairs on a cluster.
  */
object Dedup {

  /** Whitespace tokens, empties dropped. */
  private def toks(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > lit(0))

  /** Contiguous word `n`-gram shingles of the text.
    * Docs shorter than n words shingle to the whole text.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val t = toks(text)
    val ngrams = transform(
      sequence(lit(1), greatest(size(t) - (n - 1), lit(1))),
      i => array_join(slice(t, i, lit(n)), " "))
    ngrams
  }

  /** Exact dedup: canonical row per identical text. Returns (text_hash,
    * doc_id) keeping the smallest doc_id per hash — one hash-shuffle,
    * fully partial-aggregated map-side.
    */
  def exact(docs: DataFrame, text: String = "text", id: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(text)).as("text_hash"))
      .agg(min(col(id)).as(id), count(lit(1)).as("dup_cnt"))

  /** Key-collision fingerprint dedup: normalized bag-of-words fingerprint
    * (lowercase, distinct, sorted, md5) — catches word-order shuffles that
    * exact hashing misses.
    */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(toks(lower(text)))), " "))

  /** MinHash signature per doc: for permutation i, sig_i = min over
    * shingles of md5(i || "|" || shingle). Using the lexicographic min of
    * a seeded md5 as the permutation is engine-portable and collision-safe
    * for dedup purposes.
    *
    * One explode + one groupBy: Catalyst plans map-side partial `min` for
    * all `numPerms` columns in a single shuffle.
    */
  def minhashSignatures(docs: DataFrame, numPerms: Int = 8, shingleN: Int = 3,
                        text: String = "text", id: String = "doc_id"): DataFrame = {
    val ex = docs.select(col(id), explode(array_distinct(shingles(col(text), shingleN))).as("sh"))
    val aggs = (0 until numPerms).map { i =>
      min(md5(concat(lit(i.toString), lit("|"), col("sh")))).as(s"sig$i")
    }
    ex.groupBy(col(id)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding over minhash signatures: band b's key is the md5 of its
    * `rowsPerBand` concatenated signature components. Docs sharing any
    * (band, key) are near-dup candidates.
    */
  def lshBands(sigs: DataFrame, numPerms: Int, rowsPerBand: Int,
               id: String = "doc_id"): DataFrame = {
    require(numPerms % rowsPerBand == 0, "numPerms must divide into bands")
    val numBands = numPerms / rowsPerBand
    val bands = (0 until numBands).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"sig${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat_ws("|", cols: _*)).as("bkey"))
    }
    sigs.select(col(id), explode(array(bands: _*)).as("bk"))
      .select(col(id), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
  }

  /** Candidate near-dup pairs from LSH: self-join on (band, bkey),
    * `a < b`, distinct across bands. `maxBucket` drops pathological
    * buckets (identical boilerplate at corpus scale) before the join.
    */
  def minhashCandidates(docs: DataFrame, numPerms: Int = 8, rowsPerBand: Int = 2,
                        shingleN: Int = 3, maxBucket: Int = 1000,
                        text: String = "text", id: String = "doc_id"): DataFrame = {
    val bands = lshBands(minhashSignatures(docs, numPerms, shingleN, text, id),
      numPerms, rowsPerBand, id)
    val bounded = bands
      .withColumn("_bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bkey")))
      .where(col("_bsz") <= maxBucket).drop("_bsz")
    val a = bounded.select(col("band"), col("bkey"), col(id).as("doc_a"))
    val b = bounded.select(col("band"), col("bkey"), col(id).as("doc_b"))
    a.join(b, Seq("band", "bkey"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Exact n-gram Jaccard similarity for given candidate pairs
    * (doc_a, doc_b): |A ∩ B| / |A ∪ B| over distinct shingle sets.
    * Computed distributively: explode both sides' shingles, count
    * intersections via an equi-join grouped per pair.
    */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, shingleN: Int = 3,
                   text: String = "text", id: String = "doc_id"): DataFrame = {
    val sh = docs.select(col(id), explode(array_distinct(shingles(col(text), shingleN))).as("sh"))
    val sizes = sh.groupBy(col(id)).agg(count(lit(1)).as("sz"))
    val inter = pairs
      .join(sh.withColumnRenamed(id, "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
      .join(sh.withColumnRenamed(id, "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
      .where(col("sh_a") === col("sh_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    pairs
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("inter"))
      .join(sizes.withColumnRenamed(id, "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed(id, "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** SimHash-style 16-bit fingerprint, engine-portable: bit j of the
    * fingerprint is the majority vote across the doc's distinct tokens of
    * whether hex digit j of md5(token) is >= '8' (i.e. the digit's top
    * bit). Emitted as a 16-char '0'/'1' string (msb-first) so any SQL
    * engine can reproduce and compare via Hamming distance on characters.
    */
  def simhash16(docs: DataFrame, text: String = "text", id: String = "doc_id"): DataFrame = {
    val tok = docs.select(col(id),
      explode(array_distinct(toks(col(text)))).as("t"))
      .withColumn("h", md5(col("t")))
    val bitVotes = (0 until 16).map { j =>
      sum(when(substring(col("h"), j + 1, 1).isin(
        "8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1)).as(s"v$j")
    }
    val votes = tok.groupBy(col(id)).agg(bitVotes.head, bitVotes.tail: _*)
    val bits = (0 until 16).map(j => when(col(s"v$j") > 0, "1").otherwise("0"))
    votes.select(col(id), concat(bits: _*).as("simhash"))
  }
}
