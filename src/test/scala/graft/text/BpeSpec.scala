package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  private def corpus(rows: (String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("trainMerges learns the classic frequency-ordered merges") {
    // 4×"low" + 2×"lowest": 'lo' and 'ow' both appear 6 times → tie
    // breaks lexicographically ('lo' < 'ow'); then 'low' (as merged
    // symbol pair (lo, w)) appears 6 times and wins step 2.
    val docs = corpus(
      "d1" -> "low low low low",
      "d2" -> "lowest lowest")
    val m = Bpe.trainMerges(docs, steps = 2)
    assert(m.map(x => (x.step, x.merged, x.pair_count)) ==
      Seq((1L, "lo", 6L), (2L, "low", 6L)))
  }

  test("greedy rewrite resolves overlapping pairs left-to-right") {
    // Pair counting sees every adjacent position: (a,a) appears 3 times
    // in "aaaa" and 2 in "aaa" → 5. The greedy L2R rewrite then merges
    // non-overlapping: "aaaa" → [aa, aa], "aaa" → [aa, a]. Round 2 ties
    // (aa,aa):1 vs (aa,a):1 → lexicographic on b picks (aa,a) → "aaa".
    val docs = corpus("d1" -> "aaaa aaa")
    val m = Bpe.trainMerges(docs, steps = 2)
    assert(m(0).merged == "aa" && m(0).pair_count == 5)
    assert(m(1).merged == "aaa" && m(1).pair_count == 1)
  }

  test("trainMerges stops early when no pair remains") {
    val docs = corpus("d1" -> "a b c") // all single-char words
    assert(Bpe.trainMerges(docs, steps = 5).isEmpty)
  }

  test("encodeCounts: chars, words, and post-merge token counts") {
    val docs = corpus("d1" -> "low lowest", "d2" -> "low")
    val m = Bpe.trainMerges(docs, steps = 2) // lo, low
    val rows = Bpe.encodeCounts(docs, m).orderBy("doc_id").collect()
    // d1: "low"→[low]=1 tok, "lowest"→[low,e,s,t]=4 toks
    assert(rows(0).getLong(1) == 2 && rows(0).getLong(2) == 9 &&
      rows(0).getLong(3) == 5)
    // d2: "low"→1 tok
    assert(rows(1).getLong(1) == 1 && rows(1).getLong(2) == 3 &&
      rows(1).getLong(3) == 1)
  }

  test("encode with empty merge list counts characters") {
    val docs = corpus("d1" -> "ab cde")
    val r = Bpe.encodeCounts(docs, Nil).head()
    assert(r.getLong(1) == 2 && r.getLong(2) == 5 && r.getLong(3) == 5)
  }

  test("byteWordCounts pre-tokens are lossless, spaces carried") {
    val docs = corpus("d1" -> "to be  or", "d2" -> "to")
    val got = Bpe.byteWordCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // "to be  or": ["to", " be", " ", " or"] — the double space becomes
    // a bare " " token; concatenation reproduces the text exactly
    assert(got == Map("to" -> 2L, " be" -> 1L, " " -> 1L, " or" -> 1L))
  }

  test("byteSymbols splits multi-byte UTF-8 into per-byte hex symbols") {
    import spark.implicits._
    // "é" = C3 A9 (2 bytes), "€" = E2 82 AC (3 bytes), "你" = E4 BD A0
    val words = Seq(("café", 1L), ("€", 1L), (" 你", 1L)).toDF("word", "cnt")
    val syms = Bpe.byteSymbols(words).collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(syms("café") == Seq("63", "61", "66", "C3", "A9"))
    assert(syms("€") == Seq("E2", "82", "AC"))
    assert(syms(" 你") == Seq("20", "E4", "BD", "A0"))
  }

  test("trainByteMerges learns space-crossing and multi-byte merges") {
    // " é" (20 C3 A9) dominates: (C3,A9) has 5 occurrences (4 in the
    // " é" pre-token + 1 in "éz"), then (20, C3A9) has 4 — a merge
    // CONTAINING the space byte, which the word-level path cannot express
    val docs = corpus(
      "d1" -> "x é é é é",
      "d2" -> "éz x")
    val m = Bpe.trainByteMerges(docs, steps = 2)
    assert(m(0).pair_left == "C3" && m(0).pair_right == "A9" &&
      m(0).merged == "C3A9" && m(0).pair_count == 5)
    assert(m(1).pair_left == "20" && m(1).pair_right == "C3A9" &&
      m(1).merged == "20C3A9" && m(1).pair_count == 4)
  }

  test("byteEncodeCounts: bytes are exact UTF-8 lengths, tokens shrink") {
    val docs = corpus("d1" -> "é é", "d2" -> "ab")
    val m = Bpe.trainByteMerges(docs, steps = 1) // (C3,A9) → C3A9
    val rows = Bpe.byteEncodeCounts(docs, m).orderBy("doc_id").collect()
    // d1 "é é": pre-tokens ["é", " é"] = 2+3 bytes; post-merge
    // symbols [C3A9] + [20, C3A9] = 3 tokens
    assert(rows(0).getLong(1) == 2 && rows(0).getLong(2) == 5 &&
      rows(0).getLong(3) == 3)
    // d2 "ab": 1 pre-token, 2 bytes, no merge applies → 2 tokens
    assert(rows(1).getLong(1) == 1 && rows(1).getLong(2) == 2 &&
      rows(1).getLong(3) == 2)
  }

  test("encode dispatches to the broadcast fold past MaxLiteralMerges") {
    val docs = corpus("d1" -> "low lowest", "d2" -> "low")
    val real = Bpe.trainMerges(docs, steps = 2)
    // pad with no-op merges to force the >MaxLiteralMerges broadcast
    // path; results must be identical to the literal-fold path
    val padded = real ++ (1 to Bpe.MaxLiteralMerges + 10).map(i =>
      Bpe.Merge(real.size + i.toLong, s"zz$i", s"qq$i", s"zz${i}qq$i", 0L))
    assert(padded.size > Bpe.MaxLiteralMerges)
    val lit = Bpe.encodeCounts(docs, real).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val bc = Bpe.encodeCounts(docs, padded).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(lit == bc)
    val litB = Bpe.byteEncodeCounts(docs, real).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    val bcB = Bpe.byteEncodeCounts(docs, padded).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(litB == bcB)
  }

  test("batchedByteMerges at batch=1 degenerates to trainByteMerges") {
    // per-step re-ranking with batch=1 IS the sequential trainer — same
    // counts, same tie-break, so the merge lists must be identical
    val docs = corpus("d1" -> "x é é é é", "d2" -> "éz x")
    val seq = Bpe.trainByteMerges(docs, steps = 4)
    val bat = Bpe.batchedByteMerges(docs, steps = 4, batch = 1)
    assert(bat == seq)
  }

  test("batchedByteMerges: big batches stop at vocab exhaustion and " +
    "encode like any ordered merge list") {
    val docs = corpus("d1" -> "low lowest", "d2" -> "low low")
    // ask for far more merges than the vocabulary supports: training
    // must terminate (no pairs left) rather than loop, through the
    // >MaxLiteralMerges broadcast batch-apply path
    val m = Bpe.batchedByteMerges(docs, steps = 500,
      batch = Bpe.MaxLiteralMerges + 36)
    assert(m.nonEmpty && m.size < 500)
    assert(m.map(_.step) == (1L to m.size))
    // fully-merged vocabulary: every pre-token collapses to one symbol
    val enc = Bpe.byteEncodeCounts(docs, m).orderBy("doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
    assert(enc == Seq(("d1", 2L, 2L), ("d2", 2L, 2L)),
      s"fully-merged corpus must count 1 token per pre-token: ${enc.toList}")
  }

  test("training plan never re-touches the corpus after the first pass") {
    // initSymbols(wordCounts) is checkpointed eagerly; per-step plans
    // must read the truncated vocab table, not re-scan documents.
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val words = Bpe.wordCounts(docs)
    val vocab = words.count()
    assert(vocab > 0)
    // pairCounts over the vocab-sized table stays vocab-sized
    val pc = Bpe.pairCounts(Bpe.initSymbols(words))
    val plan = pc.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate")) // partial agg on the explode
  }
}
