package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  private def one(text: String, c: org.apache.spark.sql.Column) = {
    import spark.implicits._
    Seq(text).toDF("text").select(c).head()
  }

  test("langId picks language with most stopword hits, und on no evidence") {
    assert(one("the cat and the dog", TextAnalysis.langId(col("text"))).getString(0) == "en")
    assert(one("le chat et la vie est dans", TextAnalysis.langId(col("text"))).getString(0) == "fr")
    assert(one("der hund ist nicht das", TextAnalysis.langId(col("text"))).getString(0) == "de")
    assert(one("xyzzy qwerty", TextAnalysis.langId(col("text"))).getString(0) == "und")
  }

  test("langId tie-break is alphabetical") {
    // "la" is in both es and fr lists (1 hit each) → 'es' (alphabetical)
    assert(one("la cosa", TextAnalysis.langId(col("text"))).getString(0) == "es")
  }

  test("token and subword counts") {
    assert(one("one two  three", TextAnalysis.tokenCount(col("text"))).getInt(0) == 3)
    // 'customer' → cust+omer = 2 subwords; '42' → 2 digits; '!' → 1
    assert(one("customer 42 !", TextAnalysis.subwordCount(col("text"))).getInt(0) == 5)
  }

  test("punctuation ratio and quality bounds") {
    val p = one("a,b.c!", TextAnalysis.punctRatio(col("text"))).getDouble(0)
    assert(math.abs(p - 0.5) < 1e-9)
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val q = docs.select(TextAnalysis.qualityScore(col("text")).as("q"))
      .agg(min("q"), max("q")).head()
    assert(q.getDouble(0) >= 0.0 && q.getDouble(1) <= 1.0)
  }

  test("scrubPii replaces emails, IPs, digit runs; order protects typed tags") {
    def scrub(s: String): String =
      one(s, TextAnalysis.scrubPii(col("text"))).getString(0)
    assert(scrub("mail bob.smith+x@corp.example.org now") == "mail <EMAIL> now")
    assert(scrub("from 192.168.0.1 port") == "from <IP> port")
    assert(scrub("call +1 555 014-2398 ok") == "call +<PHONE> ok")
    // ordering: an email's digits must become part of <EMAIL>, not
    // <PHONE>; an IP's dotted digits must become <IP>, not <PHONE>
    assert(scrub("x 12345678@num.example.com y") == "x <EMAIL> y")
    assert(scrub("x 10.20.30.40 y") == "x <IP> y")
    // clean text passes through untouched (short numbers are not PII)
    assert(scrub("take route 66 at 9am, room 101") == "take route 66 at 9am, room 101")
    // composite line, all three classes
    assert(scrub("a@b.co at 8.8.8.8 tel 5551234567") == "<EMAIL> at <IP> tel <PHONE>")
  }

  test("unigramEntropy: 0 for constant docs, log2(n) for all-distinct, " +
    "1 bit for a 50/50 split; empty docs yield no row") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a"), (2L, "a b c d"), (3L, "a a b b"), (4L, "  "),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.unigramEntropy(docs).orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Double]("entropy") == 0.0)
    assert(out(0).getAs[Long]("n_tokens") == 4L)
    assert(out(0).getAs[Long]("n_distinct") == 1L)
    assert(out(1).getAs[Double]("entropy") == 2.0)
    assert(out(2).getAs[Double]("entropy") == 1.0)
  }

  test("lengthBuckets: smallest rung >= len, overflow clamps to top rung, " +
    "pad accounting is exact") {
    import spark.implicits._
    // len 3 → rung 16 (pad 13); len 17 → rung 32 (pad 15);
    // len 16 → rung 16 (pad 0); 600 tokens → clamp 512, pad 0
    val docs = Seq(
      (1L, Seq.fill(3)("w").mkString(" ")),
      (2L, Seq.fill(17)("w").mkString(" ")),
      (3L, Seq.fill(16)("w").mkString(" ")),
      (4L, Seq.fill(600)("w").mkString(" ")),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lengthBuckets(docs).orderBy("bucket").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("pad_tokens"),
        r.getAs[Double]("pad_frac")))
    assert(out.toSeq == Seq(
      (16L, 2L, 19L, 13L, math.rint(13.0 / 32 * 1e6) / 1e6),
      (32L, 1L, 17L, 15L, math.rint(15.0 / 32 * 1e6) / 1e6),
      (512L, 1L, 600L, 0L, 0.0)))
  }

  test("tfidf ranks rare terms above common ones; topK truncates by score then term") {
    import spark.implicits._
    val df = Seq(
      (1L, "apple apple banana the"),
      (2L, "banana the cherry"),
      (3L, "the the the")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tfidf(df, topK = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(-_._3).map(x => (x._2, x._3)).toSeq }
    // N=3; df: apple 1, banana 2, cherry 1, the 3
    // idf: apple/cherry ln(4/2)+1, banana ln(4/3)+1, the ln(4/4)+1 = 1
    val idfRare = math.log(4.0 / 2.0) + 1
    val idfMid = math.log(4.0 / 3.0) + 1
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    assert(out(1L) == Seq("apple" -> r6(2 * idfRare), "banana" -> r6(idfMid)))
    assert(out(2L) == Seq("cherry" -> r6(idfRare), "banana" -> r6(idfMid)))
    // doc 3 has only one distinct term; topK must not pad
    assert(out(3L) == Seq("the" -> 3.0))
  }

  test("chunk: overlap-stride windows cover every token; trailing chunks shorten") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens
      (2L, "x"),                   // shorter than a window
      (3L, "  ")                   // empty after tokenization
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(df, window = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq
    assert(doc1 == Seq("a b c d", "d e f g", "g h i j", "j"),
      s"stride-3/window-4 chunking wrong: $doc1")
    assert(out.filter(_._1 == 2L).map(_._3).toSeq == Seq("x"))
    assert(!out.exists(_._1 == 3L), "empty doc must yield no chunks")
    // every token of doc 1 appears in at least one chunk
    assert(doc1.flatMap(_.split(" ")).toSet == "abcdefghij".map(_.toString).toSet)
  }

  test("bm25 ranks rare terms above common ones at equal tf; scores hand-check") {
    import spark.implicits._
    val df = Seq(
      (1L, "apple the the"),  // dl 3
      (2L, "the banana"),     // dl 2
      (3L, "the cherry")      // dl 3 tokens? no: 2
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(df, topK = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // N=3, tottok=7, avgdl=7/3; df: apple 1, the 3, banana 1, cherry 1
    def score(tf: Long, dfc: Long, dl: Long): Double = {
      val idf = math.log(1.0 + (3L - dfc + 0.5) / (dfc + 0.5))
      val v = idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl * 3L / 7L.toDouble))
      math.round(v * 1e6) / 1e6
    }
    val d1 = out.filter(_._1 == 1L).sortBy(-_._3).map(x => (x._2, x._3)).toSeq
    // rare 'apple' (tf 1) outranks common 'the' (tf 2, df 3)
    assert(d1 == Seq("apple" -> score(1, 1, 3), "the" -> score(2, 3, 3)), s"got $d1")
    val d2 = out.filter(_._1 == 2L).sortBy(-_._3).map(x => (x._2, x._3)).toSeq
    assert(d2 == Seq("banana" -> score(1, 1, 2), "the" -> score(1, 3, 2)), s"got $d2")
  }

  test("unigramLogProb: rare-token docs score below common-token docs; exact value") {
    import spark.implicits._
    val df = Seq(
      (1L, "the the"),      // all common
      (2L, "the zzyzx")     // one rare token
    ).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(df)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // corpus: the=3, zzyzx=1, tot=4
    def r9(x: Double) = math.round(x * 1e9) / 1e9
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    val lpThe = r9(math.log10(3.0 / 4.0))
    val lpZ = r9(math.log10(1.0 / 4.0))
    assert(out(1L) == r6((lpThe + lpThe) / 2))
    assert(out(2L) == r6((lpThe + lpZ) / 2))
    assert(out(2L) < out(1L), "rare tokens must lower the score")
  }

  test("ngramCharFractions: repeated long phrase dominates; unique text has no dups") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b a b"),          // bigrams: 'a b' x3, 'b a' x2
      (2L, "p q r s"),              // all bigrams unique
      (3L, "x")                     // < n tokens: whole-text collapse
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramCharFractions(df, n = 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // doc 1: chars('a b')=3*3=9, chars('b a')=2*3=6, tot=15
    assert(out(1L) == (0.6, 1.0), s"got ${out(1L)}")
    // doc 2: three unique bigrams, top = 3/9, dup = 0
    assert(out(2L) == (math.round(3.0 / 9.0 * 1e6) / 1e6, 0.0))
    // doc 3: single collapsed gram 'x' occurs once
    assert(out(3L) == (1.0, 0.0))
  }

  test("bm25/unigramLogProb/ngramCharFractions: degenerate docs are deterministic") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "   "), (3L, "solo")).toDF("doc_id", "text")
    // token-less docs produce no tf/token rows and vanish from term ops
    assert(TextAnalysis.bm25(df).collect().map(_.getLong(0)).toSet == Set(3L))
    assert(TextAnalysis.unigramLogProb(df).collect().map(_.getLong(0)).toSet == Set(3L))
    // char fractions: empty docs yield the zero-char collapsed gram →
    // guarded 0.0 fractions; a single-token doc is its own top gram
    val ncf = TextAnalysis.ngramCharFractions(df, n = 2)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(ncf(1L) == (0.0, 0.0) && ncf(2L) == (0.0, 0.0))
    assert(ncf(3L) == (1.0, 0.0))
  }

  test("invertedIndex: hand-traced postings, df gate drops stop terms pre-assembly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "apple cherry cherry"),
      (4L, "banana date")).toDF("doc_id", "text")
    // 'banana' df=3 of 4 → dropped at maxDfFrac=0.7; others survive
    val idx = TextAnalysis.invertedIndex(docs, maxDfFrac = 0.7)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(!idx.contains("banana"))
    assert(idx("apple") == (2L, "1:2 3:1"))   // sorted by doc, tf counted
    assert(idx("cherry") == (2L, "2:1 3:2"))
    assert(idx("date") == (1L, "4:1"))
  }

  test("invertedIndexSegmented: segment = id mod n, union equals global index") {
    import spark.implicits._
    val docs = Seq.tabulate(20)(i =>
      (i.toLong, s"w${i % 5} w${i % 3} common")).toDF("doc_id", "text")
    val seg = TextAnalysis.invertedIndexSegmented(docs, nSegments = 4,
      maxDfFrac = 0.5).collect()
    // every doc in a postings row lives in that row's segment
    seg.foreach { r =>
      val s = r.getLong(0)
      r.getString(3).split(" ").foreach { p =>
        assert(p.split(":")(0).toLong % 4 == s, s"doc $p outside segment $s")
      }
    }
    // merging segments reproduces the global index exactly
    val merged = seg.groupBy(_.getString(1)).map { case (term, rows) =>
      term -> (rows.head.getLong(2),
        rows.flatMap(_.getString(3).split(" "))
          .sortBy(_.split(":")(0).toLong).mkString(" "))
    }
    val global = TextAnalysis.invertedIndex(docs, maxDfFrac = 0.5)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(merged.toMap == global)
    assert(!global.contains("common")) // df=20 of 20 → gated in both forms
  }

  test("cooccurrence: hand-traced window-2 pairs, canonical order, symmetry") {
    import spark.implicits._
    // "a b c b": pairs (a,b) (a,c) (b,c) (b,b) (c,b→b,c); "b c": (b,c)
    val docs = Seq((1L, "a b c b"), (2L, "b c"), (3L, "x")).toDF("doc_id", "text")
    val co = TextAnalysis.cooccurrence(docs, window = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(co == Map(("a", "b") -> 1L, ("a", "c") -> 1L,
      ("b", "b") -> 1L, ("b", "c") -> 3L))
    // canonical ordering means no (b,a)-style mirror rows exist
    assert(co.keys.forall { case (a, b) => a <= b })
  }

  test("pmiPairs: exact score replay, minCount prunes, totals unfiltered") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c c")).toDF("doc_id", "text")
    // window-1 pairs: doc1 (a,b)x3, doc2 (a,b), doc3 (c,c) → totPairs 5
    // unigrams: a:3 b:3 c:2, totTok 8
    val out = TextAnalysis.pmiPairs(docs, window = 1, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(("a", "b"))) // (c,c) cnt=1 pruned by minCount
    val expected = math.round(math.log((4.0 / 5.0) /
      ((3.0 / 8.0) * (3.0 / 8.0))) * 1e6) / 1e6
    assert(out(("a", "b")) == (4L, expected))
  }

  test("knDocScores: hand-computed interpolated Kneser-Ney bigram scores") {
    import spark.implicits._
    // corpus: "a b" x3, "b a" x1 → cnt(a,b)=3, cnt(b,a)=1
    // c1(a)=3 fan1(a)=1; c1(b)=1 fan1(b)=1; cont2(a)=cont2(b)=1; nbi=2
    // P(b|a) = (3-.75)/3 + (.75·1/3)·(1/2) = 0.875
    // P(a|b) = (1-.75)/1 + (.75·1/1)·(1/2) = 0.625
    val docs = Seq("d1" -> "a b", "d2" -> "a b", "d3" -> "a b",
      "d4" -> "b a").toDF("doc_id", "text")
    val out = TextAnalysis.knDocScores(docs, threshold = -0.1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    def lp(p: Double) = math.round(math.log10(p) * 1e9) / 1e9
    def sc(p: Double) = math.round(lp(p) * 1e6) / 1e6
    assert(out("d1") == (1L, sc(0.875), true))
    assert(out("d4") == (1L, sc(0.625), false))
  }

  test("knDocScores drops docs with fewer than two tokens") {
    import spark.implicits._
    val docs = Seq("d1" -> "solo", "d2" -> "two words").toDF("doc_id", "text")
    val ids = TextAnalysis.knDocScores(docs).select("doc_id")
      .collect().map(_.getString(0)).toSet
    assert(ids == Set("d2"))
  }

  test("fingerprint equals dedup fingerprint (shared definition)") {
    val docs = graft.Tables.load(spark, sfDir, "documents").limit(50)
    val n = docs.select(
      (TextAnalysis.fingerprint(col("text")) ===
        graft.dedup.Dedup.fingerprint(col("text"))).as("eq"))
      .where(!col("eq")).count()
    assert(n == 0)
  }

  test("sourceLogOdds: exclusive terms outrank shared ones, z sign tracks side") {
    import spark.implicits._
    val shared = Seq.fill(20)("the common words here").mkString(" ")
    val df = Seq(
      (1L, shared + " alpha alpha alpha alpha", "srcA"),
      (2L, shared + " beta beta beta beta", "srcB"))
      .toDF("doc_id", "text", "source")
    val top = TextAnalysis.sourceLogOdds(df, topK = 3).collect()
      .map(r => (r.getString(0), r.getLong(3)) -> (r.getString(1), r.getDouble(2)))
      .toMap
    // each source's most distinctive term is its exclusive word, z > 0
    assert(top(("srcA", 1L))._1 == "alpha" && top(("srcA", 1L))._2 > 0)
    assert(top(("srcB", 1L))._1 == "beta" && top(("srcB", 1L))._2 > 0)
    // the other side's exclusive word never enters a source's top list
    assert(!top.exists { case ((s, _), (t, _)) => s == "srcA" && t == "beta" })
    // shared words carry strictly smaller z than the exclusive word
    assert(top(("srcA", 2L))._2 < top(("srcA", 1L))._2)
  }

  test("zipfFit recovers slope -1, r2 1 on an exact power law") {
    import spark.implicits._
    // term i appears exactly 60/i times for i = 1..6, so
    // ln(c) = ln(60) - ln(rank) exactly: slope -1, intercept ln(60)
    val text = (1 to 6).flatMap(i => Seq.fill(60 / i)(s"t$i")).mkString(" ")
    val df = Seq((1L, text, "xx")).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.zipfFit(df).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 6L)
    assert(math.abs(r.head.getDouble(2) - (-1.0)) < 1e-3)
    assert(math.abs(r.head.getDouble(3) - math.log(60.0)) < 1e-3)
    assert(r.head.getDouble(4) > 0.999)
  }

  test("tokenGini: uniform counts give 0; hand-computed skew gives 0.5") {
    import spark.implicits._
    val uniform = Seq.fill(2)(Seq("a", "b", "c", "d")).flatten.mkString(" ")
    // ascending counts (1,1,1,9): G = (2*42 - 5*12) / (4*12) = 0.5
    val skew = (Seq("w", "x", "y") ++ Seq.fill(9)("z")).mkString(" ")
    val df = Seq((1L, uniform, "uni"), (2L, skew, "skw"))
      .toDF("doc_id", "text", "lang")
    val g = TextAnalysis.tokenGini(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(g("uni") == ((4L, 0.0)))
    assert(g("skw") == ((4L, 0.5)))
  }

  test("bm25Search: summed per-term scores, rank order, absent terms score 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple apple the the"),
      (3L, "the the the durian")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25Search(docs,
        Seq((7L, "apple banana")), topK = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // doc 3 has neither term -> no row; doc 1 has both -> ranks first
    assert(got.map(_._3).toSeq == Seq(1L, 2L))
    assert(got.forall(_._1 == 7L))
    // the per-doc score is the exact sum of the bm25Scores rows the
    // query terms select, in 1e-6 integer space
    val perTerm = TextAnalysis.bm25Scores(docs)
      .where(col("term").isin("apple", "banana"))
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
      .groupBy(_._1).map { case (d, xs) =>
        d -> xs.map(x => math.round(x._2 * 1e6)).sum / 1e6 }
    got.foreach { case (_, _, d, s) => assert(s == perTerm(d), s"doc $d") }
  }

  test("phraseSearch: exact consecutive matches only; repeated-term " +
    "phrases and overlapping occurrences count correctly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b"),        // "a b" twice, "b a" once
      (2L, "a x b"),            // terms present but not consecutive
      (3L, "t t t"),            // "t t" overlaps: starts 0 and 1
      (4L, "b a")
    ).toDF("doc_id", "text")
    def search(p: String): Map[Long, Long] =
      TextAnalysis.phraseSearch(docs, Seq((9L, p)))
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(search("a b") == Map(1L -> 2L))
    // doc 1 is "a b c a b" — its bigrams are {a b, b c, c a}; "b a"
    // appears only in doc 4
    assert(search("b a") == Map(4L -> 1L))
    assert(search("t t") == Map(3L -> 2L))
    assert(search("a x b") == Map(2L -> 1L))
    assert(search("c a b") == Map(1L -> 1L))
    assert(search("zz yy") == Map.empty[Long, Long])
  }

  test("invertedIndexDelta: one-word edit emits one posting; removes, " +
    "adds and unchanged docs behave") {
    import spark.implicits._
    val oldD = Seq(
      (1L, "a b c"),   // unchanged
      (2L, "x y z"),   // gets ' w' appended
      (3L, "p q"),     // removed
      (4L, "m n")      // 'n' replaced by 'k'
    ).toDF("doc_id", "text")
    val newD = Seq(
      (1L, "a b c"),
      (2L, "x y z w"),
      (4L, "m k"),
      (5L, "new doc")  // added
    ).toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndexDelta(oldD, newD)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set(
      ("w", 2L, "add"),                      // the appended word ONLY
      ("p", 3L, "del"), ("q", 3L, "del"),    // removed doc's postings
      ("n", 4L, "del"), ("k", 4L, "add"),    // replacement: one del one add
      ("new", 5L, "add"), ("doc", 5L, "add")))
  }

  test("script spoofing: homoglyph words flag via mixed adjacency; pure " +
    "scripts and word-boundary switches pass") {
    import spark.implicits._
    val cases = Seq(
      ("plain latin words", false),
      // 'cаt': Latin c + Cyrillic а (U+0430) + Latin t — the spoof
      ("the cаt sat", true),
      // pure Cyrillic word — no Latin adjacency
      ("привет", false),
      // legitimate multilingual: scripts switch at the word boundary
      ("hello мир world", false))
    val got = cases.map(_._1).toDF("s")
      .select(TextAnalysis.scriptSpoofFlag(col("s"))).collect()
      .map(_.getBoolean(0))
    assert(got.toSeq == cases.map(_._2),
      s"got ${got.toSeq} for ${cases.map(_._1)}")
    // counts: 'c' and 't' are Latin, а is Cyrillic, two mixed pairs
    val r = Seq("cаt").toDF("s").select(
      TextAnalysis.latinCount(col("s")),
      TextAnalysis.cyrillicCount(col("s")),
      TextAnalysis.mixedScriptCount(col("s"))).head()
    assert((r.getLong(0), r.getLong(1)) == ((2L, 1L)))
    assert(r.getLong(2) >= 1L)
  }

  test("homoglyphFold collapses spoofed variants onto the Latin key and " +
    "is the identity on clean Latin text") {
    import spark.implicits._
    // "cаt" with Cyrillic а folds to plain "cat"
    val got = Seq("cаt", "cat", "plain words 123")
      .toDF("s").select(TextAnalysis.homoglyphFold(col("s")))
      .collect().map(_.getString(0))
    assert(got(0) == "cat" && got(1) == "cat")
    assert(got(2) == "plain words 123", "identity on clean Latin")
    // fold removes the spoof flag
    val flag = Seq("cаt").toDF("s")
      .select(TextAnalysis.scriptSpoofFlag(TextAnalysis.homoglyphFold(col("s"))))
      .head().getBoolean(0)
    assert(!flag)
  }

  test("mixed-language gate: stitched bilingual text flags, clean " +
    "monolingual and sub-threshold noise pass") {
    import spark.implicits._
    val cases = Seq(
      ("the cat and the dog is here", false),     // en only
      ("le chat est dans la maison", false),      // fr only
      ("the cat and le chat est dans", true),     // en>=2 AND fr>=2
      ("the cat and the dog le", false))          // fr evidence below 2
    val got = cases.map(_._1).toDF("s")
      .select(TextAnalysis.mixedLangFlag(col("s"))).collect()
      .map(_.getBoolean(0))
    assert(got.toSeq == cases.map(_._2), s"got ${got.toSeq}")
    // langsDetected counts every language over threshold
    val ld = Seq("the and le est el un der die").toDF("s")
      .select(TextAnalysis.langsDetected(col("s"))).head().getLong(0)
    assert(ld == 4L, s"all four languages have 2 hits: $ld")
  }

  test("encoding gate: counts each corruption class, clean text keeps") {
    import spark.implicits._
    val rows = Seq(
      ("clean ascii text, nothing wrong here.", 0L, 0L, 0L, true),
      // café misdecoded: UTF-8 C3 A9 as Latin-1 -> Ã©
      ("cafÃ© menu", 1L, 0L, 0L, false),
      // cp1252 curly apostrophe salad: â€™
      ("itâ€™s fine", 1L, 0L, 0L, false),
      ("byte�salad�", 0L, 2L, 0L, false),
      ("bin\u0001ary\u0002", 0L, 0L, 2L, false),
      // tab/newline/CR are NOT control contamination
      ("a\tb\nc\rd", 0L, 0L, 0L, true))
    val got = rows.map(_._1).toDF("s").select(
      TextAnalysis.mojibakeCount(col("s")),
      TextAnalysis.replacementCount(col("s")),
      TextAnalysis.controlCount(col("s")),
      TextAnalysis.encodingKeep(col("s"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == rows.map(r => (r._2, r._3, r._4, r._5)))
  }

  test("encoding gate: accented but CORRECTLY decoded text is not mojibake") {
    import spark.implicits._
    val ok = Seq("café crème brûlée", "niño über")
    val flags = ok.toDF("s")
      .select(TextAnalysis.encodingKeep(col("s"))).collect().map(_.getBoolean(0))
    assert(flags.forall(identity),
      "legit Latin-1-range accents must pass the gate")
  }

  test("scalar entropy/repetition ≡ their aggregate paths, incl. edges") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").limit(60)
    val viaAggE = TextAnalysis.unigramEntropy(docs)
      .select("doc_id", "entropy").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaScalarE = docs.select(col("doc_id"),
        TextAnalysis.unigramEntropyScalar(col("text")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaScalarE == viaAggE)
    val viaAggR = TextAnalysis.repetitionRatio(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaScalarR = docs.select(col("doc_id"),
        TextAnalysis.repetitionRatioScalar(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaScalarR == viaAggR)
    // edges: empty text → NULL entropy (the aggregate path emits no
    // row) but rep 1.0 (the whole-text shingle); a doc cycling one
    // word → entropy 0, rep 1.0; NULL text → NULL for both
    val edge = Seq((1L, Some("")), (2L, Some("w w w w")),
        (3L, Option.empty[String]))
      .toDF("doc_id", "text")
    val er = edge.orderBy("doc_id").select(
      TextAnalysis.unigramEntropyScalar(col("text")),
      TextAnalysis.repetitionRatioScalar(col("text"))).collect()
    assert(er(0).isNullAt(0) && er(0).getDouble(1) == 1.0)
    assert(er(1).getDouble(0) == 0.0 && er(1).getDouble(1) == 1.0)
    assert(er(2).isNullAt(0) && er(2).isNullAt(1))
  }
}
