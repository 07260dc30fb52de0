package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("shingles: contiguous word 3-grams; short docs collapse to whole text") {
    import spark.implicits._
    val df = docs(1L -> "a b c d", 2L -> "x y")
    val got = df.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("a b c", "b c d"))
    assert(got(2L) == Seq("x y"))
  }

  test("exact dedup groups identical texts, keeps min id") {
    val df = docs(5L -> "same text here", 2L -> "same text here", 9L -> "other")
    val got = Dedup.exact(df).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((2L, 2L), (9L, 1L)))
  }

  test("incrementalExact equals plain anti join and uses the bloom fast path") {
    val history = docs(1L -> "seen one", 2L -> "seen two", 3L -> "seen three")
    val fps = Dedup.exact(history).select("text_hash")
    val batch = docs(
      10L -> "brand new",     // definitely new
      11L -> "seen two",      // re-crawl of history → dropped
      12L -> "brand new",     // intra-batch dup of 10 → collapsed
      13L -> "also new")
    val got = Dedup.incrementalExact(batch, fps, expectedHistory = 10)
    // equivalence to the naive plan: batch exact-dedup anti-join history
    val naive = Dedup.exact(batch)
      .join(fps, Seq("text_hash"), "left_anti")
    assert(got.collect().map(r => (r.getLong(1), r.getLong(2))).toSet ==
      naive.collect().map(r => (r.getLong(1), r.getLong(2))).toSet)
    assert(got.count() == 2) // "brand new" (id 10, cnt 2) + "also new"
    // the membership test is the native bloom predicate, not a UDF/join
    // (analyzed plan: over in-memory test rows Catalyst folds the local
    // filters away entirely; MapLookupSpec asserts the executed form on
    // real file scans)
    val plan = got.queryExecution.analyzed.toString
    assert(plan.contains("might_contain"), plan.take(500))
  }

  test("incrementalNearDups finds a near-dup of history, skips unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val history = docs(1L -> base, 2L -> "completely different words entirely here")
    val batch = docs(
      10L -> (base + " tail"),                       // near-dup of hist 1
      11L -> "nothing in common with anything else") // unrelated
    val got = Dedup.incrementalNearDups(batch, history, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 1L)))
  }

  test("fingerprint is word-order and duplication invariant") {
    val df = docs(1L -> "alpha beta gamma", 2L -> "gamma alpha beta alpha", 3L -> "alpha beta delta")
    val fps = df.select(Dedup.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("minhash LSH finds a planted near-duplicate pair") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 60).map(i => if (i == 30) "CHANGED" else s"w$i").mkString(" ")
    val other = (100 to 160).map(i => s"v$i").mkString(" ")
    val df = docs(1L -> base, 2L -> nearDup, 3L -> other)
    val pairs = Dedup.minhashCandidates(df, numPerms = 8, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("crossSourceDupMatrix counts planted leakage under unordered source pairs") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 60).map(i => if (i == 30) "CHANGED" else s"w$i").mkString(" ")
    val intra = (200 to 260).map(i => s"u$i").mkString(" ")
    val other = (100 to 160).map(i => s"v$i").mkString(" ")
    // leak: srcB's doc 2 near-duplicates srcA's doc 1; srcB also has an
    // internal exact pair (4, 5); doc 3 is unrelated noise in srcA
    val df = Seq(
      (1L, base, "srcA"), (2L, nearDup, "srcB"), (3L, other, "srcA"),
      (4L, intra, "srcB"), (5L, intra, "srcB"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.crossSourceDupMatrix(df)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("srcA", "srcB") -> 1L, ("srcB", "srcB") -> 1L))
  }

  test("cluster size distribution: planted chain of 3 plus singletons") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nd1 = (1 to 60).map(i => if (i == 30) "X" else s"w$i").mkString(" ")
    val nd2 = (1 to 60).map(i => if (i == 5) "Y" else s"w$i").mkString(" ")
    val solo1 = (100 to 160).map(i => s"v$i").mkString(" ")
    val solo2 = (300 to 360).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, base), (2L, nd1), (3L, nd2), (4L, solo1), (5L, solo2))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidates(df, numPerms = 8, rowsPerBand = 2)
    val comp = Dedup.dedupClusters(pairs)
    val dist = df.select("doc_id").join(comp, Seq("doc_id"), "left")
      .select(coalesce(col("cluster"), col("doc_id")).as("component"))
      .groupBy("component").count()
      .groupBy("count").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == Map(3L -> 1L, 1L -> 2L))
  }

  test("dedupCorpus keeps one canonical doc per near-dup cluster") {
    // three near-identical docs (one cluster) + one unrelated
    val base = (1 to 60).map(i => s"w$i")
    val d1 = base.mkString(" ")
    val d2 = base.updated(10, "X").mkString(" ")
    val d3 = base.updated(50, "Y").mkString(" ")
    val other = (100 to 160).map(i => s"v$i").mkString(" ")
    val df = docs(4L -> d2, 1L -> d1, 9L -> d3, 7L -> other)
    val kept = Dedup.dedupCorpus(df)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(kept(1L)) // smallest id in the cluster is canonical
    assert(!kept(4L) && !kept(9L))
    assert(kept(7L)) // unclustered doc survives
  }

  test("dedupCorpusVerified rejects LSH false positives below threshold") {
    // two docs similar enough to band-collide but with low exact Jaccard
    // must NOT dedup at threshold 0.8; true near-dups must
    val base = (1 to 60).map(i => s"w$i")
    val trueDup = base.updated(30, "X").mkString(" ")      // jaccard ~0.9
    val partial = (base.take(20) ++ (200 to 240).map(i => s"z$i")).mkString(" ")
    val df = docs(1L -> base.mkString(" "), 2L -> trueDup, 3L -> partial)
    val kept = Dedup.dedupCorpusVerified(df, threshold = 0.8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(kept(1L) && !kept(2L)) // true near-dup deduped
    assert(kept(3L))              // partial overlap survives
  }

  test("dedupClusters handles chains (transitive components)") {
    import spark.implicits._
    // chain 1-2, 2-3, plus isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val clusters = Dedup.dedupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(3L) == 1L)
    assert(clusters(10L) == 10L && clusters(11L) == 10L)
  }

  test("dedupClusters converges on a long chain (diameter > 5)") {
    import spark.implicits._
    // chain 1-2-3-4-5-6-7: min-label distance 6 — the old maxIter=5 cap
    // would have silently split this component
    val pairs = (1L to 6L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val clusters = Dedup.dedupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 7L).forall(clusters(_) == 1L))
  }

  test("dedupClusters raises instead of returning unconverged labels") {
    import spark.implicits._
    val pairs = (1L to 6L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      Dedup.dedupClusters(pairs, maxIter = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("dedupCorpus leaves at most the final label generation persisted") {
    // VERDICT r3 defect: every propagation iteration leaked its
    // checkpoint blocks — 50 pinned generations at scale
    val base = (1 to 60).map(i => s"w$i")
    val df = docs(4L -> base.updated(10, "X").mkString(" "),
      1L -> base.mkString(" "), 9L -> base.updated(50, "Y").mkString(" "),
      7L -> (100 to 160).map(i => s"v$i").mkString(" "))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Dedup.dedupCorpus(df).collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 2, s"checkpoint generations leaked: ${leaked.toSeq.sorted}")
    leaked.foreach(id => spark.sparkContext.getPersistentRDDs
      .get(id).foreach(_.unpersist(false)))
  }

  test("dedupCorpusVerified releases the shingle-table checkpoint too") {
    val base = (1 to 60).map(i => s"w$i")
    val df = docs(4L -> base.updated(10, "X").mkString(" "),
      1L -> base.mkString(" "), 9L -> base.updated(50, "Y").mkString(" "),
      7L -> (100 to 160).map(i => s"v$i").mkString(" "))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Dedup.dedupCorpusVerified(df, threshold = 0.8).collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 2, s"checkpoint generations leaked: ${leaked.toSeq.sorted}")
    leaked.foreach(id => spark.sparkContext.getPersistentRDDs
      .get(id).foreach(_.unpersist(false)))
  }

  test("ngramJaccard computes exact overlap on candidates") {
    val df = docs(1L -> "a b c d e", 2L -> "a b c d f", 3L -> "z z z")
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val got = Dedup.ngramJaccard(df, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // doc1 shingles: {abc,bcd,cde}; doc2: {abc,bcd,cdf} → inter 2, union 4
    assert(math.abs(got((1L, 2L)) - 0.5) < 1e-12)
    assert(got((1L, 3L)) == 0.0)
  }

  test("multi-table embedding LSH recovers pairs a single table misses") {
    import spark.implicits._
    // 120 (v, v+noise) pairs at cosine ~0.99: wide enough angles that a
    // single 6-bit table splits a meaningful fraction across buckets;
    // extra independent tables must recover them (seeded → deterministic)
    val rnd = new scala.util.Random(7)
    val dim = 16
    val rows = (0 until 120).flatMap { i =>
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val w = v.map(x => x + 0.15f * rnd.nextGaussian().toFloat)
      Seq((i.toLong * 2, v.toSeq), (i.toLong * 2 + 1, w.toSeq))
    }
    val df = rows.toDF("vec_id", "embedding")
    def pairsOf(nTables: Int): Set[(Long, Long)] =
      Dedup.embeddingNearDups(df, dim, threshold = 0.98, nBits = 6,
        nTables = nTables)
        .select("vec_a", "vec_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = pairsOf(1)
    val multi = pairsOf(3)
    assert(single.subsetOf(multi), "multi-table lost a single-table pair")
    assert(multi.size > single.size,
      s"no recall gain (single=${single.size}, multi=${multi.size}) — tables not independent?")
  }

  test("contaminatedDocs flags exactly the train docs overlapping eval n-grams") {
    val train = docs(
      1L -> "alpha beta gamma delta",
      2L -> "completely different words entirely",
      3L -> "the quick brown fox")
    val eval = docs(
      10L -> "zz yy alpha beta gamma xx",
      11L -> "unrelated eval content here")
    val out = Dedup.contaminatedDocs(train, eval, shingleN = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // only doc 1 shares a 3-gram ("alpha beta gamma"); exactly one of them
    assert(out == Map(1L -> 1L), s"got $out")
  }

  test("semanticNearDups: k-means cells recover planted clone pairs exactly") {
    import spark.implicits._
    // 4 well-separated gaussian blobs of 30 vectors; every 5th vector is
    // cloned under id+1000. The trained cells must co-bucket each clone
    // with its original (identical vectors score identically against every
    // centroid) and the exact gate must emit exactly the clone pairs —
    // blob-mates sit at cosine far below the 0.999 threshold.
    val rnd = new scala.util.Random(11)
    val dim = 16
    val rows = (0 until 4).flatMap { blob =>
      val center = Array.tabulate(dim)(j => if (j % 4 == blob) 10.0f else 0.0f)
      (0 until 30).map { i =>
        val v = center.map(x => x + 0.5f * rnd.nextGaussian().toFloat)
        ((blob * 30 + i).toLong, v.toSeq)
      }
    }
    val clones = rows.filter(_._1 % 5 == 0).map { case (i, v) => (i + 1000L, v) }
    val df = (rows ++ clones).toDF("vec_id", "embedding")
    val got = Dedup.semanticNearDups(df, k = 4, iters = 2, threshold = 0.999)
      .select("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = rows.map(_._1).filter(_ % 5 == 0).map(i => (i, i + 1000L)).toSet
    assert(got == want, s"expected exactly the planted clone pairs; " +
      s"missing=${want -- got} extra=${got -- want}")
  }

  test("winnowing: docs sharing a long run share a fingerprint, unrelated don't") {
    import spark.implicits._
    val common = (1 to 10).map(i => s"c$i") // run of 10 ≥ w+k-1 = 6
    val a = ((1 to 8).map(i => s"a$i") ++ common ++ (1 to 8).map(i => s"x$i")).mkString(" ")
    val b = ((1 to 8).map(i => s"b$i") ++ common ++ (1 to 8).map(i => s"y$i")).mkString(" ")
    val c = (100 to 130).map(i => s"z$i").mkString(" ")
    val fps = Dedup.winnowFingerprints(docs(1L -> a, 2L -> b, 3L -> c))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty,
      "shared 10-token run produced no shared fingerprint")
    assert((fps(1L) intersect fps(3L)).isEmpty)
    // short doc (< k tokens) still fingerprints (whole-text fallback)
    val short = Dedup.winnowFingerprints(docs(9L -> "just two"))
      .select("fingerprints").head().getSeq[Long](0)
    assert(short.size == 1)
  }

  test("simhash: near-dups land at small Hamming distance, unrelated far") {
    val base = (1 to 80).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 80).map(i => if (i % 40 == 0) "CHANGED" + i else s"w$i").mkString(" ")
    val other = (200 to 280).map(i => s"v$i").mkString(" ")
    val sh = Dedup.simhash16(docs(1L -> base, 2L -> nearDup, 3L -> other))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(hamming(sh(1L), sh(2L)) <= 3)
    assert(hamming(sh(1L), sh(3L)) >= 4)
  }

  test("simhashPairs: banding finds exactly the brute-force Hamming<=3 pairs") {
    // corpus: 6 planted duplicate families (hamming 0 — a 64-bit simhash
    // flips ~1 bit per changed token so "1 token changed" is NOT reliably
    // <=3; exact dups pin the expectation) + unrelated docs. The REAL
    // property under test is banding losslessness: banded results must
    // equal the brute-force all-pairs verify at the <=3 threshold,
    // whatever near-pairs happen to exist.
    val corpus = (0 until 6).flatMap { f =>
      val base = (1 to 100).map(i => s"f${f}w$i").mkString(" ")
      Seq((f * 10L + 1) -> base, (f * 10L + 2) -> base)
    } ++ (0 until 8).map(i => (1000L + i) -> (1 to 60).map(j => s"u${i}x$j").mkString(" "))
    val df = docs(corpus: _*)
    val banded = Dedup.simhashPairs(df, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute force over the same signatures
    val sig = Dedup.simhash64(df).collect()
      .map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    val brute = (for {
      (a, sa) <- sig.toSeq; (b, sb) <- sig.toSeq if a < b
      h = sa.zip(sb).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
      if h <= 3
    } yield (a, b) -> h.toLong).toMap
    assert(banded == brute, s"banded=${banded.keySet} brute=${brute.keySet}")
    assert(brute.nonEmpty, "test corpus produced no near-dup pairs at all")
    // each planted family's pair is present
    (0 until 6).foreach { f =>
      assert(banded.contains((f * 10L + 1, f * 10L + 2)),
        s"family $f near-dup pair missed")
    }
    // the 128-bit/8-band variant is lossless at the deeper <=7 threshold
    // on the same corpus: banded == brute force over the 8-band signature
    val banded128 = Dedup.simhashPairs128(df, maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sig128 = Dedup.simhash128(df).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getInt)).toMap
    val brute128 = (for {
      (a, sa) <- sig128.toSeq; (b, sb) <- sig128.toSeq if a < b
      h = sa.zip(sb).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
      if h <= 7
    } yield (a, b) -> h.toLong).toMap
    assert(banded128 == brute128,
      s"128-bit banded=${banded128.keySet} brute=${brute128.keySet}")
    (0 until 6).foreach { f =>
      assert(banded128.contains((f * 10L + 1, f * 10L + 2)),
        s"family $f pair missed by 128-bit banding")
    }
  }

  test("passageDedup: first occurrence survives, repeats removed, shells kept") {
    val df = docs(
      1L -> "x1 x2 x3 x4 y1 y2 y3 y4", // both passages first occurrences
      2L -> "x1 x2 x3 x4 z1 z2 z3 z4", // first passage is doc 1's boilerplate
      3L -> "x1 x2 x3 x4 y1 y2 y3 y4", // fully shadowed by doc 1 -> shell
      4L -> "w1 w2 w3")                // shortfall chunk, unique
    val got = Dedup.passageDedup(df, window = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) == ((2L, 2L, "x1 x2 x3 x4 y1 y2 y3 y4")))
    assert(got(2L) == ((2L, 1L, "z1 z2 z3 z4")))
    assert(got(3L) == ((2L, 0L, null)))
    assert(got(4L) == ((1L, 1L, "w1 w2 w3")))
  }

  test("passageDedup is partitioning-independent (total-order first pick)") {
    val df = docs((1L to 40L).map(i =>
      i -> s"p1 p2 p3 p4 u${i}a u${i}b u${i}c u${i}d"): _*)
    def run(parts: Int) = Dedup.passageDedup(df.repartition(parts), window = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).sortBy(_._1).toSeq
    assert(run(1) == run(13))
    // only doc 1 keeps the shared boilerplate passage
    val kept = run(13).filter(_._3 != null ).filter(_._3.contains("p1 p2 p3 p4"))
    assert(kept.map(_._1) == Seq(1L))
  }

  test("duplicateWindows flags cross-doc repeats, not unique or short docs") {
    val shared = "x" * 25 + "y" * 25 // 50 shared chars >= winLen + stride - 1
    val df = docs(
      1L -> (shared + " unique tail one " + "a" * 30),
      2L -> (shared + " other trailing text " + "b" * 30),
      3L -> ("entirely distinct content here padded out to window length " +
        "c" * 30),
      4L -> "short") // < winLen: no window fits, excluded
    val r = Dedup.duplicateWindows(df, winLen = 20, stride = 10)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(!r.contains(4L))
    assert(r(1L)._2 > 0 && r(2L)._2 > 0, s"shared prefix must be flagged: $r")
    assert(r(3L)._2 == 0, s"unique doc flagged: $r")
    // a window duplicated only WITHIN one doc does not count
    val self = docs(5L -> ("z" * 60 + " filler " + "z" * 60))
    val rs = Dedup.duplicateWindows(self, winLen = 20, stride = 10)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(rs(5L) == 0, s"within-doc repeat counted as cross-doc: $rs")
  }

  test("dedupCorpusBest keeps the highest-scoring cluster member") {
    // d1/d2 identical (one cluster), d3 unrelated. Score favors d2 →
    // the LARGER id survives, unlike dedupCorpus's min-id rule.
    val txt = "alpha beta gamma delta epsilon zeta eta theta"
    val df = docs(1L -> txt, 2L -> txt, 3L -> "totally different words here now")
    val score = when(col("doc_id") === 2L, 2.0).otherwise(1.0)
    val keep = Dedup.dedupCorpusBest(df, score)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(keep == Map(1L -> false, 2L -> true, 3L -> true))
    // tie on score → smaller id wins
    val tied = Dedup.dedupCorpusBest(df, lit(1.0))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(tied == Map(1L -> true, 2L -> false, 3L -> true))
  }

  test("duplicateWindows is partitioning-independent") {
    val df = docs((1L to 30L).map(i =>
      i -> (("common prefix block shared by everyone ") + s"doc $i " + "t" * 40)): _*)
    def run(p: Int) = Dedup.duplicateWindows(df.repartition(p))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(run(1) == run(11))
  }

  test("ngramContainment: a small doc quoted whole inside a big one " +
    "scores containment ~1 while jaccard stays low") {
    import spark.implicits._
    val small = "alpha beta gamma delta epsilon zeta"
    val big = small + " " + (1 to 60).map(i => s"filler$i word$i").mkString(" ")
    val d = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val r = Dedup.ngramContainment(d, pairs).head()
    assert(r.getDouble(3) === 1.0,
      "every shingle of the small doc is in the big one")
    assert(r.getDouble(2) < 0.1, "jaccard misses the inclusion")
    assert(r.getDouble(4) < 0.1)
    // the shared overlap pipeline gives jaccard the BIT-identical value —
    // both views round at 6 digits
    val j = Dedup.ngramJaccard(d, pairs).head().getDouble(2)
    assert(j === r.getDouble(2))
  }

  /** Deterministic aperiodic char soup (seeded PRNG) — aperiodic so a
    * copied span can only hash-match at its true alignment, never via
    * periodicity. (A polynomial-mod-26 generator is NOT enough: its
    * constant second difference makes it periodic with period 13.)
    */
  private def soup(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  }

  test("ExactSubstr recall vs stride: stride-aligned windows recall " +
    "1/stride on offset-shifted copies; stride-1 recalls all") {
    import spark.implicits._
    // 20 planted pairs: pair k shares a 120-char aperiodic span placed
    // at position 41 in doc 2k and position 41+k in doc 2k+1 (shift k).
    // Window starts are ≡ 1 (mod stride) in BOTH docs, so a shared span
    // hash-matches iff its two placements agree mod stride: at
    // stride 20 only k = 0 — measured recall 1/20 = 0.05 — while
    // stride-1 detection catches every shift (recall 1.0). This is the
    // quantified bound behind substringTrimExact.
    val docs = (0 until 20).flatMap { k =>
      val span = soup(500 + k, 120)
      Seq(
        (2L * k, soup(1000 + k, 40) + span + soup(2000 + k, 37)),
        (2L * k + 1, soup(3000 + k, 40 + k) + span + soup(4000 + k, 23)))
    }.toDF("doc_id", "text")
    def detected(stride: Int): Set[Long] =
      Dedup.duplicateWindows(docs, winLen = 40, stride = stride)
        .where(col("dup_windows") > 0)
        .collect().map(_.getLong(0)).toSet
    val s20 = detected(20)
    assert(s20 == Set(0L, 1L),
      s"stride 20 must see exactly the aligned pair (k=0), got $s20")
    assert(s20.size / 2.0 / 20.0 == 0.05) // the measured recall bound
    val s1 = detected(1)
    assert(s1 == (0L until 40L).toSet, "stride 1 must recall every pair")
  }

  test("substringTrimExact cuts shifted copies substringTrim misses") {
    import spark.implicits._
    val span = soup(7, 120)
    // copy shifted by 7 — not a multiple of the 40-char segment length
    val docs = Seq(
      (1L, soup(11, 40) + span + soup(12, 40)),
      (2L, soup(13, 47) + span + soup(14, 33))).toDF("doc_id", "text")
    // stride-aligned trim sees nothing (shift 7 ≢ 0 mod 40)
    val aligned = Dedup.substringTrim(docs, winLen = 40)
      .select(sum("dropped_windows")).head().getLong(0)
    assert(aligned == 0, s"stride-aligned trim should miss the shift, cut $aligned")
    // exact trim cuts every segment the span touches, in both docs
    val exact = Dedup.substringTrimExact(docs, winLen = 40)
      .orderBy("doc_id").collect()
    assert(exact.forall(_.getLong(2) > 0), "both docs must lose segments")
    // doc 1 (len 200 = 5 segments, no tail): span covers chars
    // [41,160] → segments 1..3 cut, segments 0 and 4 reassembled
    val d1 = exact(0)
    assert(d1.getLong(1) == 5 && d1.getLong(2) == 3)
    assert(d1.getString(3) == soup(11, 40) + soup(12, 40))
  }

  test("pathological long doc: sliced window generation reproduces " +
    "exact global positions and cuts") {
    import spark.implicits._
    // one 64 KB doc (128 slices of the 512-position chunk) carrying a
    // 120-char span copied 7-shifted into a short doc — the sliced
    // path must reproduce exact GLOBAL window positions (the cut
    // segment math depends on them) and the slice overlap must not
    // drop or duplicate boundary windows: any off-by-one at a slice
    // seam would move a cut segment and change these counts/bodies
    val span = soup(21, 120)
    val longDoc = soup(22, 40000) + span + soup(23, 25416)
    val docs = Seq(
      (1L, longDoc),
      (2L, soup(24, 47) + span + soup(25, 33))).toDF("doc_id", "text")
    val exact = Dedup.substringTrimExact(docs, winLen = 40)
      .orderBy("doc_id").collect()
    // the long doc loses exactly the segments its span copy touches:
    // chars [40001, 40120] → segments 1000..1002 (3 of 1638)
    assert(exact(0).getLong(1) == 1638L && exact(0).getLong(2) == 3L)
    assert(exact(0).getString(3) ==
      longDoc.substring(0, 40000) + longDoc.substring(40120))
    // short doc (200 = 5 segments): span at [48,167] cuts segments 1–4
    assert(exact(1).getLong(1) == 5L && exact(1).getLong(2) == 4L)
    assert(exact(1).getString(3) == soup(24, 47).substring(0, 40))
    // sparse mode: the sliced+spread path (forced by a tiny threshold)
    // is bit-identical to the in-task transform on the same corpus
    def dup(spreadChars: Int) =
      Dedup.duplicateWindows(docs, winLen = 40, stride = 20,
          spreadChars = spreadChars)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(dup(4096) == dup(1 << 30))
  }

  test("pathological-doc guard: a 2 MB doc at stride 1 trims exactly " +
    "and completes inside a linear-path wall bound") {
    import spark.implicits._
    // Regression guard for the r12 quadratic-substring fix: SQL
    // substring() on a UTF8String walks from byte 0 per call, so
    // per-position windowing of one doc costs ~len²/2 char steps —
    // ~2·10¹² for this 2 MB doc (tens of minutes on the one core that
    // owns the row; 32 MB OOMed outright), while the sliced+spread path
    // measured ~93 s for 32 MB and low seconds here. The bound is ~20×
    // a healthy reading and ~10× under the quadratic one, so it fails
    // on a regression without flaking on a slow run.
    val big = soup(31, 2 * 1000 * 1000)
    // 600-char span at an aligned 40-char segment boundary (500000 =
    // 12500·40), copied into a short doc: cut accounting stays exact
    val span = big.substring(500000, 500600)
    val docs = Seq(
      (1L, big),
      (2L, soup(32, 80) + span + soup(33, 90))).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val exact = Dedup.substringTrimExact(docs, winLen = 40)
      .orderBy("doc_id").collect()
    val secs = (System.nanoTime() - t0) / 1e9
    // 2 MB doc: 50000 segments, the span's 15 cut; kept text = the doc
    // minus exactly the span's characters
    assert(exact(0).getLong(1) == 50000L && exact(0).getLong(2) == 15L)
    assert(exact(0).getString(3) ==
      big.substring(0, 500000) + big.substring(500600))
    // short doc (770 chars = 19 segments): span chars [81,680] touch
    // segments 2..16 → 15 cut, segments 0,1,17,18 kept
    assert(exact(1).getLong(1) == 19L && exact(1).getLong(2) == 15L)
    assert(secs < 180.0,
      f"stride-1 trim of a 2 MB doc took $secs%.1f s — the sliced " +
        "window path has regressed toward the quadratic walk")
  }

  test("lshBanding: picks the S-curve-optimal split, monotone in the " +
    "threshold, ties break toward recall") {
    // hand-checked error integrals for 16 permutations (midpoint rule):
    // τ=0.5 → (4,4); looser τ=0.2 → more bands (8,2); stricter τ=0.8 →
    // fewer bands (2,8). Bands never increase as τ rises.
    assert(Dedup.lshBanding(0.2, 16) == ((8, 2)))
    assert(Dedup.lshBanding(0.5, 16) == ((4, 4)))
    assert(Dedup.lshBanding(0.8, 16) == ((2, 8)))
    val picks = Seq(0.1, 0.3, 0.5, 0.7, 0.9).map(Dedup.lshBanding(_, 16)._1)
    assert(picks == picks.sorted.reverse, s"bands must fall as τ rises: $picks")
    // (16,1) and (1,16) tie exactly at τ=0.5 by grid symmetry; the
    // documented tie-break prefers more bands — verify via the prob curve
    assert(Dedup.lshCandidateProb(0.6, 16, 1) > Dedup.lshCandidateProb(0.6, 1, 16))
  }

  test("minhashCandidatesAuto runs the plan lshBanding picks") {
    val df = docs(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "the quick brown fox jumps over the lazy dog again and again!",
      3L -> "entirely different content about distributed query engines",
      4L -> "entirely different content about distributed query engines")
    val auto = Dedup.minhashCandidatesAuto(df, threshold = 0.5, numPerms = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val manual = Dedup.minhashCandidates(df, numPerms = 16, rowsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == manual && auto.contains((3L, 4L)))
  }

  test("contaminationSpans: island lengths read off planted verbatim spans") {
    import spark.implicits._
    // 40 distinct tokens; eval leaks tokens 5..20 (16 tokens → run 4 of
    // 13-grams → span 16) and tokens 25..38 (14 tokens → run 2 → span 14)
    val words = (1 to 40).map(i => s"w$i")
    val train = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val eval = Seq(
      words.slice(4, 20).mkString(" "),   // w5..w20
      words.slice(24, 38).mkString(" ")   // w25..w38
    ).toDF("text")
    val got = Dedup.contaminationSpans(train, eval, shingleN = 13).head()
    assert(got.getLong(0) == 1L)
    assert(got.getAs[Long]("max_run") == 4L)
    assert(got.getAs[Long]("n_islands") == 2L)
    assert(got.getAs[Long]("longest_span_tokens") == 16L)
    // an unleaked doc yields no row at all
    val clean = Seq((2L, (100 to 140).map(i => s"v$i").mkString(" ")))
      .toDF("doc_id", "text")
    assert(Dedup.contaminationSpans(clean, eval, shingleN = 13).count() == 0)
  }

  test("scalar minhashSigArray ≡ the aggregate minhashSignatures path") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, element_at}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").limit(50)
    val viaAgg = Dedup.minhashSignatures(docs, numPerms = 6)
      .collect().map(r => r.getLong(0) -> (1 to 6).map(r.getLong)).toMap
    val sig = Dedup.minhashSigArray(col("text"), numPerms = 6)
    val viaScalar = docs.select(col("doc_id"), sig.as("s"))
      .select(col("doc_id") +: (0 until 6).map(i =>
        element_at(col("s"), i + 1).as(s"sig$i")): _*)
      .collect().map(r => r.getLong(0) -> (1 to 6).map(r.getLong)).toMap
    assert(viaScalar == viaAgg)
    // degenerate docs: empty and single-word still produce signatures
    val edge = Seq((1L, ""), (2L, "word")).toDF("doc_id", "text")
    val es = edge.select(Dedup.minhashSigArray(col("text"), 4)).collect()
    assert(es.forall(r => r.getSeq[Long](0).length == 4))
    // NULL text → NULL signature and NULL band keys (one whole-array
    // null, never k null components / md5-of-nothing bucket keys) —
    // matching the aggregate path, which emits NO row for such a doc
    val withNull = Seq((1L, Option.empty[String]), (2L, Some("word")))
      .toDF("doc_id", "text")
    val nr = withNull.orderBy("doc_id")
      .select(Dedup.minhashSigArray(col("text"), 4).as("s"),
        Dedup.minhashBandKeys(col("text"), 4, 2).as("b"))
      .collect()
    assert(nr(0).isNullAt(0) && nr(0).isNullAt(1))
    assert(nr(1).getSeq[Long](0).length == 4 &&
      nr(1).getSeq[String](1).length == 2)
  }

  test("scalar simhash64Array ≡ the aggregate simhash64 bands") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").limit(50)
    val viaAgg = Dedup.simhash64(docs).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getInt).toList).toMap
    val viaScalar = docs.select(col("doc_id"),
        Dedup.simhash64Array(col("text")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(viaScalar == viaAgg)
    // NULL text → NULL signature (the aggregate path emits no row)
    val nr = Seq((1L, Option.empty[String]), (2L, Some("a b c")))
      .toDF("doc_id", "text").orderBy("doc_id")
      .select(Dedup.simhash64Array(col("text"))).collect()
    assert(nr(0).isNullAt(0) && nr(1).getSeq[Int](0).length == 4)
  }

  test("scalar minhashBandKeys lands in the same buckets as lshBands") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, posexplode}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").limit(40)
    val viaAgg = Dedup.lshBands(Dedup.minhashSignatures(docs, numPerms = 8),
        numPerms = 8, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val viaScalar = docs
      .select(col("doc_id"),
        posexplode(Dedup.minhashBandKeys(col("text"), 8, 2))
          .as(Seq("band", "bkey")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(viaScalar == viaAgg)
  }
}
