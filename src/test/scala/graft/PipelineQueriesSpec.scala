package graft

import org.apache.spark.sql.functions._

/** Properties of the round-10 curation batch that the DuckDB hash-compare
  * cannot express: leakage-freedom of the cluster split, partitioning
  * invariance of the exact-moment z-scores, the Σw size law of the
  * temperature mix, and the contamination gate's containment in the
  * candidate set.
  */
class PipelineQueriesSpec extends SparkSpec {

  private def run(name: String) =
    Queries.fullRegistry(name).fn(spark, sfDir)

  test("q_cluster_split never separates an LSH candidate pair") {
    val docs = Tables.load(spark, sfDir, "documents")
    val pairs = graft.dedup.Dedup.minhashCandidates(docs,
      numPerms = 8, rowsPerBand = 2, maxBucket = 1000000)
    val split = run("q_cluster_split").select(col("doc_id"), col("split"))
    val crossSplit = pairs
      .join(split.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("split", "split_a"), "doc_a")
      .join(split.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("split", "split_b"), "doc_b")
      .where(col("split_a") =!= col("split_b"))
    assert(crossSplit.count() === 0L,
      "near-dup candidates must land in the same split")
    // and the split is total: every doc has exactly one assignment
    assert(split.count() === docs.count())
  }

  test("q_cluster_split covers all three splits with sane proportions") {
    val bySplit = run("q_cluster_split").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = bySplit.values.sum
    assert(bySplit.keySet === Set("train", "valid", "test"))
    // hash gates at 0.8/0.9: train should dominate by a wide margin
    assert(bySplit("train") > total / 2)
  }

  test("q_zscore_outliers is invariant to input partitioning") {
    val reference = run("q_zscore_outliers").collect().map(_.toSeq).toSeq
    // the FULL pipeline recomputed over a shuffled, repartitioned input —
    // not the same plan twice
    val ev = Tables.load(spark, sfDir, "events").repartition(17, col("user_id"))
    val base = ev.select(col("event_type"),
      round(col("value") * 100).cast("long").as("c"))
    val stats = base.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("c").as("s1"),
        sum(col("c") * col("c")).as("s2"))
      .where(col("n") > 1)
      .withColumn("stdc", sqrt(
        (col("s2").cast("double") * col("n") -
          col("s1").cast("double") * col("s1")) /
        (col("n").cast("double") * (col("n") - 1))))
    val outl = base.join(broadcast(stats), "event_type")
      .withColumn("z",
        (col("c").cast("double") - col("s1").cast("double") / col("n")) /
          col("stdc"))
      .groupBy("event_type")
      .agg(sum(when(abs(col("z")) > 1.5, 1L).otherwise(0L)).as("n_outliers"),
        max(round(abs(col("z")), 6)).as("max_abs_z"))
    val recomputed = stats.join(outl, "event_type")
      .select(col("event_type"), col("n"),
        round(col("s1").cast("double") / col("n") / lit(100.0), 6)
          .as("mean_value"),
        round(col("stdc") / lit(100.0), 6).as("std_value"),
        col("n_outliers"), col("max_abs_z"))
      .orderBy("event_type")
      .collect().map(_.toSeq).toSeq
    assert(recomputed === reference,
      "the full z-score output must not depend on input partitioning")
  }

  test("q_alpha_mix output size is exactly the deterministic copy count " +
    "and rare languages are upsampled") {
    val docs = Tables.load(spark, sfDir, "documents")
    val mix = run("q_alpha_mix")
    assert(mix.count() >= docs.count(),
      "alpha < 1 flattening never shrinks the corpus")
    // the head language keeps rate exactly 1 (w = 1 → one copy each)
    val headLang = docs.groupBy("lang").count()
      .orderBy(col("count").desc, col("lang")).head().getString(0)
    val headDocs = docs.where(col("lang") === headLang).count()
    val headCopies = mix.where(col("lang") === headLang).count()
    assert(headCopies === headDocs)
    // rare languages gain copies
    val tailLang = docs.groupBy("lang").count()
      .orderBy(col("count").asc, col("lang")).head().getString(0)
    if (tailLang != headLang) {
      val tailDocs = docs.where(col("lang") === tailLang).count()
      val tailCopies = mix.where(col("lang") === tailLang).count()
      assert(tailCopies > tailDocs)
    }
    // copy_id is dense per doc: max(copy_id) + 1 == copies of that doc
    val bad = mix.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), (max("copy_id") + 1).as("m"))
      .where(col("n") =!= col("m"))
    assert(bad.count() === 0L)
  }

  test("q_dsir_weights: en docs score higher than non-en on average") {
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "lang")
    val scored = run("q_dsir_weights").join(docs, "doc_id")
    val avg = scored.groupBy(col("lang") === "en")
      .agg(org.apache.spark.sql.functions.avg("dsir_logratio").as("a"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(avg(true) > avg(false),
      "the importance weight must separate target-like docs")
  }

  test("q_decontam_fuzzy only flags train docs against eval docs") {
    val hits = run("q_decontam_fuzzy").collect()
    hits.foreach { r =>
      assert(r.getLong(0) % 10 != 0, "train side must be doc_id % 10 != 0")
      assert(r.getLong(1) % 10 == 0, "eval side must be doc_id % 10 == 0")
      assert(r.getDouble(2) >= 0.3 && r.getDouble(2) <= 1.0)
      assert(r.getLong(3) >= 1)
    }
  }

  test("q_proj_topk: the query vector is its own best match in both " +
    "spaces and sketch recall is visible") {
    val rows = run("q_proj_topk").collect()
    assert(rows.nonEmpty)
    val top = rows.head
    assert(top.getLong(0) === 0L, "vec 0 must retrieve itself first")
    assert(math.abs(top.getDouble(1) - 1.0) < 1e-6)
    assert(math.abs(top.getDouble(2) - 1.0) < 1e-6)
    // projected similarities are valid cosines
    rows.foreach { r =>
      assert(r.getDouble(1) <= 1.0 + 1e-9 && r.getDouble(1) >= -1.0 - 1e-9)
    }
  }

  test("q_triangles: every triangle member has at least two candidate " +
    "neighbors and counts are consistent") {
    val docs = Tables.load(spark, sfDir, "documents")
    val pairs = graft.dedup.Dedup.minhashCandidates(docs,
      numPerms = 8, rowsPerBand = 2, maxBucket = 1000000)
    val deg = pairs.select(col("doc_a").as("doc_id"))
      .unionAll(pairs.select(col("doc_b").as("doc_id")))
      .groupBy("doc_id").count()
    val tri = run("q_triangles")
    val under = tri.join(deg, "doc_id").where(col("count") < 2)
    assert(under.count() === 0L,
      "a doc in a triangle must have degree >= 2")
    // total triangle incidences divide by 3
    val total = tri.agg(sum("n_triangles")).head().getLong(0)
    assert(total % 3 === 0L)
  }

  test("q_session_seq: sequence token count equals n_events and " +
    "session starts align with q_sessionize") {
    val seqs = run("q_session_seq")
    val bad = seqs.where(
      size(split(col("seq"), " ")) =!= col("n_events"))
    assert(bad.count() === 0L)
    val sess = run("q_sessionize").select("user_id", "sess", "session_start")
    val joined = seqs.select("user_id", "sess", "session_start")
      .except(sess)
    assert(joined.count() === 0L,
      "session boundaries must match the sessionize operator")
  }

  test("q_stream_quantile: p50 <= p95 and per-hour n matches the batch " +
    "count") {
    val rows = run("q_stream_quantile").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), "p50 bin must not exceed p95 bin")
    }
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("hour"))
      .agg(count(lit(1)).as("n_batch"))
    val streamed = run("q_stream_quantile").select("hour", "n")
    val mismatch = streamed.join(batch, "hour")
      .where(col("n") =!= col("n_batch"))
    assert(mismatch.count() === 0L)
    assert(streamed.count() === batch.count(),
      "every batch hour must appear exactly once in the stream result")
  }

  test("q_source_kl: divergences are non-negative and doc counts total") {
    val docs = Tables.load(spark, sfDir, "documents")
    val rows = run("q_source_kl").collect()
    rows.foreach(r => assert(r.getDouble(2) >= -1e-6,
      s"KL must be non-negative, got ${r.getDouble(2)} for ${r.getString(0)}"))
    assert(rows.map(_.getLong(1)).sum === docs.count())
  }

  test("q_novelty_curve: cumulative is monotone and ends at the distinct " +
    "shingle vocabulary") {
    val curve = run("q_novelty_curve").collect()
    assert(curve.nonEmpty)
    val cums = curve.map(_.getLong(2))
    assert(cums.zip(cums.tail).forall { case (a, b) => b > a } || cums.length == 1)
    val docs = Tables.load(spark, sfDir, "documents")
    val vocab = docs.select(explode(array_distinct(
        graft.dedup.Dedup.shingles(col("text"), 3))).as("sh"))
      .select(md5(col("sh"))).distinct().count()
    assert(cums.last === vocab)
    assert(curve.map(_.getLong(1)).sum === vocab)
  }

  test("q_substring_trim: length bookkeeping is exact and untouched docs " +
    "round-trip") {
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val trimmed = run("q_substring_trim")
    // every cut removes exactly one 40-char window
    val badLen = trimmed.join(docs, "doc_id")
      .where(col("trimmed_len") =!=
        length(col("text")) - col("dropped_windows") * 40)
    assert(badLen.count() === 0L)
    // docs with nothing cut are byte-identical
    val changedClean = trimmed.join(docs, "doc_id")
      .where(col("dropped_windows") === 0 && col("trimmed") =!= col("text"))
    assert(changedClean.count() === 0L)
    assert(trimmed.count() === docs.count())
  }

  test("q_ivfpq_refine: the query retrieves itself first at exact " +
    "cosine 1 and the refined list is exact-sorted") {
    val rows = run("q_ivfpq_refine").collect()
    assert(rows.nonEmpty)
    assert(rows.head.getLong(0) === 0L)
    assert(math.abs(rows.head.getDouble(2) - 1.0) < 1e-6)
    val cosines = rows.map(_.getDouble(2))
    assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
  }

  test("q_weighted_sample: exactly 5 docs per source with negative keys") {
    val sample = run("q_weighted_sample")
    val counts = sample.groupBy("source").count().collect()
    counts.foreach(r => assert(r.getLong(1) === 5L))
    assert(sample.where(col("key") > 0).count() === 0L)
  }

  test("q_event_transitions: rows normalize to 1 and transitions total " +
    "events minus users") {
    val trans = run("q_event_transitions")
    val rowSums = trans.groupBy("prev_type")
      .agg(sum("prob").as("p"), sum("cnt").as("c")).collect()
    rowSums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-4))
    val ev = Tables.load(spark, sfDir, "events")
    val expected = ev.count() -
      ev.select("user_id").distinct().count()
    assert(trans.agg(sum("cnt")).head().getLong(0) === expected)
  }

  test("q_lang_confusion: cells cover every doc with valid labels") {
    val docs = Tables.load(spark, sfDir, "documents")
    val cm = run("q_lang_confusion")
    assert(cm.agg(sum("cnt")).head().getLong(0) === docs.count())
    // predicted labels come only from the classifier's codomain: the
    // stopword-list languages plus 'und' (zh has no list, so it can
    // never be PREDICTED — only mispredicted into other buckets, which
    // the matrix exists to expose)
    val valid = graft.text.TextAnalysis.stopwords.keySet + "und"
    val bad = cm.collect().map(_.getString(1)).filterNot(valid)
    assert(bad.isEmpty, s"unexpected predicted labels: ${bad.mkString(",")}")
    assert(cm.where(col("predicted") === "zh").count() === 0L)
  }

  test("q_minhash_containment: jaccard bounded by both containments and " +
    "all measures in [0,1]") {
    val rows = run("q_minhash_containment").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (j, ca, cb) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(j >= -1e-9 && j <= 1 + 1e-9)
      assert(ca >= -1e-9 && ca <= 1 + 1e-9)
      assert(cb >= -1e-9 && cb <= 1 + 1e-9)
      assert(j <= math.min(ca, cb) + 1e-6,
        "jaccard can never exceed either containment")
    }
  }

  test("q_vocab_coverage: token totals match the corpus and fractions " +
    "are valid") {
    val cov = run("q_vocab_coverage")
    val docs = Tables.load(spark, sfDir, "documents")
    val totalTokens = docs.select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0).count()
    assert(cov.agg(sum("n_tokens")).head().getLong(0) === totalTokens)
    assert(cov.where(col("oov_frac") < 0 || col("oov_frac") > 1).count() === 0L)
    // a 10-word vocab over a larger vocabulary must leave some OOV mass
    assert(cov.agg(sum("oov_tokens")).head().getLong(0) > 0L)
  }

  test("q_expectations: clean synthetic data passes RI and null rules") {
    val rows = run("q_expectations").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(rows.size === 8)
    // referential integrity and null gates hold on the generated data
    for (rule <- Seq("orders_custkey_fk", "lineitem_orderkey_fk",
      "orders_orderdate_nonnull"))
      assert(rows(rule)._1 === 0L, s"$rule should have zero violations")
    rows.values.foreach { case (v, pass) => assert(pass === (v == 0L)) }
  }

  test("q_lsh_precision: verified count bounded and ratio consistent; " +
    "a planted high-jaccard corpus reads precision 1") {
    val r = run("q_lsh_precision").head()
    val (cand, ver, prec) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(cand > 0 && ver >= 0 && ver <= cand)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(prec == r6(ver.toDouble / cand.toDouble))
    // planted: one near-identical pair and an unrelated doc — the only
    // candidate verifies, precision exactly 1
    import spark.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nd = (1 to 60).map(i => if (i == 30) "X" else s"w$i").mkString(" ")
    val other = (100 to 160).map(i => s"v$i").mkString(" ")
    val df = Seq((1L, base), (2L, nd), (3L, other)).toDF("doc_id", "text")
    val pairs = graft.dedup.Dedup.minhashCandidates(df,
      numPerms = 8, rowsPerBand = 2, maxBucket = 1000000)
    val p = graft.dedup.Dedup.ngramJaccard(df, pairs)
      .agg(count(lit(1)).as("c"),
        sum(when(col("jaccard") >= 0.5, lit(1L)).otherwise(lit(0L))).as("v"))
      .head()
    assert(p.getLong(0) == 1L && p.getLong(1) == 1L)
  }

  test("q_lang_source_chi2: independent table reads 0, perfect " +
    "association reads n") {
    val r = run("q_lang_source_chi2").head()
    assert(r.getLong(0) > 0 && r.getLong(1) > 0 && r.getDouble(2) >= 0.0)
    import spark.implicits._
    def chi2Of(rows: Seq[(String, String)]): (Long, Long, Double) = {
      val df = rows.zipWithIndex
        .map { case ((l, s), i) => (i.toLong, l, s) }
        .toDF("doc_id", "lang", "source")
      val o = df.groupBy("lang", "source").agg(count(lit(1)).as("o"))
      val rr = o.groupBy("lang").agg(sum("o").as("r"))
      val cc = o.groupBy("source").agg(sum("o").as("c"))
      val nn = o.agg(sum("o").as("n"))
      val cells = rr.crossJoin(broadcast(cc))
        .join(o, Seq("lang", "source"), "left").crossJoin(broadcast(nn))
        .withColumn("e", col("r").cast("double") * col("c").cast("double")
          / col("n").cast("double"))
        .withColumn("oo", coalesce(col("o"), lit(0L)).cast("double"))
        .withColumn("t", round((col("oo") - col("e")) * (col("oo") - col("e"))
          / col("e") * lit(1e9), 0).cast("long"))
      val a = cells.agg(count(lit(1)),
        ((countDistinct("lang") - 1) * (countDistinct("source") - 1)),
        round(sum(col("t")).cast("double") / lit(1e9), 6)).head()
      (a.getLong(0), a.getLong(1), a.getDouble(2))
    }
    // independent 2x2: every (lang, source) cell holds 5 docs → chi2 0
    val ind = (for (l <- Seq("a", "b"); s <- Seq("x", "y"); _ <- 1 to 5)
      yield (l, s))
    assert(chi2Of(ind) == ((4L, 1L, 0.0)))
    // perfect 2x2 association with 10 docs → chi2 = n = 10
    val dep = (1 to 5).flatMap(_ => Seq(("a", "x"), ("b", "y")))
    assert(chi2Of(dep) == ((4L, 1L, 10.0)))
  }

  test("q_curation_funnel: survivors monotonically shrink and stage 0 " +
    "is the whole table") {
    val rows = run("q_curation_funnel").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L to 5L))
    assert(rows.head._2 == Tables.load(spark, sfDir, "documents").count())
    assert(rows.sliding(2).forall { case Array((_, d1, t1), (_, d2, t2)) =>
      d2 <= d1 && t2 <= t1 })
  }

  test("q_quality_dup_decile: deciles are balanced and sum to the corpus") {
    val rows = run("q_quality_dup_decile").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = Tables.load(spark, sfDir, "documents").count()
    assert(rows.map(_._1).sorted.toSeq == (0L to 9L))
    assert(rows.map(_._2).sum == n)
    // exact rank cuts: every decile holds floor(n/10) or ceil(n/10) docs
    assert(rows.forall { case (_, d, _) => d == n / 10 || d == n / 10 + 1 })
    assert(rows.forall { case (_, d, dup) => dup <= d })
  }

  test("q_lsh_tuned_sweep: candidate sets nest as bands coarsen, so " +
    "counts fall monotonically with the threshold") {
    // an r-row band key is the conjunction of its r/2-row halves: any
    // pair matching a (2,8) band matches both covering (4,4) bands, and
    // any (4,4) match implies both (8,2) matches — candidates(τ=0.8) ⊆
    // candidates(0.5) ⊆ candidates(0.3)
    val rows = run("q_lsh_tuned_sweep").collect()
      .map(r => (r.getDouble(0), r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0.3, 0.5, 0.8))
    assert(rows.sliding(2).forall { case Array((_, c1, _), (_, c2, _)) =>
      c2 <= c1 })
    assert(rows.forall { case (_, c, v) => v <= c })
  }

  test("q_lsh_autotune's in-engine winner is the plan lshBanding derives") {
    val rows = run("q_lsh_autotune").collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(3)))
    val winner = rows.find(_._3 == 1L).map(r => (r._1, r._2))
    // the squaring-chain replay and the driver-side math.pow integral
    // must agree on the PICK (the contract; raw err may differ in ulps)
    assert(winner.contains(graft.dedup.Dedup.lshBanding(0.5, 16)))
  }
}
