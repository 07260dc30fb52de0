package graft

/** Physical-plan shape assertions for the round-10 curation operators —
  * the 100 TB design claims as executable checks, not prose: broadcasts
  * where a model/weight table must never shuffle with the corpus,
  * WindowGroupLimit where a per-group top-k must be bounded map-side,
  * TakeOrderedAndProject where a top-k must never become a global sort,
  * and no cartesian product anywhere in the layer.
  */
class PlanShapesSpec extends SparkSpec {

  private def plan(name: String): String =
    Queries.fullRegistry(name).fn(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("q_dsir_weights broadcasts the 64-row feature model, never " +
    "shuffling it with the corpus") {
    val p = plan("q_dsir_weights")
    assert(p.contains("BroadcastHashJoin"),
      "the (doc,bucket) partials must join the model via broadcast")
  }

  test("q_weighted_sample's per-source top-5 is WindowGroupLimit-bounded") {
    val p = plan("q_weighted_sample")
    assert(p.contains("WindowGroupLimit"),
      "rank<=k must prune map-side before the shuffle")
  }

  test("q_proj_topk stays TakeOrderedAndProject — no global sort") {
    val p = plan("q_proj_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_zscore_outliers gates via a broadcast of the per-type moments") {
    val p = plan("q_zscore_outliers")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q_vocab_coverage broadcasts the vocabulary to the token scan") {
    val p = plan("q_vocab_coverage")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q_event_transitions windows by user and broadcasts the row totals") {
    val p = plan("q_event_transitions")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_bpe_bytes_encode joins occurrences to the encoded vocabulary " +
    "via broadcast — the fold must run per distinct word, not per row") {
    val p = plan("q_bpe_bytes_encode")
    assert(p.contains("BroadcastHashJoin"),
      "the encoded-vocab join must broadcast, not shuffle the corpus")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_substring_trim_exact stays a hash aggregate over window " +
    "hashes — no doc-pair join, no cartesian") {
    val p = plan("q_substring_trim_exact")
    assert(p.contains("HashAggregate"),
      "the cross-doc cut decision must be an aggregate over hashes")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_nb_lang joins the hashed NB model via broadcast — the corpus " +
    "never shuffles on a vocabulary key") {
    val p = plan("q_nb_lang")
    assert(p.contains("BroadcastHashJoin"),
      "the bounded (bucket,class) weight table must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_hard_negatives ranks candidates from the bucket equi-join — " +
    "never a label-pair cartesian") {
    val p = plan("q_hard_negatives")
    assert(!p.contains("CartesianProduct"),
      "anchor×corpus must stay a bucket equi-join")
    assert(p.contains("WindowGroupLimit"),
      "the per-anchor top-k must prune map-side before the shuffle")
  }

  test("q_sql_redact rides the scan: no join, only the sort exchange") {
    // the r14 SQL-surface redaction row — every scalar (pii scrub,
    // repetition, entropy, simhash bands, script count) must fold
    // per row inside the scan stage; the only exchange is the output
    // orderBy's range partitioning
    val p = plan("q_sql_redact")
    assert(!p.contains("Join"), p.take(600))
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 1, s"expected only the sort exchange:\n${p.take(600)}")
    assert(!p.contains("UDF") && !p.contains("BatchEval"))
  }

  test("q_length_quantiles never plans a single-partition window") {
    // the whole point of routing through GlobalRank: exact quantiles
    // without `row_number() OVER (ORDER BY ...)`'s one-task sort, and
    // without a per-group window that serializes a dominant group
    val p = plan("q_length_quantiles")
    assert(!p.contains("SinglePartition"),
      "quantile ranking must stay range-partitioned")
  }

  test("q_quality_dup_decile ranks quality through GlobalRank — never a " +
    "single-partition window") {
    val p = plan("q_quality_dup_decile")
    // exactly ONE single-partition convergence is legitimate — the 1-row
    // global count scalar. The ranking itself is GlobalRank's
    // checkpointed offset arithmetic (no `row_number() OVER (ORDER BY
    // …)`), and the only window is the LSH bucket guard's, partitioned
    // by (band, bkey) — so a second SinglePartition exchange would mean
    // the rank or a window serialized the corpus through one task
    assert(p.sliding("Exchange SinglePartition".length)
      .count(_ == "Exchange SinglePartition") == 1,
      "only the count scalar may converge to a single partition")
  }

  test("no curation-layer operator plans a cartesian product over row data") {
    // 1-row scalar cross joins (BroadcastNestedLoopJoin over a single
    // aggregate row) are the repo's documented broadcast-scalar idiom;
    // CartesianProduct over two row-data relations is the anti-pattern.
    for (name <- Seq("q_dsir_weights", "q_alpha_mix", "q_expectations",
      "q_source_kl", "q_novelty_curve", "q_substring_trim",
      "q_substring_trim_exact", "q_bpe_bytes_encode", "q_xml_records_split",
      "q_weighted_sample", "q_minhash_containment", "q_vocab_coverage",
      "q_doc_entropy", "q_length_buckets", "q_nb_lang", "q_nb_confusion",
      "q_nb_margin", "q_nb_calibration", "q_hard_negatives",
      "q_cross_source_dups", "q_zipf_fit", "q_token_gini",
      "q_length_quantiles", "q_ann_recall", "q_dup_cluster_stats",
      "q_source_logodds", "q_split_leakage", "q_cell_outliers",
      "q_clustering_coeff", "q_corpus_diff", "q_lsh_autotune",
      "q_curation_funnel", "q_quality_dup_decile", "q_embed_drift",
      "q_lsh_tuned_sweep", "q_dedup_savings", "q_ivf_incremental",
      "q_media_dedup"))
      assert(!plan(name).contains("CartesianProduct"),
        s"$name must not plan a cartesian product")
  }

  test("q_source_logodds bounds the per-source top-k map-side and " +
    "broadcasts only the source totals") {
    val p = plan("q_source_logodds")
    assert(p.contains("WindowGroupLimit"),
      "rank<=k must prune before the window shuffle")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_ann_recall's exact side is a broadcast of the query sample, " +
    "not a row-data cartesian") {
    val p = plan("q_ann_recall")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the sampled query set must broadcast against the corpus scan")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_bm25_search broadcasts the query terms and bounds the per-query " +
    "top-k map-side") {
    val p = plan("q_bm25_search")
    assert(p.contains("BroadcastHashJoin"),
      "the metadata-sized query-term table must broadcast — the corpus " +
        "never reshuffles per query")
    assert(p.contains("WindowGroupLimit"),
      "rank<=k must prune before the per-query window shuffle")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_length_gate joins the sketch bounds via broadcast — the corpus " +
    "scan never reshuffles for the gate") {
    val p = plan("q_length_gate")
    assert(p.contains("BroadcastHashJoin"),
      "the |langs|-row [p05,p95] table must broadcast back to the scan")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_sample_quantiles bounds the hash sample map-side and never " +
    "plans a single-partition window") {
    // the quantile stage checkpoints through GlobalRank (lineage
    // truncates), so assert the two claims on the stages that carry them:
    // the SAMPLE stage must be WindowGroupLimit-bounded...
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sp = graft.agg.Sketches
      .hashSample(docs, "lang", "n_chars", "doc_id", k = 64)
      .queryExecution.executedPlan.toString
    assert(sp.contains("WindowGroupLimit"),
      "the bottom-k hash sample must prune before its shuffle")
    // ...and the assembled query must never converge to one task
    val p = plan("q_sample_quantiles")
    assert(!p.contains("SinglePartition"),
      "sample-quantile ranking must stay range-partitioned")
  }
}
