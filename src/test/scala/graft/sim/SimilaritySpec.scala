package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("dot/norm/cosine agree with hand math") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 2.0), Seq(2.0, 0.0, 0.0))).toDF("a", "b")
    val r = df.select(
      Similarity.dot(col("a"), col("b")),
      Similarity.norm(col("a")),
      Similarity.cosine(col("a"), col("b"))).head()
    assert(r.getDouble(0) == 2.0)
    assert(r.getDouble(1) == 3.0)
    assert(math.abs(r.getDouble(2) - 2.0 / (3.0 * 2.0)) < 1e-12)
  }

  test("topKCosine: self is rank 1, k respected, scores descending") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val q = emb.where(col("vec_id") === 7).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val top = Similarity.topKCosine(emb, q, 10).collect()
    assert(top.length == 10)
    assert(top.head.getLong(0) == 7L)
    val sims = top.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("ANN probe returns subset of brute-force ordering, includes self") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val q = emb.where(col("vec_id") === 3).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val index = Similarity.buildLshIndex(emb, dim = 64, nBits = 4)
    val ann = Similarity.annTopK(index, q, 10, dim = 64, nBits = 4).collect()
    assert(ann.nonEmpty)
    assert(ann.head.getLong(0) == 3L)
    // every ANN result's score matches brute force for the same id
    val bf = Similarity.topKCosine(emb, q, 500).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ann.foreach(r => assert(math.abs(bf(r.getLong(0)) - r.getDouble(1)) < 1e-9))
  }

  test("batched ANN agrees with single-query ANN for every query in the batch") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val index = Similarity.buildLshIndex(emb, dim = 64, nBits = 4)
    val queries = emb.where(col("vec_id") % 200 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val batch = Similarity.annTopKBatch(index, queries, k = 5, dim = 64, nBits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.map(x => (x._2, x._3)).sortBy(p => (-p._2, p._1)).toSeq).toMap
    assert(batch.nonEmpty)
    val qvecs = queries.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    qvecs.foreach { case (qid, qvec) =>
      val single = Similarity.annTopK(index, qvec, 5, dim = 64, nBits = 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(qid) == single, s"batch vs single mismatch for query $qid")
      assert(batch(qid).head._1 == qid, s"query $qid must find itself first")
    }
  }

  test("batched IVF agrees with single-query ivfTopK for every query in the batch") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val centroids = emb.where(col("vec_id") < 8)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).map(_.toDouble).toSeq)).toSeq
    val index = Similarity.buildIvfIndex(emb, centroids)
    val queries = emb.where(col("vec_id") % 200 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val batch = Similarity.ivfTopKBatch(index, centroids, queries, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.map(x => (x._2, x._3)).sortBy(p => (-p._2, p._1)).toSeq).toMap
    assert(batch.nonEmpty)
    queries.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
      .foreach { case (qid, qvec) =>
        val single = Similarity.ivfTopK(index, centroids, qvec, 5, nprobe = 2)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        assert(batch(qid) == single, s"batch vs single mismatch for query $qid")
      }
  }

  test("IVF index assigns every vector to one cell; probe finds self") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val centroids = emb.where(col("vec_id") < 8)
      .collect().map(r => (r.getLong(0).toInt,
        r.getSeq[Float](1).map(_.toDouble).toSeq)).toSeq
    val index = Similarity.buildIvfIndex(emb, centroids)
    assert(index.count() == emb.count())
    assert(index.select("cell").distinct().count() <= 8)
    val q = emb.where(col("vec_id") === 42).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val got = Similarity.ivfTopK(index, centroids, q, 5, nprobe = 1).collect()
    assert(got.head.getLong(0) == 42L) // own cell contains self
  }

  test("large-k IVF (k=256, dim=64) plans the broadcast fold and matches the literal path") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val centroids = emb.where(col("vec_id") < 256)
      .collect().map(r => (r.getLong(0).toInt,
        r.getSeq[Float](1).map(_.toDouble).toSeq)).toSeq
    assert(centroids.size == 256)
    // default dispatch: k=256 > MaxLiteralCentroids → broadcast path
    val bcast = Similarity.buildIvfIndex(emb, centroids)
    val plan = bcast.queryExecution.executedPlan.toString
    assert(!plan.contains("greatest"),
      s"broadcast path must not plan a 256-way greatest:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"centroids should attach via a 1-row broadcast join:\n${plan.take(2000)}")
    // forced literal path: same assignments, cell for cell
    val literal = Similarity.buildIvfIndex(emb, centroids,
      maxLiteralCentroids = Int.MaxValue)
    assert(literal.queryExecution.executedPlan.toString.contains("greatest"))
    val a = bcast.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = literal.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b, "broadcast and literal assignments diverge")
    // every centroid vector is its own nearest centroid
    (0 until 256).foreach(i => assert(a(i.toLong) == i, s"vector $i not in own cell"))
  }

  test("kmeansFit: deterministic across partitionings, improves the objective") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val (a1, c1) = Similarity.kmeansFit(emb, k = 4, iters = 2)
    val (a2, c2) = Similarity.kmeansFit(emb.repartition(7), k = 4, iters = 2)
    // identical trajectory on any layout (rounded means kill FP-order noise)
    assert(c1 == c2)
    assert(a1.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      == a2.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap)
    assert(a1.select("cell").distinct().count() > 1, "all points in one cell")
    // Lloyd must not worsen the mean assigned-cosine vs the seed centroids
    def objective(cents: Seq[(Int, Seq[Double])]): Double =
      Similarity.buildIvfIndex(emb, cents)
        .select(greatest(cents.map { case (_, c) =>
          Similarity.cosine(col("embedding").cast("array<double>"),
            array(c.map(lit): _*))
        }: _*).as("best"))
        .agg(avg("best")).head().getDouble(0)
    val seeds = emb.orderBy("vec_id").limit(4).collect().zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Float](1).map(_.toDouble).toVector }.toSeq
    assert(objective(c1) >= objective(seeds) - 1e-9,
      "training worsened the clustering objective")
  }

  test("kmeans-trained IVF: probe finds self, recall not worse than seeded centroids") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val seeded = emb.where(col("vec_id") < 8)
      .collect().map(r => (r.getLong(0).toInt,
        r.getSeq[Float](1).map(_.toDouble).toSeq)).toSeq
    val (_, trained) = Similarity.kmeansFit(emb, k = 8, iters = 3)
    val queryIds = Seq(7L, 101L, 211L, 307L, 401L)
    def recall(cents: Seq[(Int, Seq[Double])]): Double = {
      val idx = Similarity.buildIvfIndex(emb, cents)
      queryIds.map { qid =>
        val q = emb.where(col("vec_id") === qid).select("embedding")
          .head().getSeq[Float](0).map(_.toDouble)
        val brute = Similarity.topKCosine(emb, q, 10)
          .collect().map(_.getLong(0)).toSet
        val got = Similarity.ivfTopK(idx, cents, q, 10, nprobe = 2)
          .collect().map(_.getLong(0)).toSet
        assert(got.contains(qid), s"probe lost the query vector $qid itself")
        (brute intersect got).size.toDouble / brute.size
      }.sum / queryIds.size
    }
    val (rs, rt) = (recall(seeded), recall(trained))
    // Lloyd-trained cells track the data distribution; arbitrary seed
    // vectors as "centroids" should never probe meaningfully better
    assert(rt >= rs - 0.05, s"trained recall $rt worse than seeded $rs")
    assert(rt >= 0.5, s"trained recall@10 (nprobe=2 of 8 cells) too low: $rt")
  }

  test("embedding near-dup detection finds planted duplicates") {
    import spark.implicits._
    val base = (0 until 32).map(i => math.sin(i * 1.7).toFloat)
    val nearDup = base.updated(0, base(0) + 0.001f)
    val rnd = new scala.util.Random(7)
    val others = (2 until 40).map(i =>
      (i.toLong, Seq.fill(32)((rnd.nextDouble() * 2 - 1).toFloat)))
    val df = (Seq((0L, base), (1L, nearDup)) ++ others).toDF("vec_id", "embedding")
    val pairs = graft.dedup.Dedup.embeddingNearDups(df, dim = 32,
      threshold = 0.99, nBits = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("partitioned LSH index probe scans only the query's bucket partition") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val index = Similarity.buildLshIndex(emb, dim = 64, nBits = 4)
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString + "/idx"
    index.write.partitionBy("bucket").mode("overwrite").parquet(dir)
    val someBucket = index.select("bucket").head().getString(0)
    val probe = spark.read.parquet(dir).where(col("bucket") === someBucket)
    val scan = probe.queryExecution.executedPlan.toString
    assert(scan.contains(s"bucket=$someBucket") ||
      scan.contains("PartitionFilters: [isnotnull(bucket"),
      s"expected partition pruning in:\n$scan")
    // and the probe returns exactly that bucket's vectors
    val expected = index.where(col("bucket") === someBucket).count()
    assert(probe.count() == expected && expected > 0)
  }

  test("lshBucket is deterministic across evaluations") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val b1 = Similarity.buildLshIndex(emb, 64, 8).select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b2 = Similarity.buildLshIndex(emb, 64, 8).select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(b1 == b2)
  }

  test("int8 quantization: reconstruction within half a step, constants exact") {
    import spark.implicits._
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
      .union(Seq((999999L, Array.fill(64)(0.25f), 0)).toDF("vec_id", "embedding", "label"))
    val err = emb.select(
        col("embedding"),
        Similarity.dequantizeInt8(Similarity.quantizeInt8(col("embedding"))).as("d"))
      .select(greatest(  // max per-component |x - dequant(x)| vs half-step bound
        expr("""aggregate(zip_with(embedding, d, (x, y) -> abs(cast(x AS DOUBLE) - y)),
                CAST(0.0 AS DOUBLE), (a, v) -> greatest(a, v))"""),
        lit(0.0)).as("maxerr"),
        ((expr("array_max(transform(embedding, x -> cast(x AS DOUBLE)))")
          - expr("array_min(transform(embedding, x -> cast(x AS DOUBLE)))"))
          / 510.0 + 1e-12).as("bound"))
    assert(err.where(col("maxerr") > col("bound")).count() == 0)
    // constant vector: codes 0, dequantizes exactly
    val const = Seq((1L, Array.fill(8)(0.5f))).toDF("vec_id", "embedding")
    val d = const.select(Similarity.dequantizeInt8(
      Similarity.quantizeInt8(col("embedding"))).as("d")).head().getSeq[Double](0)
    assert(d.forall(_ == 0.5))
  }

  test("quantized top-k keeps high recall vs exact top-k") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val qvec = emb.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val exact = Similarity.topKCosine(emb, qvec, 20)
      .collect().map(_.getLong(0)).toSet
    val quant = Similarity.topKCosineQuantized(emb, qvec, 20)
      .collect().map(_.getLong(0)).toSet
    assert((exact & quant).size >= 18, s"recall ${(exact & quant).size}/20")
    assert(quant.contains(0L)) // self survives quantization at rank ~1
  }

  test("hardNegatives: cross-label only, k bound, scores match brute force") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val anchors = emb.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("label"), col("embedding"))
    val negs = Similarity.hardNegatives(emb, anchors, k = 5, dim = 64, nBits = 4)
      .collect()
    assert(negs.nonEmpty)
    val anchorRows = anchors.collect()
    val anchorLabel = anchorRows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    val anchorVec = anchorRows
      .map(r => r.getLong(0) -> r.getSeq[Float](2).map(_.toDouble)).toMap
    negs.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      assert(rows.length <= 5)
      // the defining constraint: no negative shares the anchor's label —
      // which also means the anchor itself can never be its own result
      rows.foreach(r => assert(r.getInt(2) != anchorLabel(qid)))
      val sims = rows.map(_.getDouble(3)).toSeq
      assert(sims == sims.sorted.reverse)
      // scores are true cosines: each matches brute force for that id
      val bf = Similarity.topKCosine(emb, anchorVec(qid), 500).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      rows.foreach(r =>
        assert(math.abs(bf(r.getLong(1)) - r.getDouble(3)) < 1e-9))
    }
  }

  test("annRecall: self always hits (top1_hit 1), recall bounded, " +
    "exact side agrees with topKCosine") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val queries = emb.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val rec = Similarity.annRecall(emb, queries, k = 10, dim = 64, nBits = 4)
      .collect()
    assert(rec.length == queries.count())
    rec.foreach { r =>
      // the query vector is in its own probe bucket, so the true top-1
      // (itself, cosine 1.0) is always retrieved
      assert(r.getDouble(3) == 1.0, s"query ${r.getLong(0)} missed itself")
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 10)
      assert(r.getDouble(2) == r.getLong(1) / 10.0)
    }
    // ground truth side is the brute-force ordering
    val q0 = queries.orderBy("query_id").head()
    val qvec = q0.getSeq[Float](1).map(_.toDouble)
    val exact = Similarity.exactTopKBatch(emb,
        queries.where(col("query_id") === q0.getLong(0)), k = 10)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    val brute = Similarity.topKCosine(emb, qvec, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(exact == brute)
  }

  test("annNdcg: full-recall queries score exactly 1, misses score " +
    "strictly below, MRR is 1 when the index holds the self-match") {
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val queries = emb.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val rec = Similarity.annRecall(emb, queries, k = 10, dim = 64, nBits = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val nd = Similarity.annNdcg(emb, queries, k = 10, dim = 64, nBits = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(nd.length == rec.size)
    nd.foreach { case (q, ndcg, mrr) =>
      assert(ndcg >= 0.0 && ndcg <= 1.0)
      // ANN and exact share one total order (round-6 cosine, id
      // tie-break), so retrieving the full true set implies the full
      // true ORDER: recall 1 ⟺ nDCG 1; any miss costs strictly
      if (rec(q) == 1.0) assert(ndcg == 1.0, s"query $q: full recall but ndcg $ndcg")
      else assert(ndcg < 1.0, s"query $q: recall ${rec(q)} but ndcg $ndcg")
      // the query's own vector is in its probe bucket at cosine 1.0 →
      // the true top-1 sits at approx rank 1 → reciprocal rank 1
      assert(mrr == 1.0, s"query $q: mrr $mrr")
    }
  }

  test("ndcg discount/ideal literals: monotone discounts, hand-computed ideal") {
    val d = Similarity.ndcgDiscounts(3)
    assert(d == Seq(1000000000L,
      math.round(1e9 / (math.log(3.0) / math.log(2.0))),
      math.round(1e9 / 2.0)))
    assert(d.sliding(2).forall { case Seq(a, b) => a > b })
    // ideal at k=3: 3*d1 + 2*d2 + 1*d3
    assert(Similarity.ndcgIdeal(3) == 3 * d(0) + 2 * d(1) + d(2))
  }

  test("cellOutliers: on-centroid vectors pass, off-manifold ones flag") {
    import spark.implicits._
    val c0 = Seq(1.0, 0.0, 0.0, 0.0)
    val c1 = Seq(0.0, 1.0, 0.0, 0.0)
    val df = Seq(
      (10L, Seq(2.0, 0.1, 0.0, 0.0)),  // near c0 → high cosine, kept
      (11L, Seq(0.1, 3.0, 0.0, 0.0)),  // near c1 → high cosine, kept
      (12L, Seq(0.0, 0.0, 5.0, 0.0))   // orthogonal to both → outlier
    ).toDF("vec_id", "embedding")
    val got = Similarity.cellOutliers(df, Seq(0 -> c0, 1 -> c1), threshold = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(got(10L) == ((0L, false)))
    assert(got(11L) == ((1L, false)))
    assert(got(12L)._2, "orthogonal vector must be flagged")
    // ties in the assignment argmax break to the smaller cid (vector 12
    // has cosine 0 to both centroids)
    assert(got(12L)._1 == 0L)
  }

  test("rrfFuse matches the hand-computed two-list formula") {
    import spark.implicits._
    val lex = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val vec = Seq((2L, 1), (3L, 2)).toDF("id", "rank")
    val got = Similarity.rrfFuse(Seq(lex, vec))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == (r9(1.0 / 61), 1L))
    assert(got(2L) == (r9(1.0 / 62 + 1.0 / 61), 2L))
    assert(got(3L) == (r9(1.0 / 62), 1L))
    // the doc on both lists outranks single-list docs at adjacent ranks
    assert(got(2L)._1 > got(1L)._1 && got(1L)._1 > got(3L)._1)
  }

  test("centroidDrift: hand-computed centroid cosine per group; identical " +
    "snapshots read 1.0") {
    import spark.implicits._
    // group 0: v1 centroid (0.5, 0.5) from (1,0)+(0,1), v2 centroid (1,0)
    // → cos = 0.5 / (sqrt(0.5)·1) = 0.70710678… → 0.707107 at 6 digits.
    // group 1: same centroid both sides → exactly 1.0
    val v1 = Seq((0, Seq(1.0, 0.0)), (0, Seq(0.0, 1.0)), (1, Seq(0.25, 0.75)))
      .toDF("label", "e")
    val v2 = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.5, 0.5)), (1, Seq(0.0, 1.0)))
      .toDF("label", "e")
    val got = Similarity.centroidDrift(v1, v2)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got(0) == 0.707107)
    val self = Similarity.centroidDrift(v1, v1)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(self == Map(0 -> 1.0, 1 -> 1.0))
  }

  test("centroidDrift is partitioning-independent (quantized sums)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vs = (0 until 300).map(i =>
      (i % 4, Seq.fill(8)(rnd.nextDouble() * 2 - 1)))
    val v1 = vs.take(200).toDF("label", "e")
    val v2 = vs.drop(100).toDF("label", "e")
    val a = Similarity.centroidDrift(v1.repartition(1), v2.repartition(1))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val b = Similarity.centroidDrift(v1.repartition(13), v2.repartition(7))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(a == b && a.size == 4)
  }
}
