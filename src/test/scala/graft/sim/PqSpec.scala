package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {

  private def emb = graft.Tables.load(spark, sfDir, "embeddings")

  test("l2sq matches hand math") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 2.0), Seq(2.0, 0.0, 0.0))).toDF("a", "b")
    // |a|^2 = 9, |b|^2 = 4, a·b = 2 → l2sq = 9 - 4 + 4 = 9
    assert(df.select(Pq.l2sq(col("a"), col("b"))).head().getDouble(0) == 9.0)
  }

  test("seedCodebooks: m subspaces, dense codes, width dim/m") {
    val books = Pq.seedCodebooks(emb, m = 4, ksub = 8)
    assert(books.size == 4)
    books.foreach { b =>
      assert(b.map(_._1) == (0 until 8))
      assert(b.forall(_._2.size == 16))
    }
  }

  test("encode: codes in range, codebook vectors encode to themselves") {
    val books = Pq.seedCodebooks(emb, m = 4, ksub = 8)
    val codes = Pq.encode(emb, books).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.size == emb.count())
    codes.values.foreach { cs =>
      assert(cs.size == 4)
      assert(cs.forall(c => c >= 0 && c < 8))
    }
    // a vector whose subvectors ARE codebook entries must encode exactly
    (0 until 8).foreach { v => assert(codes(v.toLong) == Seq(v, v, v, v)) }
  }

  test("encode: literal and broadcast forms agree code-for-code") {
    val books = Pq.seedCodebooks(emb, m = 4, ksub = 8)
    val lit = Pq.encode(emb, books, maxLiteralCodewords = 1000).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val bc = Pq.encode(emb, books, maxLiteralCodewords = 1).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(lit == bc)
  }

  test("encode is partitioning-independent") {
    val books = Pq.seedCodebooks(emb, m = 4, ksub = 8)
    val a = Pq.encode(emb, books).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = Pq.encode(emb.repartition(7), books).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a == b)
  }

  test("reconstruct: codebook vectors round-trip exactly; error bounded for the rest") {
    val books = Pq.seedCodebooks(emb, m = 4, ksub = 8)
    val codes = Pq.encode(emb, books)
    val approx = Pq.reconstruct(codes, books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val exact = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    (0 until 8).foreach { v =>
      assert(approx(v.toLong) == exact(v.toLong), s"codebook vector $v must round-trip")
    }
    // reconstruction error never exceeds the distance to the best codeword
    // by construction; sanity: mean per-component error is finite and small
    // relative to the data range (unit-ish embeddings)
    val errs = exact.keys.map { k =>
      approx(k).zip(exact(k)).map { case (x, y) => (x - y) * (x - y) }.sum
    }
    assert(errs.forall(e => !e.isNaN && e < 1e6))
  }

  test("topKAdc: query's own vector ranks first; literal and broadcast tables agree") {
    val books = Pq.seedCodebooks(emb, m = 4, ksub = 8)
    val codes = Pq.encode(emb, books)
    // query = codebook vector 3: its ADC score is its exact self-dot, the
    // best possible reconstruction, so it must rank at the top
    val q = emb.where(col("vec_id") === 3).select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)
    val topLit = Pq.topKAdc(codes, books, q, k = 10, maxLiteralCodewords = 1000)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val topBc = Pq.topKAdc(codes, books, q, k = 10, maxLiteralCodewords = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(topLit == topBc)
    assert(topLit.head._1 == 3L)
    val scores = topLit.map(_._2)
    assert(scores == scores.sorted.reverse)
  }

  test("ADC score equals exact dot for vectors that encode losslessly") {
    val books = Pq.seedCodebooks(emb, m = 4, ksub = 8)
    val codes = Pq.encode(emb, books)
    val q = emb.where(col("vec_id") === 0).select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)
    val adc = Pq.topKAdc(codes, books, q, k = 500).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exact = emb.select(col("vec_id"),
      round(Similarity.dot(col("embedding").cast("array<double>"),
        array(q.map(lit): _*)), 6).as("d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // codebook vectors reconstruct exactly → their ADC dot is the true dot
    assert(adc.contains(0L))
    (0 until 8).foreach { v =>
      assert(adc.contains(v.toLong), s"k=500 covers the whole sf0.001 table")
      assert(math.abs(adc(v.toLong) - exact(v.toLong)) < 1e-6)
    }
  }

  test("ivfAdcTopK: probe-all equals plain ADC; probed results come from probed cells") {
    val books = Pq.seedCodebooks(emb, m = 4, ksub = 8)
    val centroids = emb.where(col("vec_id") < 4)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).map(_.toDouble).toSeq)).toSeq
    val q = emb.where(col("vec_id") === 0).select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)
    val index = Similarity.buildIvfIndex(emb, centroids)
    // nprobe = all cells → identical to ADC over the whole table
    val all = Pq.ivfAdcTopK(index, centroids, books, q, k = 20,
      nprobe = centroids.size).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val plain = Pq.topKAdc(Pq.encode(emb, books), books, q, k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(all == plain)
    // nprobe = 1 → every result's assigned cell is the probed one
    val probed = Pq.ivfAdcTopK(index, centroids, books, q, k = 20, nprobe = 1)
      .collect().map(_.getLong(0)).toSet
    val cellOf = index.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(probed.map(cellOf).size == 1, "nprobe=1 results must share one cell")
  }

  test("ivfAdcTopKBatch equals the single-query form for every query") {
    val books = Pq.seedCodebooks(emb, m = 4, ksub = 8)
    val centroids = emb.where(col("vec_id") < 4)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).map(_.toDouble).toSeq)).toSeq
    val index = Similarity.buildIvfIndex(emb, centroids)
    val queries = emb.where(col("vec_id") % 200 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val batch = Pq.ivfAdcTopKBatch(index, centroids, books, queries,
      k = 5, nprobe = 2).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(r => (r.getLong(1), r.getDouble(2))).toSeq }
    queries.select("query_id").collect().map(_.getLong(0)).foreach { q =>
      val qv = emb.where(col("vec_id") === q)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
      val single = Pq.ivfAdcTopK(index, centroids, books, qv, k = 5, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(q) == single, s"query $q: batch != single")
    }
  }
}
