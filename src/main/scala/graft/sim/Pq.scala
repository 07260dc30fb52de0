package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding columns — the memory side of
  * ANN at corpus scale (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011; the arrangement FAISS calls IVFPQ/ADC).
  *
  * No reference analog; value-add for training-data pipelines (builder
  * brief). Scalar int8 quantization ([[Similarity.quantizeInt8]]) shrinks
  * an index 4×; PQ is the next two orders of magnitude: split each
  * dim-D vector into `m` contiguous subvectors, learn (or seed) a
  * per-subspace codebook of `ksub` centroids, and store each vector as
  * `m` small codes. A dim-64 float32 embedding (256 B) at m=16, ksub=256
  * becomes 16 bytes — 16×; at corpus dims (768–4096 floats) the ratio is
  * 100–1000×, which is what lets a 100 TB corpus's index live in cluster
  * memory at all.
  *
  * Query-time ranking is asymmetric distance computation (ADC): the query
  * stays full precision; `dot(q, x) ≈ Σ_mi dot(q_mi, codebook_mi[code_mi])`
  * where the m·ksub partial dot products are computed ONCE per query on
  * the driver (query and codebooks are both driver values — the same
  * legitimate metadata collect as the IVF centroid table) and ride the
  * plan as a lookup table. Scoring a vector is then m array lookups + a
  * sum — no per-row floating-point dot product at all, fully codegen'd.
  *
  * Determinism, engine-portable (same discipline as [[Similarity.kmeansFit]]):
  * encoding argmin rounds squared L2 at 9 decimals and tie-breaks on the
  * smaller code; ADC scores round at 6 before ranking. Squared L2 is
  * computed as `dot(a,a) − 2·dot(a,b) + dot(b,b)` so DuckDB replays the
  * identical arithmetic with `list_dot_product`.
  *
  * Two physical encode forms with identical semantics, dispatched on
  * `m · ksub` exactly like [[Similarity.buildIvfIndex]]'s literal/broadcast
  * split: literal codebooks fold as `least`-of-structs (codegen'd, ideal
  * at test scale), large codebooks ride as ONE broadcast row so plan and
  * codegen size are ksub-independent (real PQ is m=16, ksub=256 → 4096
  * centroids; a literal plan would be megabytes).
  */
object Pq {

  /** Squared L2 distance between two array columns, as the three-dot
    * identity both engines replay bit-for-bit. Operands are each used
    * twice — let-bound so CollapseProject cannot duplicate their subtrees
    * (see [[Similarity.topKCosineQuantized]]'s measured 4× pitfall).
    */
  def l2sq(a: Column, b: Column): Column =
    bindOnce(a, x => bindOnce(b, y =>
      Similarity.dot(x, x) - lit(2.0) * Similarity.dot(x, y) +
        Similarity.dot(y, y)))

  private def bindOnce(value: Column, body: Column => Column): Column =
    graft.ColumnUtil.bindOnce(value, body)

  /** Seed per-subspace codebooks from the `ksub` smallest-id vectors —
    * the deterministic analog of sampling training vectors (the same
    * seeding [[Similarity.kmeansFit]] uses, and what the oracle replays).
    * At corpus scale, refine these with per-subspace `kmeansFit` over
    * `slice`d embeddings; the encode/ADC contract only needs codebooks
    * with dense codes 0..ksub−1.
    *
    * @return books(mi) = Seq of (code, subvector), codes dense from 0.
    */
  def seedCodebooks(vectors: DataFrame, m: Int, ksub: Int,
                    id: String = "vec_id", emb: String = "embedding")
      : Seq[Seq[(Int, Seq[Double])]] = {
    val seeds = vectors.orderBy(col(id)).limit(ksub)
      .select(col(emb).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toVector)
    require(seeds.size == ksub,
      s"seedCodebooks: need ksub=$ksub seed vectors, table has ${seeds.size}")
    val dim = seeds.head.size
    require(dim % m == 0, s"seedCodebooks: dim $dim not divisible by m=$m")
    val w = dim / m
    (0 until m).map { mi =>
      seeds.zipWithIndex.map { case (v, code) =>
        code -> v.slice(mi * w, (mi + 1) * w).toVector
      }.toSeq
    }
  }

  /** Above this many total centroids (m · ksub) the encode switches from
    * plan-literal codebooks to the one-row broadcast fold — the same
    * plan-size discipline, and threshold rationale, as
    * [[Similarity.MaxLiteralCentroids]].
    */
  val MaxLiteralCodewords: Int = 64

  /** Encode vectors to PQ codes: (id, codes array<int> of length m).
    * Pure map — the encode rides the scan, no shuffle, no UDF; each row
    * costs m·ksub subvector distances (or m lookups of fold state in the
    * broadcast form) and the output is the column a 100 TB index stores
    * INSTEAD of the embeddings.
    */
  def encode(vectors: DataFrame, books: Seq[Seq[(Int, Seq[Double])]],
             id: String = "vec_id", emb: String = "embedding",
             maxLiteralCodewords: Int = MaxLiteralCodewords,
             keep: Seq[String] = Nil): DataFrame = {
    require(books.nonEmpty && books.forall(_.nonEmpty), "encode: empty codebooks")
    val m = books.size
    val w = books.head.head._2.size
    books.foreach { b =>
      require(b.map(_._1).sorted == (0 until b.size), "encode: codes must be dense 0..ksub-1")
      require(b.forall(_._2.size == w), "encode: ragged codebook widths")
    }
    val e = col(emb).cast("array<double>")
    if (books.map(_.size).sum <= maxLiteralCodewords) {
      // literal form: per subspace, least-of-(dist, code) structs over the
      // codebook — `least` picks the lexicographically smallest struct, so
      // equal distances break to the smaller code, matching the broadcast
      // fold and the oracle's (dist, code) ordering
      val codeCols = books.zipWithIndex.map { case (book, mi) =>
        // Spark's least() needs >=2 args; a one-entry codebook encodes to
        // its only (dense) code, which is constantly 0
        if (book.size == 1) lit(book.head._1)
        else bindOnce(slice(e, mi * w + 1, w), xsub =>
          least(book.map { case (code, cvec) =>
            struct(round(l2sq(xsub, array(cvec.map(lit): _*)), 9).as("d"),
              lit(code).as("code"))
          }: _*).getField("code"))
      }
      vectors.select(col(id) +: keep.map(col) :+ array(codeCols: _*).as("codes"): _*)
    } else {
      val spark = vectors.sparkSession
      import spark.implicits._
      // ONE broadcast row: books as array<array<struct<_1:code,_2:subvec>>>;
      // plan and codegen size independent of m·ksub. Input narrowed to
      // (id, emb) before the crossJoin so a user column can't collide
      // with the reserved __pq_books name.
      val bookRow = broadcast(Seq(books).toDF("__pq_books"))
      val codes = transform(sequence(lit(0), lit(m - 1)), mi =>
        bindOnce(slice(e, mi * lit(w) + 1, lit(w)), xsub =>
          aggregate(element_at(col("__pq_books"), mi + 1),
            struct(lit(Double.MaxValue).as("d"), lit(Int.MaxValue).as("code")),
            (acc, c) => {
              val cand = struct(round(l2sq(xsub, c.getField("_2")), 9).as("d"),
                c.getField("_1").as("code"))
              when(cand < acc, cand).otherwise(acc)
            }).getField("code")))
      vectors.select(col(id) +: keep.map(col) :+ col(emb): _*).crossJoin(bookRow)
        .select(col(id) +: keep.map(col) :+ codes.as("codes"): _*)
    }
  }

  /** Reconstruct approximate vectors from codes — concatenated codebook
    * entries. The reconstruction-error spec's primitive; also the decode
    * path a reranking stage would use before exact rescoring.
    */
  def reconstruct(codes: DataFrame, books: Seq[Seq[(Int, Seq[Double])]],
                  id: String = "vec_id", keep: Seq[String] = Nil): DataFrame = {
    val parts = books.zipWithIndex.map { case (book, mi) =>
      val entries = book.sortBy(_._1).map { case (_, cvec) => array(cvec.map(lit): _*) }
      element_at(array(entries: _*), col("codes").getItem(mi) + 1)
    }
    codes.select(col(id) +: keep.map(col) :+ concat(parts: _*).as("approx"): _*)
  }

  /** ADC top-k: rank all encoded vectors against one full-precision query
    * by the table-lookup inner product. The m·ksub lookup table is driver
    * arithmetic (k·dim-style metadata, like the IVF centroid collect);
    * per row the plan does m `element_at`s and a sum —
    * TakeOrderedAndProject keeps per-partition heaps, no global sort.
    * Table larger than [[MaxLiteralCodewords]] entries rides as one
    * broadcast row instead of plan literals (same dispatch as [[encode]]).
    */
  def topKAdc(codes: DataFrame, books: Seq[Seq[(Int, Seq[Double])]],
              query: Seq[Double], k: Int, id: String = "vec_id",
              maxLiteralCodewords: Int = MaxLiteralCodewords): DataFrame = {
    require(books.nonEmpty && books.forall(_.nonEmpty), "topKAdc: empty codebooks")
    val m = books.size
    val w = books.head.head._2.size
    require(query.size == m * w, s"topKAdc: query dim ${query.size} != m·w ${m * w}")
    // table(mi)(code) = dot(q_mi, codebook_mi[code]) — computed once here
    val table: Seq[Seq[Double]] = books.zipWithIndex.map { case (book, mi) =>
      val qsub = query.slice(mi * w, (mi + 1) * w)
      book.sortBy(_._1).map { case (_, cvec) =>
        cvec.zip(qsub).map { case (a, b) => a * b }.sum
      }
    }
    val score =
      if (books.map(_.size).sum <= maxLiteralCodewords) {
        (0 until m).map { mi =>
          element_at(array(table(mi).map(lit): _*), col("codes").getItem(mi) + 1)
        }.reduce(_ + _)
      } else {
        val spark = codes.sparkSession
        import spark.implicits._
        // one broadcast row holding the table; note this branch returns a
        // Column over the JOINED frame below. Input narrowed to
        // (id, codes) so a user column can't collide with __pq_tab.
        val tabRow = broadcast(Seq(table).toDF("__pq_tab"))
        return codes.select(col(id), col("codes")).crossJoin(tabRow)
          .select(col(id), round(
            aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, mi) =>
              acc + element_at(element_at(col("__pq_tab"), mi + 1),
                col("codes").getItem(mi) + 1)), 6).as("adc_dot"))
          .orderBy(col("adc_dot").desc, col(id)).limit(k)
      }
    codes.select(col(id), round(score, 6).as("adc_dot"))
      .orderBy(col("adc_dot").desc, col(id)).limit(k)
  }

  /** IVF × PQ composed — the arrangement FAISS calls IVFPQ with ADC: probe
    * the query's `nprobe` nearest cells (driver arithmetic over the k·dim
    * centroid metadata, as [[Similarity.ivfTopK]]), then ADC-rank ONLY the
    * probed cells' members. At deployment the stored index is
    * (cell, id, codes) written `partitionBy(cell)` — a query reads nprobe
    * partitions of 16-byte codes instead of scanning the corpus, which is
    * the two-sided win: IVF bounds rows touched, PQ bounds bytes per row.
    * Here the encode runs inline on the probed candidates (same plan shape
    * the stored form would load), so the whole path stays oracle-checkable
    * end-to-end.
    */
  def ivfAdcTopK(index: DataFrame, centroids: Seq[(Int, Seq[Double])],
                 books: Seq[Seq[(Int, Seq[Double])]], query: Seq[Double],
                 k: Int, nprobe: Int = 1, id: String = "vec_id",
                 emb: String = "embedding",
                 maxLiteralCodewords: Int = MaxLiteralCodewords): DataFrame = {
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      // zero-norm guard matches Similarity.cosine (CosineSimilarity
      // returns 0.0, not NaN) so the single and batched probe paths rank
      // degenerate vectors identically — PqSpec asserts batch==single.
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0.0 || nb == 0.0) 0.0
      else a.zip(b).map { case (x, y) => x * y }.sum / (na * nb)
    }
    val cells = centroids.map { case (cid, cvec) => (cos(query, cvec), cid) }
      .sortBy { case (s, cid) => (-s, cid) }.take(nprobe).map(_._2)
    val cand = index.where(col("cell").isin(cells: _*))
    topKAdc(encode(cand, books, id, emb, maxLiteralCodewords),
      books, query, k, id, maxLiteralCodewords)
  }

  /** Batched IVFPQ: queries as a TABLE — the no-driver-collect form that
    * scales to millions of queries (the `ivfTopKBatch` discipline applied
    * to the PQ index). Each query ranks the broadcast centroid array for
    * its `nprobe` cells, candidates arrive by the ONE cell equi-join
    * against the (cell, id, codes) index, and ADC scores read the
    * broadcast codebooks directly: Σ_mi dot(q_mi, books[mi][code_mi]) —
    * the per-query lookup table of the driver-known form becomes a
    * per-pair m·(dim/m) fold, still no shuffle beyond the cell join, and
    * the per-query top-k is a WindowGroupLimit, never a global sort.
    * FP discipline matches the oracle: inner dot is a left fold per
    * subspace, outer sum left-folds in mi order, rounded at 6.
    */
  def ivfAdcTopKBatch(index: DataFrame, centroids: Seq[(Int, Seq[Double])],
                      books: Seq[Seq[(Int, Seq[Double])]], queries: DataFrame,
                      k: Int, nprobe: Int = 1, qid: String = "query_id",
                      id: String = "vec_id", emb: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty, "ivfAdcTopKBatch: empty centroid set")
    val spark = index.sparkSession
    import spark.implicits._
    val m = books.size
    val w = books.head.head._2.size
    val codes = encode(index, books, id, emb, keep = Seq("cell"))
    val centRow = broadcast(Seq(centroids).toDF("__pq_cents"))
    val scoredC = transform(col("__pq_cents"), c =>
      struct((-Similarity.cosine(col("_q"), c.getField("_2"))).as("negsim"),
        c.getField("_1").as("cid")))
    val probes = queries
      .select(col(qid), col(emb).cast("array<double>").as("_q"))
      .crossJoin(centRow)
      .select(col(qid), col("_q"),
        explode(slice(array_sort(scoredC), 1, nprobe).getField("cid")).as("cell"))
    // codebooks as mi → code → subvector (codes are dense, sorted here)
    val vecs: Seq[Seq[Seq[Double]]] = books.map(_.sortBy(_._1).map(_._2))
    val bookRow = broadcast(Seq(vecs).toDF("__pq_books"))
    val pairDot = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, mi) => {
      val cvec = element_at(element_at(col("__pq_books"), mi + 1),
        element_at(col("codes"), mi + 1) + 1)
      val qsub = slice(col("_q"), mi * lit(w) + lit(1), lit(w))
      acc + aggregate(zip_with(qsub, cvec, (a, b) => a * b),
        lit(0.0), (s, x) => s + x)
    })
    val cand = probes.join(codes, "cell").crossJoin(bookRow)
      .select(col(qid), col(id), round(pairDot, 6).as("adc_dot"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qid)).orderBy(col("adc_dot").desc, col(id))
    cand.withColumn("_rn", row_number().over(win)).where(col("_rn") <= k)
      .select(col(qid), col(id), col("adc_dot"))
  }
}
