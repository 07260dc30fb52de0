package graft.text

import graft.SparkSpec

class ClassifierSpec extends SparkSpec {

  test("nbPredict recovers disjoint-vocabulary classes exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x y", "a"), (2L, "x y y", "a"), (3L, "x x x", "a"),
      (4L, "p q q", "b"), (5L, "p p q", "b"),
    ).toDF("doc_id", "text", "lang")
    val out = Classifier.nbPredict(docs).orderBy("doc_id").collect()
    assert(out.length == 5)
    assert(out.forall(r => r.getAs[String]("pred") == r.getAs[String]("lang")))
  }

  test("nbPredict exact score ties break on class name ascending") {
    import spark.implicits._
    // Two classes with IDENTICAL content and doc counts → identical
    // priors, totals and bucket weights → every per-class score ties
    // exactly, so the argmax must fall to the alphabetically-first label.
    val docs = Seq(
      (1L, "x x", "b"), (2L, "x x", "a"),
    ).toDF("doc_id", "text", "lang")
    val out = Classifier.nbPredict(docs).orderBy("doc_id").collect()
    assert(out.forall(_.getAs[String]("pred") == "a"))
  }

  test("nbMargin: separable classes give positive confident margins; " +
    "exact ties give margin 0 and confident=false") {
    import spark.implicits._
    val sep = Seq(
      (1L, "x x x x", "a"), (2L, "x x x x", "a"),
      (3L, "q q q q", "b"), (4L, "q q q q", "b"),
    ).toDF("doc_id", "text", "lang")
    val m = Classifier.nbMargin(sep).orderBy("doc_id").collect()
    assert(m.forall(r => r.getAs[Double]("margin") > 0))
    assert(m.forall(_.getAs[Boolean]("confident")))
    val tied = Seq((1L, "x x", "b"), (2L, "x x", "a"))
      .toDF("doc_id", "text", "lang")
    val tm = Classifier.nbMargin(tied).orderBy("doc_id").collect()
    assert(tm.forall(_.getAs[Double]("margin") == 0.0))
    assert(tm.forall(!_.getAs[Boolean]("confident")))
  }

  test("nbCalibration bins partition the prediction stream; accuracy in [0,1]") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val cal = Classifier.nbCalibration(docs).collect()
    val total = cal.map(_.getAs[Long]("n_docs")).sum
    assert(total == Classifier.nbPredict(docs).count())
    assert(cal.forall { r =>
      val a = r.getAs[Double]("accuracy"); a >= 0.0 && a <= 1.0
    })
    assert(cal.forall(_.getAs[Long]("margin_bin") <= 20L))
  }

  test("nbPredict on the documents table: one row per doc, beats the " +
    "majority-class baseline, and covers zh (no stopword list exists)") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val out = Classifier.nbPredict(docs).cache()
    try {
      assert(out.count() == docs.count())
      val n = out.count().toDouble
      val hit = out.where(org.apache.spark.sql.functions.col("pred") ===
        org.apache.spark.sql.functions.col("lang")).count().toDouble
      val majority = docs.groupBy("lang").count()
        .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
        .toDouble
      assert(hit / n > majority / n,
        s"self-trained NB accuracy ${hit / n} must beat majority ${majority / n}")
      assert(out.where(org.apache.spark.sql.functions.col("pred") === "zh")
        .count() > 0, "the learned model must be able to emit zh")
    } finally out.unpersist()
  }
}
