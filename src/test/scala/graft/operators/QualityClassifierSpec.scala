package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Quality-classifier training (q84): MLlib logistic regression on weak
  * labels, served through the same per-partition-handle path as q50. */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("fitted LR separates crafted separable classes through the scoreBatches path") {
    import spark.implicits._
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.linalg.Vectors
    // clean docs: low punctuation, varied words; junk: pure symbol spam
    val clean = (1 to 40).map(i => (i.toLong, 1.0, Array(0.01, 0.3, 0.5, 0.9, 0.5)))
    val junk = (41 to 80).map(i => (i.toLong, 0.0, Array(0.8, 0.0, 0.1, 0.2, 0.2)))
    val df = (clean ++ junk).toDF("doc_id", "label", "f")
    val train = df.select($"label", $"f").as[(Double, Seq[Double])]
      .map { case (l, f) => (l, Vectors.dense(f.toArray)) }
      .toDF("label", "features")
    val model = new LogisticRegression().setMaxIter(25).setRegParam(0.01).fit(train)
    val scored = Inference.scoreBatches(
      df.select($"doc_id", $"f"), Inference.LinearScorer(model.coefficients.toArray, model.intercept),
      idCol = "doc_id", featCol = "f")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // perfect separation on linearly separable data
    assert(clean.forall { case (id, _, _) => scored(id) > 0 })
    assert(junk.forall { case (id, _, _) => scored(id) < 0 })
  }

  test("q84 recovers the weak labels on the corpus (mean p tracks the label)") {
    val out = Inference.qQualityClassifier(spark, sf).collect()
    assert(out.nonEmpty)
    val (pos, neg) = out.partition(_.getAs[Long]("weak_label") == 1L)
    assert(pos.nonEmpty && neg.nonEmpty)
    val meanPos = pos.map(_.getAs[Double]("mean_p")).sum / pos.length
    val meanNeg = neg.map(_.getAs[Double]("mean_p")).sum / neg.length
    // the weak labels are source-parity noise over real feature overlap,
    // so demand direction, not perfection
    assert(meanPos > meanNeg,
      s"positive sources should score higher: $meanPos vs $meanNeg")
    out.foreach { r =>
      val p = r.getAs[Double]("mean_p")
      assert(p >= 0.0 && p <= 1.0)
    }
  }
}
