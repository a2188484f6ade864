package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Top-level so the task closure serializes without dragging the test
  * suite along; the accumulator counts open() calls across executors. */
case class CountingScorer(opens: org.apache.spark.util.LongAccumulator)
    extends Inference.ModelScorer {
  def open(): Inference.ModelHandle = {
    opens.add(1)
    new Inference.ModelHandle {
      def score(f: Array[Double]): Double = f.sum
    }
  }
}

/** Counts closes too — verifies the task-completion-listener lifecycle. */
case class ClosingScorer(opens: org.apache.spark.util.LongAccumulator,
    closes: org.apache.spark.util.LongAccumulator) extends Inference.ModelScorer {
  def open(): Inference.ModelHandle = {
    opens.add(1)
    new Inference.ModelHandle {
      def score(f: Array[Double]): Double = f.sum
      override def close(): Unit = closes.add(1)
    }
  }
}

/** Batched inference (C14 analogue): per-partition model lifecycle and
  * numeric exactness of the in-repo linear model. */
class InferenceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("one model handle per partition, not per row") {
    val opens = spark.sparkContext.longAccumulator("model-opens")
    val df = spark.range(1000)
      .select(col("id").as("vec_id"), array(lit(1.0f), lit(2.0f)).as("embedding"))
      .repartition(4)
    val rows = Inference.scoreBatches(df, CountingScorer(opens)).collect()
    assert(rows.length == 1000)
    assert(rows.forall(_.getDouble(1) == 3.0))
    assert(opens.value == 4L, s"expected one open per partition, got ${opens.value}")
  }

  test("handle closes on early termination (limit stops consuming the iterator)") {
    val opens = spark.sparkContext.longAccumulator("model-opens-lim")
    val closes = spark.sparkContext.longAccumulator("model-closes-lim")
    val df = spark.range(100000)
      .select(col("id").as("vec_id"), array(lit(1.0f), lit(2.0f)).as("embedding"))
      .repartition(4)
    val out = Inference.scoreBatches(df, ClosingScorer(opens, closes)).limit(1).collect()
    assert(out.length == 1)
    assert(opens.value >= 1)
    // every opened handle must be closed even though no task drained
    // its iterator — the task completion listener, not exhaustion,
    // releases the model
    assert(closes.value == opens.value,
      s"leaked ${opens.value - closes.value} of ${opens.value} handles")
  }

  test("linear scorer matches a driver-side dot product exactly") {
    val e = Tables.embeddings(spark, sf).select("vec_id", "embedding").limit(20)
    val dims = e.select(size(col("embedding"))).head().getInt(0)
    val w = Inference.q50Weights(dims)
    val got = Inference.scoreBatches(e, Inference.LinearScorer(w))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val raw = e.collect().map { r =>
      val emb = r.getSeq[Float](1).toArray
      var acc = 0.0
      var i = 0
      while (i < dims) { acc += w(i) * emb(i).toDouble; i += 1 }
      r.getLong(0) -> acc
    }.toMap
    assert(got.keySet == raw.keySet)
    got.foreach { case (id, s) => assert(s == raw(id), s"vec $id") }
  }

  test("q50 output shape: score and thresholded class agree") {
    val rows = Inference.qModelScore(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val score = r.getDouble(1)
      val positive = r.getInt(2)
      assert((score > 0) == (positive == 1))
    }
  }

  test("q105: MLP artifact scoring matches the driver forward pass bit for bit") {
    val spark = TestSpark.spark
    import spark.implicits._
    val (dims, hidden) = (5, 3)
    val (w1, b1, w2, b2) = Inference.mlpWeights(dims, hidden)
    val path = java.nio.file.Files.createTempFile("graft-mlp-", ".safetensors")
    path.toFile.deleteOnExit()
    Safetensors.write(path.toString, Seq(
      ("w1", "F64", w1), ("b1", "F64", b1), ("w2", "F64", w2), ("b2", "F64", Array(b2))))
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(dims)(j => ((i * 7 + j * 3) % 11 - 5) / 5.0)))
    val scored = Inference.scoreBatches(vecs.toDF("vec_id", "embedding"),
        Inference.MlpScorer(path.toString))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // driver-side reference forward pass, same accumulation order
    var anyPos = false; var anyNeg = false
    for ((id, x) <- vecs) {
      var out = 0.0
      for (j <- 0 until hidden) {
        var acc = 0.0
        for (i <- 0 until dims) acc += w1(j * dims + i) * x(i)
        val pre = b1(j) + acc
        if (pre > 0.0) { out += w2(j) * pre; anyPos = true } else anyNeg = true
      }
      assert(scored(id) == b2 + out, s"vec $id: ${scored(id)} != ${b2 + out}")
    }
    // the relu is live: both branches exercised across the batch
    assert(anyPos && anyNeg)
  }

  test("q105: inconsistent MLP tensors are rejected at open()") {
    val path = java.nio.file.Files.createTempFile("graft-mlp-bad-", ".safetensors")
    path.toFile.deleteOnExit()
    // |w2| = 2 but |b1| = 3 hidden units
    Safetensors.write(path.toString, Seq(
      ("w1", "F64", Array.fill(15)(0.1)), ("b1", "F64", Array.fill(3)(0.0)),
      ("w2", "F64", Array.fill(2)(1.0)), ("b2", "F64", Array(0.0))))
    val ex = intercept[IllegalArgumentException] {
      Inference.MlpScorer(path.toString).open()
    }
    assert(ex.getMessage.contains("inconsistent MLP tensors"))
  }
}
