package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Count-Min sketch: ceiling guarantee, ε-band quality, and the
  * linear-sketch merge property (bit-identical estimates under any
  * partitioning). */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf
  private val depth = 4
  private val width = 1024

  private lazy val tokens: Array[String] = {
    import spark.implicits._
    graft.operators.Tables.documents(spark, sf)
      .select(explode(graft.functions.tokens(lower(col("text")))).as("t"))
      .filter(length(col("t")) > 0)
      .as[String].collect()
  }

  private def sketch(parts: Int): CMSState = {
    import spark.implicits._
    spark.createDataset(tokens.toSeq).repartition(parts)
      .select(new CountMin(depth, width).toColumn).head()
  }

  test("ceiling, band, and n over the full corpus") {
    val st = sketch(4)
    val exact = tokens.groupBy(identity).map { case (t, v) => t -> v.length.toLong }
    assert(st.n == tokens.length.toLong)
    val overs = exact.map { case (t, c) =>
      val est = CountMin.estimate(st, t, depth, width)
      assert(est >= c, s"ceiling violated for '$t': est $est < exact $c")
      est - c
    }
    // ε-band: overwhelmingly within (e/width)·n; mean far inside it
    val bound = math.ceil(math.E / width * st.n)
    val within = overs.count(_ <= bound).toDouble / overs.size
    assert(within >= 0.95, s"only $within within the ε band")
    assert(overs.sum.toDouble / overs.size <= bound)
  }

  test("linear merge: estimates are partition-invariant bit for bit") {
    val a = sketch(1)
    val b = sketch(7)
    assert(a.n == b.n)
    assert(a.counts.toSeq == b.counts.toSeq)
  }

  test("q170 output: every reported estimate dominates its exact count") {
    val rows = graft.operators.TextAnalysis.qCmsFrequency(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1))
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
  }
}
