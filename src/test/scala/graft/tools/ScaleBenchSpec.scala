package graft.tools

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.cosineSimilarity

/** The scale generator's embedding claim: each copy's map is
  * ORTHOGONAL, so every intra-copy cosine is preserved exactly —
  * without this the 10×/100× semantic-dedup probe would measure a
  * different similarity structure than sf0.1. */
class ScaleBenchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("per-copy transform preserves intra-copy cosines bit-for-bit") {
    val e = graft.operators.Tables.embeddings(spark, TestSpark.sf).limit(50)
    val base = e.select(col("vec_id"), col("embedding"))
    def pairs(df: org.apache.spark.sql.DataFrame) = {
      val a = df.select(col("vec_id").as("ia"), col("embedding").as("ea"))
      val b = df.select(col("vec_id").as("ib"), col("embedding").as("eb"))
      a.crossJoin(b).filter(col("ia") < col("ib"))
        .select(col("ia"), col("ib"), cosineSimilarity(col("ea"), col("eb")).as("cos"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    }
    val orig = pairs(base)
    // a rotation-only copy and a rotation+flip copy
    Seq(3, 64 + 5).foreach { i =>
      val t = pairs(base.select(col("vec_id"),
        ScaleBench.orthoTransform(col("embedding"), i).as("embedding")))
      orig.foreach { case (k, c) =>
        assert(math.abs(t(k) - c) < 1e-6, s"copy $i changed cosine of $k: ${t(k)} vs $c")
      }
    }
    // distinct copies decorrelate: the identity copy and copy 3 of the
    // SAME vector should not be near-identical in general
    val v0 = base.limit(5)
    val cross = v0.select(col("vec_id"), col("embedding").as("ea"))
      .join(v0.select(col("vec_id"),
        ScaleBench.orthoTransform(col("embedding"), 3).as("eb")), Seq("vec_id"))
      .select(cosineSimilarity(col("ea"), col("eb")).as("cos"))
      .collect().map(_.getDouble(0))
    assert(cross.forall(c => c < 0.9), s"cross-copy vectors too correlated: ${cross.mkString(",")}")
  }
}
