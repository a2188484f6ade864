package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Tables

/** Parity of the hashed-shingle Jaccard path against the definitional
  * string-set formulation: `sorted_intersect_size` over
  * [[hashedShingleSet]] must reproduce `size(array_intersect)` over the
  * string sets, and [[jaccardHashed]] must equal [[jaccard]] exactly
  * (same integer numerator/denominator feeding the division). */
class IntersectSizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("sorted_intersect_size equals size(array_intersect) on real shingle sets") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sf).limit(120)
      .select(col("doc_id"),
        shingleSet(col("text"), 2).as("strs"),
        hashedShingleSet(col("text"), 2).as("hsh"))
    val a = docs.select(col("doc_id").as("ida"), col("strs").as("sa"), col("hsh").as("ha"))
    val b = docs.select(col("doc_id").as("idb"), col("strs").as("sb"), col("hsh").as("hb"))
    val pairs = a.join(b, col("idb") > col("ida") && col("idb") <= col("ida") + 16)
      .select(
        size(array_intersect(col("sa"), col("sb"))).as("want_inter"),
        sortedIntersectSize(col("ha"), col("hb")).as("got_inter"),
        jaccard(col("sa"), col("sb")).as("want_jac"),
        jaccardHashed(col("ha"), col("hb")).as("got_jac"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), "intersection count mismatch")
      assert(r.getDouble(2) == r.getDouble(3), "jaccard value mismatch")
    }
  }

  test("merge-walk kernel handles empty and disjoint arrays") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L), 2),
      (Seq.empty[Long], Seq(1L), 0),
      (Seq(1L, 5L, 9L), Seq(2L, 6L, 10L), 0),
      (Seq(-5L, 0L, 7L), Seq(-5L, 0L, 7L), 3)
    ).toDF("a", "b", "want")
    df.select(sortedIntersectSize(col("a"), col("b")).as("got"), col("want"))
      .collect().foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }
}
