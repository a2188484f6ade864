package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.{signLshBuckets, signLshBucketsReference}
import graft.operators.Tables

/** The native SignLshBuckets expression must be bit-exact with the
  * declarative HOF formulation it replaced — same xxhash64-derived
  * hyperplanes, same left-to-right double accumulation — so the
  * q31/q33 bucket joins produce identical candidates. */
class SignLshSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("native expression is bit-exact with the HOF reference on real embeddings") {
    GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sf).limit(500)
    val mismatches = e.select(
        signLshBuckets(col("embedding"), 6, 4).as("native"),
        signLshBucketsReference(col("embedding"), 6, 4).as("ref"))
      .filter(col("native") =!= col("ref"))
      .count()
    assert(mismatches == 0)
  }

  test("buckets are deterministic and in-range; empty/null vectors map to bucket 0") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      Seq(1.0f, -2.0f, 0.5f),
      Seq.empty[Float]
    ).toDF("embedding")
    val rows = df.select(signLshBuckets(col("embedding"), 6, 2).as("b"))
      .selectExpr("inline(b)")
      .collect()
    // 2 tables per vector, tbl ids 0 and 1, buckets in [0, 2^6)
    assert(rows.length == 4)
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 0, 1))
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 64))
    // empty vector: every projection degenerates → bucket 0 in all tables
    assert(rows.drop(2).forall(_.getLong(1) == 0L))
    // deterministic across evaluations
    val again = df.select(signLshBuckets(col("embedding"), 6, 2).as("b"))
      .selectExpr("inline(b)").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
