package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("salted join equals the plain join on a skewed dataset") {
    import spark.implicits._
    // 10k rows of one hot key + a long tail
    val left = ((1 to 10000).map(i => (1L, s"hot$i")) ++
      (1 to 100).map(i => (i.toLong + 1, s"tail$i"))).toDF("k", "lv")
    val right = (1 to 50).map(i => (i.toLong, s"dim$i")).toDF("k", "rv")

    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(left, right, "k", salt = 8).select("k", "lv", "rv")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 10000 + 49) // hot key matched + tail keys 2..50
  }

  test("the hot key's rows spread across multiple salt buckets") {
    import spark.implicits._
    val left = (1 to 5000).map(i => (1L, i)).toDF("k", "v")
    val buckets = left.withColumn("__salt",
        pmod(xxhash64(struct(left.columns.map(col): _*)), lit(8)).cast("int"))
      .groupBy("__salt").count().collect()
    assert(buckets.length == 8, "content-hash salting must hit every bucket")
    // no bucket owns more than half the hot key's rows
    assert(buckets.map(_.getLong(1)).max < 2500)
  }
}
