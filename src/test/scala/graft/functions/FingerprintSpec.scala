package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FingerprintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fps(texts: String*): Seq[Set[Long]] = {
    GraftFunctions.register(spark)
    import spark.implicits._
    texts.toDF("text")
      .select(winnowFingerprint(col("text"), 8, 4).as("fp"))
      .collect().toSeq.map(_.getSeq[Long](0).toSet)
  }

  test("winnowing guarantee: docs sharing a run of >= k+w-1 chars share a fingerprint") {
    val shared = "the quick brown fox jumps over the lazy dog repeatedly"
    val Seq(a, b) = fps(s"PREFIX ONE $shared SUFFIX ONE", s"other start $shared other end")
    assert(a.intersect(b).nonEmpty)
  }

  test("disjoint documents share no fingerprints") {
    val Seq(a, b) = fps("aaaa bbbb cccc dddd eeee ffff gggg",
      "zzzz yyyy xxxx wwww vvvv uuuu tttt")
    assert(a.intersect(b).isEmpty)
  }

  test("deterministic and non-empty; short text yields empty") {
    val Seq(a, b, c) = fps("hello world hello world", "hello world hello world", "hi")
    assert(a == b && a.nonEmpty)
    assert(c.isEmpty) // shorter than k
  }

  test("simhash/winnow SQL registration works end-to-end") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq("some text here").toDF("t").createOrReplaceTempView("fp_probe")
    val r = spark.sql(
      "SELECT simhash64(split(t, ' ')) AS sh, size(winnow_fingerprint(t, 8, 4)) AS n FROM fp_probe")
      .collect().head
    assert(r.getLong(0) != 0L)
    assert(r.getInt(1) >= 1)
  }
}
