package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Containment detection (q77): complete recall on the planted
  * verbatim containments and exact precision via the contains verify. */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("finds every planted containment; every reported pair verifies exactly") {
    val got = Dedup.qContainment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // planted: doc i (i % 7 == 0) swallows doc i+1 verbatim
    val planted = ids.filter(i => i % 7 == 0 && ids.contains(i + 1)).map(i => (i, i + 1))
    assert(planted.nonEmpty)
    planted.foreach(p => assert(got.contains(p), s"planted containment $p missed"))
    // precision: re-verify every reported pair on the injected texts
    val docs0 = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def injected(i: Long): String =
      if (i % 7 == 0 && docs0.contains(i + 1)) docs0(i) + " " + docs0(i + 1) else docs0(i)
    got.foreach { case (a, b) =>
      assert(injected(a).contains(injected(b)), s"false containment ($a, $b)")
    }
  }

  test("document-frequency ceiling is active at the default and costs no planted recall") {
    graft.functions.GraftFunctions.register(spark)
    // the corpus genuinely has fingerprints above the default ceiling
    // (so the cap provably drops join keys, it isn't a no-op)
    val maxDf = Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(array_distinct(graft.functions.winnowFingerprint(col("text"), 8, 4))).as("h"))
      .groupBy("h").agg(count("*").as("docfreq"))
      .agg(max("docfreq")).head().getLong(0)
    assert(maxDf > 128, s"corpus max fingerprint df $maxDf not above the default ceiling")
    // recall survives an even tighter ceiling: planted containments are
    // distinctive content (their fingerprints live in ~2 docs), so a
    // cap of 32 — a quarter of the default — still finds every pair
    val got = Dedup.qContainment(spark, sf, maxDocFreq = 32).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val planted = ids.filter(i => i % 7 == 0 && ids.contains(i + 1)).map(i => (i, i + 1))
    planted.foreach(p => assert(got.contains(p), s"planted containment $p missed under cap"))
  }

  test("asymmetry: a long wrapper is reported as container, not as near-dup peer") {
    val got = Dedup.qContainment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the planted direction is (wrapper, payload); the reverse (payload
    // contains wrapper) must never appear for strictly-longer wrappers
    got.foreach { case (a, b) =>
      assert(!(a % 7 == 0 && got.contains((b, a))), s"symmetric containment ($a, $b)")
    }
  }
}
