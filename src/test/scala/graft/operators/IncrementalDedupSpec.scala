package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.GraftFunctions

/** The bloom-prefiltered incremental dedup (q69): the RESULT is exact
  * (oracle-checked in the gate); these tests pin the ROUTING — the
  * bloom's no-false-negative contract and the pruning that makes the
  * shape scale. */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  import spark.implicits._

  /** The q69 corpus/batch split with the injected re-crawl dups. */
  private def corpusAndBatch = {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      .select(col("doc_id"), col("source"), col("text"))
    val crawlSrc = corpus.select((col("doc_id") - 1).as("doc_id"),
      col("text").as("crawl_text"))
    val batch = docs.filter(col("doc_id") % 5 === 0)
      .join(crawlSrc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 15 === 0 && col("crawl_text").isNotNull, col("crawl_text"))
          .otherwise(col("text")).as("text"))
    (corpus, batch)
  }

  test("incrementalNew equals the plain digest anti-join (bloom only routes)") {
    val (corpus, batch) = corpusAndBatch
    val got = Dedup.incrementalNew(corpus, batch, "text")
      .select("doc_id").as[Long].collect().toSet
    val want = batch.withColumn("dg", md5(col("text").cast("binary")))
      .join(corpus.select(md5(col("text").cast("binary")).as("dg")).distinct(),
        Seq("dg"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(got == want)
    // the injection produced real dups, so the test is not vacuous
    assert(got.size < batch.count())
  }

  test("bloom flags every true duplicate as maybe (no false negatives) and prunes") {
    val (corpus, batch) = corpusAndBatch
    GraftFunctions.register(spark)
    val bloom = corpus.select(xxhash64(col("text")).as("h"))
      .agg(call_function("bloom_filter_agg", col("h"), lit(1000000L)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val flagged = batch.withColumn("maybe",
        call_function("bloom_might_contain", lit(bloom), xxhash64(col("text"))))
      .withColumn("isDup",
        col("doc_id").isin(
          batch.withColumn("dg", md5(col("text").cast("binary")))
            .join(corpus.select(md5(col("text").cast("binary")).as("dg")).distinct(), Seq("dg"))
            .select("doc_id").as[Long].collect().toSeq: _*))
    // no false negatives: a true dup is never routed around the verify join
    assert(flagged.filter(col("isDup") && !col("maybe")).count() == 0)
    // pruning: most non-dup batch rows skip the anti-join entirely
    val nonDup = flagged.filter(!col("isDup"))
    val falsePos = nonDup.filter(col("maybe")).count()
    assert(falsePos.toDouble / nonDup.count() < 0.10,
      s"bloom false-positive rate too high: $falsePos of ${nonDup.count()}")
  }

  test("empty corpus: everything in the batch is new") {
    val (_, batch) = corpusAndBatch
    val empty = batch.filter(lit(false))
    assert(Dedup.incrementalNew(empty, batch, "text").count() == batch.count())
  }
}
