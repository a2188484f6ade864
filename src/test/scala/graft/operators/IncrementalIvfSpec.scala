package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q150: incremental IVF maintenance — append-without-rebuild must be
  * indistinguishable from a from-scratch assignment under the same
  * codebook, appended rows must sit in their true argmin cell, and new
  * vectors must serve immediately through the unchanged search path. */
class IncrementalIvfSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Tables.embeddings(spark, TestSpark.sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))

  private lazy val indexDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("ivfinc-spec").toString
    Similarity.buildAppendableIvfIndex(spark,
      corpus.filter(col("vec_id") % 2 === 0), dir, cells = 8)
    Similarity.appendToIvfIndex(spark, dir,
      corpus.filter(col("vec_id") % 2 =!= 0))
    dir
  }

  private def codebook: Seq[(Int, Seq[Double])] =
    spark.read.parquet(s"$indexDir/centroids")
      .select(col("cell"), col("centroid"))
      .as[(Int, Seq[Double])].collect().toSeq

  test("incrementally grown index equals a full re-assignment bit for bit") {
    val grown = spark.read.parquet(s"$indexDir/assignments")
      .select(col("vec_id"), col("cell")).as[(Long, Int)].collect().toMap
    val rebuilt = Similarity.assignWithCodebook(corpus, codebook)
      .select(col("vec_id"), col("cell")).as[(Long, Int)].collect().toMap
    assert(grown.size == rebuilt.size)
    assert(grown == rebuilt)
  }

  test("every appended row sits in its true argmin cell (lowest-cell ties)") {
    val cents = codebook.sortBy(_._1).map(_._2.toArray)
    def d2(a: Seq[Double], c: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { val dlt = a(i) - c(i); acc += dlt * dlt; i += 1 }
      acc
    }
    val appended = spark.read.parquet(s"$indexDir/assignments")
      .filter(col("vec_id") % 2 =!= 0)
      .select(col("vec_id"), col("embedding"), col("cell"))
      .as[(Long, Seq[Double], Int)].collect()
    assert(appended.nonEmpty)
    appended.foreach { case (id, emb, cell) =>
      val ds = cents.map(c => d2(emb, c))
      val want = ds.indexOf(ds.min)
      assert(cell == want, s"vec $id: assigned $cell, argmin $want")
    }
  }

  test("appended vectors serve immediately through the unchanged search path") {
    // a query identical to an ODD (appended) vector must come back at
    // rank 1 with cosine 1.0
    val probe = corpus.filter(col("vec_id") % 2 =!= 0).limit(1)
      .as[(Long, Seq[Double])].collect().head
    val queries = Seq((900001L, probe._2))
      .toDF("query_id", "q_emb")
    val top = Similarity.ivfSearchFromIndex(spark, indexDir, queries,
      nprobe = 2, k = 3, excludeSelfId = false)
      .orderBy("rank").as[(Long, Int, Long, Double)].collect()
    assert(top.nonEmpty)
    assert(top.head._3 == probe._1, s"expected appended vec ${probe._1} at rank 1, got ${top.head._3}")
    assert(top.head._4 == 1.0)
  }

  test("q150 audit: every cell accounted, counts reconcile with the corpus") {
    val out = Similarity.qIvfAppend(spark, TestSpark.sf)
      .as[(Int, Long, Long, Double, Double)].collect()
    assert(out.nonEmpty)
    val n = corpus.count()
    assert(out.map(r => r._2 + r._3).sum == n)
    assert(out.forall(r => r._4 >= 0.0 && r._5 >= 0.0))
  }
}
