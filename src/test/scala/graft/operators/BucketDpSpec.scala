package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q370 — the k-segmentation DP must match brute-force enumeration of
  * EVERY boundary choice (the ground truth no heuristic shares), and
  * the fixture run must dominate the heuristics it replaces. */
class BucketDpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** Brute force: min total padding over all ways to cut `hist`
    * (len -> count, ascending) into at most k contiguous segments. */
  private def brute(hist: Seq[(Long, Long)], k: Int): Long = {
    val m = hist.length
    def cost(seg: Seq[(Long, Long)]): Long = {
      val mx = seg.map(_._1).max
      seg.map { case (l, c) => (mx - l) * c }.sum
    }
    def go(from: Int, left: Int): Long =
      if (from == m) 0L
      else if (left == 1) cost(hist.drop(from))
      else (from + 1 to m - left + 1).map { cut =>
        cost(hist.slice(from, cut)) + go(cut, left - 1)
      }.min
    go(0, k)
  }

  private def dpTotal(rows: Seq[(Long, Long)], k: Int): Long = {
    import spark.implicits._
    val docs = rows.flatMap { case (len, c) =>
      Seq.fill(c.toInt)("w " * len.toInt)
    }.zipWithIndex.map { case (t, i) => (i.toLong, t.trim) }
      .toDF("doc_id", "text")
    // run the DP through a crafted documents frame via the public
    // query path: write to a temp dir the Tables loader can read
    val dir = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    docs.withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Pipeline.qBucketBoundaries(spark, dir, k).collect()
    out.head.getAs[Long]("total_padding_optimal")
  }

  test("DP total equals brute force over crafted histograms") {
    val hists = Seq(
      // two tight clusters: the k=2 cut belongs between them
      Seq((3L, 5L), (4L, 4L), (20L, 3L), (21L, 6L)),
      // uniform spread
      Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), (6L, 1L)),
      // heavy head, long tail
      Seq((2L, 50L), (3L, 30L), (9L, 2L), (15L, 1L), (16L, 1L)))
    for (h <- hists; k <- Seq(2, 3)) {
      assert(dpTotal(h, k) == brute(h, k), s"hist $h k=$k")
    }
  }

  test("fixture: optimal dominates single-bucket; buckets partition the corpus") {
    val out = Pipeline.qBucketBoundaries(spark, sf).collect()
    val opt = out.head.getAs[Long]("total_padding_optimal")
    val single = out.head.getAs[Long]("total_padding_single_bucket")
    assert(opt <= single)
    assert(out.map(_.getAs[Long]("padding")).sum == opt)
    // every doc lands in exactly one bucket
    val nDocs = out.map(_.getAs[Long]("n_docs")).sum
    val want = Tables.documents(spark, sf).count()
    assert(nDocs == want)
    // pad_to_len strictly increases across buckets
    val lens = out.sortBy(_.getAs[Long]("bucket")).map(_.getAs[Long]("pad_to_len"))
    assert(lens.toSeq == lens.toSeq.sorted && lens.distinct.length == lens.length)
  }
}
