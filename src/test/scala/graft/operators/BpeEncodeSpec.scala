package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BPE encoding (q82) vs an independent reference: the operator applies
  * merges SEQUENTIALLY in rank order (one left-to-right fold per merge);
  * the reference here is the classic LOWEST-RANK-FIRST loop (repeatedly
  * merge the best-ranked adjacent pair present). The two are provably
  * equivalent — a pair involving a merged symbol can only be learned at
  * a later rank — so an exact match is a genuine cross-check of the
  * implementation, not the same code run twice. */
class BpeEncodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** Reference encoder: iterated best-rank merge (the huggingface-style
    * apply loop), merging all non-overlapping occurrences leftmost-first
    * of the single best-ranked pair each iteration. */
  private def referenceEncode(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms: Vector[String] = word.split("").toVector
    var continue = true
    while (continue && syms.length >= 2) {
      val present = syms.zip(syms.tail).flatMap(p => ranks.get(p).map(r => (r, p)))
      if (present.isEmpty) continue = false
      else {
        val (_, (a, b)) = present.minBy(_._1)
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  test("operator subword sequences match the lowest-rank-first reference on the corpus vocabulary") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val merges = Pipeline.learnBpeMerges(docs, "text", 30)
    val ranks = merges.map { case (r, a, b) => (a, b) -> r }.toMap
    val words = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).distinct().as[String]
    val got = Pipeline.encodeBpe(words, merges)
      .as[(String, Seq[String])].collect().toMap
    assert(got.nonEmpty)
    got.foreach { case (w, subwords) =>
      assert(subwords.toVector === referenceEncode(w, ranks), s"word: $w")
      assert(subwords.mkString === w, s"lossless concatenation failed for: $w")
    }
    // the learned merges must actually compress: at least one multi-char
    // subword must appear somewhere in the encoded vocabulary
    assert(got.values.exists(_.exists(_.length > 1)))
  }

  test("q82 per-source stats are consistent with a driver-side recount") {
    import org.apache.spark.sql.functions._
    val out = Pipeline.qBpeEncode(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_words")
      val sum = r.getAs[Long]("sum_subwords")
      val avg = r.getAs[Double]("avg_subwords")
      assert(sum >= n) // every word is at least one subword
      assert(math.abs(avg - sum.toDouble / n) < 1e-3)
    }
    // occurrence totals must equal the corpus word count
    val totalWords = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).count()
    assert(out.map(_.getAs[Long]("n_words")).sum === totalWords)
  }
}
