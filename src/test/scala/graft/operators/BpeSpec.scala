package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BPE merge learning (q78) vs an independent driver-side reference:
  * with the deterministic tie-break (count desc, pair asc) the merge
  * sequence must match EXACTLY. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** Plain-Scala reference BPE trainer over word frequencies. */
  private def referenceBpe(wordCounts: Map[String, Long], numMerges: Int): Seq[(String, String)] = {
    var vocab: Map[Vector[String], Long] =
      wordCounts.map { case (w, c) => w.toVector.map(_.toString) -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (out.size < numMerges && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ => ()
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val (pair, _) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        out += pair
        val (a, b) = pair
        vocab = vocab.map { case (syms, c) =>
          val merged = syms.foldLeft(Vector.empty[String]) { (acc, s) =>
            if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
            else acc :+ s
          }
          merged -> c
        }
      }
    }
    out.toSeq
  }

  test("distributed merges match the reference trainer exactly") {
    import org.apache.spark.sql.functions._
    val numMerges = 30
    val got = Pipeline.learnBpeMerges(Tables.documents(spark, sf), "text", numMerges)
      .map { case (_, a, b) => (a, b) }
    val wordCounts = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count("*").as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referenceBpe(wordCounts, numMerges)
    assert(got.size == numMerges, s"expected $numMerges merges, got ${got.size}")
    assert(got == want,
      s"merge sequences diverge at ${got.zip(want).indexWhere(p => p._1 != p._2)}")
  }

  test("merges apply non-overlapping left-to-right (aaa + (a,a) -> [aa, a])") {
    import spark.implicits._
    val docs = Seq("aaa aaa b").toDF("text")
    val merges = Pipeline.learnBpeMerges(docs, "text", 1)
    assert(merges == Seq((0, "a", "a")))
  }
}
