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

  test("non-BMP text: driver and distributed paths agree (code points, UTF-8 tie-break)") {
    import spark.implicits._
    // emoji are supplementary characters: UTF-16 code-unit splitting
    // would shatter them into surrogate halves, and UTF-16 collation
    // disagrees with Spark's UTF-8 binary order around them
    val docs = Seq(
      "😀ab 😀ab 😀cd",
      "ab ab 😀cd xy").toDF("text")
    val driver = Pipeline.learnBpeMerges(docs, "text", 6)
    val distributed = Pipeline.learnBpeMerges(docs, "text", 6, driverVocabCap = 0)
    assert(driver == distributed)
    assert(driver.nonEmpty)
    // no merge token may contain an unpaired surrogate half (those
    // don't survive a UTF-8 round trip)
    driver.foreach { case (_, a, b) =>
      Seq(a, b).foreach(s => assert(new String(s.getBytes("UTF-8"), "UTF-8") == s,
        s"malformed symbol in merge ($a, $b)"))
    }
  }

  test("above-cap fallback: distributed rounds produce the identical sequence") {
    // driverVocabCap = 0 forces the distributed path on the same corpus
    val docs = Tables.documents(spark, sf)
    val driver = Pipeline.learnBpeMerges(docs, "text", 15)
    val distributed = Pipeline.learnBpeMerges(docs, "text", 15, driverVocabCap = 0)
    assert(driver.size == 15)
    assert(driver == distributed)
  }

  test("1000 merges run driver-side: a handful of Spark jobs, seconds of wall time") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    // the sf corpus's vocabulary exhausts near 90 merges; a seeded
    // 20k-word corpus sustains 1000+ (what a real tokenizer run needs)
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val docs = {
      import spark.implicits._
      (1 to 2000).map { _ =>
        (1 to 10).map(_ =>
          (1 to (6 + rnd.nextInt(10))).map(_ => alpha(rnd.nextInt(26))).mkString
        ).mkString(" ")
      }.toDF("text")
    }
    try {
      val t0 = System.nanoTime()
      val merges = Pipeline.learnBpeMerges(docs, "text", 1000)
      val secs = (System.nanoTime() - t0) / 1e9
      assert(merges.size == 1000, s"corpus exhausted at ${merges.size} merges")
      assert(secs < 60.0, f"1000 merges took $secs%.1f s — the loop is not driver-paced")
      Thread.sleep(1000) // listener bus is async
      // a handful = the size probe + the vocab collect (+ their stage
      // jobs) — CONSTANT in the merge count, which is the contract
      assert(jobs.get() <= 6,
        s"${jobs.get()} Spark jobs for 1000 merges — rounds are spending jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
