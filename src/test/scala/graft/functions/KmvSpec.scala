package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.{Pipeline, Tables}

/** The KMV bottom-k sketch's contract: exact below k, a deterministic
  * set-function state (split/merge invariance), the Beyer et al.
  * estimator within its ~1/√k error band against exact counts, and the
  * q87 query's estimate/exact agreement on the corpus. */
class KmvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("below k the sketch IS the distinct set: estimate exact, duplicates ignored") {
    val agg = new KmvSketch(16)
    val hashes = (1 to 10).map(i => md5hex(s"v$i"))
    // feed every hash three times, in shuffled order
    val state = new Random(7).shuffle(hashes ++ hashes ++ hashes)
      .foldLeft(agg.zero)(agg.reduce)
    assert(state.hashes.length == 10)
    assert(agg.finish(state) == 10.0)
  }

  test("raw (unhashed) input is rejected at the reduce boundary") {
    val agg = new KmvSketch(4)
    intercept[IllegalArgumentException] { agg.reduce(agg.zero, "raw value") }
    intercept[IllegalArgumentException] { agg.reduce(agg.zero, "ABCDEF" * 6) } // uppercase, wrong width
  }

  test("state is a pure set function: random split/merge trees agree with serial") {
    val agg = new KmvSketch(8)
    val hashes = (1 to 500).map(i => md5hex(s"item$i"))
    val serial = hashes.foldLeft(agg.zero)(agg.reduce)
    val rnd = new Random(42)
    (1 to 10).foreach { trial =>
      val shuffled = rnd.shuffle(hashes.toList)
      val parts = shuffled.grouped(1 + rnd.nextInt(120)).toSeq
      val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge)
      assert(merged == serial, s"trial $trial: merge tree diverged from serial fold")
      assert(agg.finish(merged) == agg.finish(serial))
    }
  }

  test("estimator stays within 4/sqrt(k) of the true cardinality (k=64, D=20000)") {
    val k = 64
    val agg = new KmvSketch(k)
    val d = 20000
    val state = (1 to d).map(i => md5hex(s"elem$i")).foldLeft(agg.zero)(agg.reduce)
    val est = agg.finish(state)
    val relErr = math.abs(est - d) / d
    assert(relErr < 4.0 / math.sqrt(k), f"rel err $relErr%.4f outside the 4/sqrt(k) band")
  }

  test("q87 on the corpus: every estimate within 4/sqrt(k) of its exact column") {
    // at k=16 the 4/sqrt(k) band is relErr < 1.0 — vacuous; run the
    // accuracy assertion at k=64 where the band (0.5) has teeth, and
    // keep the gate's k=16 shape for the determinism check below
    val k = 64
    val rows = Pipeline.qKmvDistinct(spark, sf, k).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getDouble(2))
      val relErr = math.abs(est - exact) / exact
      assert(relErr < 4.0 / math.sqrt(k),
        s"${r.getString(0)}: estimate $est vs exact $exact (rel err $relErr)")
    }
    // determinism at the gate's k: a second run is bit-identical (no
    // HLL-style run noise)
    val k16 = Pipeline.qKmvDistinct(spark, sf, 16).collect()
    val again = Pipeline.qKmvDistinct(spark, sf, 16).collect()
    assert(k16.map(_.getDouble(2)).toSeq == again.map(_.getDouble(2)).toSeq)
  }

  test("degenerate all-zero-prefix hashes: finish reports the sketch size, not Infinity") {
    val k = 4
    val agg = new KmvSketch(k)
    // well-formed 32-char hex whose 15-hex estimator prefix is zero
    val zeroPrefixed = (0 until k).map(i => "0" * 15 + f"$i%017x")
    val state = zeroPrefixed.foldLeft(agg.zero)(agg.reduce)
    assert(state.hashes.length == k)
    val est = agg.finish(state)
    assert(!est.isInfinity && est == k.toDouble)
  }

  test("distributed fold matches the driver-side fold on corpus tokens") {
    val k = 32
    val toks = Tables.documents(spark, sf)
      .select(explode(tokens(lower(col("text")))).as("t"))
      .filter(length(col("t")) > 0)
      .select(md5(col("t").cast("binary")).as("h"))
    val agg = new KmvSketch(k)
    val distributed = toks.repartition(8)
      .select(udaf(agg, org.apache.spark.sql.Encoders.STRING)(col("h")).as("est"))
      .head().getDouble(0)
    val driver = toks.collect().map(_.getString(0))
      .foldLeft(agg.zero)(agg.reduce)
    assert(distributed == agg.finish(driver))
  }
}
