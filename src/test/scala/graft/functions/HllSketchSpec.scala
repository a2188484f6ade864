package graft.functions

import org.apache.spark.sql.{Encoders, functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** HyperLogLog sketch core: the algebraic properties that make the
  * persisted-rollup shape (q193) sound, checked directly on register
  * arrays — merge ≡ direct build bit for bit under any split, order,
  * and overlap; partition-invariance through the Spark udaf path; and
  * the published ~1.04/√m error band. */
class HllSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def hash(x: Long): Long = {
    // any stable 64-bit mix works for the property tests; use a
    // splitmix64 step so inputs aren't trivially sequential
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def build(values: Seq[Long], p: Int = 12): Array[Byte] = {
    val agg = new HllSketch(p)
    values.foldLeft(agg.zero)((b, v) => agg.reduce(b, hash(v)))
  }

  test("merge of disjoint splits equals the direct build bit for bit") {
    val vals = (1L to 50000L).toSeq
    val agg = new HllSketch(12)
    val direct = build(vals)
    val merged = vals.grouped(777).map(g => build(g.toSeq))
      .reduce(agg.merge)
    assert(java.util.Arrays.equals(direct, merged))
  }

  test("merge is idempotent under overlap and commutative") {
    val agg = new HllSketch(12)
    val a = build((1L to 30000L).toSeq)
    val b = build((20000L to 50000L).toSeq)  // overlaps a
    val all = build((1L to 50000L).toSeq)
    assert(java.util.Arrays.equals(agg.merge(a, b), all))
    assert(java.util.Arrays.equals(agg.merge(a, b), agg.merge(b, a)))
    assert(java.util.Arrays.equals(agg.merge(all, all), all))
  }

  test("estimate lands in the ~1.04/sqrt(m) band at m=4096") {
    // 3 sigma at p=12 is ~4.9%; require 5%
    for (n <- Seq(10000L, 100000L, 1000000L)) {
      val est = HllSketch.estimate(build((1L to n).toSeq))
      assert(math.abs(est - n) / n < 0.05,
        s"n=$n est=$est err=${math.abs(est - n) / n}")
    }
  }

  test("linear-counting regime is tight at small cardinalities") {
    for (n <- Seq(50L, 150L, 1000L)) {
      val est = HllSketch.estimate(build((1L to n).toSeq))
      assert(math.abs(est - n) / n < 0.03, s"n=$n est=$est")
    }
  }

  test("udaf path: registers are repartition-invariant") {
    import spark.implicits._
    val buildU = F.udaf(new HllSketch(12), Encoders.scalaLong)
    val df = (1L to 20000L).toDF("v").select(F.xxhash64(F.col("v")).as("h"))
    def regs(parts: Int): Array[Byte] =
      df.repartition(parts).agg(buildU(F.col("h"))).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(regs(1), regs(7)))
    assert(java.util.Arrays.equals(regs(7), regs(32)))
  }

  test("HllMerge rollup of daily sketches == one-shot build (q193 core)") {
    import spark.implicits._
    val buildU = F.udaf(new HllSketch(12), Encoders.scalaLong)
    val mergeU = F.udaf(new HllMerge(12), Encoders.BINARY)
    // 90 "days", users recur across days (the realistic overlap case)
    val rows = for (d <- 0 until 90; u <- 0 until 500) yield (d, (u * 37 + d) % 8000L)
    val df = rows.toDF("day", "user")
      .select(F.col("day"), F.xxhash64(F.col("user")).as("h"))
    val daily = df.groupBy("day").agg(buildU(F.col("h")).as("sk"))
    val rolled = daily.agg(mergeU(F.col("sk"))).head().getAs[Array[Byte]](0)
    val direct = df.agg(buildU(F.col("h"))).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(rolled, direct))
  }
}
