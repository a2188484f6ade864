package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog (Flajolet et al. 2007) as a typed Spark [[Aggregator]]
  * over PRE-HASHED 64-bit values (hash in-plan with the codegen'd
  * `xxhash64`; the sketch consumes the hash, so the aggregator itself
  * is pure register arithmetic).
  *
  * This is the fifth and final member of the sketch family (MG floor
  * q76, KMV distinct q87, bloom membership q69, CMS ceiling q170):
  * what HLL adds over KMV is the PERSISTED ROLLUP shape — the register
  * array is a tiny (2^p-byte) mergeable summary whose merge is
  * ELEMENTWISE MAX, so per-(day, group) sketches materialized once can
  * answer distinct-over-any-date-range forever without rescanning raw
  * data (the Druid/datacube pattern; the reference's analogue is the
  * cross-shard gather in Cluster_Support.md, which must re-read keys
  * per question). max is idempotent/commutative/associative, so the
  * merged registers — and every estimate read from them — are
  * BIT-IDENTICAL under any partitioning, merge order, or re-merge of
  * overlapping sketches (HllSketchSpec asserts all three).
  *
  * Scale shape: the shuffle carries one 2^p-byte array per partition
  * per group regardless of input size; a year of daily per-group
  * sketches is groups×365×4 KB — driver-trivial, query-instant. */
class HllSketch(p: Int = 12) extends Aggregator[Long, Array[Byte], Array[Byte]] {
  require(p >= 4 && p <= 16, s"precision $p outside [4,16]")
  private val m = 1 << p

  def zero: Array[Byte] = new Array[Byte](m)

  def reduce(regs: Array[Byte], hash: Long): Array[Byte] = {
    val idx = (hash >>> (64 - p)).toInt
    // rank of the first 1-bit in the remaining 64-p bits (1-based);
    // an all-zero remainder gets the max rank 64-p+1
    val rest = hash << p
    val rho = (if (rest == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (rho > regs(idx)) regs(idx) = rho.toByte
    regs
  }

  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](m)
    var i = 0
    while (i < m) { out(i) = if (a(i) >= b(i)) a(i) else b(i); i += 1 }
    out
  }

  def finish(r: Array[Byte]): Array[Byte] = r

  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Merge-only aggregator: rolls PERSISTED register arrays up to coarser
  * groups (day → month → lifetime) with the same elementwise max. */
class HllMerge(p: Int = 12) extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
  private val build = new HllSketch(p)
  def zero: Array[Byte] = build.zero
  def reduce(b: Array[Byte], in: Array[Byte]): Array[Byte] = build.merge(b, in)
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = build.merge(a, b)
  def finish(r: Array[Byte]): Array[Byte] = r
  def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object HllSketch {
  /** Cardinality estimate from a register array: the classic harmonic
    * mean with alpha bias correction, falling back to linear counting
    * (m·ln(m/V)) in the small range where empty registers remain —
    * a deterministic pure function of the registers, so a merged
    * rollup and a direct build over the same set estimate identically
    * (they share registers bit for bit). */
  def estimate(regs: Array[Byte]): Double = {
    val m = regs.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Math.scalb(1.0, -regs(i).toInt)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha * m.toDouble * m.toDouble / invSum
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }
}
