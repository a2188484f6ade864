package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV / bottom-k sketch state: the ≤ k smallest DISTINCT hash values
  * seen, as sorted lowercase hex strings (fixed-width hex compares
  * lexicographically = numerically, so no numeric decode in the hot
  * path). */
case class KmvState(hashes: Vector[String])

/** K-Minimum-Values distinct-count sketch (Bar-Yossef et al., RANDOM'02)
  * with the unbiased estimator of Beyer et al. (SIGMOD'07):
  * keep the k smallest distinct hash values; if fewer than k were seen
  * the sketch IS the distinct set (exact count), otherwise estimate
  * D ≈ (k−1) / h_(k) with h_(k) the k-th smallest hash mapped to [0,1).
  *
  * Unlike HyperLogLog (q43) the KMV state is a pure function of the
  * input SET — insertion- and merge-order invariant — so the estimate
  * is DETERMINISTIC and the gate can hash-check it against a DuckDB
  * oracle computing the same bottom-k (the rare sketch with an exact
  * oracle). Merging is bottom-k of the union, which also gives
  * union/intersection cardinality estimates across sketches for free.
  *
  * Scale shape (the reason to prefer it over exact count-distinct):
  * each partition folds into ≤ k hex strings, so a grouped aggregation
  * gathers O(groups · k) instead of shuffling the full value domain —
  * the same bounded-gather contract as [[MisraGries]]. Standard error
  * is ~1/√k (k=256 ≈ 6%); HeavyHitters-style guarantees are pinned by
  * KmvSpec against exact counts. */
class KmvSketch(k: Int) extends Aggregator[String, KmvState, Double] {
  require(k >= 2, "k must be at least 2")

  def zero: KmvState = KmvState(Vector.empty)

  def reduce(b: KmvState, hash: String): KmvState = {
    // the estimator assumes FIXED-WIDTH lowercase hex (lexicographic =
    // numeric order; finish parses a 15-hex prefix) — fail fast on raw
    // unhashed input instead of crashing in finish or silently biasing
    require(hash.length == 32 && KmvSketch.isHex(hash),
      s"KmvSketch expects 32-char lowercase hex digests, got '$hash'")
    val hs = b.hashes
    if (hs.length == k && hash >= hs.last) b
    else {
      val i = insertionPoint(hs, hash)
      if (i < hs.length && hs(i) == hash) b // already present
      else {
        val ins = hs.patch(i, Vector(hash), 0)
        KmvState(if (ins.length > k) ins.take(k) else ins)
      }
    }
  }

  def merge(a: KmvState, b: KmvState): KmvState =
    KmvState((a.hashes ++ b.hashes).distinct.sorted.take(k))

  /** Exact when the sketch saw fewer than k distinct values; otherwise
    * (k−1)/h_(k) with h_(k) read as the first 15 hex digits / 16^15
    * (60 bits — within double precision, and cheap to reproduce in
    * SQL: `('0x' || substr(h,1,15))::BIGINT / 16.0^15`). */
  def finish(r: KmvState): Double =
    if (r.hashes.length < k) r.hashes.length.toDouble
    else {
      val frac = java.lang.Long.parseLong(r.hashes.last.substring(0, 15), 16)
        .toDouble / KmvSketch.Scale
      // h_(k) with an all-zero 15-hex prefix (~16^-15 for real digests,
      // but reachable by a caller feeding pre-zeroed "hashes"): the k
      // sketch entries are then the only values below 16^-15, so the
      // distinct set is, to estimator resolution, exactly the sketch —
      // report it as exact rather than returning a silent Infinity
      if (frac == 0.0) r.hashes.length.toDouble
      else (k - 1).toDouble / frac
    }

  private def insertionPoint(hs: Vector[String], h: String): Int = {
    var lo = 0
    var hi = hs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (hs(mid) < h) lo = mid + 1 else hi = mid
    }
    lo
  }

  def bufferEncoder: Encoder[KmvState] = Encoders.product[KmvState]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** [[KmvSketch]] variant whose result is the bottom-k hash vector
  * itself rather than the distinct-count estimate — the form set
  * ALGEBRA needs (q256): bottom-k of a union is the bottom-k of the
  * merged sketches, and sketch membership tests give intersection /
  * Jaccard estimates (Beyer et al., SIGMOD'07 §5). Same fold, same
  * state, same determinism argument. */
class KmvBottomK(k: Int) extends Aggregator[String, KmvState, Seq[String]] {
  private val inner = new KmvSketch(k)
  def zero: KmvState = inner.zero
  def reduce(b: KmvState, hash: String): KmvState = inner.reduce(b, hash)
  def merge(a: KmvState, b: KmvState): KmvState = inner.merge(a, b)
  def finish(r: KmvState): Seq[String] = r.hashes
  def bufferEncoder: Encoder[KmvState] = Encoders.product[KmvState]
  def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object KmvSketch {
  /** 16^15 = 2^60: the denominator mapping a 15-hex-digit prefix to [0,1). */
  val Scale: Double = 1152921504606846976.0

  private[functions] def isHex(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (!((c >= '0' && c <= '9') || (c >= 'a' && c <= 'f'))) return false
      i += 1
    }
    true
  }
}
