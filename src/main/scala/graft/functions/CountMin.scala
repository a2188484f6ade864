package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch state: a depth×width counter matrix (flattened)
  * plus the processed-item count (the error bound's scale). */
case class CMSState(counts: Array[Long], n: Long)

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a typed Spark
  * [[Aggregator]] — the frequency-CEILING twin of [[MisraGries]]'s
  * floor: point estimates obey true ≤ est ≤ true + (e/width)·n with
  * probability 1 − e^−depth, over an UNBOUNDED item domain in
  * depth·width counters forever.
  *
  * Unlike MG (whose estimates are merge-order-dependent inside the ε
  * band), CMS is a LINEAR sketch: merge is elementwise counter
  * addition, so the merged matrix — and every estimate read from it —
  * is bit-identical under any partitioning or merge order
  * (CountMinSpec asserts repartition-invariance). Row hashes are
  * MurmurHash3 over the item with the row index as seed — pure
  * arithmetic, identical on every JVM.
  *
  * Scale shape: the shuffle carries one depth×width matrix per
  * partition (a few KB) regardless of data size — the same bounded
  * gather as KMV/MG/bloom; at 100 TB the alternative exact frequency
  * table is a vocabulary-sized exchange. */
class CountMin(depth: Int = 4, width: Int = 1024)
    extends Aggregator[String, CMSState, CMSState] {
  require(depth >= 1 && width >= 1, "depth and width must be positive")

  def zero: CMSState = CMSState(new Array[Long](depth * width), 0L)

  def reduce(b: CMSState, item: String): CMSState = {
    var i = 0
    while (i < depth) {
      b.counts(i * width + CountMin.bucket(item, i, width)) += 1
      i += 1
    }
    CMSState(b.counts, b.n + 1)
  }

  def merge(a: CMSState, b: CMSState): CMSState = {
    val out = new Array[Long](depth * width)
    var i = 0
    while (i < out.length) { out(i) = a.counts(i) + b.counts(i); i += 1 }
    CMSState(out, a.n + b.n)
  }

  def finish(r: CMSState): CMSState = r

  def bufferEncoder: Encoder[CMSState] = Encoders.product[CMSState]
  def outputEncoder: Encoder[CMSState] = Encoders.product[CMSState]
}

object CountMin {
  /** Row-`seed` bucket of `item` — MurmurHash3 string hash, made
    * non-negative before the mod. */
  private[graft] def bucket(item: String, seed: Int, width: Int): Int = {
    val h = scala.util.hashing.MurmurHash3.stringHash(item, seed)
    ((h % width) + width) % width
  }

  /** Point estimate: the minimum of the item's `depth` counters. */
  def estimate(state: CMSState, item: String, depth: Int = 4,
      width: Int = 1024): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = state.counts(i * width + bucket(item, i, width))
      if (c < best) best = c
      i += 1
    }
    best
  }
}
