package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary state: at most `m` counters plus
  * the processed-item count (the error bound's denominator). */
case class MGSummary(counters: Map[String, Long], n: Long)

/** Misra–Gries heavy hitters (Misra & Gries 1982) as a typed Spark
  * [[Aggregator]] — the genuinely-custom-UDAF case: a MERGEABLE
  * per-partition summary Spark has no built-in for (`freqItems` reports
  * candidates without counts; exact top-k — q55 — shuffles the whole
  * token table). Each partition folds its items into ≤ m counters;
  * partition summaries merge by counter addition followed by
  * subtracting the (m+1)-th largest value (Agarwal et al., "Mergeable
  * Summaries", PODS'12), which preserves the sketch's guarantee:
  *
  *  - every item with true count > n/m is PRESENT in the summary;
  *  - every reported estimate c satisfies true − n/m ≤ c ≤ true.
  *
  * Scale shape: the shuffle carries m counters per partition instead
  * of the full item domain — at 100 TB that is the difference between
  * a bounded gather and a vocabulary-sized exchange. Estimates are
  * merge-order-dependent within the ε band, so q76 is rows-only in the
  * gate; HeavyHittersSpec pins both guarantees against exact counts. */
class MisraGries(m: Int) extends Aggregator[String, MGSummary, Seq[(String, Long)]] {
  require(m >= 1, "m must be positive")

  def zero: MGSummary = MGSummary(Map.empty, 0L)

  def reduce(b: MGSummary, item: String): MGSummary = {
    val c = b.counters
    if (c.contains(item)) MGSummary(c.updated(item, c(item) + 1), b.n + 1)
    else if (c.size < m) MGSummary(c.updated(item, 1L), b.n + 1)
    else {
      // classic decrement-all step; zeroed counters drop out
      val dec = c.collect { case (k, v) if v > 1 => k -> (v - 1) }
      MGSummary(dec, b.n + 1)
    }
  }

  def merge(a: MGSummary, b: MGSummary): MGSummary = {
    val sum = (a.counters.keySet ++ b.counters.keySet).iterator.map { k =>
      k -> (a.counters.getOrElse(k, 0L) + b.counters.getOrElse(k, 0L))
    }.toMap
    val merged =
      if (sum.size <= m) sum
      else {
        // subtract the (m+1)-th largest counter, keep positives — the
        // mergeable-summaries step that caps the size at m without
        // weakening the n/m bound
        val sub = sum.values.toSeq.sorted(Ordering[Long].reverse).apply(m)
        sum.collect { case (k, v) if v > sub => k -> (v - sub) }
      }
    MGSummary(merged, a.n + b.n)
  }

  def finish(r: MGSummary): Seq[(String, Long)] =
    r.counters.toSeq.sortBy { case (k, v) => (-v, k) }

  def bufferEncoder: Encoder[MGSummary] = Encoders.product[MGSummary]
  def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}

/** The SEQUENTIAL Misra–Gries fold shared by the q345 stream/batch
  * parity pair — the literal per-item update over Long item ids
  * (present → +1; room → insert 1; full → decrement all, drop
  * zeros). Unlike [[MisraGries]]'s mergeable-summary algebra (whose
  * result is merge-order-dependent within the ε band), this fold is
  * fully DETERMINISTIC under a fixed arrival order, which is what a
  * bit-exact parity needs. */
object MisraGriesFold {
  def update(buf: scala.collection.mutable.Map[Long, Long], item: Long,
      m: Int): Unit = {
    if (buf.contains(item)) buf(item) += 1
    else if (buf.size < m) buf(item) = 1L
    else {
      val ks = buf.keys.toArray
      ks.foreach { k =>
        val nv = buf(k) - 1
        if (nv == 0L) buf.remove(k) else buf(k) = nv
      }
    }
  }
}
