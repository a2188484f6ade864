package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q369 — the streaming KS drift monitor's final snapshot must equal
  * the batch q359 statistic BIT FOR BIT (counter-addition state is a
  * pure function of the event multiset), and the monitor must have
  * actually advanced across micro-batches (enforced inside the query
  * by the ≥3-data-batches require). */
class KsDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("stream final snapshot == batch q359, bit-exact") {
    val streamed = EventTime.qStreamingKs(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val batch = graft.operators.Stats.qKsTest(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.keySet.foreach { pair =>
      assert(streamed(pair) == batch(pair), s"pair $pair")
    }
  }
}
