package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q98 normalization impact, q99 FIM splits, q100 source quotas —
  * driver-side recomputation of each operator's contract (the gate
  * hash-checks them against DuckDB; these pin the semantics on raw
  * driver data so a same-wrong-answer-on-both-engines bug can't hide
  * behind the oracle). */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private lazy val docs = Tables.documents(spark, sf)
    .select("doc_id", "source", "text").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("q98: per-source collapse counts match a driver-side normalization") {
    val got = TextAnalysis.qNormalize(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val want = docs.groupBy(_._2).map { case (src, rows) =>
      val norms = rows.map(_._3).map(t => t.replaceAll("\\s+", " ").trim.toLowerCase)
      val shed = rows.map(_._3).zip(norms).map { case (t, n) => t.length - n.length }.sum
      src -> ((rows.length.toLong, norms.distinct.length.toLong, shed.toLong))
    }
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q99: PSM digest equals a driver-side prefix+suffix+middle reassembly") {
    val got = Pipeline.qFimSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))))
      .toMap
    docs.foreach { case (id, _, t) =>
      val k = t.length / 3
      val (p, m, s0) = (t.substring(0, k), t.substring(k, 2 * k), t.substring(2 * k))
      val (np, nm, ns, dig) = got(id)
      assert((np, nm, ns) == ((p.length, m.length, s0.length)), s"doc $id lengths")
      assert(dig == md5hex(p + s0 + m), s"doc $id psm digest")
    }
    assert(got.size == docs.length)
  }

  test("q100: at most K per source, dense ranks, deterministic across runs") {
    val rows = Pipeline.qSourceQuota(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val bySource = rows.groupBy(_._1)
    bySource.foreach { case (src, rs) =>
      assert(rs.length <= 20, s"$src over quota")
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length), s"$src ranks not dense")
    }
    // the hash ranking is deterministic: a second run returns the same set
    val again = Pipeline.qSourceQuota(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(rows.toSet == again.toSet)
    // and it matches the driver-side hash order per source
    bySource.foreach { case (src, rs) =>
      val expected = docs.filter(_._2 == src).map(_._1)
        .sortBy(id => (md5hex(id.toString), id)).take(20).toSeq
      assert(rs.sortBy(_._3).map(_._2).toSeq == expected, s"$src hash order")
    }
  }
}
