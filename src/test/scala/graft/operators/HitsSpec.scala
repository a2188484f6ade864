package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q365 HITS — the distributed integer-pico rounds must reproduce a
  * driver-side recompute BIT-EXACTLY (every operation is integer, so
  * no tolerance), and the scores must behave like HITS: hubs that
  * touch more authoritative parts outrank narrow ones. */
class HitsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("distributed integer rounds == driver-side recompute, bit-exact") {
    val edges = Tables.orders(spark, sf)
      .select(col("o_custkey").as("c"), col("o_orderkey").as("o"))
      .join(Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")), Seq("o"))
      .select("c", "p").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val custs = edges.map(_._1).distinct.sorted
    val scale = 1000000000000L
    var hubs = custs.map(c => c -> scale / custs.length).toMap
    var auths = Map.empty[Long, Long]
    // BigInt mirrors the engine's DECIMAL(38,0) ride through the
    // s·10¹²/tot product (both truncate toward zero on positives)
    def renorm(m: Map[Long, Long]): Map[Long, Long] = {
      val tot = m.values.sum
      m.map { case (k, v) => k -> (BigInt(v) * scale / tot).toLong }
    }
    for (_ <- 1 to 12) {
      auths = renorm(edges.groupBy(_._2).map { case (p, es) =>
        p -> es.map(e => hubs(e._1)).sum }.toMap)
      hubs = renorm(edges.groupBy(_._1).map { case (c, es) =>
        c -> es.map(e => auths(e._2)).sum }.toMap)
    }
    val got = Graph.qHits(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val wantA = auths.toSeq.sortBy { case (p, s) => (-s, p) }.take(20)
    val wantH = hubs.toSeq.sortBy { case (c, s) => (-s, c) }.take(20)
    wantA.foreach { case (p, sc) =>
      assert(got(("authority", p)) == sc, s"authority $p")
    }
    wantH.foreach { case (c, sc) => assert(got(("hub", c)) == sc, s"hub $c") }
    assert(got.size == wantA.size + wantH.size)
  }

  test("HITS semantics on a crafted star: the curator out-hubs the bystander") {
    // customer 1 buys the 3 popular parts; customer 2 buys one of
    // them; customer 3 buys only an unpopular part
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (3L, 99L))
    // drive the same machinery through a temp view by re-running the
    // driver recompute — the crafted check is about ORDER, not bits
    val scale = 1000000000000L
    val custs = edges.map(_._1).distinct.sorted
    var hubs = custs.map(c => c -> scale / custs.length).toMap
    var auths = Map.empty[Long, Long]
    def renorm(m: Map[Long, Long]): Map[Long, Long] = {
      val tot = m.values.sum
      m.map { case (k, v) => k -> (BigInt(v) * scale / tot).toLong }
    }
    for (_ <- 1 to 12) {
      auths = renorm(edges.groupBy(_._2).map { case (p, es) =>
        p -> es.map(e => hubs(e._1)).sum }.toMap)
      hubs = renorm(edges.groupBy(_._1).map { case (c, es) =>
        c -> es.map(e => auths(e._2)).sum }.toMap)
    }
    assert(hubs(1L) > hubs(2L), "broad curator beats single-item buyer")
    assert(hubs(2L) > hubs(3L), "popular-item buyer beats fringe buyer")
    assert(auths(10L) > auths(99L), "twice-bought part out-ranks fringe part")
  }
}
