package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q163 co-purchase PageRank — the distributed integer power iteration
  * must equal a sequential driver-side reference EXACTLY (bit-level:
  * the whole iteration is integer arithmetic by design). */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("q163: distributed picorank equals the exact sequential reference") {
    // reference graph straight off the raw table
    val lp = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val pairW = lp.groupBy(_._1).values.flatMap { lines =>
      val parts = lines.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).map { case (e, v) => e -> v.size.toLong }
    val out = scala.collection.mutable.Map.empty[Long, List[(Long, Long)]]
      .withDefaultValue(Nil)
    pairW.foreach { case ((u, v), w) =>
      out(u) = (v, w) :: out(u); out(v) = (u, w) :: out(v)
    }
    val nodes = out.keys.toSeq.sorted
    val wdeg = nodes.map(u => u -> out(u).map(_._2).sum).toMap
    val n = nodes.length.toLong
    val init = 1000000000000L / n
    val base = 150000000000L / n
    var r = nodes.map(_ -> init).toMap
    for (_ <- 1 to 15) {
      val cin = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      nodes.foreach { u =>
        out(u).foreach { case (v, w) => cin(v) += (r(u) * w) / wdeg(u) }
      }
      r = nodes.map(u => u -> (base + 85L * cin(u) / 100L)).toMap
    }
    val wantTop = nodes.map(u => (u, r(u))).sortBy { case (u, rk) => (-rk, u) }
      .take(20)
      .map { case (u, rk) => (u, out(u).length.toLong, wdeg(u), rk) }

    val got = Graph.qCopurchaseRank(spark, sf).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)))
    assert(got.toSeq == wantTop)
    // sanity: mass is conserved up to deterministic truncation leakage
    val mass = r.values.sum
    assert(mass <= 1000000000000L && mass > 900000000000L)
  }

  test("q166: triangle census matches a driver-side adjacency-set count") {
    val lp = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val edges = lp.groupBy(_._1).values.flatMap { lines =>
      val parts = lines.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.toSet
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    edges.foreach { case (u, v) =>
      adj(u) = adj(u) + v; adj(v) = adj(v) + u
    }
    val tri = edges.toSeq.map { case (u, v) =>
      (adj(u) & adj(v)).count(_ > v).toLong
    }.sum
    val wedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    val row = Graph.qTriangleCensus(spark, TestSpark.sf).head()
    assert(row.getLong(0) == adj.size.toLong)
    assert(row.getLong(1) == edges.size.toLong)
    assert(row.getLong(2) == tri)
    assert(row.getLong(3) == wedges)
    assert(tri > 0 && wedges > 0)
  }
}
