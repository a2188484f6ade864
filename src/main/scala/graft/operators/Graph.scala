package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relationship structures the relational
  * operators only touch pairwise — the engine family the reference
  * reaches through user-scripted multi-pass stream jobs, built here as
  * driver-paced iterative DataFrame plans (the q57 star-contraction
  * discipline: equi-shuffle rounds, `localCheckpoint` lineage
  * truncation, bounded driver state).
  */
object Graph {

  import Tables._

  /** q163: co-purchase PageRank — importance ranking of parts over the
    * "bought in the same order" graph (edge weight = number of shared
    * orders), the canonical recommendation/centrality primitive
    * (Brin & Page 1998; weighted variant). Random-surfer model with
    * damping d = 0.85 over the undirected weighted projection of the
    * order–part bipartite graph.
    *
    * Determinism at the bit level: ranks are integer PICORANKS (1e12 =
    * total initial mass). Each edge's contribution is the integer
    * `(r·w) div W(u)` (truncating division — identical everywhere),
    * per-node sums are exact long addition (order-invariant), and the
    * damping mix is `base + (85·Σ) div 100`. No float enters the
    * iteration, so the distributed result equals a sequential
    * reference EXACTLY (GraphSpec) — the same
    * no-transcendentals-in-the-ranking rule as q153/q151. Truncation
    * leaks ≤1 pico per in-edge per round — deterministic, and
    * irrelevant at rank scale.
    *
    * Scale shape: pair generation is an l_orderkey equi-self-join with
    * per-order fanout ≤ lines²  (TPC-H ≤ 7 lines/order ⇒ ≤ 21 pairs —
    * bounded, no blow-up); each iteration is ONE edge⋈rank equi-join +
    * a destination-keyed partial-agg sum — the textbook distributed
    * power iteration, `localCheckpoint` per round so lineage stays
    * flat. Driver state: one (count) scalar per round. At 100 TB the
    * edge table is the big operand; it partitions by source key and
    * never materializes on the driver. */
  def qCopurchaseRank(s: SparkSession, d: String, iters: Int = 15,
      topK: Int = 20): DataFrame = {
    val li = lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val pairs = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("u"), col("b.p").as("v"))
      .agg(count(lit(1)).as("w"))
    val edges = pairs
      .union(pairs.select(col("v").as("u"), col("u").as("v"), col("w")))
      .localCheckpoint()
    val wdeg = edges.groupBy("u")
      .agg(sum("w").as("wdeg"), count(lit(1)).as("deg"))
      .localCheckpoint()
    val n = wdeg.count()
    val init = 1000000000000L / n
    val base = 150000000000L / n // (1−d)·mass, d = 0.85
    var ranks = wdeg.select(col("u"), lit(init).as("r"))
    for (_ <- 1 to iters) {
      val contrib = edges.join(wdeg, "u").join(ranks, "u")
        .select(col("v"), expr("(r * w) div wdeg").as("c"))
        .groupBy("v").agg(sum("c").as("cin"))
      ranks = wdeg.select(col("u"))
        .join(contrib, col("u") === col("v"), "left")
        .select(col("u"),
          (lit(base) + expr("85L * coalesce(cin, 0L) div 100L")).as("r"))
        .localCheckpoint()
    }
    ranks.join(wdeg, "u")
      .orderBy(col("r").desc, col("u"))
      .limit(topK)
      .select(col("u").as("part"), col("deg").as("degree"),
        col("wdeg").as("weighted_degree"), col("r").as("rank_pico"))
  }

  /** q166: triangle census of the co-purchase graph — triangle count,
    * wedge count, and the global clustering coefficient 3T/W: how much
    * do parts bought with a common third part also get bought
    * together? The transitivity statistic that separates clustered
    * purchase communities from a hub-and-spoke catalog, and the
    * standard second graph metric beside centrality (q163).
    *
    * Scale shape: DEGREE-ORDERED orientation (Cohen 2009 / the
    * MapReduce triangle-counting standard): each undirected edge
    * points from its lower (degree, id) endpoint to the higher, so
    * every out-neighborhood is O(√m) on any graph (arboricity bound)
    * and the wedge self-join — the quadratic hazard — is bounded by
    * Σ d_out² = O(m^1.5) instead of hub-degree². A star catalog node
    * with a million neighbors generates ZERO wedges (all edges point
    * into it). Two equi-joins, all integer arithmetic; the clustering
    * ratio is one scalar IEEE division. The id-ordered DuckDB oracle
    * counts the same triangles by u<v<w triple join — orientation
    * changes the plan, never the census. */
  def qTriangleCensus(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val pairs = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v"))
      .distinct()
      .localCheckpoint()
    val deg = pairs.select(col("u").as("x"))
      .union(pairs.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    // orient each edge from lower (deg, id) to higher (deg, id)
    val withDeg = pairs
      .join(deg.select(col("x").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("x").as("v"), col("d").as("dv")), Seq("v"))
    val oriented = withDeg.select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("src"), col("v").as("dst"),
            col("dv").as("dd"), col("v").as("di")))
          .otherwise(struct(col("v").as("src"), col("u").as("dst"),
            col("du").as("dd"), col("u").as("di"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"),
        col("e.dd").as("dd"), col("e.di").as("di"))
      .localCheckpoint()
    // wedges from a common source, far endpoints in orientation order;
    // a wedge closes iff its (b, c) chord is itself an oriented edge
    val wedgeCand = oriented.as("e1").join(oriented.as("e2"),
        col("e1.src") === col("e2.src") &&
        (struct(col("e1.dd"), col("e1.di")) < struct(col("e2.dd"), col("e2.di"))))
      .select(col("e1.dst").as("src"), col("e2.dst").as("dst"))
    val triangles = wedgeCand.join(oriented.select("src", "dst"), Seq("src", "dst"))
      .count()
    val stats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("d * (d - 1) div 2")).as("wedges")).head()
    val nEdges = pairs.count()
    val nNodes = stats.getLong(0)
    val wedges = stats.getLong(1)
    import s.implicits._
    Seq((nNodes, nEdges, triangles, wedges,
      BigDecimal(3.0 * triangles / wedges)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("n_nodes", "n_edges", "n_triangles", "n_wedges", "clustering")
  }
}
