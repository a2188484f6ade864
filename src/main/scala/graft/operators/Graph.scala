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
}
