package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions._

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("q134 cluster-size histogram buckets components with their doc mass") {
    import spark.implicits._
    // cluster {1,2} (size 2), singleton {3}, cluster {4,5,6} (size 3 ->
    // bucket 4)
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "one two three"),
      (4L, "p q r s t"),
      (5L, "p q r s t u"),
      (6L, "p q r s t u v")).toDF("doc_id", "text")
    val got = Dedup.clusterSizeHistogram(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((1L, 1L)), 2L -> ((1L, 2L)), 4L -> ((1L, 3L))))
  }

  test("q128 keep-best retains the LONGEST cluster member, not the min id") {
    import spark.implicits._
    // docs 1,2 are bigram near-dups (Jaccard 3/5 = 0.6); doc 2 is longer,
    // so keep-longest must pick it even though doc 1 has the lower id.
    // doc 3 is an unrelated singleton and survives.
    val docs = Seq(
      (1L, "s", 22L, "alpha beta gamma delta"),
      (2L, "s", 35L, "alpha beta gamma delta epsilon zeta"),
      (3L, "s", 13L, "one two three")).toDF("doc_id", "source", "n_chars", "text")
    val r = Dedup.dedupKeepBest(docs).collect().head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      (("s", 3L, 2L, 35L + 13L)))
  }

  test("exact dedup counts distinct digests") {
    val r = Dedup.qExact(spark, sf).collect().head
    assert(r.getAs[Long]("n_docs") == 500)
    assert(r.getAs[Long]("n_unique") == 500) // generator produces no exact dups
  }

  test("minhash LSH: perfect precision, high recall vs brute-force Jaccard") {
    val docs = Tables.documents(spark, sf).limit(200)
    val threshold = 0.7
    val got = Dedup.minhashPairs(docs, "text", "doc_id", threshold = threshold)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // brute force ground truth over all pairs
    val sh = docs.select(col("doc_id").as("id"), shingleSet(col("text"), 2).as("sh"))
    val truth = sh.as("a").join(sh.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        round(jaccard(col("a.sh"), col("b.sh")), 4).as("jac"))
      .filter(col("jac") >= threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // precision is exact (candidates are verified with true Jaccard)
    got.keys.foreach(k => assert(truth.contains(k), s"false positive $k"))
    // recall: 16 bands x 4 rows at j>=0.7 → P(miss) <= (1-0.7^4)^16 ~ 0.9%
    val recall = if (truth.isEmpty) 1.0 else got.size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall (got ${got.size} of ${truth.size})")
    // values agree where both found the pair
    got.foreach { case (k, j) => assert(math.abs(truth(k) - j) < 1e-9) }
  }

  test("simhash bucketing finds every pair within Hamming distance 3 (pigeonhole)") {
    val docs = Tables.documents(spark, sf).limit(300)
    val got = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    GraftFunctions.register(spark)
    val hashed = docs.select(col("doc_id").as("id"), simhash64(tokens(col("text"))).as("sh"))
    val truth = hashed.as("a").join(hashed.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        hamming64(col("a.sh"), col("b.sh")).as("d"))
      .filter(col("d") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // 4 quadrants of 16 bits: d<=3 guarantees one quadrant matches
    assert(got == truth)
  }

  test("simhash bucketing is complete at maxHamming=6 (7 bands)") {
    val docs = Tables.documents(spark, sf).limit(300)
    val got = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 6)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    GraftFunctions.register(spark)
    val hashed = docs.select(col("doc_id").as("id"), simhash64(tokens(col("text"))).as("sh"))
    val truth = hashed.as("a").join(hashed.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        hamming64(col("a.sh"), col("b.sh")).as("d"))
      .filter(col("d") <= 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // 7 bands: a pair differing in <=6 bits leaves one band untouched
    assert(got == truth)
  }

  test("id-window pair queries plan as equi-joins, not nested loop (scale contract)") {
    Seq(Dedup.qNgramJaccard(spark, sf), Dedup.qEmbeddingNearDup(spark, sf)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"id-window pairs must bucket-equi-join:\n$plan")
    }
  }

  test("bucketed id-window join equals the pure range join") {
    val e = Tables.embeddings(spark, sf)
    import org.apache.spark.sql.functions.col
    val a = e.select(col("vec_id").as("vec_a"))
    val b = e.select(col("vec_id").as("vec_b"))
    val want = a.join(b, col("vec_b") > col("vec_a") && col("vec_b") <= col("vec_a") + 128)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.qEmbeddingNearDup(spark, sf, threshold = -1.0) // keep all pairs
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("simhash is deterministic and order-sensitive only to multiset") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      ("a", Seq("x", "y", "z")),
      ("b", Seq("z", "y", "x")), // same multiset, different order
      ("c", Seq("completely", "different", "tokens", "here"))
    ).toDF("id", "toks").select(col("id"), simhash64(col("toks")).as("sh"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("a") == m("b"))
    assert(m("a") != m("c"))
  }

  test("embedding LSH near-dup: subset of the exact answer, decent recall") {
    // exact answer over the full pair space at this threshold
    val e = Tables.embeddings(spark, sf)
    val all = e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
      .crossJoin(e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        cosineSimilarity(col("emb_a"), col("emb_b")).as("cos"))
      .filter(col("cos") >= 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.qEmbeddingLshNearDup(spark, sf)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(all), "LSH produced a pair below threshold")
    assert(all.isEmpty || got.size.toDouble / all.size >= 0.15,
      s"recall ${got.size}/${all.size} below floor")
  }

  test("survivor selection: kept = corpus minus dominated docs, and something is actually dropped") {
    val spark = graft.TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val total = Tables.documents(spark, sf).count()
    val dominated = Dedup.qNgramJaccard(spark, sf)
      .select("doc_b").distinct().collect().map(_.getLong(0)).toSet
    val kept = Dedup.qDedupKeep(spark, sf).agg(
      org.apache.spark.sql.functions.sum("n_kept")).collect().head.getLong(0)
    assert(dominated.nonEmpty, "test data should contain near-dup pairs")
    assert(kept == total - dominated.size,
      s"kept $kept != $total - ${dominated.size}")
    // no kept doc is the higher id of any qualifying pair
    val keptIds = Tables.documents(spark, sf)
      .join(Dedup.qNgramJaccard(spark, sf).select(
        org.apache.spark.sql.functions.col("doc_b").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds.intersect(dominated).isEmpty)
  }

  /** cutoff 0 forces pure distributed star-contraction (no driver
    * union-find tail) so the algorithm itself is what converges. */
  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.connectedComponents(edges.toDF("u", "v"), driverCutoff = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("connected components: multi-hop chain merges into one component") {
    // a 64-node path exercises the O(log n) star contraction across
    // several rounds (min-propagation would need 63)
    val path = (0L until 63L).map(i => (i, i + 1))
    val got = ccOf(path)
    assert(got.size == 64 && got.values.toSet == Set(0L))
  }

  test("connected components: disjoint structures keep distinct roots") {
    //  triangle {1,2,3} + star rooted high {10;11,12,13} + pair {20,21}
    val got = ccOf(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (13L, 10L), (13L, 11L), (13L, 12L), (21L, 20L)))
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(Set(10L, 11L, 12L, 13L).forall(got(_) == 10L))
    assert(got(20L) == 20L && got(21L) == 20L)
  }

  test("connected components: empty and self-loop-only edge sets") {
    import spark.implicits._
    assert(Dedup.connectedComponents(Seq.empty[(Long, Long)].toDF("u", "v")).isEmpty)
    assert(Dedup.connectedComponents(Seq((5L, 5L)).toDF("u", "v")).isEmpty)
  }

  test("connected components: driver union-find tail equals pure distributed") {
    import spark.implicits._
    // mixed structure crossing the two code paths
    val edges = (0L until 40L).map(i => (i, i + 1)) ++ // path
      Seq((100L, 101L), (101L, 102L), (100L, 102L)) ++ // triangle
      Seq((200L, 300L))
    val viaTail = Dedup.connectedComponents(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaStars = ccOf(edges)
    assert(viaTail == viaStars)
  }

  test("q57 components match driver-side union-find on the same pairs") {
    val pairs = Dedup.qNgramJaccard(spark, sf, window = 64, threshold = 0.1)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "test data should produce near-dup edges")
    // driver-side union-find ground truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = parent.keys.map(k => k -> find(k)).toMap
    val got = Dedup.qDedupComponents(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = Tables.documents(spark, sf).count()
    assert(got.size == total)
    truth.foreach { case (n, r) => assert(got(n) == r, s"node $n: ${got(n)} != $r") }
    // every doc not in any pair is its own singleton component
    got.foreach { case (n, c) => if (!truth.contains(n)) assert(c == n) }
  }

  test("split leakage (q92): crossing pairs counted, leaky valid docs identified") {
    import spark.implicits._
    val dup = "alpha beta gamma delta epsilon zeta"
    // ids 0-7 -> train, 8-9 -> valid under the doc_id % 10 < 8 rule:
    //  (1, 3): within-train dup; (4, 8): TRAIN-VALID dup (leak);
    //  9: valid, unique; the rest unique filler
    val docs = Seq(
      0L -> "u0 a b c", 1L -> dup, 2L -> "u2 d e f", 3L -> dup,
      4L -> s"$dup extra", 5L -> "u5 g h i", 6L -> "u6 j k l",
      7L -> "u7 m n o", 8L -> s"$dup extra", 9L -> "u9 p q r"
    ).toDF("doc_id", "text")
    val r = Dedup.splitLeakage(docs).head()
    assert(r.getLong(0) == 8 && r.getLong(1) == 2) // split sizes
    // pairs: (1,3) and (4,8) are exact (jaccard 1.0); (1,4)/(3,4)/
    // (1,8)/(3,8) share 5 of 6 distinct bigrams (0.833) -> 6 total
    assert(r.getLong(2) == 6, s"pairs: ${r.getLong(2)}")
    // crossing: (4,8), (1,8), (3,8)
    assert(r.getLong(3) == 3, s"crossing: ${r.getLong(3)}")
    // one distinct compromised valid doc: 8
    assert(r.getLong(4) == 1, s"leaky valid: ${r.getLong(4)}")
  }

  test("q101: cluster-consistent split — zero crossings where the naive split leaks") {
    import spark.implicits._
    // cluster {1, 8}: identical text, chosen so the NAIVE per-doc split
    // (doc_id % 10 < 8, q92's device) puts them on OPPOSITE sides;
    // cluster {10, 11}: identical; 20 and 28 are singletons
    val docs = Seq(
      (1L, "alpha beta gamma delta", "s1"),
      (8L, "alpha beta gamma delta", "s2"),
      (10L, "epsilon zeta eta theta", "s1"),
      (11L, "epsilon zeta eta theta", "s1"),
      (20L, "iota kappa lambda mu", "s1"),
      (28L, "nu xi omicron pi", "s2")
    ).toDF("doc_id", "text", "source")
    val assign = Dedup.leakageSafeSplitAssign(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // planted clusters resolved; singletons distinct
    assert(assign(1L)._1 == assign(8L)._1)
    assert(assign(10L)._1 == assign(11L)._1)
    assert(Set(assign(1L)._1, assign(10L)._1, assign(20L)._1, assign(28L)._1).size == 4)
    // the invariant: same cluster, same side — no near-dup pair crosses
    assert(assign(1L)._2 == assign(8L)._2)
    assert(assign(10L)._2 == assign(11L)._2)
    // while the naive per-doc split DOES cross on the {1, 8} cluster
    assert((1L % 10 < 8) != (8L % 10 < 8))
  }

  test("q101/q103 on the corpus: assignments reconcile and weights sum to cluster count") {
    val docs = Tables.documents(spark, sf)
    val assign = Dedup.leakageSafeSplitAssign(docs)
    // no component straddles the split (the defining invariant)
    assert(assign.groupBy("component")
      .agg(countDistinct("split").as("k")).filter(col("k") > 1).count() == 0)
    // gate output reconciles: doc total and the ~80/20 shape
    val out = Dedup.qLeakageSafeSplit(spark, sf).collect()
    assert(out.map(_.getLong(2)).sum == 500)
    val bySplit = out.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(bySplit("train") > bySplit("valid") && bySplit("valid") > 0)
    // soft-dedup weights: each cluster contributes total weight 1, so
    // the corpus-wide effective size (in exact picoweights) equals the
    // number of clusters up to the per-cluster floor residue of
    // 1e12 div csize (< csize picoweights per cluster)
    val nClusters = assign.select("component").distinct().count()
    val effPico = Dedup.qSoftDedup(spark, sf).collect()
      .map(_.getLong(2)).sum
    assert(math.abs(effPico / 1e12 - nClusters) < 0.01,
      s"effective ${effPico / 1e12} vs clusters $nClusters")
  }

  test("q108: band histogram reconciles exactly with the pair list") {
    val pairs = Dedup.qNgramJaccard(spark, sf, 64, 0.1).collect()
      .map(_.getDouble(2))
    val expected = pairs.groupBy(j => math.floor(j * 10) / 10)
      .view.mapValues(_.length.toLong).toMap
    val got = Dedup.qJaccardBands(spark, sf).collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got == expected, s"bands $got vs driver $expected")
    assert(got.values.sum == pairs.length)
  }

  test("q103a/q103b: bisection rows reconcile exactly with q103") {
    // the r9 diagnostic decomposition must agree with the combined
    // q103 output column-for-column on the same corpus
    val full = Dedup.qSoftDedup(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val counts = Dedup.qSoftDedupCounts(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val pico = Dedup.qSoftDedupPico(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == full.keySet && pico.keySet == full.keySet)
    full.foreach { case (src, (nDocs, effPico, nInClusters)) =>
      assert(counts(src)._1 == nDocs, s"$src n_docs")
      assert(counts(src)._2 == nInClusters, s"$src n_in_clusters")
      // n_components per source is bounded by n_docs and at least
      // n_docs - n_in_clusters (each unclustered doc is its own comp)
      assert(counts(src)._3 <= nDocs && counts(src)._3 >= nDocs - nInClusters)
      assert(pico(src) == effPico, s"$src effective_docs_pico")
    }
  }

  test("q103: weights are 1/cluster-size on crafted clusters") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta", "s1"),
      (2L, "alpha beta gamma delta", "s1"),
      (3L, "alpha beta gamma delta", "s2"),
      (20L, "iota kappa lambda mu", "s1")
    ).toDF("doc_id", "text", "source")
    val w = Dedup.softDedupWeights(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("csize")).toMap
    assert(w == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 20L -> 1L))
  }
}
