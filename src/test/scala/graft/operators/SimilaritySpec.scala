package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions._

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("cosine similarity column matches a driver-side computation") {
    val rows = Tables.embeddings(spark, sf).limit(10)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val (idA, a) = rows(0)
    val (idB, b) = rows(1)
    def cosine(x: Array[Float], y: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < x.length) {
        dot += x(i).toDouble * y(i).toDouble
        nx += x(i).toDouble * x(i).toDouble
        ny += y(i).toDouble * y(i).toDouble
        i += 1
      }
      dot / math.sqrt(nx * ny)
    }
    import spark.implicits._
    val got = Seq((a.toSeq, b.toSeq)).toDF("x", "y")
      .select(cosineSimilarity(col("x"), col("y"))).collect().head.getDouble(0)
    assert(math.abs(got - cosine(a, b)) < 1e-12, s"$idA vs $idB")
  }

  test("brute-force top-k: ranks agree with a driver-side sort") {
    val topk = Similarity.qBruteForceTopK(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
    assert(topk.keySet == Set(0L, 1L, 2L, 3L, 4L))
    topk.values.foreach { rows =>
      assert(rows.length == 10)
      val ranked = rows.sortBy(_.getAs[Int]("rank"))
      val cosines = ranked.map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (x, y) => x >= y },
        "cosine not non-increasing with rank")
    }
  }

  test("q260: CV accuracy matches a driver-side leave-fold-out recompute") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def fold(id: Long): Int = {
      md.reset()
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 4), 16) % 5
    }
    val vs = Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getAs[scala.collection.Seq[Float]](2).map(_.toDouble).toArray,
        fold(r.getLong(0))))
    val dims = vs.head._3.length
    // leave-fold-out centroids from (label, fold) partial sums
    val totals = vs.groupBy(_._2).map { case (l, g) =>
      l -> (g.length, Array.tabulate(dims)(d => g.map(_._3(d)).sum))
    }
    val byLf = vs.groupBy(v => (v._2, v._4)).map { case (k, g) =>
      k -> (g.length, Array.tabulate(dims)(d => g.map(_._3(d)).sum))
    }
    def centroid(label: Int, f: Int): Array[Double] = {
      val (nl, tot) = totals(label)
      val (nlf, sf) = byLf.getOrElse((label, f), (0, new Array[Double](dims)))
      Array.tabulate(dims)(d => (tot(d) - sf(d)) / (nl - nlf))
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dims) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val labels = totals.keys.toSeq.sorted
    val want = vs.groupBy(_._4).map { case (f, g) =>
      val cents = labels.map(l => l -> centroid(l, f)).toMap
      val correct = g.count { case (_, l, e, _) =>
        labels.minBy(c => (-cos(e, cents(c)), c)) == l
      }
      f -> (g.length.toLong, correct.toLong)
    }
    val got = Similarity.qCvCentroid(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (f, (n, nc, acc)) =>
      assert(n == want(f)._1, s"fold $f n")
      assert(nc == want(f)._2, s"fold $f correct")
      assert(acc == nc * 1000000L / n, s"fold $f acc_ppm")
    }
    assert(got.values.map(_._1).sum == vs.length.toLong)
  }

  test("q266: IVF-served hard negatives — label-clean, recall floor, full-probe ceiling") {
    val exact = Similarity.qHardNegatives(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("negative")).toSet }
    val ivf = Similarity.qHardNegativesIvf(spark, sf).collect()
    val labels = Tables.embeddings(spark, sf).select("vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    ivf.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      assert(rows.length == 10, s"query $q row count")
      rows.foreach { r =>
        assert(r.getAs[Int]("neg_label") != r.getAs[Int]("q_label"))
        assert(labels(r.getAs[Long]("negative")) == r.getAs[Int]("neg_label"))
      }
      // probabilistic leg: at nprobe=3 most of the exact negatives
      // should be found (q192's recall profile)
      val overlap = rows.map(_.getAs[Long]("negative")).toSet
        .intersect(exact(q)).size
      assert(overlap >= 5, s"query $q recall $overlap/10 too low")
    }
    // probing every cell makes the candidate set the full corpus: the
    // top-k must then match the exact miner per query (set compare —
    // the IVF leg re-ranks on round-4 cosine, so boundary order may
    // differ but membership may not beyond rounding ties)
    val full = Similarity.qHardNegativesIvf(spark, sf, nprobe = 1000)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("negative")).toSet }
    full.foreach { case (q, got) =>
      assert(got.intersect(exact(q)).size >= 9, s"query $q full-probe overlap")
    }
  }

  test("q254: hard negatives equal a driver-side different-label top-k") {
    val embs = Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getAs[scala.collection.Seq[Float]](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      val n = math.sqrt(na) * math.sqrt(nb)
      if (n == 0) 0.0 else d / n
    }
    val queries = embs.filter(_._1 < 5)
    val want = queries.map { case (qid, qlab, qv) =>
      qid -> embs.filter(_._2 != qlab)
        .map { case (vid, lab, v) => (vid, lab, cos(qv, v)) }
        .sortBy { case (vid, _, c) => (-c, vid) }
        .take(10)
    }.toMap
    val got = Similarity.qHardNegatives(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
    assert(got.keySet == want.keySet)
    got.foreach { case (qid, rows) =>
      val ranked = rows.sortBy(_.getAs[Int]("rank"))
      assert(ranked.map(_.getAs[Long]("negative")).toSeq ==
        want(qid).map(_._1).toSeq, s"query $qid ids")
      ranked.zip(want(qid)).foreach { case (r, (_, lab, c)) =>
        assert(r.getAs[Int]("neg_label") == lab)
        assert(r.getAs[Int]("neg_label") != r.getAs[Int]("q_label"))
        assert(math.abs(r.getAs[Double]("cosine") - c) < 1e-4)
      }
    }
  }

  test("LSH top-k: every reported neighbor has its true cosine; recall floor") {
    val brute = Similarity.qBruteForceTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor")) ->
        r.getAs[Double]("cosine")).toMap
    val lsh = Similarity.qLshTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor")) ->
        r.getAs[Double]("cosine")).toMap
    // any LSH (query, neighbor) also found by brute force must agree on value
    lsh.foreach { case (k, v) =>
      brute.get(k).foreach(bv => assert(math.abs(bv - v) < 1e-9)) }
    // recall@10 across the 5 queries — multi-probe multi-table LSH on
    // random vectors is probabilistic; pin a conservative floor (the
    // measured recall is ~0.6; single-probe was ~0.2)
    val hits = lsh.keys.count(brute.contains)
    assert(hits.toDouble / brute.size >= 0.4, s"recall@10 ${hits}/${brute.size}")
  }

  test("IVF top-k: exact cosines, recall floor, and candidate restriction to probed cells") {
    val brute = Similarity.qBruteForceTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor")) ->
        r.getAs[Double]("cosine")).toMap
    val ivf = Similarity.qIvfTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor")) ->
        r.getAs[Double]("cosine")).toMap
    // exactness: any (query, neighbor) both find must agree on the cosine
    ivf.foreach { case (k, v) =>
      brute.get(k).foreach(bv => assert(math.abs(bv - v) < 1e-9)) }
    // probing 3 of 10 cells on random vectors: conservative recall floor
    val hits = ivf.keys.count(brute.contains)
    assert(hits.toDouble / brute.size >= 0.1, s"recall@10 ${hits}/${brute.size}")
    // every query still returns a full top-k (cells hold enough candidates)
    assert(ivf.keys.groupBy(_._1).forall(_._2.size == 10))
  }

  test("IVF training spends no job counting the corpus") {
    val offending = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        j.stageInfos.foreach { si =>
          if (si.name.startsWith("count at Similarity")) offending.add(si.name)
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Similarity.qIvfTopK(spark, sf).collect()
      // listener bus is async; give queued job-start events time to drain
      Thread.sleep(1000)
      assert(offending.isEmpty, s"corpus-count job observed: $offending")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("label centroid aggregate covers all labels") {
    val rows = Similarity.qLabelCentroids(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("label")).toSet == (0 to 9).toSet)
    assert(rows.map(_.getAs[Long]("n")).sum == 500)
  }

  test("SQ8 top-k: high recall vs exact float, bounded cosine error") {
    val exact = Similarity.qBruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val quant = Similarity.qSq8TopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    // recall@10: quantization may only reorder near-ties
    val recall = quant.keys.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.9, s"SQ8 recall@10 $recall below floor")
    // where both agree on a neighbor, the quantized cosine is close
    quant.foreach { case (k, c) =>
      exact.get(k).foreach(e => assert(math.abs(e - c) <= 0.03,
        s"quantized cosine off by ${math.abs(e - c)} for $k"))
    }
  }

  test("SQ8 codes are genuine int8 with per-vector scale") {
    import org.apache.spark.sql.functions._
    val q = Similarity.quantizeSq8(
      Tables.embeddings(spark, sf).select("vec_id", "embedding"), "embedding")
    val schema = q.schema("q8").dataType
    assert(schema == org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.ByteType, containsNull = false) ||
      schema.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType ==
        org.apache.spark.sql.types.ByteType)
    // max reconstruction error per element is scale/2
    val bad = q.select(max(expr(
      "aggregate(zip_with(embedding, q8, (x, b) -> abs(x - b * scale)), " +
        "0D, (acc, v) -> greatest(acc, v)) - scale / 2")).as("worst"))
      .head().getDouble(0)
    assert(bad <= 1e-9, s"element error exceeds scale/2 by $bad")
  }

  test("persisted IVF index: results match the in-query IVF path bit for bit") {
    // both paths fit the same seeded KMeans on the same bounded train
    // set, so the codebook — and therefore probing and ranking — agree
    val fresh = Similarity.qIvfTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val fromIndex = Similarity.qIvfFromIndex(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(fromIndex == fresh)
    assert(fresh.nonEmpty)
  }

  test("persisted IVF index: the assignments scan reads only probed cell directories") {
    val indexDir = Similarity.ivfIndexDir(spark, sf)
    val queries = Tables.embeddings(spark, sf).filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val result = Similarity.ivfSearchFromIndex(spark, indexDir, queries, nprobe = 2)
    result.collect() // materialize so AQE settles on its final plan
    // AQE wraps materialized stages as leaf nodes, so a flat collect
    // misses their scans — descend through the stage wrappers
    def allScans(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(allScans)
    }
    val scans = allScans(result.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("assignments")))
    assert(scans.nonEmpty, "no file scan over the assignments table")
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "cell")),
      s"no partition filter on cell: ${scan.partitionFilters}")
    val selected = scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .map(_.values.getInt(0)).distinct
    val total = spark.read.parquet(s"$indexDir/assignments")
      .select("cell").distinct().count()
    assert(selected.length < total,
      s"probing read every cell directory (${selected.length} of $total)")
    // the pruned search still returns k results per query
    assert(result.groupBy("query_id").count().collect().forall(_.getLong(1) == 10))
  }

  test("PQ top-k: recall vs exact L2, and ADC distances approximate true distances") {
    val k = 10
    val got = Similarity.qPqTopK(spark, sf, k = k).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.nonEmpty)
    // exact L2 neighbors, driver-side
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val queries = vecs.keys.filter(_ < 5)
    var recallHits = 0
    queries.foreach { q =>
      val truth = vecs.keys.filter(_ != q).toSeq
        .sortBy(v => (d2(vecs(q), vecs(v)), v)).take(k).toSet
      val mine = got.filter(_._1 == q).map(_._2).toSet
      assert(mine.size == k)
      recallHits += mine.intersect(truth).size
    }
    val recall = recallHits.toDouble / (queries.size * k)
    assert(recall >= 0.4, f"PQ recall@10 $recall%.2f below floor 0.4")
    // ADC is an approximation of the true squared distance, not noise:
    // mean relative error over reported pairs stays bounded
    val relErrs = got.map { case (q, v, adc, _) =>
      val truthD2 = d2(vecs(q), vecs(v))
      math.abs(adc - truthD2) / math.max(truthD2, 1e-12)
    }
    val meanRelErr = relErrs.sum / relErrs.length
    assert(meanRelErr < 0.5, f"mean ADC relative error $meanRelErr%.3f too large")
    // the re-rank column is the exact distance (bit-parity with driver math)
    got.foreach { case (q, v, _, reported) =>
      assert(math.abs(reported - d2(vecs(q), vecs(v))) < 1e-3,
        s"re-ranked d2 for ($q,$v) diverges from exact")
    }
  }

  test("persisted PQ index: results match the in-query PQ path bit for bit") {
    // both paths fit the same seeded sub-codebooks on the same bounded
    // train slice (buildPqIndex shares qPqTopK's helpers), and parquet
    // round-trips the centroid doubles exactly, so LUTs, ADC distances,
    // and rankings agree
    val fresh = Similarity.qPqTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSet
    val fromIndex = Similarity.qPqFromIndex(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSet
    assert(fromIndex == fresh)
    assert(fresh.nonEmpty)
  }

  test("persisted IVF-PQ index: results match the in-query path; codes scan prunes cells") {
    val fresh = Similarity.qIvfPqTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSet
    val result = Similarity.qIvfPqFromIndex(spark, sf)
    val fromIndex = result.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toSet
    assert(fromIndex == fresh)
    assert(fresh.nonEmpty)
    // the codes scan lists only the probed cell directories (q89's
    // partition-pruning assertion, on the 4-byte-code table)
    def allScans(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(allScans)
    }
    val scans = allScans(result.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("codes")))
    assert(scans.nonEmpty, "no file scan over the codes table")
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "cell")),
      s"no partition filter on cell: ${scan.partitionFilters}")
    val indexDir = Similarity.ivfPqIndexDir(spark, sf)
    val selected = scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .map(_.values.getInt(0)).distinct
    val total = spark.read.parquet(s"$indexDir/codes")
      .select("cell").distinct().count()
    assert(selected.length < total,
      s"probing read every cell directory (${selected.length} of $total)")
  }

  test("IVF-PQ top-k: recall within probed cells, exact re-rank distances") {
    val k = 10
    val got = Similarity.qIvfPqTopK(spark, sf, k = k).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(4)))
    assert(got.nonEmpty)
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val queries = vecs.keys.filter(_ < 5)
    var hits = 0
    queries.foreach { q =>
      val truth = vecs.keys.filter(_ != q).toSeq
        .sortBy(v => (d2(vecs(q), vecs(v)), v)).take(k).toSet
      val mine = got.filter(_._1 == q).map(_._2).toSet
      assert(mine.size == k)
      hits += mine.intersect(truth).size
    }
    // cell restriction costs recall vs flat PQ — floor it like q46's
    val recall = hits.toDouble / (queries.size * k)
    assert(recall >= 0.25, f"IVF-PQ recall@10 $recall%.2f below floor")
    // re-rank distances are exact
    got.foreach { case (q, v, reported) =>
      assert(math.abs(reported - d2(vecs(q), vecs(v))) < 1e-3,
        s"re-ranked d2 for ($q,$v) diverges from exact")
    }
  }

  test("q106: per-dimension stats match a driver-side computation") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val stats = Similarity.qEmbeddingStats(spark, sf).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(stats.size == 64)
    for (dim <- Seq(0, 17, 63)) {
      val col0 = vecs.map(_(dim))
      val mean = col0.sum / col0.length
      val std = math.sqrt(col0.map(v => (v - mean) * (v - mean)).sum / (col0.length - 1))
      val r = stats(dim)
      assert(r.getLong(1) == vecs.length)
      assert(math.abs(r.getDouble(2) - mean) < 5e-5, s"dim $dim mean")
      assert(math.abs(r.getDouble(3) - std) < 5e-5, s"dim $dim std")
      assert(r.getDouble(4) == math.floor(col0.min * 10000 + 0.5) / 10000 ||
        math.abs(r.getDouble(4) - col0.min) < 5e-5)
      assert(math.abs(r.getDouble(5) - col0.max) < 5e-5, s"dim $dim max")
    }
  }

  test("q107: every vector's reconstruction error respects the scale/2 bound") {
    val rows = Similarity.qSq8Error(spark, sf).collect()
    assert(rows.length == 500)
    for (r <- rows) {
      val (scale, meanErr, maxErr) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(scale > 0)
      // |v - round(v/scale)*scale| <= scale/2 by construction; the
      // rounded outputs may sit a half-ulp-of-round-6 above
      assert(maxErr <= scale / 2 + 5e-7, s"vec ${r.getLong(0)}: $maxErr > ${scale / 2}")
      assert(meanErr <= maxErr)
    }
  }

  test("q116: RRF fusion matches a driver-side two-leg brute force, exact ranks") {
    val (k1, b, legN, rrfK) = (1.2, 0.75, 100, 60)
    val query = Seq("stream", "join", "window")
    // lexical leg: the q112 BM25 brute force (df/dl/avgdl over ALL docs
    // including doc 0; doc 0 dropped only from the ranking — the query
    // owns id 0 on both legs)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)))
    val dl = docs.map { case (id, ts) => id -> ts.length.toLong }.toMap
    val n = dl.size
    val avgdl = dl.values.sum.toDouble / n
    val df = query.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    val lexRank = docs.flatMap { case (id, ts) =>
      if (id == 0) None else {
        val s = query.map { t =>
          val tf = ts.count(_ == t).toLong
          if (tf == 0) 0.0
          else math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) * (tf * (k1 + 1)) /
            (tf + k1 * ((1 - b) + b * dl(id) / avgdl))
        }.sum
        if (s > 0) Some(id -> s) else None
      }
    }.sortBy { case (id, s) => (-s, id) }.take(legN)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    // semantic leg: cosine against vec 0
    val embs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val qv = embs.find(_._1 == 0L).get._2
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < x.length) {
        dot += x(i).toDouble * y(i).toDouble
        nx += x(i).toDouble * x(i).toDouble
        ny += y(i).toDouble * y(i).toDouble
        i += 1
      }
      dot / math.sqrt(nx * ny)
    }
    val semRank = embs.filter(_._1 != 0L).map { case (id, v) => id -> cos(qv, v) }
      .sortBy { case (id, s) => (-s, id) }.take(legN)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    // fusion: integer ranks only, so this is exactly deterministic
    val fused = (lexRank.keySet ++ semRank.keySet).toSeq.map { id =>
      id -> (lexRank.get(id).map(r => 1.0 / (rrfK + r)).getOrElse(0.0) +
        semRank.get(id).map(r => 1.0 / (rrfK + r)).getOrElse(0.0))
    }
    val expect = fused.sortBy { case (id, s) => (-s, id) }.take(20)
      .zipWithIndex.map { case ((id, s), i) =>
        (i + 1, id, lexRank.get(id), semRank.get(id), s) }
    val got = Similarity.qHybridRrf(spark, sf).collect().map { r =>
      (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        if (r.isNullAt(3)) None else Some(r.getInt(3)),
        r.getDouble(4))
    }.sortBy(_._1)
    assert(got.length == expect.length)
    for (((gr, gid, glex, gsem, grrf), (er, eid, elex, esem, errf)) <- got.zip(expect)) {
      assert((gr, gid, glex, gsem) == ((er, eid, elex, esem)),
        s"rank $er: got ($gid,$glex,$gsem) want ($eid,$elex,$esem)")
      assert(math.abs(grrf - errf) <= 1e-6, s"rank $er rrf $grrf vs $errf")
    }
    // both legs must actually contribute to the fused top-20
    assert(expect.exists { case (_, _, l, s2, _) => l.isDefined && s2.isEmpty })
    assert(expect.exists { case (_, _, l, s2, _) => l.isEmpty && s2.isDefined })
    assert(expect.exists { case (_, _, l, s2, _) => l.isDefined && s2.isDefined })
  }

  test("q120: truncation drift matches a driver-side slice-cosine; drift shrinks as dims grow") {
    val embs = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cosd(x: Array[Float], y: Array[Float], d: Int): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < d) {
        dot += x(i).toDouble * y(i).toDouble
        nx += x(i).toDouble * x(i).toDouble
        ny += y(i).toDouble * y(i).toDouble
        i += 1
      }
      dot / math.sqrt(nx * ny)
    }
    val pairs = embs.keys.toSeq.sorted.flatMap(i =>
      embs.get(i + 1).map(y => (embs(i), y)))
    assert(pairs.nonEmpty)
    val expect = Seq(8, 16, 32, 64).map { d =>
      val drifts = pairs.map { case (x, y) => math.abs(cosd(x, y, d) - cosd(x, y, 64)) }
      val coss = pairs.map { case (x, y) => cosd(x, y, d) }
      d -> ((pairs.length.toLong, drifts.sum / drifts.length, drifts.max,
        coss.sum / coss.length))
    }.toMap
    val got = Similarity.qMatryoshka(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    assert(got.keySet == expect.keySet)
    for ((d, (n, meanD, maxD, meanC)) <- expect) {
      val (gn, gMean, gMax, gCos) = got(d)
      assert(gn == n, s"d=$d pairs")
      assert(math.abs(gMean - meanD) <= 2e-6, s"d=$d mean drift $gMean vs $meanD")
      assert(math.abs(gMax - maxD) <= 2e-6, s"d=$d max drift")
      assert(math.abs(gCos - meanC) <= 2e-6, s"d=$d mean cos")
    }
    // longer prefixes are more faithful, and the full dimension is exact
    assert(got(64)._2 == 0.0 && got(64)._3 == 0.0)
    assert(got(8)._2 >= got(16)._2 && got(16)._2 >= got(32)._2)
    assert(got(8)._2 > 0.0, "8-dim truncation must actually drift")
  }

  test("q121: PCA spectrum is a sorted sub-stochastic distribution that beats uniform") {
    val rows = Similarity.qPcaVariance(spark, sf).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to 16))
    val ratios = rows.map(_._2)
    assert(ratios.forall(v => v > 0.0 && v <= 1.0))
    // eigenvalues come out sorted
    assert(ratios.zip(ratios.tail).forall { case (a, b) => a >= b - 1e-9 })
    // cumulative curve is the prefix sum and stays <= 1
    var acc = 0.0
    for ((_, v, c) <- rows) {
      acc += v
      assert(math.abs(c - acc) <= 1e-4)
    }
    assert(acc <= 1.0 + 1e-6)
    // the top PC captures at least the best single axis: its share must
    // beat the largest per-dimension variance share
    val dimVars = Tables.embeddings(spark, sf)
      .select(posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "v")))
      .groupBy("dim").agg(var_pop(col("v")).as("s2"))
      .collect().map(_.getDouble(1))
    val bestAxisShare = dimVars.max / dimVars.sum
    assert(ratios.head >= bestAxisShare - 1e-6,
      s"top PC ${ratios.head} must be >= best axis share $bestAxisShare")
    // 16 of 64 components must explain more than a uniform 16/64 share
    assert(acc > 16.0 / 64.0)
  }

  test("q191: NDCG matches a driver-side ranked-retrieval evaluation") {
    val all = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def cosine(x: Array[Float], y: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < x.length) {
        dot += x(i).toDouble * y(i).toDouble
        nx += x(i).toDouble * x(i).toDouble
        ny += y(i).toDouble * y(i).toDouble
        i += 1
      }
      dot / math.sqrt(nx * ny)
    }
    val classSize = all.groupBy(_._3).map { case (l, g) => l -> g.length }
    val k = 10
    val want = all.filter(_._1 < 100).map { case (qid, qe, ql) =>
      val top = all.filter(_._1 != qid)
        .map(c => (c._1, cosine(qe, c._2), c._3))
        .sortBy(c => (-c._2, c._1)).take(k)
      val rels = top.map(c => if (c._3 == ql) 1 else 0)
      val r = classSize(ql) - 1
      val dcg = rels.zipWithIndex
        .map { case (rel, i) => rel / math.log(i + 2.0) }.sum
      val idcg = (1 to math.min(k, r)).map(i => 1.0 / math.log(i + 1.0)).sum
      (qid, (r.toLong, rels.sum.toLong, dcg / idcg))
    }.toMap
    val got = Similarity.qNdcg(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(4))))
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (qid, (r, hits, ndcg)) =>
      val (wr, whits, wndcg) = want(qid)
      assert((r, hits) == ((wr, whits)), s"query $qid")
      // the operator rounds at 6 decimals; the reference is unrounded
      assert(math.abs(ndcg - wndcg) <= 5e-7 + 1e-12, s"query $qid ndcg")
    }
    // retrieval must beat chance: mean hits@10 above the random-class
    // baseline of 10 * (csize/n)
    val meanHits = got.values.map(_._2).sum.toDouble / got.size
    val chance = 10.0 * (classSize.values.sum.toDouble / classSize.size - 1) /
      (all.length - 1)
    assert(meanHits > chance,
      s"mean hits $meanHits must beat chance $chance")
  }

  test("q192: IVF recall is monotone in nprobe and exact at full probe") {
    val rows = Similarity.qAnnRecall(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3, 10))
    // recall never decreases as more cells are probed
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._4, s"recall must be monotone: $a vs $b")
    }
    // probing every cell IS brute force: recall exactly 1
    assert(rows.last._4 == 10000L, s"full probe must reach 1.0: ${rows.last}")
    assert(rows.last._3 == rows.last._2 * 10)
    // a single probed cell must already find a nontrivial share
    assert(rows.head._4 > 0)
  }
}
