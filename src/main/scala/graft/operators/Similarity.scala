package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set against the full corpus; O(corpus) work fully parallel, the only
  * shuffle is the per-query top-k (TakeOrdered-style via window + filter
  * on a tiny intermediate).
  *
  * Scale path: sign-LSH (random hyperplanes) bucketing — the corpus is
  * hashed once into buckets; a query probes only its own bucket. Recall
  * is probabilistic (covered by SimilaritySpec vs brute force); the
  * candidate set shrinks by ~2^nbits.
  */
object Similarity {

  import Tables._

  /** Brute-force cosine top-k for a broadcast query set.
    * @param queries (query_id, embedding) — small, broadcast.
    * @param corpus  (vec_id, embedding) — large, scanned once. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cosineSimilarity(col("q_emb"), col("embedding")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor"),
        round(col("cos"), 4).as("cosine"))
  }

  private def queriesDf(s: SparkSession, d: String, n: Int = 5): DataFrame =
    embeddings(s, d).filter(col("vec_id") < n)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

  /** Top-10 cosine neighbors for the first 5 vectors (deterministic,
    * oracle-checkable in DuckDB with double-precision cosine). */
  def qBruteForceTopK(s: SparkSession, d: String): DataFrame =
    bruteForceTopK(queriesDf(s, d),
      embeddings(s, d).select("vec_id", "embedding"), 10)

  /** SQ8 scalar quantization of an embedding column: per-vector scale
    * = max|x|/127, elements rounded to int8 and stored as
    * ARRAY<TINYINT> — 1 byte per dimension at rest (4× less than
    * float32, the first memory lever of any billion-vector corpus).
    * Cosine is per-vector-scale-invariant, so similarity search runs
    * DIRECTLY on the int8 codes cast to float — the scale column is
    * only needed to reconstruct magnitudes. All codegen'd column ops;
    * no UDFs. */
  def quantizeSq8(e: DataFrame, vecCol: String): DataFrame = {
    val scale = array_max(transform(col(vecCol), x => abs(x))) / lit(127.0)
    e.withColumn("scale", scale)
      .withColumn("q8",
        when(col("scale") === 0, transform(col(vecCol), _ => lit(0).cast("byte")))
          .otherwise(transform(col(vecCol),
            x => round(x / col("scale")).cast("byte"))))
  }

  /** q66: brute-force top-k over the SQ8-QUANTIZED corpus — the memory-
    * bound scale variant of q32: the scan side holds int8 codes (4×
    * smaller working set; at 100 TB this is the difference between a
    * corpus that fits executor memory and one that doesn't), and the
    * kernel is the same codegen'd cosine over the codes (scale cancels
    * in cosine, so no dequantization multiply is even needed).
    * Quantization error makes ranks approximate → rows-only in the
    * gate; SimilaritySpec pins recall@10 vs exact float and a cosine
    * error bound. */
  def qSq8TopK(s: SparkSession, d: String, k: Int = 10): DataFrame = {
    val corpus = quantizeSq8(embeddings(s, d).select("vec_id", "embedding"), "embedding")
      .select(col("vec_id"),
        transform(col("q8"), b => b.cast("float")).as("embedding"))
    val queries = quantizeSq8(queriesDf(s, d).withColumnRenamed("q_emb", "embedding"),
        "embedding")
      .select(col("query_id"),
        transform(col("q8"), b => b.cast("float")).as("q_emb"))
    bruteForceTopK(queries, corpus, k)
  }

  /** LSH-bucketed ANN: multi-table sign-LSH — the corpus is hashed into
    * `tables` independent bucket families; a query MULTI-PROBES its own
    * bucket plus every bucket at Hamming distance 1 in each table
    * (the near buckets hold the vectors that fell just across one
    * hyperplane — the dominant source of missed neighbors). Probe
    * expansion happens only on the tiny query side: the corpus is
    * still hashed ONCE into one bucket per table, so corpus-side work
    * is unchanged at any scale. Probabilistic recall — no SQL oracle;
    * SimilaritySpec measures recall vs brute force. */
  def qLshTopK(s: SparkSession, d: String, nbits: Int = 6, tables: Int = 4,
      multiProbe: Boolean = true): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val corpus = embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        explode(signLshBuckets(col("embedding"), nbits, tables)).as("tb"))
      .select(col("vec_id"), col("embedding"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val exact = queriesDf(s, d)
      .select(col("query_id"), col("q_emb"),
        explode(signLshBuckets(col("q_emb"), nbits, tables)).as("tb"))
      .select(col("query_id"), col("q_emb"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket0"))
    val qs =
      if (!multiProbe) exact.withColumnRenamed("bucket0", "bucket")
      else exact
        .select(col("query_id"), col("q_emb"), col("tbl"),
          explode(expr(s"transform(sequence(0, $nbits), i -> " +
            "CASE WHEN i = 0 THEN bucket0 " +
            "ELSE bucket0 ^ shiftleft(1L, i - 1) END)")).as("bucket"))
    val scored = corpus.join(broadcast(qs), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cosineSimilarity(col("q_emb"), col("embedding")).as("cos"))
      .groupBy("query_id", "vec_id").agg(max("cos").as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor"),
        round(col("cos"), 4).as("cosine"))
  }

  /** Centroid stats per label — the IVF coarse-quantizer building block
    * (mean vector per cluster), oracle-checkable as per-label sums. */
  def qLabelCentroids(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("label"), col("embedding"))
      .groupBy("label")
      .agg(count("*").as("n"),
        round(sum(aggregate(col("embedding"), lit(0.0),
          (acc, v) => acc + v.cast("double"))), 4).as("sum_components"))

  /** Element-wise mean vector per label — the IVF coarse quantizer
    * (posexplode → per-(label, dim) avg → re-assemble ordered). One
    * shuffle; output is #labels rows. */
  def labelCentroids(e: DataFrame): DataFrame =
    e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg(col("x")).as("m"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))

  /** IVF ANN with a TRAINED coarse quantizer: an MLlib k-means codebook
    * (fixed seed) learned from the embedding column itself — no label
    * column involved. The corpus is assigned to its nearest cell once;
    * a query scores the tiny centroid table, probes its `nprobe`
    * nearest cells by the assignment metric (euclidean, so the probe
    * ranking matches how vectors were binned), and ranks exact cosine
    * only among those cells' vectors. Work per query drops from
    * O(corpus) to O(corpus · nprobe / cells); the centroid table
    * broadcasts at any corpus size. At 100 TB the `fit` runs on a
    * bounded sample (`trainCap` rows) — the codebook quality depends on
    * the distribution, not the corpus size — while assignment and
    * probe-and-verify keep the same broadcast shapes. Probabilistic
    * recall — rows-only in the gate; SimilaritySpec pins the recall
    * floor on this unlabeled path and verifies every reported cosine
    * exactly. */
  def qIvfTopK(s: SparkSession, d: String, nprobe: Int = 3, k: Int = 10,
      cells: Int = 10, trainCap: Long = 100000): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import s.implicits._
    val e = embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .withColumn("fv", array_to_vector(col("embedding")))
    // train on a LIMIT of the corpus rather than a count()-derived
    // sample fraction: the codebook quality depends on the value
    // distribution, not row count, and a limit avoids spending a whole
    // extra Spark job on counting the corpus before training
    val train = e.limit(math.min(trainCap, Int.MaxValue.toLong).toInt)
    val model = new KMeans().setK(cells).setSeed(42)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(train)
    val assigned = model.transform(e).select(col("vec_id"), col("embedding"), col("cell"))
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq.toDF("cell", "centroid")
    val qs = queriesDf(s, d)
      .select(col("query_id"), col("q_emb").cast("array<double>").as("q_emb"))
    // probe: nearest nprobe cells per query (query-set × centroids,
    // both tiny → broadcast both sides of the small cross score)
    val d2 = expr("aggregate(zip_with(q_emb, centroid, (x, y) -> (x - y) * (x - y)), 0D, (a, v) -> a + v)")
    val probeW = Window.partitionBy("query_id").orderBy(col("d2").asc, col("cell").asc)
    val probed = qs.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("q_emb"), col("cell"), d2.as("d2"))
      .withColumn("prank", row_number().over(probeW))
      .filter(col("prank") <= nprobe)
      .select("query_id", "q_emb", "cell")
    // exact scoring inside the probed cells only
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cosineSimilarity(col("q_emb"), col("embedding")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor"),
        round(col("cos"), 4).as("cosine"))
  }

  /** Build a PERSISTED IVF index — the build-once / query-many shape a
    * production vector store actually runs (q46 retrains its codebook
    * inside every query): the trained codebook lands in
    * `indexDir/centroids` and the corpus assignments land in
    * `indexDir/assignments` PARTITIONED BY CELL, so the cell id is a
    * directory, not a column value. Probing then becomes partition-
    * directory pruning: a query reads only its `nprobe` cell
    * directories off disk — at 100 TB the difference between touching
    * nprobe/cells of the corpus bytes and scanning all of them, before
    * any row is decoded. Same seeded KMeans + bounded `trainCap` fit as
    * [[qIvfTopK]], so both paths share a codebook given the same
    * params. */
  def buildIvfIndex(s: SparkSession, d: String, indexDir: String,
      cells: Int = 10, trainCap: Long = 100000): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import s.implicits._
    val e = embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .withColumn("fv", array_to_vector(col("embedding")))
    val train = e.limit(math.min(trainCap, Int.MaxValue.toLong).toInt)
    val model = new KMeans().setK(cells).setSeed(42)
      .setFeaturesCol("fv").setPredictionCol("cell").fit(train)
    model.transform(e).select(col("vec_id"), col("embedding"), col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/assignments")
    model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq.toDF("cell", "centroid")
      .write.mode("overwrite").parquet(s"$indexDir/centroids")
  }

  /** ANN search over a persisted [[buildIvfIndex]] index. The probe
    * step scores the broadcast-sized centroid table, collects the
    * probed cell ids (nprobe · |queries| ints — a control-plane read,
    * not data), and pushes them as a STATIC partition filter into the
    * assignments scan: the plan lists only the probed cell directories
    * (spec-asserted), then ranks exact cosine among their vectors. */
  def ivfSearchFromIndex(s: SparkSession, indexDir: String, queries: DataFrame,
      nprobe: Int = 3, k: Int = 10): DataFrame = {
    val centroids = s.read.parquet(s"$indexDir/centroids")
    val qs = queries
      .select(col("query_id"), col("q_emb").cast("array<double>").as("q_emb"))
    val d2 = expr("aggregate(zip_with(q_emb, centroid, (x, y) -> (x - y) * (x - y)), 0D, (a, v) -> a + v)")
    val probeW = Window.partitionBy("query_id").orderBy(col("d2").asc, col("cell").asc)
    val probed = qs.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("q_emb"), col("cell"), d2.as("d2"))
      .withColumn("prank", row_number().over(probeW))
      .filter(col("prank") <= nprobe)
      .select("query_id", "q_emb", "cell")
    val probedCells = probed.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    val assigned = s.read.parquet(s"$indexDir/assignments")
      .where(col("cell").isin(probedCells: _*))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("vec_id").asc)
    assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        cosineSimilarity(col("q_emb"), col("embedding")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor"),
        round(col("cos"), 4).as("cosine"))
  }

  /** q89: ANN through the persisted index — the index is built once per
    * (warehouse, corpus) into a marker-guarded directory and every
    * call after that only probes it. Rows-only in the gate
    * (probabilistic recall, like q46); SimilaritySpec asserts the
    * results match the in-query IVF path given the shared codebook
    * seed, and that the assignments scan lists only the probed cell
    * directories. */
  def qIvfFromIndex(s: SparkSession, d: String, nprobe: Int = 3,
      k: Int = 10): DataFrame = {
    val indexDir = ivfIndexDir(s, d)
    ivfSearchFromIndex(s, indexDir, queriesDf(s, d), nprobe, k)
  }

  /** Build (once) and return the session-cached IVF index dir for a
    * corpus — marker-file guarded, same device as eventsStream's
    * cached source dirs. */
  def ivfIndexDir(s: SparkSession, d: String, cells: Int = 10): String = {
    val key = java.util.UUID.nameUUIDFromBytes(
      s"${s.sparkContext.applicationId}:$d:$cells".getBytes("UTF-8")).toString
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-ivf-$key"
    val marker = new java.io.File(s"$dir/_INDEX_READY")
    ivfBuildLock.synchronized {
      if (!marker.exists()) {
        buildIvfIndex(s, d, dir, cells)
        marker.createNewFile()
      }
    }
    dir
  }

  private val ivfBuildLock = new Object
}
