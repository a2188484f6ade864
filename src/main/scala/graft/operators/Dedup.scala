package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design: every variant reduces the O(n²) pair space to
  * hash-bucket-joins (LSH bands, SimHash prefixes, fingerprint buckets)
  * before any exact verification, so the shuffle volume is
  * O(n · signature) and the pair work is confined to same-bucket
  * candidates. At 100 TB the bucket join shuffles on (band, hash) —
  * uniformly distributed by construction, no skew.
  */
object Dedup {

  import Tables._

  /** Exact dedup by content hash — counts docs vs distinct texts.
    * At scale: hash first (map-side), then a count-distinct on the
    * 128-bit digest instead of the full text (tiny shuffle). */
  def qExact(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(md5(col("text").cast("binary")).as("digest"))
      .agg(count("*").as("n_docs"), count_distinct(col("digest")).as("n_unique"))

  /** MinHash + LSH near-dup candidate pairs, verified by exact Jaccard.
    *
    * Pipeline: word shingles → k=64 MinHash → 16 bands of 4 rows →
    * explode (band, bandHash) → self-join on the bucket → distinct
    * candidate pairs → verify exact token-set Jaccard ≥ threshold.
    * Output: (doc_a, doc_b, jaccard) pairs.
    */
  def minhashPairs(docs: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16, threshold: Double = 0.7,
      shingleN: Int = 2): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val shSets = docs.select(col(idCol).as("id"),
      shingleSet(col(textCol), shingleN).as("sh"))
    // band hashes only — (id, band, bandHash) is ~16 longs/doc, so the
    // bucket self-join shuffles signatures, never document content
    val bandHashes = shSets
      .select(col("id"), minhashSignature(col("sh"), numHashes).as("sig"))
      .select(col("id"),
        posexplode(lshBandHashes(col("sig"), numHashes, bands)).as(Seq("band", "bh")))
    val candidates = bandHashes.select(col("band"), col("bh"), col("id").as("id_a"))
      .join(bandHashes.select(col("band"), col("bh"), col("id").as("id_b")),
        Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // verify: join the shingle sets back only for surviving candidates
    candidates
      .join(shSets.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(shSets.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), round(jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash-LSH near-dup pairs over `documents`. LSH is probabilistic,
    * so no SQL oracle; MinHashSpec verifies recall against the
    * brute-force Jaccard answer at sf0.001. */
  def qMinhashLsh(s: SparkSession, d: String): DataFrame =
    minhashPairs(documents(s, d), "text", "doc_id")
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("jaccard"))

  /** SimHash near-dup: 64-bit SimHash per doc, bucketed by the 4
    * 16-bit quadrants (any pair within Hamming distance 3 shares at
    * least one exact quadrant — pigeonhole), then exact Hamming verify.
    */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val hashed = docs.select(col(idCol).as("id"),
      simhash64(tokens(col(textCol))).as("sh"))
    val banded = hashed.select(col("id"), col("sh"),
      posexplode(array((0 until 4).map(q =>
        shiftrightunsigned(col("sh"), q * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("quad", "qv")))
    val a = banded.select(col("quad"), col("qv"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("quad"), col("qv"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("quad", "qv"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming64(col("sh_a"), col("sh_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy("id_a", "id_b").agg(min("hamming").as("hamming"))
  }

  /** SimHash near-dup pairs over `documents` (no SQL oracle — covered by
    * SimHashSpec against brute-force Hamming). */
  def qSimhash(s: SparkSession, d: String): DataFrame =
    simhashPairs(documents(s, d), "text", "doc_id", maxHamming = 6)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("hamming"))

  /** n-gram Jaccard similarity pairs within a doc_id window — the
    * deterministic, oracle-checkable core of Jaccard dedup (the full
    * pair space goes through LSH above; the id-window candidate set here
    * is shared with the DuckDB oracle so the *similarity math* is what
    * gets verified). */
  def qNgramJaccard(s: SparkSession, d: String, window: Long = 64,
      threshold: Double = 0.5): DataFrame = {
    val docs = documents(s, d)
      .select(col("doc_id"), shingleSet(col("text"), 2).as("sh"))
    val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, col("doc_b") > col("doc_a") && col("doc_b") <= col("doc_a") + window)
      .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jac"))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 4).as("jaccard"))
  }

  /** Embedding-cosine near-dup within a vec_id window (oracle-checkable:
    * DuckDB computes the identical double-precision cosine). The 0.35
    * threshold matches the synthetic embeddings' similarity range (they
    * are i.i.d. random — max pairwise cosine ≈ 0.46). */
  def qEmbeddingNearDup(s: SparkSession, d: String, window: Long = 128,
      threshold: Double = 0.35): DataFrame = {
    val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
    val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.join(b, col("vec_b") > col("vec_a") && col("vec_b") <= col("vec_a") + window)
      .select(col("vec_a"), col("vec_b"),
        cosineSimilarity(col("emb_a"), col("emb_b")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cosine"))
  }

  /** Embedding near-dup at scale: multi-table sign-LSH bucketing →
    * distinct candidates → exact cosine verify. Probabilistic recall —
    * covered by SimilaritySpec, no SQL oracle. The bucket join shuffles
    * (tbl, bucket, vec_id) only; vectors join back for the verify. */
  def qEmbeddingLshNearDup(s: SparkSession, d: String, nbits: Int = 6,
      tables: Int = 4, threshold: Double = 0.35): DataFrame = {
    val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
    val bucketed = e.select(col("vec_id"),
        explode(signLshBuckets(col("embedding"), nbits, tables)).as("tb"))
      .select(col("vec_id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val candidates = bucketed.select(col("tbl"), col("bucket"), col("vec_id").as("vec_a"))
      .join(bucketed.select(col("tbl"), col("bucket"), col("vec_id").as("vec_b")),
        Seq("tbl", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
    candidates
      .join(e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")), Seq("vec_a"))
      .join(e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")), Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        cosineSimilarity(col("emb_a"), col("emb_b")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cosine"))
  }
}
