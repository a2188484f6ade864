package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque BINARY columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run as partition-local batch
  * functions over `Dataset[MediaRecord]`. The Spark-side plumbing —
  * schema, partitioning, batch iteration, output shape — is real and
  * tested; the actual codec call is STUBBED (no image/audio libraries in
  * this environment) behind [[Multimodal.stubDecode]], a deterministic
  * fake keyed on the payload bytes. Swap `stubDecode` for a real codec
  * (e.g. JNI / javacv) without touching the plan shape.
  */
object Multimodal {

  import Tables._

  /** An opaque media payload + typed metadata (the multimodal row model). */
  case class MediaRecord(media_id: Long, media_type: String, payload: Array[Byte],
      width: Int, height: Int, duration_ms: Long)

  /** Fixed-size fake feature vector. */
  case class MediaFeatures(media_id: Long, media_type: String, n_bytes: Int,
      features: Array[Double])

  /** STUB — deterministic fake decoder standing in for a real image/audio
    * codec. Produces an 8-dim "feature vector" from byte statistics so
    * tests are reproducible. Replace with a real decode when codec
    * libraries are available. */
  def stubDecode(payload: Array[Byte], dims: Int = 8): Array[Double] = {
    val out = new Array[Double](dims)
    var i = 0
    while (i < payload.length) {
      out(i % dims) += (payload(i) & 0xFF).toDouble / 255.0
      i += 1
    }
    out
  }

  /** Synthesize a media table from `documents` (text bytes as the opaque
    * payload) — the container has no real media files; the *plumbing*
    * (binary column + metadata schema) is the deliverable. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"),
      (col("n_chars") * 10).as("duration_ms"))

  /** Metadata extraction over binary payloads — byte length + digest.
    * Pure column ops (oracle-checkable in DuckDB). */
  def qMediaMeta(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d).groupBy("media_type")
      .agg(count("*").as("n"),
        sum(length(col("payload"))).as("sum_bytes"),
        count_distinct(md5(col("payload"))).as("n_unique"))

  /** Feature extraction: partition-local batched decode over the binary
    * column (mapPartitions = one decoder init per partition, the same
    * batch shape `mapInPandas` gives PySpark). Output is a fixed-dim
    * feature vector per media row, ready for the Similarity operators. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder init would go here (real codec handle)
      it.map { r =>
        MediaFeatures(r.media_id, r.media_type, r.payload.length,
          stubDecode(r.payload))
      }
    }
  }

  /** Frame sampling: for video rows, emit one row per sampled frame
    * (every `stepMs` of the duration) — a Generator-shaped explode over
    * metadata, no payload duplication (the frame offset indexes into the
    * shared payload at decode time). */
  def qFrameSample(s: SparkSession, d: String, stepMs: Long = 1000): DataFrame =
    mediaTable(s, d)
      .filter(col("media_type") === "video" && col("duration_ms") >= stepMs)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(stepMs))).as("frame_ms"))
      .groupBy("media_id").agg(count("*").as("n_frames"))

  /** End-to-end feature pipeline as a queries() entry: decode (stubbed)
    * → fixed-dim features → per-type aggregate. Rows-only check (the
    * stub decode is not SQL-expressible; FeatureSpec covers values). */
  def qMediaFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = mediaTable(s, d).as[MediaRecord]
    extractFeatures(media).toDF()
      .groupBy("media_type")
      .agg(count("*").as("n"),
        round(sum(aggregate(col("features"), lit(0.0), (a, v) => a + v)), 4)
          .as("sum_features"))
  }
}
