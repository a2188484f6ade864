package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batched model inference over feature/embedding columns — the
  * engine's analogue of the reference's `client.redisai` surface (C14:
  * model get + run over keyspace tensors,
  * `/root/reference/redisgears_v8_plugin/src/v8_redisai.rs`), recast
  * for Spark: the model is distributed with the task closure (or
  * loaded from storage in `open()`), and scoring runs partition-local
  * over batches — one handle per partition, never one per row.
  *
  * The pattern mirrors [[Multimodal.MediaDecoder]]: a serializable
  * [[ModelScorer]] factory whose `open()` is called once per partition
  * to produce a [[ModelHandle]] (load weights, start a session,
  * allocate buffers); the handle scores the partition's rows and is
  * closed when the partition ends. A real runtime (ONNX, XGBoost, a
  * TF session) plugs in as one ModelScorer instance — the plan shape,
  * batching, and lifecycle never change. [[LinearScorer]] is the
  * in-repo implementation (exact, SQL-expressible, so the q50 gate is
  * a full DuckDB hash check, not rows-only).
  *
  * Scale: mapPartitions keeps the model resident per task, work is
  * embarrassingly parallel, no shuffle; at 100 TB this is a single
  * pass over the corpus with #partitions model instantiations.
  */
object Inference {

  /** Per-partition model lifecycle: score rows, then release. */
  trait ModelHandle {
    def score(features: Array[Double]): Double
    def close(): Unit = ()
  }

  /** Serializable model factory; `open()` runs once per partition. */
  trait ModelScorer extends Serializable {
    def open(): ModelHandle
  }

  /** A deterministic linear model: score = w · x + bias. Stands in for
    * any real runtime; weights ship with the closure like a small
    * broadcast model artifact. */
  final case class LinearScorer(weights: Array[Double], bias: Double = 0.0)
      extends ModelScorer {
    def open(): ModelHandle = new ModelHandle {
      def score(features: Array[Double]): Double = {
        var acc = bias
        val n = math.min(weights.length, features.length)
        var i = 0
        while (i < n) { acc += weights(i) * features(i); i += 1 }
        acc
      }
    }
  }

  /** A scorer that loads a PERSISTED model in `open()` — the real
    * serving lifecycle (weights come from a file at partition start,
    * not from the task closure): reads a linear model from a
    * safetensors file ([[Safetensors]]) once per partition and scores
    * through the same [[ModelHandle]] path as [[LinearScorer]]. On a
    * cluster the path is distributed storage (or a node-local cache);
    * the open()-per-partition contract is exactly how an ONNX/TF
    * session would bind. */
  final case class SafetensorsScorer(path: String,
      weightTensor: String = "weight", biasTensor: Option[String] = Some("bias"))
      extends ModelScorer {
    def open(): ModelHandle = {
      val w = Safetensors.readVector(path, weightTensor)
      val b = biasTensor.map(n => Safetensors.readVector(path, n).head).getOrElse(0.0)
      LinearScorer(w, b).open()
    }
  }

  /** A 2-layer MLP (relu hidden layer) loaded from a MULTI-tensor
    * safetensors artifact — the nonlinear step past [[LinearScorer]]
    * on the same per-partition-handle lifecycle: `w1` is the
    * row-major (hidden × dims) input matrix, `b1`/`w2` the hidden
    * bias/output weights, `b2` the scalar output bias. This is the
    * shape a real TorchScript/ONNX classifier head reduces to; the
    * artifact format (named tensors in one file) is exactly how such
    * heads ship. score = b2 + Σ_j w2_j · relu(b1_j + Σ_i w1_{j,i} x_i),
    * accumulated in ascending-index order so an engine-independent
    * oracle can reproduce every double. */
  final case class MlpScorer(path: String) extends ModelScorer {
    def open(): ModelHandle = {
      val w1 = Safetensors.readVector(path, "w1")
      val b1 = Safetensors.readVector(path, "b1")
      val w2 = Safetensors.readVector(path, "w2")
      val b2 = Safetensors.readVector(path, "b2").head
      val h = b1.length
      require(h > 0 && w2.length == h && w1.length % h == 0,
        s"inconsistent MLP tensors in $path: |w1|=${w1.length} |b1|=$h |w2|=${w2.length}")
      val dims = w1.length / h
      new ModelHandle {
        def score(x: Array[Double]): Double = {
          var out = 0.0
          var j = 0
          while (j < h) {
            var acc = 0.0
            val n = math.min(dims, x.length)
            var i = 0
            while (i < n) { acc += w1(j * dims + i) * x(i); i += 1 }
            val hid = b1(j) + acc
            if (hid > 0.0) out += w2(j) * hid
            j += 1
          }
          b2 + out
        }
      }
    }
  }

  /** Score an (id, features) DataFrame with one model handle per
    * partition. Input columns: `idCol` LONG, `featCol` ARRAY<numeric>;
    * output (idCol, score). */
  def scoreBatches(df: DataFrame, scorer: ModelScorer,
      idCol: String = "vec_id", featCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val in = df.select(col(idCol).cast("long"), col(featCol).cast("array<double>"))
      .as[(Long, Array[Double])]
    in.mapPartitions { it =>
      val handle = scorer.open()
      // release on TASK COMPLETION, not iterator exhaustion: a limit
      // pushed into the plan, take(n), or a task failure stops
      // consuming early and would otherwise leak the handle (trivial
      // for LinearScorer, load-bearing for a real ONNX/TF session)
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ => handle.close())
      val mapped = it.map { case (id, feats) => (id, handle.score(feats)) }
      if (tc != null) mapped
      else new Iterator[(Long, Double)] { // no task context (direct/unit use)
        def hasNext: Boolean = { val h = mapped.hasNext; if (!h) handle.close(); h }
        def next(): (Long, Double) = mapped.next()
      }
    }.toDF(idCol, "score")
  }

  /** The q50 model: fixed pseudo-random weights over the embedding
    * dimensions — w_i = (((i*31 + 7) mod 13) - 6) / 6, exactly
    * reproducible in SQL for the oracle. */
  def q50Weights(dims: Int): Array[Double] =
    Array.tabulate(dims)(i => (((i * 31 + 7) % 13) - 6) / 6.0)

  /** q50: batched inference over the embeddings table — per-vector
    * linear score through the per-partition-handle path, plus the
    * sigmoid-thresholded "class" so the operator output looks like a
    * classifier head, all DuckDB-checkable. */
  def qModelScore(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val dims = e.select(size(col("embedding"))).head().getInt(0)
    scoreBatches(e, LinearScorer(q50Weights(dims)))
      .select(col("vec_id"), round(col("score"), 4).as("score"),
        (lit(1.0) / (lit(1.0) + exp(-col("score"))) > 0.5).cast("int").as("positive"))
  }

  /** The q105 model: fixed pseudo-random MLP weights, the same
    * integer-formula device as [[q50Weights]] so the oracle reproduces
    * every tensor in SQL. Flat row-major w1 (hidden × dims). */
  def mlpWeights(dims: Int, hidden: Int)
      : (Array[Double], Array[Double], Array[Double], Double) = (
    Array.tabulate(hidden * dims)(k => (((k * 31 + 7) % 13) - 6) / 6.0),
    Array.tabulate(hidden)(j => ((j * 17 + 5) % 7 - 3) / 3.0),
    Array.tabulate(hidden)(j => ((j * 23 + 11) % 9 - 4) / 4.0),
    0.25)

  /** q105: NONLINEAR model serving — a 2-layer relu MLP head scored
    * over the embeddings table through the [[MlpScorer]] artifact path:
    * the four named tensors land in one safetensors file (exactly how
    * a distilled classifier head ships), each partition binds the
    * artifact once, and the forward pass is fully DuckDB-expressible
    * (deterministic weights + fixed accumulation order), so unlike
    * every fitted-model path the gate hash-checks a NONLINEAR model
    * end to end. Same scale shape as q50: one pass, no shuffle, one
    * model bind per partition. */
  def qMlpScore(s: SparkSession, d: String, hidden: Int = 4): DataFrame = {
    val e = Tables.embeddings(s, d).select("vec_id", "embedding")
    val dims = e.select(size(col("embedding"))).head().getInt(0)
    val (w1, b1, w2, b2) = mlpWeights(dims, hidden)
    val artifact = java.nio.file.Files.createTempFile("graft-q105-", ".safetensors")
    artifact.toFile.deleteOnExit()
    Safetensors.write(artifact.toString, Seq(
      ("w1", "F64", w1), ("b1", "F64", b1), ("w2", "F64", w2),
      ("b2", "F64", Array(b2))))
    scoreBatches(e, MlpScorer(artifact.toString))
      .select(col("vec_id"), round(col("score"), 4).as("score"))
  }

  /** The q84 document feature vector — cheap codegen'd quality
    * signals, shared between training and scoring so the two stages
    * can never skew. */
  private[operators] def qualityFeatures: org.apache.spark.sql.Column = {
    import graft.functions._
    array(
      graft.functions.punctRatio(col("text")),
      stopwordRatio(col("text")),
      meanTokenLen(col("text")) / 10.0,
      distinctTokenRatio(col("text")),
      log(length(col("text")).cast("double") + 1.0) / 10.0)
  }

  /** q84: quality-CLASSIFIER training — the fastText-style step of a
    * CCNet-like curation pipeline: fit a logistic-regression quality
    * model on weak labels (here: "wiki-like" even-numbered sources are
    * positive — in production, a trusted-corpus vs crawl split), then
    * score the whole corpus with it. Complements q50 (which SERVES a
    * fixed model): this TRAINS one, distributed, with MLlib through its
    * public API — gradient aggregation is the only corpus-sized work,
    * the model itself is 5 weights. Scoring goes through the same
    * per-partition-handle path as q50 ([[scoreBatches]] with the fitted
    * coefficients in a [[LinearScorer]]), so serving stays
    * runtime-agnostic. Rows-only in the gate (LBFGS float reduction is
    * partition-order sensitive); QualityClassifierSpec pins separation
    * on crafted separable data and weak-label recovery on the corpus. */
  def qQualityClassifier(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.linalg.Vectors
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), qualityFeatures.as("f"),
        (substring(col("source"), 4, 10).cast("int") % 2 === 0).cast("double").as("label"))
    val train = docs.select(col("label"), col("f")).as[(Double, Seq[Double])]
      .map { case (l, f) => (l, Vectors.dense(f.toArray)) }
      .toDF("label", "features")
    val model = new LogisticRegression()
      .setMaxIter(25).setRegParam(0.01).setTol(1e-7)
      .fit(train)
    // train → PERSIST → serve: the fitted weights land in a
    // safetensors artifact and serving loads it per partition through
    // SafetensorsScorer — the real deployment seam (the artifact
    // outlives the training job; a scoring-only job needs just the
    // path). F64 round-trips bit-exactly, so the output is identical
    // to closure-shipped LinearScorer weights (spec-pinned). Local
    // tmpdir here; on a cluster the artifact goes to shared storage.
    val artifact = java.nio.file.Files.createTempFile("graft-q84-", ".safetensors")
    artifact.toFile.deleteOnExit()
    Safetensors.write(artifact.toString, Seq(
      ("weight", "F64", model.coefficients.toArray),
      ("bias", "F64", Array(model.intercept))))
    val scored = scoreBatches(
      docs.select(col("doc_id"), col("f")),
      SafetensorsScorer(artifact.toString),
      idCol = "doc_id", featCol = "f")
    docs.select(col("doc_id"), col("source"), col("label"))
      .join(scored, Seq("doc_id"))
      .select(col("doc_id"), col("source"),
        (lit(1.0) / (lit(1.0) + exp(-col("score")))).as("p"),
        col("label"))
      .groupBy("source")
      .agg(count("*").as("n_docs"),
        round(avg("p"), 4).as("mean_p"),
        sum((col("p") > 0.5).cast("long")).as("n_positive"),
        first(col("label")).cast("long").as("weak_label"))
  }
}
