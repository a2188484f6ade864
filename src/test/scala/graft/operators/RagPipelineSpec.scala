package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q225: the composed RAG retrieval pipeline — metric sanity, audit
  * reconciliation against the label table, determinism across runs,
  * and the embedding gate's abort behavior on a degenerate table. */
class RagPipelineSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val out = Similarity.qRagPipeline(spark, sf).collect()
    .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("n_relevant"),
      r.getAs[Long]("n_from_lex"), r.getAs[Long]("n_from_sem"),
      r.getAs[Long]("hits_at_10"), r.getAs[Double]("ndcg_at_10")))
    .sortBy(_._1)

  test("q225: one audit row per query, metrics in range, both legs contribute") {
    assert(out.map(_._1).toSeq == (0L until 20L))
    out.foreach { case (q, nRel, nLex, nSem, hits, ndcg) =>
      assert(hits >= 0 && hits <= 10, s"q$q hits $hits")
      assert(hits <= nRel, s"q$q hits $hits > relevant $nRel")
      assert(ndcg >= 0.0 && ndcg <= 1.0, s"q$q ndcg $ndcg")
      assert(nLex >= 0 && nLex <= 10 && nSem >= 0 && nSem <= 10)
      // every fused doc came from at least one leg
      assert(nLex + nSem >= 10, s"q$q: fused list has legless docs")
    }
    // both legs matter somewhere (the fusion isn't degenerate)
    assert(out.exists(_._3 > 0) && out.exists(_._4 > 0))
  }

  test("q225: n_relevant reconciles with the label class sizes") {
    val sizes = Tables.embeddings(spark, sf)
      .groupBy("label").agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val qlabel = Tables.embeddings(spark, sf).filter(col("vec_id") < 20)
      .select("vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.get(1).toString).toMap
    out.foreach { case (q, nRel, _, _, _, _) =>
      assert(nRel == sizes(qlabel(q)) - 1, s"q$q")
    }
  }

  test("q225: deterministic across runs (cached index, re-run legs)") {
    val again = Similarity.qRagPipeline(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("n_relevant"),
        r.getAs[Long]("n_from_lex"), r.getAs[Long]("n_from_sem"),
        r.getAs[Long]("hits_at_10"), r.getAs[Double]("ndcg_at_10")))
      .sortBy(_._1)
    assert(again.toSeq == out.toSeq)
  }

  test("q225 gate: a dead embedding dimension aborts the pipeline") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rag-gate").toString
    // dim 2 is constant → std 0 → the q106 gate must throw before any
    // index build or retrieval happens
    (0L until 40L).map(i =>
      (i, Seq(i.toDouble, (i % 7).toDouble, 1.0, -i.toDouble), s"l${i % 3}"))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    (0L until 40L).map(i => (i, s"doc $i text", "s0", "en", 11L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      Similarity.qRagPipeline(spark, dir, nQ = 4)
    }
    assert(e.getMessage.contains("dead dimension"))
  }
}
