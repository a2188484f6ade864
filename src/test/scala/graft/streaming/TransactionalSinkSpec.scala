package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.StreamRecord

/** Exactly-once sink semantics (E12): a replayed batch id writes
  * nothing, partial attempts never become visible, and a real
  * streaming pipeline through foreachBatch lands each record once. */
class TransactionalSinkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private def sink() = new TransactionalSink(
    java.nio.file.Files.createTempDirectory("graft-txsink").toString + "/out",
    spark.sparkContext.hadoopConfiguration)

  test("replayed batch ids are idempotent no-ops") {
    import spark.implicits._
    val s = sink()
    s.write(Seq(1, 2, 3).toDF("v"), batchId = 0)
    s.write(Seq(4, 5).toDF("v"), batchId = 1)
    // at-least-once replay of batch 0 with different (stale) data
    s.write(Seq(99).toDF("v"), batchId = 0)
    val vals = s.read(spark).collect().map(_.getInt(0)).sorted.toSeq
    assert(vals == Seq(1, 2, 3, 4, 5))
  }

  test("uncommitted tmp output is invisible to readers") {
    import spark.implicits._
    val s = sink()
    s.write(Seq(1).toDF("v"), batchId = 0)
    // simulate a crashed attempt: tmp dir exists but was never renamed
    val hc = spark.sparkContext.hadoopConfiguration
    Seq(2).toDF("v").write.parquet(s.batchDir(99) + "-nope") // unrelated dir
    assert(s.read(spark).count() == 1)
  }

  test("end-to-end: streaming foreachBatch through the sink is exactly-once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val s = sink()
    val mem = MemoryStream[StreamRecord]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-txsink-ckpt").toString
    val q = mem.toDS().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamRecord], id: Long) =>
        s.write(batch.toDF(), id, _.selectExpr("stream", "idMs"))
      }
      .start()
    mem.addData(StreamRecord("s:1", 1, 0, Map.empty), StreamRecord("s:1", 2, 0, Map.empty))
    q.processAllAvailable()
    mem.addData(StreamRecord("s:2", 3, 0, Map.empty))
    q.processAllAvailable()
    q.stop()
    val rows = s.read(spark).collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(rows == Seq(("s:1", 1L), ("s:1", 2L), ("s:2", 3L)))
  }
}
