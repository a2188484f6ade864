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

  test("a batch dir present without its marker is committed (crash between rename and marker)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-txsink").toString + "/out"
    val hc = spark.sparkContext.hadoopConfiguration
    val s = new TransactionalSink(dir, hc)
    s.write(Seq(1).toDF("v"), batchId = 0)
    // crash window: batch-1 was renamed into place but the marker never
    // landed — the directory only ever appears complete, so it counts
    Seq(2).toDF("v").write.parquet(s.batchDir(1))
    assert(s.read(spark).collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    // the replayed batch 1 must be a no-op, not an overwrite
    s.write(Seq(99).toDF("v"), batchId = 1)
    assert(s.read(spark).collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
  }

  test("legacy single-file commit log migrates to immutable per-batch markers") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-txsink").toString + "/out"
    val hc = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(hc)
    // old layout: batch dirs + one rewritten `_commits` FILE
    Seq(7).toDF("v").write.parquet(new org.apache.hadoop.fs.Path(root, "batch-0").toString)
    val out = fs.create(new org.apache.hadoop.fs.Path(root, "_commits"), true)
    try out.write("0\n".getBytes("UTF-8")) finally out.close()

    val s = new TransactionalSink(dir, hc)
    assert(fs.getFileStatus(new org.apache.hadoop.fs.Path(root, "_commits")).isDirectory)
    s.write(Seq(8).toDF("v"), batchId = 1)
    assert(s.read(spark).collect().map(_.getInt(0)).sorted.toSeq == Seq(7, 8))
    // replay of the migrated batch stays a no-op
    s.write(Seq(99).toDF("v"), batchId = 0)
    assert(s.read(spark).collect().map(_.getInt(0)).sorted.toSeq == Seq(7, 8))
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
