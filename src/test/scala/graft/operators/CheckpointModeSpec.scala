package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The reliable-checkpoint switch for iterative operators (VERDICT r11
  * #3): with `spark.graft.reliableCheckpoint=true` every per-round
  * lineage cut in the Graph family and Dedup.connectedComponents is a
  * RELIABLE `checkpoint()` to shared storage (survives executor loss
  * at 100 TB) instead of `localCheckpoint()` (executor-local blocks).
  * The switch must change the materialization medium ONLY: bit-equal
  * results, checkpoint files actually written, clear error when no
  * directory is configured. */
class CheckpointModeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def withReliable[T](dir: String)(body: => T): T = {
    spark.conf.set(Iterate.ReliableFlag, "true")
    spark.conf.set(Iterate.DirKey, dir)
    try body
    finally {
      spark.conf.set(Iterate.ReliableFlag, "false")
      spark.conf.unset(Iterate.DirKey)
    }
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("reliable mode without a directory fails with a clear message") {
    import spark.implicits._
    val edges = Seq((1L, 2L)).toDF("u", "v")
    spark.conf.set(Iterate.ReliableFlag, "true")
    try {
      // only meaningful when the context has no checkpoint dir yet
      if (spark.sparkContext.getCheckpointDir.isEmpty) {
        val ex = intercept[IllegalStateException] {
          Dedup.connectedComponents(edges, driverCutoff = 0L).collect()
        }
        assert(ex.getMessage.contains(Iterate.DirKey))
      }
    } finally spark.conf.set(Iterate.ReliableFlag, "false")
  }

  test("connectedComponents: reliable mode is bit-equal and writes checkpoints") {
    import spark.implicits._
    // two components + a chain long enough to take >1 contraction round
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (10L, 11L), (11L, 12L)).toDF("u", "v")
    val local = rows(Dedup.connectedComponents(edges, driverCutoff = 0L))
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val reliable = withReliable(dir) {
      rows(Dedup.connectedComponents(edges, driverCutoff = 0L))
    }
    assert(reliable == local)
    // the switch actually wrote reliable checkpoints to the directory
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(files > 0, s"no checkpoint files under $dir")
  }

  test("qCopurchaseRank: reliable mode reproduces the exact integer ranks") {
    val local = rows(Graph.qCopurchaseRank(spark, sf, iters = 4, topK = 10))
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt2").toString
    val reliable = withReliable(dir) {
      rows(Graph.qCopurchaseRank(spark, sf, iters = 4, topK = 10))
    }
    assert(reliable == local)
  }

}
