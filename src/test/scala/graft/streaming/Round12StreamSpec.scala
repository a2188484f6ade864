package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-12 streaming additions (q372–q374) on handcrafted multi-batch
  * splits — the gate's DuckDB oracles prove the final snapshots at
  * fixture scale; THIS spec proves the cross-batch state mechanics the
  * oracle cannot see (a carried last-event triple straddling a batch
  * boundary, integer moments surviving arbitrary split points, the
  * id-set cap firing). */
class Round12StreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def ckpt(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("transitions: the carried triple emits edges across batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String)]
    val name = "tr_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = Stateful.transitionProgress(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("update")
      .option("checkpointLocation", ckpt("tr")).start()
    // batch 1: u1 view(ts1) -> click(ts2), arriving OUT OF ORDER in the
    // batch (the in-group sort must fix it); u2 view only
    mem.addData((1L, 2L, 12L, "click"), (1L, 1L, 11L, "view"),
      (2L, 1L, 13L, "view"))
    q.processAllAvailable()
    // batch 2: u1 purchase — the (click -> purchase) edge needs the
    // STATE carried from batch 1; u2 click
    mem.addData((1L, 3L, 14L, "purchase"), (2L, 2L, 15L, "click"))
    q.processAllAvailable()
    q.stop()
    val edges = spark.table(name)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq.sorted
    assert(edges == Seq(
      (1L, "click", "purchase"),
      (1L, "view", "click"),
      (2L, "view", "click")))
  }

  test("moments: integer sufficient statistics are split-point invariant") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vals = Seq(3L, 7L, 7L, 10L, 2L, 5L)
    def run(batches: Seq[Seq[Long]]): (Long, Long, Long) = {
      val mem = MemoryStream[(String, Long)]
      val name = "mo_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val q = Stateful.momentsProgress(mem.toDS()).writeStream
        .format("memory").queryName(name).outputMode("update")
        .option("checkpointLocation", ckpt("mo")).start()
      batches.foreach { b =>
        mem.addData(b.map(v => ("t", v)): _*)
        q.processAllAvailable()
      }
      q.stop()
      val last = spark.table(name).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
        .maxBy(_._1)
      last
    }
    val oneShot = run(Seq(vals))
    val split = run(Seq(vals.take(2), vals.slice(2, 5), vals.drop(5)))
    assert(oneShot == split)
    assert(oneShot == ((6L, 34L, 236L))) // n, Σ, Σ² by hand
  }

  test("distinct-exact: set state dedups across batches; cap fires") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val name = "dx_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = Stateful.distinctExactProgress(mem.toDS()).writeStream
      .format("memory").queryName(name).outputMode("update")
      .option("checkpointLocation", ckpt("dx")).start()
    mem.addData(("t", 1L), ("t", 2L), ("t", 1L))
    q.processAllAvailable()
    mem.addData(("t", 2L), ("t", 3L)) // 2 is a cross-batch repeat
    q.processAllAvailable()
    q.stop()
    val last = spark.table(name).collect()
      .map(r => (r.getLong(1), r.getLong(2))).maxBy(_._1)
    assert(last == ((5L, 3L)))

    // the declared domain cap is enforced, with the HLL path named
    val mem2 = MemoryStream[(String, Long)]
    val name2 = "dx2_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q2 = Stateful.distinctExactProgress(mem2.toDS(), maxUsers = 2)
      .writeStream
      .format("memory").queryName(name2).outputMode("update")
      .option("checkpointLocation", ckpt("dx2")).start()
    mem2.addData(("t", 1L), ("t", 2L), ("t", 3L))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    assert(ex.getMessage.contains("q214") ||
      Option(ex.getCause).exists(_.getMessage.contains("q214")))
    q2.stop()
  }
}
