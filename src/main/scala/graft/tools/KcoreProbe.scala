package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: instrument the k-core iteration's round count and
  * frontier decay on a fixture, and time the DENSE sweep against the
  * Batagelj–Zaversnik BUCKETED (freeze-at-min) variant — the third
  * optimization candidate for q184's 38-sweep profile (BENCH_NOTES
  * records the verdict). Usage: KcoreProbe <sfDir>. */
object KcoreProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = graft.operators.Graph.copurchaseEdges(spark, args.head)
      .localCheckpoint()
    def time(label: String)(body: => Array[org.apache.spark.sql.Row]): Unit = {
      var rounds = 0
      graft.operators.Graph.probeHook = (r, _) => rounds = r
      val t0 = System.nanoTime()
      val rows = try body finally graft.operators.Graph.probeHook = null
      val secs = (System.nanoTime() - t0) / 1e9
      val hist = rows.map(r => s"${r.getLong(0)}:${r.getLong(1)}")
        .mkString(" ")
      println(f"KCORE $label rounds=$rounds t=$secs%.2f hist=[$hist]")
    }
    // alternate to cancel JIT-warmup bias between the variants
    time("dense")(graft.operators.Graph.kCoreHistogram(edges)
      .orderBy("coreness").collect())
    time("bucketed")(graft.operators.Graph.kCoreHistogramBucketed(edges)
      .orderBy("coreness").collect())
    time("dense2")(graft.operators.Graph.kCoreHistogram(edges)
      .orderBy("coreness").collect())
    time("bucketed2")(graft.operators.Graph.kCoreHistogramBucketed(edges)
      .orderBy("coreness").collect())
    spark.stop()
  }
}
