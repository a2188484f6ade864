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
    val results: Seq[(String, Option[Double])] = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      // full materialization: count() lets Catalyst prune every
      // unreferenced projection (a narrow quality-scoring query would be
      // measured as a bare row count); toRdd.foreach evaluates every
      // output column of the optimized plan on the executors.
      val ok = try { fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ()); true }
        catch { case _: Throwable => false }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) Some(sec) else None)
    }
    val qs = results.map {
      case (k, Some(v)) => "\"" + k + f"""":$v%.3f"""
      case (k, None) => "\"" + k + "\":null" // failed query: never report a timing
    }.mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
