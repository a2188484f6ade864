package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off scale probe: generate a `factor`× copy of the tables behind
  * the most expensive headline queries and time those queries on it —
  * the order-of-magnitude datapoint grounding the 100 TB plan-shape
  * arguments (BENCH_NOTES.md records the results).
  *
  * Scaling is distribution-preserving, not naive duplication:
  *  - relational tables shift their join keys per copy (orderkey /
  *    custkey namespaces stay consistent within a copy and disjoint
  *    across copies — exactly how TPC-H data grows with SF);
  *  - documents apply a per-copy character bijection (`translate` with
  *    a rotated alphabet) to the text: within one copy the original
  *    near-duplicate structure is preserved EXACTLY (a bijection maps
  *    equal shingles to equal shingles), while across copies texts
  *    differ everywhere, so the near-dup candidate rate grows linearly
  *    with the factor instead of quadratically (naive duplication
  *    would make every doc an exact dup of factor-1 others and melt
  *    the LSH buckets into pathological clusters no real corpus has).
  *
  * Usage: `runMain graft.tools.ScaleBench [srcDir] [factor] [outDir]`.
  */
object ScaleBench {

  private val Queries =
    Seq("q19_revenue_by_nation", "q23_text_quality",
      "q27_dedup_minhash_lsh", "q28_dedup_simhash",
      // round 5: the iterative-join CC (O(log n) rounds claim), the
      // broadcast-vocabulary join, the full curation pipeline, and the
      // bloom-routed incremental dedup — document-table shapes the
      // bijective scaling preserves
      "q57_dedup_components", "q63_tfidf", "q67_pipeline_e2e",
      "q69_incremental_dedup")

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val out = if (args.length > 2) args(2)
      else s"${System.getProperty("java.io.tmpdir")}/graft-scale-x$factor"
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

    val done = new java.io.File(s"$out/_DONE")
    if (!done.exists()) {
      generate(spark, src, factor, out)
      done.getParentFile.mkdirs()
      done.createNewFile()
    }

    // warm codegen/JIT once, then median-of-3 per query (Bench contract)
    graft.SparkEntry.queries(Queries.head)(spark, out).queryExecution.toRdd.foreach(_ => ())
    val results = Queries.map { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, out).queryExecution.toRdd.foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.sorted.apply(1)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"scale_x$factor%d_total","value":$total%.3f,"unit":"sec","queries":$qs,"src":"$src","factor":$factor%d}""")
    spark.stop()
  }

  /** The per-copy bijective character map: three disjoint 5-letter
    * sets, each rotated independently by a digit of the copy index in
    * base 5 — 125 distinct bijections, so factors up to 125 never
    * reuse a mapping (copy 0 = identity). */
  private val Sets = Seq("aeiou", "snrtl", "dhcmf")
  private val Alphabet = Sets.mkString
  private def rotated(i: Int): String =
    Sets.zipWithIndex.map { case (set, d) =>
      val k = (i / math.pow(5, d).toInt) % 5
      set.substring(k) + set.substring(0, k)
    }.mkString

  private def generate(spark: SparkSession, src: String, factor: Int, out: String): Unit = {
    def copies(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => f(df, i)).reduce(_ unionAll _)
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    val OrderShift = 10000000L
    val CustShift = 1000000L
    val DocShift = 10000000L

    write(copies(spark.read.parquet(s"$src/documents.parquet")) { (df, i) =>
      df.select(
        (col("doc_id") + lit(i * DocShift)).as("doc_id"),
        translate(col("text"), Alphabet, rotated(i)).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }, "documents")

    write(copies(spark.read.parquet(s"$src/lineitem.parquet")) { (df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * OrderShift))
    }, "lineitem")

    write(copies(spark.read.parquet(s"$src/orders.parquet")) { (df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * OrderShift))
        .withColumn("o_custkey", col("o_custkey") + lit(i * CustShift))
    }, "orders")

    write(copies(spark.read.parquet(s"$src/customer.parquet")) { (df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * CustShift))
    }, "customer")

    // dimensions are shared across copies, exactly like TPC-H SF growth
    Seq("nation", "region", "supplier", "part").foreach { t =>
      write(spark.read.parquet(s"$src/$t.parquet"), t)
    }
  }
}
