package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: instrument the k-core iteration's round count and
  * frontier decay on a fixture. Usage: KcoreProbe <sfDir>. */
object KcoreProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    graft.operators.Graph.kCoreProbe(spark, args.head)
    println(f"KCORE total=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
