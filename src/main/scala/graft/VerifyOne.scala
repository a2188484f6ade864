package graft
import org.apache.spark.sql.SparkSession
/** Dev helper: run a single SparkEntry query and dump its result to
  * parquet (same shape Verify produces) for targeted DuckDB
  * cross-checks while iterating — or, with outDir = "explain", print
  * the formatted physical plan instead (the plan-audit loop).
  * Usage: VerifyOne <name> <sfDir> <outDir|explain>. */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (outDir == "explain") df.explain("formatted")
    else df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    spark.stop()
  }
}
