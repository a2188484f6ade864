package graft
import org.apache.spark.sql.SparkSession
/** Dev helper: run a single SparkEntry query and dump its result to
  * parquet (same shape Verify produces) for targeted DuckDB
  * cross-checks while iterating. Usage: VerifyOne <name> <sfDir> <outDir>. */
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
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    spark.stop()
  }
}
