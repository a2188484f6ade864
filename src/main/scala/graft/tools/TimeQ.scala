package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev-only: median-of-3 wall time for named SparkEntry queries.
  * Args: `sfDir [--conf k=v]... name...` — `--conf` pairs land in the
  * session conf before any query runs (e.g. the reliable-checkpoint
  * flag for the overhead probe). */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val (confArgs, names) = args.tail.partition(_.startsWith("--conf="))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    confArgs.foreach { c =>
      val kv = c.stripPrefix("--conf=").split("=", 2)
      spark.conf.set(kv(0), kv(1))
    }
    names.foreach { n =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"TIMEQ $n median=${times(1)}%.3f all=${times.mkString(",")}")
    }
    spark.stop()
  }
}
