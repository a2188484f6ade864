package graft.tools
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n =>
      println(s"===== $n =====")
      val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
      df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .linesIterator.filter(l => l.contains("ReadSchema") || l.contains("PushedFilters") ||
          l.contains("Scan parquet") || l.contains("Exchange") || l.contains("WholeStageCodegen"))
        .foreach(println)
    }
    spark.stop()
  }
}
