package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only (VERDICT r12 #9): dump ONE mid-iteration `explain
  * ("formatted")` per driver-paced loop operator. The loop operators'
  * round frames are consumed by per-round actions and never appear in
  * the final query plan, so `plans/` files generated from the RESULT
  * frame cannot evidence the per-round join shapes — this tool hooks
  * [[graft.operators.Graph.roundPlanHook]] and writes the first frame
  * each tag emits. Usage: RoundPlans <sfDir> <outDir> <query>... */
object RoundPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val seen = scala.collection.mutable.Set.empty[String]
    graft.operators.Graph.roundPlanHook = (tag, df) => {
      if (seen.add(tag)) {
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${tag}.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[roundplans] wrote $outDir/$tag.txt")
      }
    }
    try names.foreach { n =>
      println(s"[roundplans] running $n")
      graft.SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.toRdd.foreach(_ => ())
    } finally graft.operators.Graph.roundPlanHook = null
    spark.stop()
  }
}
