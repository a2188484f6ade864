package graft.tools

/** Dev-only: print named [[graft.SparkEntry.oracleSql]] entries (all
  * three generated iterative oracles by default) so the exact SQL the
  * driver will hand DuckDB can be inspected / tested standalone. */
object DumpSql {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q163_copurchase_rank", "q365_hits", "q370_bucket_boundaries")
    val m = graft.SparkEntry.oracleSql
    names.foreach { k =>
      println("=== " + k)
      println(m(k))
    }
  }
}
