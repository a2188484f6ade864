package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.StreamRecord
import graft.sources.GraftLog

/** GraftLog ingest scaling probe: driver-side single-writer `append`
  * vs executor-written `appendDistributed` on N synthetic records at a
  * fixed segment granularity — the standalone version of the bench's
  * `graftlog_append_*` pair, runnable at any N to show how the
  * write-path parallelism gap grows with volume.
  *
  * Usage: `runMain graft.tools.IngestBench [nRecords] [segments]`.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val segments = if (args.length > 1) args(1).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val ds = spark.range(n).map(i =>
      StreamRecord(s"bench:${i % 64}", i, 0, Map("k" -> s"v$i"))).cache()
    ds.count() // materialize outside timings
    val records = ds.collect() // driver path input, outside timings
    val chunk = math.max(1, (n + segments - 1) / segments)

    def median3(body: => Unit): Double = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      times.sorted.apply(1)
    }

    val hc = spark.sparkContext.hadoopConfiguration
    val driver = median3 {
      val dir = java.nio.file.Files.createTempDirectory("ingest-drv").toString + "/log"
      val log = new GraftLog(dir, hc)
      records.grouped(chunk).foreach(c => log.append(c.toSeq))
    }
    val dist = median3 {
      val dir = java.nio.file.Files.createTempDirectory("ingest-dist").toString + "/log"
      val log = new GraftLog(dir, hc)
      log.appendDistributed(ds.repartition(segments))
    }
    // no-shuffle variant: write the cached partitioning as-is (the
    // shape of a real ingest, where data is born partitioned)
    val distNoShuffle = median3 {
      val dir = java.nio.file.Files.createTempDirectory("ingest-dist0").toString + "/log"
      val log = new GraftLog(dir, hc)
      log.appendDistributed(ds)
    }
    println(f"""{"metric":"graftlog_ingest","n":$n%d,"segments":$segments%d,"driver_sec":$driver%.3f,"distributed_sec":$dist%.3f,"distributed_noshuffle_sec":$distNoShuffle%.3f,"speedup":${driver / distNoShuffle}%.2f}""")
    spark.stop()
  }
}
