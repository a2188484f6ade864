package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-truncation switch for the driver-paced iterative operators
  * (PageRank/HITS/BFS/k-core/LPA/triangles in [[Graph]], the
  * alternating-star contraction in [[Dedup.connectedComponents]]).
  *
  * Default: `localCheckpoint()` — executor-local blocks, zero I/O to
  * shared storage, the right trade on a healthy cluster and in tests.
  * Its known weakness at 100 TB: blocks live only in executor storage,
  * so losing an executor mid-iteration kills the job (Spark cannot
  * recompute through a local checkpoint).
  *
  * With `spark.graft.reliableCheckpoint=true` every `cutLineage()`
  * becomes a RELIABLE `checkpoint()` to the SparkContext checkpoint
  * directory (set it to shared storage via
  * `spark.graft.checkpointDir`, or call `setCheckpointDir` yourself) —
  * a long graph iteration then survives executor loss at the cost of
  * one write+read of the node/edge-sized frame per round. The
  * logical plan either side of the cut is identical; only the
  * materialization medium changes (CheckpointModeSpec pins bit-equal
  * results across both modes).
  */
private[graft] object Iterate {
  /** Session-conf flag: reliable (HDFS-style) checkpoints instead of
    * executor-local ones. */
  val ReliableFlag = "spark.graft.reliableCheckpoint"
  /** Session-conf: checkpoint directory, applied lazily on first use
    * when the SparkContext has none set. */
  val DirKey = "spark.graft.checkpointDir"

  implicit final class CheckpointOps(private val df: DataFrame) extends AnyVal {
    /** Materialize `df` and truncate its lineage — local by default,
      * reliable under [[ReliableFlag]]. */
    def cutLineage(): DataFrame = {
      val spark = df.sparkSession
      if (spark.conf.get(ReliableFlag, "false").toBoolean) {
        if (spark.sparkContext.getCheckpointDir.isEmpty) {
          val dir = spark.conf.getOption(DirKey).getOrElse(throw new IllegalStateException(
            s"$ReliableFlag is set but neither a SparkContext checkpoint dir nor $DirKey is configured"))
          spark.sparkContext.setCheckpointDir(dir)
        }
        df.checkpoint()
      } else df.localCheckpoint()
    }
  }
}
