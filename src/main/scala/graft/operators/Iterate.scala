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

  /** r12 OPTIMIZATION (guide §5, memory): release the storage blocks
    * behind a cutLineage'd frame that a NEWER round has superseded.
    * Without this every driver-paced loop leaked O(rounds) of
    * materialized round frames into executor storage until a JVM GC
    * happened to let the ContextCleaner find them — per-query noise at
    * sf0.1 (the graph family read 2–5× worse in-suite than fresh-JVM,
    * BENCH_NOTES r12 "suite-state amplification"), and at 100 TB
    * node-sized rounds × 50 k-core sweeps of storage debt. Callers
    * must release only frames no later lazy plan still reads; the
    * reliable-checkpoint mode keeps its files (unpersist drops only
    * the block-manager copy, through which a reliable checkpoint is
    * NOT read), so both modes stay correct (CheckpointModeSpec). */
  def release(df: DataFrame): Unit = df.queryExecution.logical match {
    case l: org.apache.spark.sql.execution.LogicalRDD =>
      l.rdd.unpersist(blocking = false)
    case _ => ()
  }
}
