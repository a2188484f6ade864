package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** Exactly-once `foreachBatch` sink (E12): the reference replicates a
  * sync trigger's effects atomically as one MULTI/EXEC block
  * (`run_ctx.rs:43-59`); the Spark analogue is transactional batch
  * commits — each micro-batch's output becomes visible atomically and
  * a replayed batch id is a no-op, so foreachBatch's at-least-once
  * re-execution turns into exactly-once output.
  *
  * Protocol (the classic directory-commit pattern, same durability
  * shape as [[CheckpointStore]]):
  *  1. a replayed `batchId` that is already in the commit log is
  *     SKIPPED (idempotence);
  *  2. output is written to `dir/_tmp-batch-<id>` and atomically
  *     renamed to `dir/batch-<id>` (visibility);
  *  3. the batch id is appended to the commit log (durability) —
  *     a crash between 2 and 3 leaves a committed-looking directory
  *     that the replay detects via rename failure and re-registers.
  *
  * Readers see only renamed batch directories:
  * `spark.read.parquet(s"$dir/batch-*")`.
  */
final class TransactionalSink(dir: String, hadoopConf: Configuration) {
  private val root = new Path(dir)
  private val fs: FileSystem = root.getFileSystem(hadoopConf)
  fs.mkdirs(root)
  private val commitLog = new Path(root, "_commits")

  private def committed(): Set[Long] =
    if (!fs.exists(commitLog)) Set.empty
    else {
      val len = fs.getFileStatus(commitLog).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(commitLog)
      try in.readFully(0, buf) finally in.close()
      new String(buf, UTF_8).split('\n').filter(_.nonEmpty).map(_.toLong).toSet
    }

  private def recordCommit(batchId: Long): Unit = {
    val all = (committed() + batchId).toSeq.sorted.mkString("", "\n", "\n")
    val tmp = new Path(root, "_commits.tmp")
    val out = fs.create(tmp, true)
    try out.write(all.getBytes(UTF_8)) finally out.close()
    fs.delete(commitLog, false)
    fs.rename(tmp, commitLog)
  }

  def batchDir(batchId: Long): String = new Path(root, s"batch-$batchId").toString

  /** The foreachBatch body: write `batch` (or any derived DataFrame via
    * `transform`) exactly once for this `batchId`. */
  def write(batch: DataFrame, batchId: Long,
      transform: DataFrame => DataFrame = identity): Unit = {
    if (committed().contains(batchId)) return // replayed batch: no-op
    val tmp = new Path(root, s"_tmp-batch-$batchId")
    fs.delete(tmp, true) // leftovers of a crashed attempt
    transform(batch).write.mode("overwrite").parquet(tmp.toString)
    val dst = new Path(batchDir(batchId))
    if (!fs.rename(tmp, dst)) {
      // dst already exists: a previous attempt crashed between rename
      // and commit-log append — adopt it
      if (!fs.exists(dst))
        throw new java.io.IOException(s"cannot commit batch $batchId to $dst")
      fs.delete(tmp, true)
    }
    recordCommit(batchId)
  }

  /** All atomically-committed output as one DataFrame. */
  def read(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val dirs = committed().toSeq.sorted.map(batchDir)
    if (dirs.isEmpty)
      spark.emptyDataFrame
    else
      spark.read.parquet(dirs: _*)
  }
}
