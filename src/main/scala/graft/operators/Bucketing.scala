package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bucketed-table layout for co-located joins — the storage-side scale
  * lever the ad-hoc queries can't show: when both sides of a repeated
  * equi-join are written bucketed (and in-bucket sorted) by the join
  * key with the same bucket count, Spark's scan reports a compatible
  * `HashPartitioning` and the SortMergeJoin plans with NO shuffle
  * exchange on either side — the join cost collapses to a streaming
  * merge of pre-sorted buckets. At 100 TB this turns every
  * fact-to-fact join of a pipeline that owns its table layout
  * (lineitem⋈orders here; (doc, shingle-sig)⋈(doc, shingle-sig) in a
  * dedup pipeline) from the dominant shuffle into local work.
  *
  * The reference has no table layer at all (its keyspace is hash-slots,
  * `redisgears_core/src/background_run_ctx.rs:94-99` routes by slot);
  * bucketing is the Spark-native analogue of "data lives pre-routed by
  * key".
  */
object Bucketing {

  import Tables._

  /** Write `lineitem` and `orders` as bucketed+sorted external tables
    * under `warehouseDir`. Idempotent per (session, dir): re-running
    * overwrites. */
  def bucketize(s: SparkSession, d: String, warehouseDir: String,
      buckets: Int = 8): Unit = {
    def save(df: DataFrame, key: String, table: String): Unit =
      df.write.mode(SaveMode.Overwrite)
        .option("path", s"$warehouseDir/$table")
        .bucketBy(buckets, key).sortBy(key)
        .saveAsTable(table)
    save(lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount"),
      "l_orderkey", "graft_lineitem_bkt")
    save(orders(s, d).select("o_orderkey", "o_orderpriority"),
      "o_orderkey", "graft_orders_bkt")
  }

  /** The q03 revenue query over the bucketed tables: identical result,
    * shuffle-free join (asserted by BucketingSpec against the physical
    * plan). */
  def bucketedLookupEnrich(s: SparkSession): DataFrame =
    s.table("graft_lineitem_bkt")
      .join(s.table("graft_orders_bkt"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))

  /** Hive-style partitioned layout — the other storage-side lever:
    * writing a table partitioned by its hot filter column turns that
    * predicate into DIRECTORY pruning (the scan lists only matching
    * partitions — `PartitionFilters` in the plan — before reading a
    * byte), where an unpartitioned layout reads every file and filters
    * rows. At 100 TB this is the difference between scanning one
    * event type and scanning the fleet's entire log. Spec-asserted
    * against the scan's selected partition count. */
  def writePartitioned(df: DataFrame, dir: String, partCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(dir)

  /** Training-shard writer — the materialization sink at the end of a
    * curation pipeline: deal documents into `shards` hash-balanced
    * parquet shard directories (shard = xxhash64(doc_id) mod shards —
    * deterministic, so re-runs and incremental appends land docs in
    * the same shard) and write a manifest of per-shard doc/token/char
    * totals beside the data — what a training loader needs to plan
    * epochs without scanning shards. One shuffle on the shard column
    * lays the data out; each data-parallel worker then reads exactly
    * its directory (partition pruning), and the balance guarantee is
    * the hash's. Returns the manifest. */
  def writeTrainingShards(docs: DataFrame, dir: String,
      shards: Int = 8): DataFrame = {
    val sharded = docs.withColumn("shard",
      pmod(xxhash64(col("doc_id")), lit(shards)).cast("int"))
    sharded.repartition(col("shard"))
      .write.mode(SaveMode.Overwrite).partitionBy("shard").parquet(s"$dir/data")
    val manifest = sharded.groupBy("shard").agg(
      count("*").as("n_docs"),
      sum(graft.functions.tokenCount(col("text"))).cast("long").as("n_tokens"),
      sum(length(col("text"))).cast("long").as("n_chars"))
    manifest.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/manifest")
    manifest
  }

  /** Range-sorted layout — the third storage lever, for RANGE
    * predicates where partitionBy (categorical directories) and
    * bucketBy (hash co-location) don't apply: `repartitionByRange`
    * gives every output file a disjoint slice of the sort column's
    * domain and `sortWithinPartitions` orders rows inside each, so
    * parquet's per-file/row-group min-max statistics let a range scan
    * skip every file outside the queried window. On an unsorted
    * layout the same column's values span every file and the min-max
    * stats prune nothing. At 100 TB this is how a time-range query
    * over an event log reads hours instead of years. The range
    * boundaries come from a distributed sample (Spark's range
    * partitioner) — no global sort, one shuffle to lay the data out
    * once, every later range query pays only for what it touches.
    * Spec-asserted: per-file min-max ranges are pairwise disjoint and
    * a window predicate's matching rows live in a strict subset of
    * files. */
  def writeRangeSorted(df: DataFrame, dir: String, sortCol: String,
      files: Int = 8): Unit =
    df.repartitionByRange(files, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite).parquet(dir)

  /** Z-ordered layout — the fourth storage lever, for MULTI-dimensional
    * predicates where range-sorting on one column leaves the other's
    * min-max stats useless (a file holding one `event_id` slice still
    * spans the full `user_id` domain). Each row's two key columns are
    * scaled to 16-bit grid cells and bit-interleaved into a Morton
    * code; range-partitioning + in-file sorting on that code gives
    * every file a compact 2-D box of the key space, so parquet min-max
    * statistics prune files for box predicates on EITHER or BOTH
    * columns. This is the layout trick of Delta/Iceberg OPTIMIZE
    * ZORDER, built from public Spark primitives: the Morton spread is
    * a codegen'd shift/mask expression chain, the layout shuffle is
    * one `repartitionByRange` on the code (sampled boundaries, no
    * global sort), and the code column is dropped before the write —
    * readers see only the original schema. Min/max for the scaling
    * come from one footer-cheap agg over the input. */
  def writeZOrdered(df: DataFrame, dir: String, colA: String, colB: String,
      files: Int = 8): Unit = {
    // min/max via a double cast so any numeric key type works (and an
    // empty/all-null input degenerates to a plain write, not an NPE)
    val mm = df.agg(min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head()
    if (mm.isNullAt(0) || mm.isNullAt(2)) {
      df.write.mode(SaveMode.Overwrite).parquet(dir)
      return
    }
    def grid(c: String, lo: Double, hi: Double) = {
      val span = math.max(hi - lo, 1e-12)
      least(lit(65535L), (col(c).cast("double") - lo) / span * 65536.0)
        .cast("long")
    }
    val z = spread16(grid(colA, mm.getDouble(0), mm.getDouble(1)))
      .bitwiseOR(shiftleft(spread16(grid(colB, mm.getDouble(2),
        mm.getDouble(3))), 1))
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(dir)
  }

  /** Morton spread: distribute a 16-bit value's bits to the even bit
    * positions of a 32-bit lane (the classic magic-mask doubling walk),
    * as a pure `Column` shift/mask chain — whole-stage-codegen'd, no
    * UDF. */
  private[operators] def spread16(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    var x = c
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x = x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
    x
  }

  /** q154: the Morton-curve bucket map behind [[writeZOrdered]], as an
    * oracle-checkable query — scale each lineitem key to a 16-bit grid
    * cell over its observed [min, max] domain (EXACT integer
    * arithmetic: `(key−min)·65535 div (max−min)`, no doubles),
    * bit-interleave into a Morton code, take the top 6 of the 32
    * z-bits = 64 buckets, and report each bucket's row count and 2-D
    * bounding box. The per-bucket min/max spans ARE the parquet
    * zone-map statistics a z-ordered file would carry; that every
    * bucket's box covers ~1/64th of the key plane (vs a 1-D sort,
    * where the second key's span stays full-domain in every file) is
    * the file-skipping argument, stated as data. Pure integer
    * shift/mask arithmetic end to end — codegen'd here, bit-identical
    * SQL in the oracle. Scale: one footer-cheap min/max agg + one
    * scan collapsed onto ≤64 groups. */
  def qZorderStats(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val mm = li.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).head()
    def grid(c: String, lo: Long, hi: Long) =
      if (hi == lo) lit(0L)
      else expr(s"(($c - ${lo}L) * 65535L) div ${hi - lo}L")
    val z = spread16(grid("l_partkey", mm.getLong(0), mm.getLong(1)))
      .bitwiseOR(shiftleft(spread16(grid("l_suppkey", mm.getLong(2), mm.getLong(3))), 1))
    li.select(col("l_partkey"), col("l_suppkey"),
        shiftright(z, 26).cast("int").as("zbucket"))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n"),
        min("l_partkey").as("min_part"), max("l_partkey").as("max_part"),
        min("l_suppkey").as("min_supp"), max("l_suppkey").as("max_supp"))
  }

  /** q198: small-file compaction plan — the table-MAINTENANCE verb
    * beside the four layout levers above (Delta/Iceberg OPTIMIZE's
    * planning phase, and what Spark's own `maxPartitionBytes` split
    * coalescing does to input files at read time): per source, the
    * document corpus's small "files" (50-doc write chunks with their
    * byte weights) are packed into contiguous size-targeted output
    * bins by cumulative offset — file → bin `floor(prev_cum ÷
    * target)` — and the plan reports each bin's file count, bytes,
    * and fill. A 100 TB table written by thousands of streaming
    * micro-batches decays into millions of KB-files; this plan is
    * what turns the rewrite into few sequential, source-local merges.
    * Contiguity (pack in file order, never re-sort by size) is what
    * keeps any range/z-order layout the table already has.
    *
    * All-integer arithmetic (hash-exact); one file-granularity rollup
    * + one per-source prefix-sum window over file counts — both
    * orders of magnitude below row scale. */
  def qCompactionPlan(s: SparkSession, d: String,
      targetBytes: Long = 65536L): DataFrame = {
    val files = documents(s, d)
      .groupBy(col("source"), expr("doc_id div 50").as("file_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("bytes"))
    val w = Window.partitionBy("source").orderBy("file_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("prev_cum", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("bin", expr(s"prev_cum div ${targetBytes}L"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_files"), sum(col("n_docs")).as("n_docs"),
        sum(col("bytes")).as("bin_bytes"))
      .withColumn("fill_bp", expr(s"bin_bytes * 10000 div ${targetBytes}L"))
  }
}
