package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for large-large equi-joins.
  *
  * AQE's skew-join splitting (on by default in the engine's sessions)
  * handles most runtime skew by splitting oversized shuffle partitions;
  * `saltedJoin` is the explicit fallback for the case AQE cannot fix —
  * a single join KEY so hot that one task would own it entirely: the
  * left side's rows for each key are spread across `salt` sub-keys
  * (deterministically, by row-content hash) and the right side is
  * replicated `salt` times, so the hot key's work lands on `salt`
  * tasks instead of one.
  *
  * Cost model: right side is duplicated `salt`× through the shuffle —
  * use it with a bounded right side (dimension/lookup shape) or a
  * pre-filtered hot-key subset (join the hot keys salted, the rest
  * normally, union the results).
  *
  * Partial aggregation does NOT need this: Spark's hash aggregates
  * combine map-side per partition before the shuffle, which already
  * flattens group-key skew for algebraic aggregates.
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt >= 2, "salt must be >= 2 (1 is a plain join)")
    val l = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salt)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
