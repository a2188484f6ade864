package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loaders for the driver test tables (TESTDATA.md). Column pruning and
  * predicate pushdown reach the parquet scan because every operator
  * builds directly on these lazy reads. */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize an events-shaped `ts` column to TimestampType (µs),
    * adapting to however the fixture was generated:
    *   - parquet TIMESTAMP(NANOS) + `nanosAsLong` conf → LongType nanos
    *     → integer-divide to µs (a double roundtrip would lose precision
    *     on 1.7e18-scale nanos);
    *   - parquet timestamp[us] → TimestampType or TimestampNTZType →
    *     cast (identity under the UTC session timezone).
    * Works on batch and streaming DataFrames alike (schema is known at
    * plan time in both). */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType      => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case TimestampType => df
    case _             => df.withColumn("ts", col("ts").cast(TimestampType))
  }

  /** events loader; `nanosAsLong` is set so a TIMESTAMP(NANOS) fixture
    * still reads (as LongType) instead of failing the vectorized reader;
    * it is a no-op for timestamp[us] fixtures. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(s, d, "events"))
  }
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
