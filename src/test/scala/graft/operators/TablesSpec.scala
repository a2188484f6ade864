package graft.operators

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Schema guard for the driver-generated fixtures: the round-6 testdata
  * regeneration silently changed events.ts from TIMESTAMP(NANOS) to
  * timestamp[us] and broke 32 gate queries through one loader. This
  * suite pins the NORMALIZED schema of every fixture at every scale
  * factor, so the next silent drift fails here — in the suite named
  * after the loader — instead of in 20 downstream suites. */
class TablesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(sf => s"/root/testdata/$sf")
    .filter(d => new java.io.File(d).isDirectory)

  test("at least one fixture directory exists") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf* directories found")
  }

  test("events loader normalizes ts to TimestampType at every SF") {
    sfDirs.foreach { d =>
      val sch = Tables.events(spark, d).schema
      assert(sch("ts").dataType == TimestampType,
        s"$d: events.ts normalized to ${sch("ts").dataType}, expected TimestampType")
      val names = sch.fieldNames.toSet
      val expected = Set("event_id", "ts", "user_id", "event_type", "value", "props")
      assert(expected.subsetOf(names), s"$d: events missing ${expected -- names}")
      assert(sch("event_id").dataType == LongType, s"$d: event_id ${sch("event_id").dataType}")
      assert(sch("user_id").dataType == LongType, s"$d: user_id ${sch("user_id").dataType}")
      assert(sch("event_type").dataType == StringType)
      assert(sch("value").dataType == DoubleType)
    }
  }

  test("events has rows and a sane event-time span at sf0.001") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, TestSpark.sf)
    val row = ev.agg(count(lit(1)).as("n"),
      (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("spanUs"))
      .head()
    assert(row.getLong(0) > 0, "events is empty")
    val spanDays = row.getLong(1) / 86400e6
    assert(spanDays > 0 && spanDays < 3700,
      f"events span $spanDays%.1f days is implausible — ts normalization broken?")
  }

  test("normalizeTs adapts to a LongType nanos column") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val nanos = 1700000000123456789L // µs floor: 1700000000123456
    val df = Seq(nanos).toDF("ts")
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    val us = out.select(unix_micros(col("ts"))).head().getLong(0)
    assert(us == nanos / 1000L, s"nanos path truncation wrong: $us")
  }

  test("normalizeTs adapts to a TimestampNTZ column") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("2024-05-01 12:00:00").toDF("s")
      .select(col("s").cast(TimestampNTZType).as("ts"))
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    // identity under the UTC session timezone
    val us = out.select(unix_micros(col("ts"))).head().getLong(0)
    assert(us == 1714564800000000L)
  }

  test("relational fixtures expose the TPC-H-ish columns at every SF") {
    val expected = Map(
      "lineitem" -> Set("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"),
      "orders" -> Set("o_orderkey", "o_custkey", "o_totalprice"),
      "customer" -> Set("c_custkey", "c_nationkey"),
      "nation" -> Set("n_nationkey", "n_regionkey", "n_name"),
      "region" -> Set("r_regionkey", "r_name"),
      "documents" -> Set("doc_id", "text", "source"),
      "embeddings" -> Set("vec_id", "embedding", "label"))
    sfDirs.foreach { d =>
      expected.foreach { case (t, cols) =>
        val have = Tables.load(spark, d, t).schema.fieldNames.toSet
        assert(cols.subsetOf(have), s"$d/$t missing ${cols -- have}")
      }
    }
  }
}
