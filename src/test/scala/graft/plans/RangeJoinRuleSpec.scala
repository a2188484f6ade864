package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The id-window range-join rewrite: installed via GraftExtensions, it
  * must turn the naive inequality join into an equi-join plan with
  * identical results (negatives included), and must not fire where an
  * equi-conjunct already exists or no constant window bounds the
  * range. */
class RangeJoinRuleSpec extends AnyFunSuite {

  /** A session over the same SparkContext with the engine's optimizer
    * extensions installed (suites run sequentially in the forked test
    * JVM, so the default-session swap is safe). */
  private lazy val ext: SparkSession = {
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  private def pairs(lo: Long, hi: Long, w: Long): Set[(Long, Long)] =
    (for {
      a <- lo to hi
      b <- lo to hi
      if b > a && b <= a + w
    } yield (a, b)).toSet

  test("naive id-window join plans as an equi-join with identical results") {
    import ext.implicits._
    val a = (1L to 300L).toDF("ida")
    val b = (1L to 300L).toDF("idb")
    val joined = a.join(b, col("idb") > col("ida") && col("idb") <= col("ida") + 7)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"rule must remove the nested loop:\n$plan")
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == pairs(1, 300, 7))
  }

  test("correct over negative ids (truncating-division bucket proof)") {
    import ext.implicits._
    val a = (-50L to 50L).toDF("ida")
    val b = (-50L to 50L).toDF("idb")
    val joined = a.join(b, col("idb") > col("ida") && col("idb") <= col("ida") + 7)
    assert(!joined.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == pairs(-50, 50, 7))
  }

  test("does not fire when an equi-conjunct exists or the range has no constant window") {
    import ext.implicits._
    val a = Seq((1L, 1L), (2L, 1L)).toDF("ida", "ka")
    val b = Seq((2L, 1L), (3L, 1L)).toDF("idb", "kb")
    // equi-join present: already hash-joinable, rule must leave it alone
    val equi = a.join(b, col("ka") === col("kb") && col("idb") > col("ida"))
    assert(equi.collect().map(r => (r.getLong(0), r.getLong(2))).toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // unbounded range: nothing to bucket — stays a nested loop, still correct
    val unbounded = a.join(b, col("idb") > col("ida"))
    assert(unbounded.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    assert(unbounded.count() == 3) // (1,2) (1,3) (2,3)
  }

  private def bandPairs(lo: Long, hi: Long, w: Long): Set[(Long, Long)] =
    (for {
      a <- lo to hi
      b <- lo to hi
      if math.abs(a - b) <= w
    } yield (a, b)).toSet

  test("abs-band join plans as an equi-join with identical results (negatives included)") {
    import ext.implicits._
    val a = (-40L to 40L).toDF("va")
    val b = (-40L to 40L).toDF("vb")
    val joined = a.join(b, abs(col("va") - col("vb")) <= 5)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"abs-band rule must remove the nested loop:\n$plan")
    val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == bandPairs(-40, 40, 5))
    // the strict (<) spelling buckets as <= w-1 and stays exact
    val strict = a.join(b, abs(col("va") - col("vb")) < 5)
    assert(!strict.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    assert(strict.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      bandPairs(-40, 40, 4))
  }

  test("abs-band rule leaves equi-joins and unbounded abs conditions alone") {
    import ext.implicits._
    val a = Seq((1L, 1L), (2L, 1L)).toDF("va", "ka")
    val b = Seq((2L, 1L), (3L, 1L)).toDF("vb", "kb")
    val equi = a.join(b, col("ka") === col("kb") &&
      abs(col("va") - col("vb")) <= 1)
    assert(equi.collect().map(r => (r.getLong(0), r.getLong(2))).toSet ==
      Set((1L, 2L), (2L, 2L), (2L, 3L)))
    // abs against a non-literal bound: nothing to bucket
    val dynamic = a.join(b, abs(col("va") - col("vb")) <= col("kb"))
    assert(dynamic.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    assert(dynamic.count() == 3) // |1-2|<=1, |2-2|<=1, |2-3|<=1
  }

  test("the naive spelling of q29's shape matches the hand-bucketed operator output") {
    import ext.implicits._
    val ids = ext.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"))
    val naive = ids.as("a").join(ids.as("b"),
        col("b.doc_id") > col("a.doc_id") && col("b.doc_id") <= col("a.doc_id") + 64)
      .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
    assert(!naive.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    val n = naive.count()
    // 500 sequential ids, window 64: full count minus edge truncation
    assert(n == (0L until 500L).map(i => math.min(64L, 499L - i)).sum)
  }
}
