package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over an `ARRAY<STRING>` of tokens.
  *
  * Per-token hash is Spark's own XXH64 (seed 42, same as `xxhash64`), so
  * the result is stable across the cluster and across sessions. For each
  * of the 64 bit positions we accumulate +1/-1 votes across tokens and
  * keep the sign — near-identical token multisets end up within a few
  * bits of Hamming distance.
  *
  * The reference engine (RedisGears) has no dedup primitives at all — it
  * delegates all per-record computation to user JS
  * (`/root/reference/redisgears_v8_plugin/src/v8_native_functions.rs:513-624`);
  * this is part of the training-data-pipeline surface added on top.
  *
  * Implemented as a native Catalyst expression with `doGenCode` so it
  * stays inside whole-stage codegen on the hot dedup path.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires ARRAY<STRING>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.hash(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.SimHash64.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** Static helper shared by interpreted eval and generated code. */
  def hash(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var res = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) res |= (1L << j)
      j += 1
    }
    res
  }
}

/** MinHash signature over an `ARRAY<STRING>` element set, as a native
  * one-pass Catalyst expression.
  *
  * Each element is hashed ONCE with Spark's XXH64; the k signature rows
  * are 2-universal affine transforms `a_i * h + b_i` of that hash
  * (constants derived per row from splitmix-style mixing), so the cost
  * is |elements| hashes + k·|elements| multiply-adds instead of the
  * k·|elements| full hashes a naive `transform(sequence(1,k), …)`
  * formulation pays — and, unlike higher-order-function lambdas (which
  * Spark interprets), this stays inside whole-stage codegen. The hot
  * loop of MinHash+LSH dedup at 100 TB runs here.
  */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 1024, "numHashes in [1,1024]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature requires ARRAY<STRING>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.signature(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashSignature.signature($c, $k);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {
  /** Per-row affine constants: odd multiplier + offset from splitmix64
    * mixing of the row index (deterministic across the cluster). */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private lazy val A: Array[Long] = Array.tabulate(1024)(j => mix(2L * j) | 1L)
  private lazy val B: Array[Long] = Array.tabulate(1024)(j => mix(2L * j + 1))

  /** Null for an empty element set (no meaningful signature). */
  def signature(arr: ArrayData, k: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val as = A
    val bs = B
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        var j = 0
        while (j < k) {
          val v = as(j) * h + bs(j)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03).
  *
  * Computes a Karp–Rabin polynomial rolling hash over every `k`-char gram
  * of the input string, then selects the minimum hash in each sliding
  * window of `w` consecutive grams (rightmost minimum on ties), returning
  * the sorted distinct selected hashes as `ARRAY<LONG>`. Two documents
  * sharing a run of >= k+w-1 characters are guaranteed to share a
  * fingerprint value, which makes the output bucket-joinable for
  * near-dup / containment detection at scale.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 2 && w >= 1, "winnow_fingerprint requires k >= 2, w >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fingerprint requires STRING, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprint.fingerprint(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.WinnowFingerprint.fingerprint($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprint"
}

object WinnowFingerprint {
  private val Base = 1000003L

  def fingerprint(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val s = text.toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    // rolling Karp-Rabin over k-grams
    val m = n - k + 1
    val hashes = new Array[Long](m)
    var h = 0L
    var pow = 1L // Base^(k-1)
    var i = 0
    while (i < k) {
      h = h * Base + s.charAt(i)
      if (i < k - 1) pow *= Base
      i += 1
    }
    hashes(0) = h
    i = 1
    while (i < m) {
      h = (h - s.charAt(i - 1) * pow) * Base + s.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    // winnowing: min of each window of w hashes, rightmost min on ties
    val selected = scala.collection.mutable.SortedSet.empty[Long]
    if (m <= w) {
      var minIdx = 0
      var j = 1
      while (j < m) { if (hashes(j) <= hashes(minIdx)) minIdx = j; j += 1 }
      selected += hashes(minIdx)
    } else {
      var start = 0
      while (start + w <= m) {
        var minIdx = start
        var j = start + 1
        while (j < start + w) { if (hashes(j) <= hashes(minIdx)) minIdx = j; j += 1 }
        selected += hashes(minIdx)
        start += 1
      }
    }
    new GenericArrayData(selected.toArray)
  }
}
