package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Registers graft's native Catalyst expressions in a session's function
  * registry, exposing them to both the Column DSL (via `call_function`)
  * and plain SQL (`SELECT simhash64(tokens) ...`). Idempotent. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64",
      (exprs: Seq[Expression]) => SimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("minhash_signature",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(e, Literal(k: Int, IntegerType)) => MinHashSignature(e, k)
        case _ => throw new IllegalArgumentException(
          "minhash_signature(elems, k) requires a literal integer k")
      }, "built-in")
    reg.createOrReplaceTempFunction("word_shingles",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(t, Literal(n: Int, IntegerType)) => WordShingles(t, n)
        case _ => throw new IllegalArgumentException(
          "word_shingles(text, n) requires a literal integer n")
      }, "built-in")
    reg.createOrReplaceTempFunction("cosine_similarity",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => CosineSimilarityExpr(a, b)
        case _ => throw new IllegalArgumentException(
          "cosine_similarity(a, b) takes exactly two array arguments")
      }, "built-in")
    reg.createOrReplaceTempFunction("sign_lsh_buckets",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(v, Literal(nbits: Int, IntegerType), Literal(tables: Int, IntegerType)) =>
          SignLshBuckets(v, nbits, tables)
        case _ => throw new IllegalArgumentException(
          "sign_lsh_buckets(vec, nbits, tables) requires literal integers nbits, tables")
      }, "built-in")
    reg.createOrReplaceTempFunction("sorted_intersect_size",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => SortedIntersectSize(a, b)
        case _ => throw new IllegalArgumentException(
          "sorted_intersect_size(a, b) takes exactly two sorted ARRAY<BIGINT> arguments")
      }, "built-in")
    reg.createOrReplaceTempFunction("levenshtein_within",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b, Literal(d: Int, IntegerType)) => LevenshteinWithin(a, b, d)
        case _ => throw new IllegalArgumentException(
          "levenshtein_within(a, b, d) requires two STRINGs and a literal integer d")
      }, "built-in")
    reg.createOrReplaceTempFunction("jaro_winkler",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => JaroWinklerExpr(a, b)
        case _ => throw new IllegalArgumentException(
          "jaro_winkler(a, b) takes exactly two STRING arguments")
      }, "built-in")
    reg.createOrReplaceTempFunction("pair_inversions",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a) => PairInversions(a)
        case _ => throw new IllegalArgumentException(
          "pair_inversions(pairs) takes one ARRAY<STRUCT<BIGINT,BIGINT,BIGINT>> argument")
      }, "built-in")
    reg.createOrReplaceTempFunction("winnow_fingerprint",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(t) => WinnowFingerprint(t, 8, 4)
        case Seq(t, Literal(k: Int, IntegerType), Literal(w: Int, IntegerType)) =>
          WinnowFingerprint(t, k, w)
        case _ => throw new IllegalArgumentException(
          "winnow_fingerprint(text[, k, w]) requires literal integer k and w")
      }, "built-in")
    // Spark's own runtime-filter bloom machinery (the expressions behind
    // spark.sql.optimizer.runtime.bloomFilter), surfaced for explicit
    // use: bloom_filter_agg(xxhash64(x), estItems) aggregates a binary
    // bloom filter; bloom_might_contain(bloomBytes, xxhash64(x)) probes
    // it (false = DEFINITELY absent — the no-false-negative side the
    // incremental-dedup prefilter relies on).
    reg.createOrReplaceTempFunction("bloom_filter_agg",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
        case Seq(c, est) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, est)
        case _ => throw new IllegalArgumentException(
          "bloom_filter_agg(hash[, estimatedItems]) takes 1 or 2 arguments")
      }, "built-in")
    // unigram_segment(word, piecesArrayLit, costsArrayLit, unkCostLit):
    // the vocabulary rides as foldable array literals and is decoded
    // ONCE at plan construction into the expression's hash map
    reg.createOrReplaceTempFunction("unigram_segment",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(w, pl @ Literal(_, ArrayType(StringType, _)),
            cl @ Literal(_, ArrayType(LongType, _)),
            Literal(unk: Long, LongType)) =>
          val pieces = pl.value.asInstanceOf[ArrayData]
            .toObjectArray(StringType)
            .map(_.asInstanceOf[UTF8String].toString).toSeq
          val costs = cl.value.asInstanceOf[ArrayData].toLongArray().toSeq
          UnigramSegment(w, pieces, costs, unk)
        case _ => throw new IllegalArgumentException(
          "unigram_segment(word, pieces, costs, unkCost) requires literal " +
            "ARRAY<STRING> pieces, ARRAY<BIGINT> costs, BIGINT unkCost")
      }, "built-in")
    // wordpiece_segment(word, piecesArrayLit): greedy longest-match
    // WordPiece inference; the vocabulary rides as a foldable array
    // literal decoded ONCE into the expression's hash set
    reg.createOrReplaceTempFunction("wordpiece_segment",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(w, pl @ Literal(_, ArrayType(StringType, _))) =>
          val pieces = pl.value.asInstanceOf[ArrayData]
            .toObjectArray(StringType)
            .map(_.asInstanceOf[UTF8String].toString).toSeq
          WordpieceSegment(w, pieces)
        case _ => throw new IllegalArgumentException(
          "wordpiece_segment(word, pieces) requires a literal " +
            "ARRAY<STRING> vocabulary")
      }, "built-in")
    reg.createOrReplaceTempFunction("bloom_might_contain",
      (exprs: Seq[Expression]) => exprs match {
        case Seq(b, v) =>
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(b, v)
        case _ => throw new IllegalArgumentException(
          "bloom_might_contain(bloom, hash) takes exactly 2 arguments")
      }, "built-in")
  }
}
