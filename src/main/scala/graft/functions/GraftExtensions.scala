package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the native kernels as SQL functions, so the similarity /
  * shingle expressions are first-class in `spark.sql(...)` exactly like
  * built-ins:
  *
  * {{{
  * spark.sql("SELECT vec_cosine(a.vec, b.vec) FROM ...")
  * spark.sql("SELECT explode(distinct_shingles(text, 3)) FROM docs")
  * }}}
  *
  * Wire-up: `SparkSession.builder.withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.functions.GraftExtensions` — the
  * standard injection point, no session-state hacks. Note the conf
  * form is STATIC: it only takes effect when the SparkContext is
  * created; to extend a session over an existing context (tests,
  * shells), use `withExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  private def strArg(e: Expression, what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(
        v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got: $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - left-fold dot product of two array<double>"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))))

    ext.injectFunction((FunctionIdentifier("vec_cosine"),
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity of two array<double>"),
      (args: Seq[Expression]) => VecCosine(args(0), args(1))))

    ext.injectFunction((FunctionIdentifier("distinct_shingles"),
      info("distinct_shingles",
        "distinct_shingles(text, k) - distinct k-token shingles of a document"),
      (args: Seq[Expression]) =>
        DistinctShingles(args(0), intArg(args(1), "shingle size k"))))

    ext.injectFunction((FunctionIdentifier("vec_max_abs"),
      info("vec_max_abs", "vec_max_abs(a) - max |element| of an array<double>"),
      (args: Seq[Expression]) => VecMaxAbs(args(0))))

    ext.injectFunction((FunctionIdentifier("vec_quant_i8"),
      info("vec_quant_i8",
        "vec_quant_i8(a, scale) - symmetric int8 quantization of an array<double>"),
      (args: Seq[Expression]) => VecQuantI8(args(0), args(1))))

    ext.injectFunction((FunctionIdentifier("vec_cosine_i8"),
      info("vec_cosine_i8",
        "vec_cosine_i8(a, b) - cosine similarity of two int8-quantized array<tinyint>"),
      (args: Seq[Expression]) => VecCosineI8(args(0), args(1))))

    // an AGGREGATE registers through the same seam: the analyzer wraps a
    // bare AggregateFunction in an AggregateExpression
    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(x, n) - array<long> of n per-hash minima over 64-bit inputs"),
      (args: Seq[Expression]) =>
        MinHashSignatureAgg(args(0), intArg(args(1), "signature width n"))))

    ext.injectFunction((FunctionIdentifier("bloom_agg"),
      info("bloom_agg",
        "bloom_agg(x, numBits, numHashes) - binary Bloom sketch over 64-bit inputs"),
      (args: Seq[Expression]) =>
        BloomFilterAgg(args(0), intArg(args(1), "numBits"),
          intArg(args(2), "numHashes"))))

    ext.injectFunction((FunctionIdentifier("frequent_items"),
      info("frequent_items",
        "frequent_items(x, capacity) - Misra-Gries map<item, weight> sketch"),
      (args: Seq[Expression]) =>
        FrequentItemsAgg(args(0), intArg(args(1), "capacity"))))

    ext.injectFunction((FunctionIdentifier("char_pairs"),
      info("char_pairs",
        "char_pairs(token) - adjacent character pairs of a token (BPE pair input)"),
      (args: Seq[Expression]) => CharPairs(args(0))))

    ext.injectFunction((FunctionIdentifier("sampled_span_hashes"),
      info("sampled_span_hashes",
        "sampled_span_hashes(text, k, sel) - per-doc-distinct md5 digests of the " +
          "char-k-grams whose hex starts with sel (tier-6 span sampling)"),
      (args: Seq[Expression]) => SampledSpanHashes(args(0),
        intArg(args(1), "span gram size k"), strArg(args(2), "selector prefix"))))
  }
}
