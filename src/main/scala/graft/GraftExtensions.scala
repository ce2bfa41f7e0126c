package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, JpegDims, LshBandBuckets, ShingleHashes, ShingleHashesAll, SimHash64}

/** Session extensions: registers the engine's native Catalyst expressions
  * for SQL use (`SELECT dot_product(a.vec, b.vec)`, `simhash64(text)`), so
  * `spark.sql(...)` users get the same codegen'd kernels as the DataFrame
  * API. Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` (done by
  * [[Sessions.local]]) or
  * `--conf spark.sql.extensions=graft.GraftExtensions` on a cluster. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  override def apply(e: SparkSessionExtensions): Unit = {
    // optimizer rule: interval-containment joins → bucketed equi-join
    // (gated on spark.graft.rewrite.intervalJoin; see the rule's docs)
    e.injectOptimizerRule(graft.plans.IntervalJoinRewrite)
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two array<double>"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text) - 64-bit whitespace-token SimHash"),
      (args: Seq[Expression]) => SimHash64(args.head)))
    e.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes",
        "shingle_hashes(text, k) - distinct xxhash64 of word k-gram shingles"),
      (args: Seq[Expression]) => {
        requireArity("shingle_hashes", args, 2)
        ShingleHashes(args.head, constInt("shingle_hashes", "k", args(1)))
      }))
    e.injectFunction((
      FunctionIdentifier("shingle_hashes_all"),
      info("shingle_hashes_all",
        "shingle_hashes_all(text, k) - ORDERED xxhash64 of word k-gram " +
          "shingles, index = gram start position"),
      (args: Seq[Expression]) => {
        requireArity("shingle_hashes_all", args, 2)
        ShingleHashesAll(args.head, constInt("shingle_hashes_all", "k", args(1)))
      }))
    e.injectFunction((
      FunctionIdentifier("redact_pii"),
      info("redact_pii",
        "redact_pii(text) - emails/IPv4s/phones replaced with typed placeholders"),
      (args: Seq[Expression]) => {
        requireArity("redact_pii", args, 1)
        // the ONE chain definition — shared with the Column API, so
        // SQL ≡ Column API holds by construction
        graft.operators.TextAnalysis.redactPiiExpr(args.head)
      }))
    e.injectFunction((
      FunctionIdentifier("jpeg_dims"),
      info("jpeg_dims",
        "jpeg_dims(bytes) - struct(width, height) from a JPEG SOF header, null if not JPEG"),
      (args: Seq[Expression]) => {
        requireArity("jpeg_dims", args, 1)
        JpegDims(args.head)
      }))
    e.injectFunction((
      FunctionIdentifier("lsh_band_buckets"),
      info("lsh_band_buckets",
        "lsh_band_buckets(vec, dims, bands, bits) - hyperplane LSH band buckets"),
      (args: Seq[Expression]) => {
        requireArity("lsh_band_buckets", args, 4)
        LshBandBuckets(args.head,
          constInt("lsh_band_buckets", "dims", args(1)),
          constInt("lsh_band_buckets", "bands", args(2)),
          constInt("lsh_band_buckets", "bitsPerBand", args(3)))
      }))
  }

  private def requireArity(name: String, args: Seq[Expression], n: Int): Unit =
    if (args.size != n)
      throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${args.size}")

  /** Plan-time integral constant — these parameters shape the expression
    * itself. Any foldable integral (3, 3L, 1+2) works; null and
    * non-integral constants get a clean error, not a MatchError. */
  private def constInt(fn: String, param: String, e: Expression): Int = e match {
    case c if c.foldable => c.eval() match {
      case i: Int => i
      case l: Long =>
        // silently truncating (shingle_hashes(t, 4294967299L) → k=3) would
        // run the wrong geometry with no error — range-check instead
        if (l.isValidInt) l.toInt
        else throw new IllegalArgumentException(
          s"$fn $param must be an integer constant in Int range, got $l")
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case null => throw new IllegalArgumentException(
        s"$fn $param must not be null")
      case other => throw new IllegalArgumentException(
        s"$fn $param must be an integer constant, got $other")
    }
    case other => throw new IllegalArgumentException(
      s"$fn $param must be a constant, got non-foldable $other")
  }
}
