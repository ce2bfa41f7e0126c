package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, ShingleHashes, SimHash64}

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
        if (args.size != 2)
          throw new IllegalArgumentException(
            s"shingle_hashes expects 2 arguments (text, k), got ${args.size}")
        val k = args(1) match {
          // any foldable integral constant (3, 3L, 1+2) works — k shapes
          // the expression itself, so it must be plan-time constant
          case e if e.foldable => e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case s: Short => s.toInt
            case b: Byte => b.toInt
            case other => throw new IllegalArgumentException(
              s"shingle_hashes k must be an integer constant, got $other")
          }
          case other => throw new IllegalArgumentException(
            s"shingle_hashes k must be a constant, got non-foldable $other")
        }
        ShingleHashes(args.head, k)
      }))
  }
}
