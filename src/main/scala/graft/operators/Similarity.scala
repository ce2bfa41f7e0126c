package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`): brute-force
  * cosine top-k as the exact baseline, and an IVF-style partitioned variant
  * as the scale path.
  *
  * Dot products use the native codegen'd [[graft.functions.DotProduct]]
  * kernel. Scale design: brute force is O(n·q) and exists for
  * verification and small n; IVF restricts each probe to its coarse
  * partition, turning the cross join into an equi-join on the partition key
  * (shuffle-partitioned both sides, no broadcast of the corpus).
  */
object Similarity {

  /** Dot product of two double arrays — the native codegen'd
    * [[graft.functions.DotProduct]] kernel (the `zip_with`+`aggregate`
    * HOF equivalent is ~20× slower at pair scale: interpreted lambda per
    * element + an intermediate array per row). */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct.dot(a, b)

  /** Attach `vec` (array<double>) and its L2 `norm`. */
  def withNorm(df: DataFrame, embCol: String): DataFrame = {
    val v = col(embCol).cast("array<double>")
    df.withColumn("vec", v).withColumn("norm", sqrt(dot(v, v)))
  }

  /** Cosine similarity given pre-normed frames (`vec`/`norm` on both). */
  private def cosine(va: Column, vb: Column, na: Column, nb: Column): Column =
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot(va, vb) / (na * nb))

  /** Exact brute-force cosine top-k: for each query row, the k nearest
    * corpus rows (excluding itself). Ties break on corpus id ascending. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     embCol: String, k: Int): DataFrame = {
    val c = withNorm(corpus, embCol)
      .select(col(idCol).as("nn_id"), col("vec").as("cv"), col("norm").as("cn"))
    val q = withNorm(queries, embCol)
      .select(col(idCol).as("query_id"), col("vec").as("qv"), col("norm").as("qn"))
    rankTopK(q.crossJoin(c), k)
  }

  /** Shared scoring + ranking tail of the exact and IVF paths: score each
    * (query, candidate) row, keep the top `k` per query (ties break on
    * corpus id ascending, self-matches excluded). */
  private def rankTopK(joined: DataFrame, k: Int): DataFrame = {
    val scored = joined
      .filter(col("query_id") =!= col("nn_id"))
      .select(col("query_id"), col("nn_id"),
        cosine(col("qv"), col("cv"), col("qn"), col("cn")).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "nn_id", "cosine", "rank")
  }

  /** IVF-style top-k: both sides carry a coarse partition key (a cluster /
    * label / LSH-bucket column); each query only scans its own partition.
    * The cross join becomes an equi-join on the key — the 100 TB shape. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              embCol: String, partCol: String, k: Int): DataFrame = {
    val c = withNorm(corpus, embCol)
      .select(col(partCol).as("part"), col(idCol).as("nn_id"),
        col("vec").as("cv"), col("norm").as("cn"))
    val q = withNorm(queries, embCol)
      .select(col(partCol).as("part"), col(idCol).as("query_id"),
        col("vec").as("qv"), col("norm").as("qn"))
    rankTopK(q.join(c, Seq("part")), k)
  }

  /** All pairs with cosine ≥ `minCosine` (embedding near-dup detection).
    * Brute force for oracle-scale; at scale, pre-bucket with random
    * hyperplane LSH and restrict pairs to equal buckets. */
  def cosinePairs(df: DataFrame, idCol: String, embCol: String,
                  minCosine: Double): DataFrame = {
    val n = withNorm(df, embCol)
    val a = n.select(col(idCol).as("id_a"), col("vec").as("va"), col("norm").as("na"))
    val b = n.select(col(idCol).as("id_b"), col("vec").as("vb"), col("norm").as("nb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosine(col("va"), col("vb"), col("na"), col("nb")).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** Random-hyperplane LSH bucket (sign bits of `nbits` deterministic
    * pseudo-random projections): equal buckets ⇒ candidate neighbors. The
    * hyperplanes derive from xxhash64(seed, dim) — deterministic, no RNG.
    * Plane length follows the vector itself, so dimension mismatches
    * cannot silently null out projections. */
  def lshBucket(embCol: Column, nbits: Int): Column = {
    require(nbits >= 1 && nbits <= 63, s"nbits must be in [1, 63], got $nbits")
    val v = embCol.cast("array<double>")
    val planes = (0 until nbits).map { b =>
      // pseudo-random ±1 plane component per (bit, dimension)
      val proj = aggregate(
        zip_with(v,
          transform(sequence(lit(0), size(v) - 1),
            d => when(pmod(xxhash64(lit(b), d), lit(2)) === 0, 1.0).otherwise(-1.0)),
          (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)): Column
    }
    planes.reduce(_.bitwiseOR(_))
  }
}
