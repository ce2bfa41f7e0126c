package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities for the 100 TB path. AQE's skew-join handling
  * covers sort-merge joins at runtime; these cover the two places AQE
  * cannot: skewed aggregation keys and skewed broadcast-probe keys.
  */
object Skew {

  /** Two-phase (salted) aggregation for count/sum-like aggregates on a
    * skewed key: phase 1 aggregates on (key, salt ∈ [0, buckets)), fanning
    * one hot key out over `buckets` reducers; phase 2 combines the partial
    * rows. `partials` maps output column name → (phase-1 agg over input,
    * phase-2 combiner over the partial column).
    *
    * Example — count and sum over a hot key:
    * {{{
    * Skew.saltedAgg(df, Seq("k"), 32,
    *   "n"   -> (count(lit(1)), ps => sum(ps)),
    *   "tot" -> (sum(col("v")), ps => sum(ps)))
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                partials: (String, (org.apache.spark.sql.Column,
                  org.apache.spark.sql.Column => org.apache.spark.sql.Column))*): DataFrame = {
    // salt must be DETERMINISTIC per row (hash of the row content, never
    // monotonically_increasing_id/rand): a task recomputed after a fetch
    // failure would otherwise re-salt rows into different reducers and
    // double-count/drop them
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(buckets)))
    val p1Aggs = partials.map { case (name, (agg, _)) => agg.as(s"__p_$name") }
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(p1Aggs.head, p1Aggs.tail: _*)
    val p2Aggs = partials.map { case (name, (_, comb)) => comb(col(s"__p_$name")).as(name) }
    phase1.groupBy(keys.map(col): _*).agg(p2Aggs.head, p2Aggs.tail: _*)
  }

  /** Salted join for a skewed probe side against a small-but-unbroadcastable
    * build side: probe rows get a random-ish salt in [0, `buckets`); build
    * rows are replicated once per salt value; the join keys become
    * (key, salt), splitting each hot key across `buckets` tasks. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    // build rows are replicated once per salt, so only probe-preserving
    // join types are sound (a right/full outer would emit every unmatched
    // build row `buckets` times)
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross")(joinType.toLowerCase),
      s"saltedJoin does not support build-preserving join type '$joinType'")
    // deterministic per-row salt (see saltedAgg note on task retries)
    val saltedProbe = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.toIndexedSeq.map(col): _*), lit(buckets)))
    val replicatedBuild = build
      .withColumn("__salt", explode(sequence(lit(0L), lit(buckets - 1L))))
    saltedProbe.join(replicatedBuild, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
