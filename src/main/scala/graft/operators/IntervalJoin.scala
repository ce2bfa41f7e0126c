package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's one conceptual join (SURVEY.md §2.3 J1): metrics ⋈
  * accounting by job-id equality AND timestamp containment in the job's
  * `[start, end)` interval — hand-rolled in the reference as batched
  * per-row Python filtering (`step-2/consumer.py:329-394`), expressed here
  * as one declarative join.
  *
  * Physical shape: the equi-key `jid` makes this a hash join with the range
  * condition evaluated as a post-probe filter. Accounting (job-scheduler
  * records) is orders of magnitude smaller than the metric stream, so the
  * build side is broadcast — at 100 TB of metrics this is a map-side join
  * with zero shuffle of the big side. The broadcast hint is EXPLICIT and
  * Catalyst will not demote it: if accounting outgrows broadcastable size,
  * pass `broadcastAccounting = false` (planner then picks a shuffled
  * hash/sort-merge join on `jid`) or use [[IntervalJoin.bucketed]].
  */
object IntervalJoin {

  /** `metrics` must carry `jid` and `Timestamp`; `accounting` must carry
    * `jid`, `start`, `end`. Boundary convention is `[start, end)` — the
    * step-2 semantics (`consumer.py:393`), not the 3.1 inclusive variant
    * (SURVEY.md §7.4.2). Jobs with `start >= end` are dropped
    * (`consumer.py:384-385`). */
  def apply(metrics: DataFrame, accounting: DataFrame,
            broadcastAccounting: Boolean = true): DataFrame = {
    val acct = accounting.filter(col("start") < col("end"))
    val build = if (broadcastAccounting) broadcast(acct) else acct
    metrics.alias("m").join(build.alias("a"),
      col("m.jid") === col("a.jid") &&
        col("m.Timestamp") >= col("a.start") &&
        col("m.Timestamp") < col("a.end"),
      "inner")
      .drop(col("a.jid"))
  }

  /** Scale-out variant for when the interval side outgrows the broadcast
    * threshold (SURVEY.md §4's "interval join planning rule" — realized as
    * an explicit operator): both sides map into fixed time buckets — each
    * interval explodes into every bucket it overlaps, each metric row into
    * exactly one — turning the range condition into an equi-join on
    * `(jid, bucket)` with a residual containment filter. Shuffle-partitioned
    * hash join, no broadcast, no all-pairs-per-jid blowup: a metric row
    * meets only the intervals overlapping its own bucket.
    *
    * `bucketMicros` should be ≥ the typical interval length (one explode
    * row per covered bucket per interval). Result is row-identical to
    * [[apply]].
    *
    * `inclusiveEnd = true` switches the containment to `[start, end]` —
    * the reference's step-3.1 boundary semantics
    * (`step-3.1/old/consumer_2.py:388,426`) and what SQL `BETWEEN`
    * means: the end instant itself matches, the last covered bucket is
    * `floor(end/w)` (no −1), and the point interval `start == end` is
    * valid rather than dropped. */
  def bucketed(metrics: DataFrame, accounting: DataFrame,
               bucketMicros: Long = 24L * 3600L * 1000000L,
               inclusiveEnd: Boolean = false): DataFrame = {
    require(bucketMicros > 0)
    // NTZ-tolerant µs extraction: no-op for TIMESTAMP, session-TZ
    // interpretation for TIMESTAMP_NTZ — applied to BOTH sides, so bucket
    // assignment stays consistent and the residual containment filter
    // still compares the original columns. NTZ wall times are ambiguous
    // under a DST-shifting zone (a spring-forward gap collapses two wall
    // clocks onto one instant, which can mis-bucket a row across a bucket
    // boundary and silently drop it from the equi-join), so NTZ inputs
    // require a fixed-offset session timezone (UTC, the engine default).
    val hasNtz = (Seq("Timestamp").map(metrics.schema(_)) ++
      Seq("start", "end").map(accounting.schema(_)))
      .exists(_.dataType == org.apache.spark.sql.types.TimestampNTZType)
    if (hasNtz) {
      val tz = metrics.sparkSession.conf.get("spark.sql.session.timeZone")
      require(java.time.ZoneId.of(tz).getRules.isFixedOffset,
        s"IntervalJoin.bucketed with TIMESTAMP_NTZ inputs requires a fixed-offset " +
          s"session timezone (got '$tz'): DST gaps make wall-clock bucketing ambiguous")
    }
    def micros(c: Column): Column = unix_micros(c.cast("timestamp"))
    def bucketOf(c: Column): Column =
      floor(micros(c) / lit(bucketMicros)).cast("long")
    val validInterval =
      if (inclusiveEnd) col("start") <= col("end") else col("start") < col("end")
    val lastBucket =
      if (inclusiveEnd) bucketOf(col("end"))
      else floor((micros(col("end")) - 1) / lit(bucketMicros)).cast("long")
    val upperCond =
      if (inclusiveEnd) col("m.Timestamp") <= col("a.end")
      else col("m.Timestamp") < col("a.end")
    val acct = accounting.filter(validInterval)
      .withColumn("__bucket",
        explode(sequence(bucketOf(col("start")), lastBucket)))
    val met = metrics.withColumn("__bucket", bucketOf(col("Timestamp")))
    met.alias("m").join(acct.alias("a"),
        col("m.__bucket") === col("a.__bucket") &&
          col("m.jid") === col("a.jid") &&
          col("m.Timestamp") >= col("a.start") &&
          upperCond,
        "inner")
      .drop(col("a.jid")).drop(col("a.__bucket")).drop(col("m.__bucket"))
  }
}
