package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.IntervalJoinRewrite

/** The interval-join optimizer rule: a natural `ts >= start AND ts < end`
  * join — DataFrame or SQL, with or without an equi key — is rewritten to
  * the bucketed equi-join shape, row-identically, and every scope guard
  * (hints, NTZ, already-bucketed, disabled) bails to the original plan. */
class RewriteSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private lazy val metrics = Seq(
    ("j1", ts("2013-01-01 10:00:30"), 1.0),
    ("j1", ts("2013-01-01 11:59:59"), 2.0),
    ("j1", ts("2013-01-02 10:00:00"), 3.0), // next day: other bucket
    ("j2", ts("2013-01-01 10:30:00"), 4.0),
    ("j9", ts("2013-01-01 10:00:00"), 5.0)  // no interval
  ).toDF("jid", "ts", "v")

  private lazy val intervals = Seq(
    ("j1", ts("2013-01-01 10:00:00"), ts("2013-01-01 12:00:00")),
    ("j1", ts("2013-01-02 00:00:00"), ts("2013-01-03 00:00:00")),
    ("j2", ts("2013-01-01 00:00:00"), ts("2013-01-01 10:00:00")) // excludes 10:30
  ).toDF("ijid", "start", "end")

  private def bucketGenerates(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate
          if g.generatorOutput.exists(_.name == "__graft_bucket") => g
    }.size

  private def rows(df: DataFrame): Set[(String, java.sql.Timestamp, Double)] =
    df.select("jid", "ts", "v").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2))).toSet

  test("pure range join (no equi key) is rewritten and row-identical to cross+filter") {
    val joined = metrics.join(intervals,
      $"ts" >= $"start" && $"ts" < $"end")
    assert(bucketGenerates(joined) == 1, "rewrite must fire for a pure range join")
    // reference: brute-force cross join + filter, rule disabled
    spark.conf.set(IntervalJoinRewrite.EnabledKey, "false")
    val expected = try rows(metrics.crossJoin(intervals)
      .filter($"ts" >= $"start" && $"ts" < $"end"))
    finally spark.conf.set(IntervalJoinRewrite.EnabledKey, "true")
    assert(rows(joined) == expected && expected.size == 5)
    // and no nested-loop/cartesian fallback survives in the physical plan
    joined.collect()
    val phys = joined.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin") && !phys.contains("CartesianProduct"),
      s"range join fell back to all-pairs:\n$phys")
  }

  test("equi + range join is rewritten and matches the broadcast interval join") {
    val joined = metrics.join(intervals,
      $"jid" === $"ijid" && $"ts" >= $"start" && $"ts" < $"end")
    assert(bucketGenerates(joined) == 1)
    val viaOperator = graft.operators.IntervalJoin(
      metrics.withColumnRenamed("ts", "Timestamp"),
      intervals.withColumnRenamed("ijid", "jid"))
      .select(col("jid"), col("Timestamp").as("ts"), col("v"))
    assert(rows(joined) == rows(viaOperator) && rows(joined).size == 3)
  }

  test("SQL range joins get the same rewrite") {
    metrics.createOrReplaceTempView("rw_m")
    intervals.createOrReplaceTempView("rw_i")
    val joined = spark.sql(
      """SELECT m.jid, m.ts, m.v FROM rw_m m JOIN rw_i i
        |ON m.jid = i.ijid AND m.ts >= i.start AND m.ts < i.end""".stripMargin)
    assert(bucketGenerates(joined) == 1)
    assert(rows(joined).size == 3)
  }

  test("guards: hinted, NTZ, already-bucketed, null bounds, and disabled all bail safely") {
    // explicit broadcast hint is respected — no rewrite
    val hinted = metrics.join(broadcast(intervals),
      $"ts" >= $"start" && $"ts" < $"end")
    assert(bucketGenerates(hinted) == 0)
    assert(rows(hinted).size == 5) // still correct via BNLJ
    // NTZ timestamps (what the parquet testdata reads as): rewritten under
    // the fixed-offset default UTC session...
    def ntzJoin = metrics.withColumn("ts", $"ts".cast("timestamp_ntz")).join(
      intervals.withColumn("start", $"start".cast("timestamp_ntz"))
        .withColumn("end", $"end".cast("timestamp_ntz")),
      $"ts" >= $"start" && $"ts" < $"end")
    assert(bucketGenerates(ntzJoin) == 1)
    assert(rows(ntzJoin.withColumn("ts", $"ts".cast("timestamp"))).size == 5)
    // ...but NOT under a DST-shifting zone, where wall-clock bucketing is
    // ambiguous (the explicit operator REQUIREs; a silent rule must bail)
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try assert(bucketGenerates(ntzJoin) == 0)
    finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    // the explicit bucketed operator is not re-bucketed on top
    val bucketed = graft.operators.IntervalJoin.bucketed(
      metrics.withColumnRenamed("ts", "Timestamp"),
      intervals.withColumnRenamed("ijid", "jid"))
    assert(bucketGenerates(bucketed) == 0)
    // null interval bounds produce no matches and no crash
    val withNull = intervals.union(
      Seq(("j9", null.asInstanceOf[java.sql.Timestamp], ts("2013-01-02 00:00:00")))
        .toDF("ijid", "start", "end"))
    val joined = metrics.join(withNull,
      $"jid" === $"ijid" && $"ts" >= $"start" && $"ts" < $"end")
    assert(bucketGenerates(joined) == 1)
    assert(!rows(joined).exists(_._1 == "j9"))
    // kill switch
    spark.conf.set(IntervalJoinRewrite.EnabledKey, "false")
    try assert(bucketGenerates(metrics.join(intervals,
      $"ts" >= $"start" && $"ts" < $"end")) == 0)
    finally spark.conf.set(IntervalJoinRewrite.EnabledKey, "true")
  }

  test("LEFT SEMI/ANTI range joins rewrite when intervals are on the right; never when left") {
    // semi: metrics rows falling in ANY interval
    val semi = metrics.join(intervals,
      $"ts" >= $"start" && $"ts" < $"end", "left_semi")
    assert(bucketGenerates(semi) == 1)
    spark.conf.set(IntervalJoinRewrite.EnabledKey, "false")
    val (semiExp, antiExp) = try (
      metrics.join(intervals, $"ts" >= $"start" && $"ts" < $"end", "left_semi")
        .collect().map(_.getString(0)).toSeq.sorted,
      metrics.join(intervals, $"ts" >= $"start" && $"ts" < $"end", "left_anti")
        .collect().map(_.getString(0)).toSeq.sorted)
    finally spark.conf.set(IntervalJoinRewrite.EnabledKey, "true")
    assert(semi.collect().map(_.getString(0)).toSeq.sorted == semiExp)
    // anti: metrics rows in NO interval — multiplicity of the exploded
    // side must not matter
    val anti = metrics.join(intervals,
      $"ts" >= $"start" && $"ts" < $"end", "left_anti")
    assert(bucketGenerates(anti) == 1)
    assert(anti.collect().map(_.getString(0)).toSeq.sorted == antiExp)
    // intervals on the LEFT (preserved) side: exploding it would duplicate
    // result rows — the rule must NOT fire
    val semiFlipped = intervals.join(metrics,
      $"ts" >= $"start" && $"ts" < $"end", "left_semi")
    assert(bucketGenerates(semiFlipped) == 0)
    assert(semiFlipped.count() == 2) // intervals containing >= 1 metric row
  }

  test("inclusive upper bound (BETWEEN) is rewritten and keeps the boundary row") {
    // interval ending EXACTLY on a metric timestamp: `<=` must keep it
    val incl = Seq(
      ("j1", ts("2013-01-01 10:00:00"), ts("2013-01-01 11:59:59")), // ends ON row 2
      ("j2", ts("2013-01-01 00:00:00"), ts("2013-01-01 10:30:00"))  // ends ON the 10:30 row
    ).toDF("ijid", "start", "end")
    val joined = metrics.join(incl,
      $"jid" === $"ijid" && $"ts".between($"start", $"end"))
    assert(bucketGenerates(joined) == 1, "rewrite must fire for BETWEEN / <= bounds")
    spark.conf.set(IntervalJoinRewrite.EnabledKey, "false")
    val expected = try rows(metrics.join(incl,
      $"jid" === $"ijid" && $"ts" >= $"start" && $"ts" <= $"end"))
    finally spark.conf.set(IntervalJoinRewrite.EnabledKey, "true")
    val got = rows(joined)
    assert(got == expected)
    // the boundary rows themselves are present — the exclusive form would
    // have dropped both
    assert(got.contains(("j1", ts("2013-01-01 11:59:59"), 2.0)))
    assert(got.contains(("j2", ts("2013-01-01 10:30:00"), 4.0)))
    // point interval start == end is VALID under inclusive bounds: it
    // matches exactly the row at that instant (the exclusive guard would
    // have routed it to the empty bucket list)
    val point = Seq(("j1", ts("2013-01-01 10:00:30"), ts("2013-01-01 10:00:30")))
      .toDF("ijid", "start", "end")
    val pj = metrics.join(point, $"jid" === $"ijid" && $"ts" >= $"start" && $"ts" <= $"end")
    assert(bucketGenerates(pj) == 1)
    assert(rows(pj) == Set(("j1", ts("2013-01-01 10:00:30"), 1.0)))
  }

  test("small-side bail: a sub-threshold interval side keeps the original plan when opted in") {
    val joined = () => metrics.join(intervals, $"ts" >= $"start" && $"ts" < $"end")
    // opt-in with a huge threshold: the tiny local relation is under it → bail
    spark.conf.set(IntervalJoinRewrite.SmallSideBytesKey, (64L * 1024 * 1024).toString)
    try {
      assert(bucketGenerates(joined()) == 0, "rule must bail on a broadcastable side")
      assert(rows(joined()).size == 5) // still correct via the un-rewritten plan
    } finally spark.conf.unset(IntervalJoinRewrite.SmallSideBytesKey)
    // default (-1) = no bail: same join rewrites again
    assert(bucketGenerates(joined()) == 1)
  }

  test("inverted and degenerate intervals yield no rows (explicit +1 sequence step)") {
    val bad = Seq(
      ("j1", ts("2013-01-05 00:00:00"), ts("2013-01-01 00:00:00")), // inverted
      ("j1", ts("2013-01-01 10:00:30"), ts("2013-01-01 10:00:30"))  // empty
    ).toDF("ijid", "start", "end")
    val joined = metrics.join(bad,
      $"jid" === $"ijid" && $"ts" >= $"start" && $"ts" < $"end")
    assert(bucketGenerates(joined) == 1)
    assert(joined.count() == 0) // auto-step would have counted DOWN and exploded rows
  }
}
