package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.EventAggregator
import graft.streaming.EventAggregator.HostEvent

/** Streaming event-time aggregation specs driven synchronously through
  * MemoryStream + processAllAvailable. */
class EventAggregatorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked tumbling window aggregates per event") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, Double)]
    val events = in.toDF().toDF("Event", "Timestamp", "Value")
    val q = EventAggregator.windowedMetrics(events, "1 minute", "5 minutes")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()

    in.addData(
      ("cpuuser", ts("2013-01-01 10:00:10"), 10.0),
      ("cpuuser", ts("2013-01-01 10:00:50"), 30.0),
      ("block", ts("2013-01-01 10:00:20"), 1.0),
      ("cpuuser", ts("2013-01-01 10:01:10"), 50.0),
      // advance watermark far enough to close the 10:00 and 10:01 windows
      ("cpuuser", ts("2013-01-01 10:30:00"), 0.0))
    q.processAllAvailable()
    in.addData(("cpuuser", ts("2013-01-01 11:00:00"), 0.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_out").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(rows(("2013-01-01 10:00:00.0", "cpuuser")) == (2L, 20.0))
    assert(rows(("2013-01-01 10:00:00.0", "block")) == (1L, 1.0))
    assert(rows(("2013-01-01 10:01:00.0", "cpuuser")) == (1L, 50.0))
  }

  test("stream-static interval enrichment ≡ batch IntervalJoin; stateless") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.IntervalJoin
    val in = MemoryStream[(String, Timestamp, Double)]
    val metrics = in.toDF().toDF("jid", "Timestamp", "value")
    val acct = Seq(
      ("j1", ts("2013-01-01 10:00:00"), ts("2013-01-01 11:00:00")),
      ("j2", ts("2013-01-01 10:30:00"), ts("2013-01-01 10:30:00")), // degenerate: dropped
      ("j3", ts("2013-01-01 09:00:00"), ts("2013-01-01 09:30:00"))
    ).toDF("jid", "start", "end")
    val q = EventAggregator.enrichWithAccounting(metrics, acct)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    val rows = Seq(
      ("j1", ts("2013-01-01 10:00:00"), 1.0), // == start: in
      ("j1", ts("2013-01-01 10:59:59"), 2.0), // in
      ("j1", ts("2013-01-01 11:00:00"), 3.0), // == end: out ([start, end))
      ("j2", ts("2013-01-01 10:30:00"), 4.0), // degenerate interval: out
      ("j3", ts("2013-01-01 09:15:00"), 5.0), // in
      ("jX", ts("2013-01-01 10:15:00"), 6.0)) // unmatched jid: out
    in.addData(rows.take(3))
    q.processAllAvailable()
    // no state store: the join must be stateless micro-batch probing
    assert(q.lastProgress.stateOperators.isEmpty,
      "stream-static inner join must not allocate a state store")
    in.addData(rows.drop(3)) // rest arrives in a LATER micro-batch
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getTimestamp(1), r.getDouble(2),
        r.getTimestamp(3), r.getTimestamp(4))
    val streamed = spark.table("enrich_out").collect().map(key).toSet
    val batch = IntervalJoin(rows.toDF("jid", "Timestamp", "value"), acct)
      .collect().map(key).toSet
    assert(streamed == batch, "streaming enrichment must equal the batch join")
    assert(streamed.map(_._3) == Set(1.0, 2.0, 5.0))
  }

  test("stream-static enrichment with broadcast OFF ≡ batch (shuffled join path)") {
    // the non-broadcast posture for when accounting outgrows the broadcast
    // threshold: stream-static INNER joins are stateless per micro-batch
    // under any join strategy, so the shuffled-hash/SMJ plan must work and
    // match the batch operator row for row
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.IntervalJoin
    val in = MemoryStream[(String, Timestamp, Double)]
    val metrics = in.toDF().toDF("jid", "Timestamp", "value")
    val acct = Seq(
      ("j1", ts("2013-01-01 10:00:00"), ts("2013-01-01 11:00:00")),
      ("j3", ts("2013-01-01 09:00:00"), ts("2013-01-01 09:30:00"))
    ).toDF("jid", "start", "end")
    val q = EventAggregator.enrichWithAccounting(metrics, acct,
        broadcastAccounting = false)
      .writeStream.format("memory").queryName("enrich_shuffled_out")
      .outputMode("append").start()
    val rows = Seq(
      ("j1", ts("2013-01-01 10:00:00"), 1.0), // == start: in
      ("j1", ts("2013-01-01 11:00:00"), 2.0), // == end: out ([start, end))
      ("j3", ts("2013-01-01 09:15:00"), 3.0), // in
      ("jX", ts("2013-01-01 10:15:00"), 4.0)) // unmatched jid: out
    in.addData(rows.take(2))
    q.processAllAvailable()
    assert(q.lastProgress.stateOperators.isEmpty,
      "non-broadcast stream-static inner join must stay stateless")
    in.addData(rows.drop(2))
    q.processAllAvailable()
    q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getTimestamp(1), r.getDouble(2),
        r.getTimestamp(3), r.getTimestamp(4))
    val streamed = spark.table("enrich_shuffled_out").collect().map(key).toSet
    val batchDf = IntervalJoin(rows.toDF("jid", "Timestamp", "value"), acct,
      broadcastAccounting = false)
    assert(streamed == batchDf.collect().map(key).toSet)
    assert(streamed.map(_._3) == Set(1.0, 3.0))
    // with the explicit broadcast hint off, the IntervalJoinRewrite rule
    // takes the plan to the bucketed `(jid, bucket)` equi-join — the
    // non-broadcast 100 TB shape (AQE is then free to broadcast the tiny
    // exploded side at THIS scale; at real scale it shuffles): pin that
    // the rewrite fired, not a strategy choice AQE owns
    val phys = batchDf.queryExecution.executedPlan.toString
    assert(phys.contains("__graft_bucket"),
      s"broadcastAccounting=false should auto-rewrite to the bucketed form:\n$phys")
  }

  test("sessionization splits sessions on intra-batch gaps (replay == live)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[HostEvent]
    val q = EventAggregator.sessionize(in.toDS(), gapMs = 60000)
      .writeStream.format("memory").queryName("sess_split")
      .outputMode("append").start()
    // one batch carrying TWO sessions for N1 (10:00-10:00:30, then 12:00)
    in.addData(
      HostEvent("N1", ts("2013-01-01 10:00:00"), 10.0),
      HostEvent("N1", ts("2013-01-01 10:00:30"), 30.0),
      HostEvent("N1", ts("2013-01-01 12:00:00"), 99.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess_split").collect()
      .map(r => (r.getLong(1), r.getDouble(4)))
    assert(out.toSeq == Seq((2L, 20.0))) // first session closed in-batch
  }

  test("streaming dedup drops repeats within the watermark, in and across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Timestamp, Double)]
    val q = EventAggregator.dedupStream(
        in.toDF().toDF("content_hash", "ts", "value"), "ts", "10 minutes",
        Seq("content_hash"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    in.addData(
      ("hA", ts("2013-01-01 10:00:00"), 1.0),
      ("hA", ts("2013-01-01 10:00:05"), 2.0), // dup within batch
      ("hB", ts("2013-01-01 10:00:10"), 3.0))
    q.processAllAvailable()
    in.addData(("hA", ts("2013-01-01 10:01:00"), 4.0)) // dup across batches
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_out").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out == Map("hA" -> 1.0, "hB" -> 3.0)) // first arrival wins
  }

  test("streaming sessionize == batch Sessionize on the same events") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      HostEvent("N1", ts("2013-01-01 10:00:00"), 10.0),
      HostEvent("N1", ts("2013-01-01 10:00:30"), 30.0),
      HostEvent("N1", ts("2013-01-01 10:05:00"), 50.0), // gap > 1 min → new session
      HostEvent("N2", ts("2013-01-01 10:00:05"), 5.0),
      HostEvent("N2", ts("2013-01-01 10:00:05"), 7.0)) // duplicate ts, same session
    val in = MemoryStream[HostEvent]
    val q = EventAggregator.sessionize(in.toDS(), gapMs = 60000)
      .writeStream.format("memory").queryName("sess_eq")
      .outputMode("append").start()
    in.addData(data: _*)
    q.processAllAvailable()
    // advance the watermark so every open session times out and emits
    in.addData(HostEvent("N9", ts("2013-01-01 12:00:00"), 0.0))
    q.processAllAvailable()
    in.addData(HostEvent("N9", ts("2013-01-01 12:00:01"), 0.0))
    q.processAllAvailable()
    q.stop()
    val streaming = spark.table("sess_eq").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2), r.getTimestamp(3),
        r.getDouble(4))).toSet

    val batch = graft.operators.Sessionize(
        data.toDF("host", "ts", "value"), "host", "ts", "value", gapMs = 60000)
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_events"),
        r.getAs[java.sql.Timestamp]("first_ts"), r.getAs[java.sql.Timestamp]("last_ts"),
        r.getAs[Double]("mean_value"))).toSet
    assert(streaming == batch) // same gap rule, two execution models
  }

  test("stateful sessionization closes sessions when the watermark passes the gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[HostEvent]
    val q = EventAggregator.sessionize(in.toDS(), gapMs = 60000)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()

    in.addData(
      HostEvent("N1", ts("2013-01-01 10:00:00"), 10.0),
      HostEvent("N1", ts("2013-01-01 10:00:30"), 30.0),
      HostEvent("N2", ts("2013-01-01 10:00:05"), 5.0))
    q.processAllAvailable()
    assert(spark.table("sess_out").isEmpty) // sessions still open
    // a much later event advances the watermark beyond last+gap → both
    // open sessions time out on the following batch
    in.addData(HostEvent("N9", ts("2013-01-01 11:00:00"), 0.0))
    q.processAllAvailable()
    in.addData(HostEvent("N9", ts("2013-01-01 11:00:01"), 0.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sess_out").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(4))).toMap
    assert(out.keySet == Set("N1", "N2"))
    assert(out("N1") == (2L, 20.0))
    assert(out("N2") == (1L, 5.0))
  }
}
