package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salted aggregation / join must be value-identical to the unsalted
  * equivalents — salting only changes the physical key distribution. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = // one hot key (90%), several cold ones
    ((1 to 900).map(i => ("hot", i.toDouble)) ++
      (1 to 100).map(i => (s"cold${i % 7}", i.toDouble))).toDF("k", "v")

  test("saltedAgg equals plain aggregation") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum($"v").as("tot"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Skew.saltedAgg(skewed, Seq("k"), 8,
        "n" -> (count(lit(1)), (ps: org.apache.spark.sql.Column) => sum(ps)),
        "tot" -> (sum($"v"), (ps: org.apache.spark.sql.Column) => sum(ps)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted == plain)
  }

  test("saltedJoin equals plain join") {
    val dim = Seq(("hot", "H"), ("cold1", "C1"), ("cold2", "C2")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).groupBy("k", "label")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val salted = Skew.saltedJoin(skewed, dim, "k", 8).groupBy("k", "label")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(salted == plain)
  }

  /** Per-task shuffle-read bytes of the heaviest stage of an action — the
    * empirical footprint AQE skew handling must flatten. */
  private def joinStageTaskReads(run: => Long): Seq[Long] = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val reads = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val l = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        Option(te.taskMetrics).foreach(m =>
          reads.add((te.stageId, m.shuffleReadMetrics.totalBytesRead)))
    }
    spark.sparkContext.addSparkListener(l)
    try {
      run
      // listener bus is async — wait until the event stream drains
      var last = -1; var stable = 0
      while (stable < 5) {
        Thread.sleep(100)
        val cur = reads.size
        if (cur == last) stable += 1 else { stable = 0; last = cur }
      }
    } finally spark.sparkContext.removeSparkListener(l)
    import scala.jdk.CollectionConverters._
    val byStage = reads.asScala.toSeq.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    info(s"stage shuffle-read breakdown: ${byStage.map { case (s, r) =>
      s"stage $s: n=${r.size} sum=${r.sum} max=${r.max}" }.mkString("; ")}")
    byStage.values.maxBy(_.sum).toSeq
  }

  test("whale jid: AQE skew-split bounds max task input in the bucketed interval join") {
    // the scale claim argued in IntervalJoin's docs, pinned on task
    // metrics: one jid carries 50% of the metric stream; the bucketed
    // equi-join (the beyond-broadcast regime, so broadcast is disabled)
    // must not leave one straggler task holding half the shuffle
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.shuffle.partitions",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption.flatMap(Option(_))).toMap
    def restore(): Unit = saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
    try {
      conf.set("spark.sql.shuffle.partitions", "32")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
      // at test scale the 1MB minPartitionSize floor + parallelism-first
      // coalescing would re-merge everything into one task and mask the
      // skew behavior under test — make the advisory size govern
      conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "32k")

      val base = 1356998400L // 2013-01-01 UTC
      // 32 input partitions: skew-split granularity is per-map output block
      val metrics = spark.range(0, 200000, 1, 32).select(
        when(pmod($"id", lit(2)) === 0, lit("whale"))
          .otherwise(concat(lit("j"), pmod($"id", lit(199)))).as("jid"),
        timestamp_seconds(lit(base) + pmod($"id", lit(86400))).as("Timestamp"),
        ($"id" % 100).cast("double").as("value"))
      val acct = (Seq("whale") ++ (0 until 199).map(i => s"j$i")).toDF("jid")
        .select($"jid", timestamp_seconds(lit(base)).as("start"),
          timestamp_seconds(lit(base + 86400)).as("end"))

      def ratio(reads: Seq[Long]): Double = {
        val nonzero = reads.filter(_ > 0).sorted
        assert(nonzero.size >= 3, s"too few join tasks: $reads")
        nonzero.last.toDouble / nonzero(nonzero.size / 2)
      }

      val withSkewHandling = joinStageTaskReads(
        graft.operators.IntervalJoin.bucketed(metrics, acct).count())
      assert(withSkewHandling.nonEmpty)
      val rAqe = ratio(withSkewHandling)

      conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val control = joinStageTaskReads(
        graft.operators.IntervalJoin.bucketed(metrics, acct).count())
      val rCtrl = ratio(control)

      // every metric row matches its own job interval exactly once
      assert(graft.operators.IntervalJoin.bucketed(metrics, acct).count() == 200000L)
      assert(rAqe <= 5.0,
        s"whale task still ${rAqe}x median with skew join on (reads: $withSkewHandling)")
      assert(rCtrl >= 2 * rAqe,
        s"control should be visibly skewed: control ${rCtrl}x vs aqe ${rAqe}x")
    } finally restore()
  }
}
