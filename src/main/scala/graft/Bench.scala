package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR`, prints one JSON line. A warmup pass at sf0.001
  * first forces classloading / codegen so timings measure the queries, not
  * JVM startup.
  *
  * Isolation: before each timed query ALL persisted state is dropped and
  * the JVM is settled (GC + a pause for the ContextCleaner to drain its
  * reference queue) so cleanup work from the PREVIOUS query — broadcast
  * removals, checkpoint-block eviction — cannot bleed into the next timed
  * window. Per-query shuffle/spill totals ride alongside wall time in the
  * JSON so regressions are attributable without a profiler.
  *
  * `SPARK_GRAFT_ONLY=q_a,q_b` restricts the run (dev loop). */
object Bench {

  /** Accumulates task-level IO counters; reset per timed query. */
  private final class TaskMetricsListener extends SparkListener {
    val shuffleRead = new AtomicLong; val shuffleWrite = new AtomicLong
    val memSpill = new AtomicLong; val diskSpill = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
      }
    }
    def reset(): Unit = Seq(shuffleRead, shuffleWrite, memSpill, diskSpill).foreach(_.set(0L))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').map(_.trim).toSet)
    val spark = Sessions.local(cpus)
    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)

    // Drop ALL persisted state — CacheManager entries (df.cache) and
    // localCheckpoint blocks (dedup/CC internals). Between queries the
    // prior query's frames are dead, so unpersisting their truncated-
    // lineage blocks is safe, and each timing is attributable to its own
    // query instead of inheriting (or re-populating) a predecessor's cache.
    def dropPersistedState(): Unit = {
      spark.catalog.clearCache()
      // blocking: eviction must FINISH before the next query's timer
      // starts, or the drop work (and still-occupied memory) bleeds into
      // the timed window — this call sits off the timed path
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      // Settle the ContextCleaner: its cleanups (broadcast/RDD/shuffle
      // removal) only start once a GC proves the references dead, and run
      // on its own thread — without this barrier a heavy predecessor's
      // cleanup lands inside the NEXT query's timed window (the r2
      // q_dedup_exact 10x anomaly). Two GC passes: the first enqueues the
      // weak references, the pause lets the cleaner drain, the second
      // collects anything the drain itself released.
      System.gc(); Thread.sleep(400)
      System.gc(); Thread.sleep(100)
    }

    val all = SparkEntry.queries.toSeq.sortBy(_._1)
    val ordered = only.fold(all)(f => all.filter(kv => f(kv._1)))
    ordered.foreach { case (name, fn) =>
      try fn(spark, warmupDir).count() catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
      }
    }

    val results = ordered.map { case (name, fn) =>
      dropPersistedState()
      listener.reset()
      val t0 = System.nanoTime()
      // a failed query is reported as -1, never as a (fast) fake timing
      val secs =
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0
        }
      val mb = 1024.0 * 1024.0
      (name, secs, listener.shuffleWrite.get / mb,
        listener.memSpill.get / mb, listener.diskSpill.get / mb)
    }
    val qs = results.map { case (k, v, _, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val io = results.map { case (k, _, sw, ms, ds) =>
      f""""$k":{"shuffle_write_mb":$sw%.2f,"mem_spill_mb":$ms%.2f,"disk_spill_mb":$ds%.2f}"""
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"io":$io,"sf":"$sfDir"}""")
    spark.stop()
  }
}
