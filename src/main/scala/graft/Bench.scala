package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR`, prints one JSON line. A warmup pass at sf0.001
  * first forces classloading / codegen so timings measure the queries, not
  * JVM startup. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    val spark = Sessions.local(cpus)

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
    }

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.foreach { case (name, fn) =>
      try fn(spark, warmupDir).count() catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
      }
    }

    val results = ordered.map { case (name, fn) =>
      dropPersistedState()
      val t0 = System.nanoTime()
      // a failed query is reported as -1, never as a (fast) fake timing
      val secs =
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0
        }
      name -> secs
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
