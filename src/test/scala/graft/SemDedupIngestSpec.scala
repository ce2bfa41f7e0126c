package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.streaming.SemDedupIngest

/** The streaming semantic-dedup gate: one-batch ≡ batch semDedup,
  * arrival-wins ordering, exactly-once replay, crashed-batch
  * invisibility, and the state guards. */
class SemDedupIngestSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated cells on the axes; near-dups at cosine ~0.995+,
  // cross-cell and in-cell non-dups far below the 0.97 gate
  private val centroids = Array(Array(1.0, 0.0), Array(0.0, 1.0))
  private def df(rows: (Long, Array[Double])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  private def statePath(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-semgate-$tag")
    d.toFile.deleteOnExit()
    new java.io.File(d.toFile, "state").getAbsolutePath
  }

  private def keptIds(path: String): Set[Long] =
    SemDedupIngest.keptSet(spark, path).collect()
      .map(_.getAs[Long]("vec_id")).toSet

  test("one-batch stream reproduces batch semDedup exactly") {
    val corpus = df(
      1L -> Array(1.0, 0.0), 2L -> Array(0.999, 0.01), // dups: 2 dies to 1
      3L -> Array(0.6, 0.8),                           // cell 1, not a dup
      4L -> Array(0.0, 1.0), 5L -> Array(0.01, 0.999)) // dups: 5 dies to 4
    val path = statePath("one")
    SemDedupIngest.init(spark, path, centroids)
    assert(SemDedupIngest.gateBatch(corpus, path, "vec_id", "embedding",
      minCosine = 0.97, key = "b0"))
    val batchForm = Similarity.semDedup(corpus, "vec_id", "embedding",
      centroids, minCosine = 0.97).collect().map(_.getLong(0)).toSet
    assert(keptIds(path) == batchForm && batchForm == Set(1L, 3L, 4L))
  }

  test("arrival wins across batches — a later near-dup dies even with a " +
    "smaller id; novel rows pass; replayed keys no-op; crashed batches " +
    "stay invisible") {
    val path = statePath("multi")
    SemDedupIngest.init(spark, path, centroids)
    assert(SemDedupIngest.gateBatch(df(10L -> Array(1.0, 0.0)), path,
      "vec_id", "embedding", 0.97, "b0"))
    // id 1 < 10, but 10 arrived first: batch semDedup would keep 1 —
    // the gate keeps 10 and drops 1 (the documented arrival rule)
    val b1 = df(1L -> Array(0.999, 0.01), 20L -> Array(0.0, 1.0))
    assert(SemDedupIngest.gateBatch(b1, path, "vec_id", "embedding",
      0.97, "b1"))
    assert(keptIds(path) == Set(10L, 20L))
    // replay of a committed key: no-op, nothing double-lands
    assert(!SemDedupIngest.gateBatch(b1, path, "vec_id", "embedding",
      0.97, "b1"))
    assert(keptIds(path) == Set(10L, 20L))
    // a CRASHED attempt (rows landed, commit record never written) is
    // invisible, and the retried key gates against the same kept set
    df(99L -> Array(0.6, 0.8)).withColumn("coarse", lit(0))
      .withColumn("build_id", lit(12345L))
      .write.mode("append").partitionBy("coarse").parquet(path)
    assert(keptIds(path) == Set(10L, 20L), "orphan rows must not serve")
    assert(SemDedupIngest.gateBatch(df(99L -> Array(0.6, 0.8)), path,
      "vec_id", "embedding", 0.97, "b2"))
    assert(keptIds(path) == Set(10L, 20L, 99L))
  }

  test("foreachBatch sink end to end over a MemoryStream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val path = statePath("stream")
    SemDedupIngest.init(spark, path, centroids)
    val in = MemoryStream[(Long, Array[Double])]
    val q = in.toDF().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch(SemDedupIngest.sink(path, "vec_id", "embedding", 0.97))
      .start()
    in.addData((1L, Array(1.0, 0.0)), (2L, Array(0.6, 0.8)))
    q.processAllAvailable()
    in.addData((3L, Array(0.999, 0.01)), (4L, Array(0.0, 1.0)))
    q.processAllAvailable()
    q.stop()
    assert(keptIds(path) == Set(1L, 2L, 4L),
      "streamed gate: 3 is a near-dup of kept 1, the rest pass")
  }

  test("state guards: double init, uninitialized path, empty kept set, " +
    "bad threshold") {
    val path = statePath("guards")
    SemDedupIngest.init(spark, path, centroids)
    val exInit = intercept[IllegalArgumentException] {
      SemDedupIngest.init(spark, path, centroids) }
    assert(exInit.getMessage.contains("already initialized"))
    val exKept = intercept[IllegalArgumentException] {
      SemDedupIngest.keptSet(spark, path) }
    assert(exKept.getMessage.contains("no committed batches"))
    intercept[IllegalArgumentException] {
      SemDedupIngest.gateBatch(df(1L -> Array(1.0, 0.0)),
        statePath("raw") + "-missing", "vec_id", "embedding", 0.97, "k") }
    intercept[IllegalArgumentException] {
      SemDedupIngest.gateBatch(df(1L -> Array(1.0, 0.0)), path,
        "vec_id", "embedding", minCosine = 0.0, key = "k") }
  }
}
