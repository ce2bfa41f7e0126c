package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.schemas.Schemas
import graft.streaming.Compactor

/** Streaming compactor spec: backlog pickup, daily partitioning, schema
  * guard, and exactly-once on restart (FIXTURES.md §5.8 schema drift). */
class CompactorSpec extends SparkSpec {
  import spark.implicits._

  private def frescoRows(day: String, n: Int) =
    (1 to n).map(i => ("JOB1", "N1", java.sql.Timestamp.valueOf(s"$day 10:0$i:00"),
      "cpuuser", i.toDouble, "CPU %"))
      .toDF("Job Id", "Host", "Timestamp", "Event", "Value", "Units")

  /** Land a single parquet FILE (like the reference's mover drops files,
    * not directories): write to staging, move the part file in. */
  private def landFile(df: org.apache.spark.sql.DataFrame, landing: String, name: String): Unit = {
    val staging = Files.createTempDirectory("staging").toFile
    df.coalesce(1).write.mode("overwrite").parquet(staging.getAbsolutePath)
    val part = staging.listFiles().find(_.getName.endsWith(".parquet")).get
    new java.io.File(landing).mkdirs()
    Files.move(part.toPath, new java.io.File(landing, name).toPath)
  }

  test("compactor picks up backlog, appends daily-partitioned parquet") {
    val base = Files.createTempDirectory("compactor").toFile.getAbsolutePath
    val landing = s"$base/landing"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    landFile(frescoRows("2013-01-01", 3), landing, "f1.parquet")
    landFile(frescoRows("2013-01-02", 2), landing, "f2.parquet")

    val q = Compactor.start(spark, landing, out, ckpt, Schemas.fresco)
    q.processAllAvailable()

    // new file arriving while running
    landFile(frescoRows("2013-01-01", 1), landing, "f3.parquet")
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(out)
    assert(got.count() == 6)
    assert(got.select("date").distinct().count() == 2)
    // restart with same checkpoint: nothing reprocessed (exactly-once)
    val q2 = Compactor.start(spark, landing, out, ckpt, Schemas.fresco)
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(out).count() == 6)
  }

  test("schema guard rejects drifted column sets") {
    val drifted = frescoRows("2013-01-01", 1).withColumnRenamed("Value", "Val")
    intercept[IllegalArgumentException] {
      Compactor.requireSameColumns(drifted.schema, Schemas.fresco)
    }
  }

  test("strict compactor: a drifted file arriving MID-STREAM fails loudly") {
    val base = Files.createTempDirectory("compactor-strict").toFile.getAbsolutePath
    val landing = s"$base/landing"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    landFile(frescoRows("2013-01-01", 3), landing, "good1.parquet")

    val q = Compactor.startStrict(spark, landing, out, ckpt, Schemas.fresco)
    q.processAllAvailable()
    assert(spark.read.parquet(out).count() == 3)

    // drift lands while the query is RUNNING — the plain file source would
    // silently null-fill the missing column; strict mode must kill the query
    landFile(frescoRows("2013-01-01", 2).drop("Value"), landing, "drifted.parquet")
    val e = intercept[Exception](q.processAllAvailable())
    var msgs = ""; var c: Throwable = e
    while (c != null) { msgs += c.getMessage + "\n"; c = c.getCause }
    val fromQuery = q.exception.map(_.toString).getOrElse("")
    assert((msgs + fromQuery).contains("schema mismatch"), msgs + fromQuery)
    q.stop()
    // the drifted batch must NOT have been appended
    assert(spark.read.parquet(out).count() == 3)
  }
}
