package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming file compactor (SURVEY.md §2.9 T1/T2): replaces the
  * reference's watchdog + mover + appender processes
  * (`step-1/mover.py:27-113`, `step-1/appender.py:215-323`) with one
  * Structured Streaming query.
  *
  * The reference's per-target locks and temp-file + atomic-rename dance
  * exist to make concurrent appends safe; here exactly-once comes from the
  * streaming checkpoint + parquet commit protocol, and the daily layout
  * from `partitionBy(date)`. Backlog files present at start are picked up
  * automatically by the file source.
  */
object Compactor {

  /** Schema guard — the appender's column-set equality check before any
    * append (`step-1/appender.py:241-249` → `SchemaMismatchError`). */
  def requireSameColumns(incoming: StructType, target: StructType): Unit = {
    val in = incoming.fieldNames.toSet
    val tgt = target.fieldNames.toSet
    require(in == tgt,
      s"schema mismatch on append: incoming ${in.toSeq.sorted} vs target ${tgt.toSeq.sorted}")
  }

  /** Watch `landingDir` for FRESCO parquet files; append each micro-batch
    * to `outDir` partitioned by day. Caller stops the query (or it runs
    * until terminated).
    *
    * Uses the native parquet streaming sink, whose `_spark_metadata`
    * commit log gives true exactly-once on restart. (A `foreachBatch` +
    * batch `append` would be at-least-once: a crash between the parquet
    * commit and the checkpoint offset commit replays the batch.) */
  def start(spark: SparkSession, landingDir: String, outDir: String,
            checkpointDir: String, schema: StructType,
            trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery = {
    // schema-drift guard on the landing backlog (the appender's
    // SchemaMismatchError): the file source would otherwise silently
    // null-fill drifted files. Files arriving later with a drifted schema
    // are still null-filled (file-source limitation) — this catches the
    // drift at every (re)start.
    scala.util.Try(spark.read.parquet(landingDir).schema)
      .foreach(actual => requireSameColumns(actual, schema))
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1000)
      .parquet(landingDir)
      .withColumn("date", to_date(col("Timestamp")))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("compression", "zstd")
      .partitionBy("date")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** Strict variant of [[start]]: enforces the appender's column-set check
    * PER MICRO-BATCH, per file — a drifted file arriving MID-STREAM kills
    * the query with `schema mismatch` instead of being silently null-filled
    * (the file source projects everything onto the declared schema, so
    * drift detection needs the files' own footers).
    *
    * Tradeoffs vs [[start]], both inherent to `foreachBatch`:
    *  - at-least-once, not exactly-once: a crash between the batch append
    *    and the checkpoint offset commit replays the batch on restart
    *    (the reference appender has the same window between its parquet
    *    write and manifest update);
    *  - per-batch footer reads: one driver-side metadata read per new file
    *    (bounded by `maxFilesPerTrigger`), the price of the guard.
    * Use [[start]] when throughput matters more than loud drift. */
  def startStrict(spark: SparkSession, landingDir: String, outDir: String,
                  checkpointDir: String, schema: StructType,
                  trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1000)
      .parquet(landingDir)
      .select(col("*"), col("_metadata.file_path").as("__src_file"))
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val files = batch.select("__src_file").distinct()
          .collect().map(_.getString(0)) // ≤ maxFilesPerTrigger entries
        // per-file footer check — a union schema would mask a file MISSING
        // a column (union = superset), the drift the reference fails on
        files.foreach { f =>
          requireSameColumns(spark.read.parquet(f).schema, schema)
        }
        if (files.nonEmpty) {
          batch.drop("__src_file")
            .withColumn("date", to_date(col("Timestamp")))
            .write.mode("append")
            .option("compression", "zstd")
            .partitionBy("date")
            .parquet(outDir)
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
