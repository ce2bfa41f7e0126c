package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{BucketAggregate, Finalize, IntervalJoin, MetricTransforms}
import graft.sources.Readers

/** End-to-end pipeline wiring (SURVEY.md §3): raw node CSVs → FRESCO long →
  * interval join with accounting → bucketed wide table → finalized output.
  * The reference spreads this over three OS-process stages with filesystem
  * handoff; here it is one logical plan per stage with parquet boundaries
  * only where the reference's data contract requires them.
  */
object Pipeline {

  /** Step 1: the four raw CSV families of one or many nodes → FRESCO long.
    * Paths may contain globs; Spark parallelizes over file splits. */
  def step1(spark: SparkSession, blockPath: String, cpuPath: String,
            llitePath: String, memPath: String): DataFrame = {
    import graft.schemas.Schemas._
    MetricTransforms.allFamilies(
      Readers.csv(spark, blockPath, block),
      Readers.csv(spark, cpuPath, cpu),
      Readers.csv(spark, llitePath, llite),
      Readers.csv(spark, memPath, mem))
  }

  /** Daily-partitioned zstd sink (SURVEY.md §2.1 S5/S7) — replaces the
    * reference's split-by-strftime + one-file-per-day writes
    * (`step-1/transformer.py:265-338`). Partitioning by date gives step-2
    * partition pruning for month-scoped reads. */
  def writeDaily(fresco: DataFrame, outDir: String,
                 overwrite: Boolean = false): Unit = {
    val base = fresco
      .withColumn("date", to_date(col("Timestamp")))
      // sorted files give step-2 readers row-group locality per job/time
      // (the reference's `sorted-*.parquet` contract, SURVEY §2.6 O4,
      // without requiring pre-sorted input)
      .sortWithinPartitions(col("date"), col("Job Id"), col("Timestamp"))
      .write
      .option("compression", "zstd")
      .partitionBy("date")
    // default APPEND: successive node batches add to existing days (the
    // reference appender's contract). overwrite=true replaces only the
    // days present in THIS batch (dynamic overwrite) — a full-output wipe
    // (static overwrite) would silently drop earlier batches' days.
    (if (overwrite)
       base.mode("overwrite").option("partitionOverwriteMode", "dynamic")
     else base.mode("append"))
      .parquet(outDir)
  }

  /** Step 2: FRESCO metrics ⋈ accounting → 1-minute bucketed wide table. */
  def step2(metrics: DataFrame, accounting: DataFrame): DataFrame =
    BucketAggregate(IntervalJoin(metrics, accounting))

  /** Step 2 from paths. */
  def step2(spark: SparkSession, metricsPath: String, accountingPath: String): DataFrame =
    step2(Readers.frescoMetrics(spark, metricsPath),
      Readers.accounting(spark, accountingPath))

  /** Step 3: final string standardization. */
  def step3(wide: DataFrame): DataFrame = Finalize(wide)

  /** Attach per-stage audit metrics (SURVEY §2.4 A10 — the reference logs
    * row counts at every stage): returns the observed frame and an
    * `Observation` whose `get` yields `rows` / `null_values` after the
    * next action, without a second scan. */
  def observed(df: DataFrame, name: String): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val valueNulls =
      if (df.columns.contains("Value"))
        sum(when(col("Value").isNull, 1L).otherwise(0L))
      else lit(0L)
    (df.observe(obs, count(lit(1)).as("rows"), valueNulls.as("null_values")), obs)
  }
}
