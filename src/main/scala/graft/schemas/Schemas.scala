package graft.schemas

import org.apache.spark.sql.types._

/** Canonical schemas of the reference data model (SURVEY.md §1.4).
  *
  * Raw node CSVs: reference `step-1/data_processor.py:89-93` (block),
  * `:148-153` (cpu), `:235-239` (llite), `:300-302` (mem).
  * FRESCO long format: `step-1/data_processor.py:132-140`.
  * Accounting CSV: `step-2/consumer.py:184-190`.
  * Wide output: `step-2/consumer.py:29-34` + types `:534-546`.
  */
object Schemas {

  /** Null sentinels accepted by every CSV reader
    * (reference `step-1/data_processor.py:62-63`). */
  val NullSentinels: Seq[String] = Seq("", "NA", "NULL")

  /** Timestamp format of the raw node CSVs and accounting CSV
    * (reference `step-1/data_processor.py:102`). */
  val RawTsFormat = "MM/dd/yyyy HH:mm:ss"

  /** Timestamp format of step-2 metric parquet/CSV inputs
    * (reference `step-2/consumer.py:235`). */
  val MetricTsFormat = "yyyy-MM-dd HH:mm:ss"

  // ---- raw node CSVs (timestamps kept as strings; parsed by the transform) ----

  val block: StructType = StructType(Seq(
    StructField("jobID", StringType),
    StructField("node", StringType),
    StructField("timestamp", StringType),
    StructField("device", StringType),
    StructField("rd_sectors", DoubleType),
    StructField("wr_sectors", DoubleType)))

  val cpu: StructType = StructType(
    Seq("jobID", "node", "timestamp", "device").map(StructField(_, StringType)) ++
      Seq("user", "nice", "system", "idle", "iowait", "irq", "softirq")
        .map(StructField(_, DoubleType)))

  /** Cumulative jiffy counter columns of `cpu` (reference
    * `step-1/data_processor.py:169-174`). */
  val cpuCounterCols: Seq[String] =
    Seq("user", "nice", "system", "idle", "iowait", "irq", "softirq")

  val llite: StructType = StructType(Seq(
    StructField("jobID", StringType),
    StructField("node", StringType),
    StructField("timestamp", StringType),
    StructField("read_bytes", DoubleType),
    StructField("write_bytes", DoubleType)))

  // ---- legacy draft inputs (SURVEY §2.8 F15/F19; the rough-draft
  // transformer consumed block files carrying tick counters and an
  // `nfs.csv` with direct read/write columns —
  // `rough-drafts/rough_transform_stampede_to_fresco_ts_data.py:12,61`) ----

  val blockLegacy: StructType = StructType(
    block.fields ++ Seq(
      StructField("rd_ticks", DoubleType),
      StructField("wr_ticks", DoubleType)))

  val nfsLegacy: StructType = StructType(Seq(
    StructField("jobID", StringType),
    StructField("node", StringType),
    StructField("timestamp", StringType),
    StructField("direct_read", DoubleType),
    StructField("direct_write", DoubleType)))

  val mem: StructType = StructType(Seq(
    StructField("jobID", StringType),
    StructField("node", StringType),
    StructField("timestamp", StringType),
    StructField("MemTotal", DoubleType),
    StructField("MemFree", DoubleType),
    StructField("MemUsed", DoubleType),
    StructField("FilePages", DoubleType)))

  // ---- FRESCO long format (step-1 output / step-2 metric input) ----

  val fresco: StructType = StructType(Seq(
    StructField("Job Id", StringType),
    StructField("Host", StringType),
    StructField("Timestamp", TimestampType),
    StructField("Event", StringType),
    StructField("Value", DoubleType),
    StructField("Units", StringType)))

  /** The five metric events step-2 keeps (reference `step-2/consumer.py:234`). */
  val frescoEvents: Seq[String] =
    Seq("block", "cpuuser", "nfs", "memused", "memused_minus_diskcache")

  // ---- accounting CSV (step-2 input) ----

  val accounting: StructType = StructType(Seq(
    StructField("jobID", StringType),
    StructField("user", StringType),
    StructField("account", StringType),
    StructField("jobname", StringType),
    StructField("queue", StringType),
    StructField("nnodes", LongType),
    StructField("ncpus", LongType),
    StructField("walltime", LongType),
    StructField("start", StringType),
    StructField("end", StringType),
    StructField("submit", StringType),
    StructField("exit_status", StringType)))

  // ---- final wide output (step-2 output, step-3 input) ----

  /** Exact output column order (reference `step-2/consumer.py:29-34`). */
  val outputColumns: Seq[String] = Seq(
    "time", "submit_time", "start_time", "end_time",
    "timelimit", "nhosts", "ncores",
    "account", "queue", "host", "jid", "jobname", "exitcode",
    "host_list", "username",
    "value_cpuuser", "value_gpu", "value_memused",
    "value_memused_minus_diskcache", "value_nfs", "value_block")

  val wide: StructType = StructType(
    Seq("time", "submit_time", "start_time", "end_time")
      .map(StructField(_, TimestampType)) ++
      Seq("timelimit", "nhosts", "ncores").map(StructField(_, LongType)) ++
      Seq("account", "queue", "host", "jid", "jobname", "exitcode",
        "host_list", "username").map(StructField(_, StringType)) ++
      Seq("value_cpuuser", "value_gpu", "value_memused",
        "value_memused_minus_diskcache", "value_nfs", "value_block")
        .map(StructField(_, DoubleType)))
}
