package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession factory: local-mode tuning per the builder contract
  * (shuffle partitions = cores, AQE on, UTC) plus
  * `spark.sql.legacy.parquet.nanosAsLong` so parquet TIMESTAMP(NANOS)
  * inputs (historical testdata `events.ts`) are readable — the loader
  * converts them back to µs timestamps — and
  * `spark.sql.parquet.inferTimestampNTZ.enabled=false` so NAIVE parquet
  * timestamps (isAdjustedToUTC=false, the current testdata encoding) read
  * as session-zoned TIMESTAMP rather than TIMESTAMP_NTZ: with the session
  * pinned to UTC the instant is identical, and time arithmetic
  * (`unix_micros` and friends) stays valid on every column without
  * per-query casts. */
object Sessions {

  /** The engine's recommended large-cluster configuration — the knobs that
    * matter at the 100 TB target, as one reviewable map. Apply via
    * [[cluster]] or `--conf` flags; values are starting points, not laws:
    *  - AQE owns runtime re-planning (coalesce, skew-join, local reads);
    *    advisory 64 MB keeps post-shuffle tasks in executor memory.
    *  - shuffle.partitions is a pre-AQE ceiling — size for the LARGEST
    *    stage (≈ total shuffle bytes / advisory size), AQE coalesces down.
    *  - 256 MB scan splits amortize parquet footer/open cost; zstd output
    *    trades CPU for the storage + network that dominate at fleet scale.
    *  - reliable dedup/CC checkpoints (plus `setCheckpointDir`) survive
    *    executor loss, which local checkpoints do not. */
  def clusterConf(shufflePartitions: Int = 2000): Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m",
    "spark.sql.shuffle.partitions" -> shufflePartitions.toString,
    "spark.sql.files.maxPartitionBytes" -> "256m",
    "spark.sql.parquet.compression.codec" -> "zstd",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false",
    graft.operators.Dedup.ReliableCheckpointKey -> "true")

  /** Builder pre-loaded with [[clusterConf]] and the graft extensions —
    * caller adds master/deploy specifics and `getOrCreate()`s. */
  def cluster(shufflePartitions: Int = 2000): SparkSession.Builder =
    clusterConf(shufflePartitions).foldLeft(
      SparkSession.builder().withExtensions(new GraftExtensions)) {
      case (b, (k, v)) => b.config(k, v)
    }

  def local(cpus: String): SparkSession = local(cpus, Map.empty)

  /** [[local]] with caller-supplied extra configs layered on top — the
    * concurrent-serving bench uses this to flip on the FAIR scheduler
    * (`spark.scheduler.mode` is context-creation-time only, so it cannot
    * be set on an existing session). */
  def local(cpus: String, extraConf: Map[String, String]): SparkSession = {
    val s = extraConf.foldLeft(SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
