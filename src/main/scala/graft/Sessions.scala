package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession factory: local-mode tuning per the builder contract
  * (shuffle partitions = cores, AQE on, UTC) plus
  * `spark.sql.legacy.parquet.nanosAsLong` so parquet TIMESTAMP(NANOS)
  * inputs (testdata `events.ts`) are readable — the loader converts them
  * back to µs timestamps. */
object Sessions {
  def local(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
