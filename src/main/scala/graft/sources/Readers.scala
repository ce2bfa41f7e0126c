package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.functions.Exprs._
import graft.schemas.Schemas

/** Source readers (SURVEY.md §2.1 S1-S4): schema-typed, null-sentinel-aware,
  * tolerant of missing columns — the Spark-native form of the reference's
  * lenient Polars readers.
  */
object Readers {

  /** Add any schema columns absent from `df` as typed nulls (missing-column
    * tolerance — reference `step-1/data_processor.py:70-79`), then project
    * to exactly the schema's columns in order. */
  def ensureColumns(df: DataFrame, schema: StructType): DataFrame = {
    val present = df.columns.map(_.toLowerCase).toSet
    val cols = schema.fields.map { f =>
      if (present(f.name.toLowerCase)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Robust CSV read (S1): explicit schema, header, PERMISSIVE mode, null
    * sentinels `["", "NA", "NULL"]` — reference
    * `step-1/data_processor.py:53-84`. Missing columns tolerated via a
    * header-only probe + [[ensureColumns]]. */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    // Read with the declared schema directly when the file's header matches;
    // otherwise read leniently and conform. A header-only inferSchema=false
    // read is one tiny file-listing job — no data scan.
    val header = spark.read.option("header", "true").csv(path).schema.fieldNames
      .map(_.toLowerCase).toSet
    val declared = schema.fieldNames.map(_.toLowerCase).toSet
    val base = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("nullValue", "NA")
      .option("emptyValue", "")
    if (header == declared) {
      base.schema(schema).csv(path).na.replace(
        schema.fields.filter(_.dataType.typeName == "string").map(_.name),
        Map("NULL" -> null, "NA" -> null))
    } else {
      ensureColumns(base.csv(path), schema)
    }
  }

  /** Lazy parquet scan of FRESCO metric files (S3) with case-insensitive
    * column conformance and event-set filter — reference
    * `step-2/consumer.py:240-290`. */
  def frescoMetrics(spark: SparkSession, path: String): DataFrame = {
    val df = ensureColumns(spark.read.parquet(path), Schemas.fresco)
    df.filter(col("Event").isin(Schemas.frescoEvents: _*))
      .withColumn("jid", normalizeJobId(col("Job Id")))
  }

  /** Accounting CSV (S2): typed read + `MM/DD/YYYY` date parsing + jid
    * normalization + key-null drop — reference `step-2/consumer.py:178-223`. */
  def accounting(spark: SparkSession, path: String): DataFrame =
    csv(spark, path, Schemas.accounting)
      .withColumn("start", parseRawTs(col("start")))
      .withColumn("end", parseRawTs(col("end")))
      .withColumn("submit", parseRawTs(col("submit")))
      .withColumn("jid", normalizeJobId(col("jobID")))
      .na.drop(Seq("jid", "start", "end"))
}
