package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle fact tables once at write time so
  * repeated joins/aggregations on the bucket key run shuffle-free — the
  * standard trade for 100 TB fact⋈fact joins that can't broadcast either
  * side (SURVEY.md §4: co-located joins via bucketing).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table on `key`. Later joins
    * between tables bucketed the same way on the same key produce
    * sort-merge joins with zero Exchange. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .option("compression", "zstd")
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
