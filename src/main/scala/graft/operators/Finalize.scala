package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Exprs._

/** Step-3 string standardization pass (SURVEY.md §3.3): `jid` gets `ID`
  * dropped, `job`→`JOB`, and `_S` appended; `host`, `host_list`, `username`
  * get `_S` appended — reference `step-3/final_cleanup.py:22-96`.
  *
  * The reference rewrites every parquet file in place with 100 worker
  * processes; in Spark this is a single narrow (shuffle-free) projection
  * whose parallelism is the file-split count.
  */
object Finalize {

  def apply(wide: DataFrame): DataFrame = {
    val withJid =
      if (wide.columns.contains("jid"))
        wide.withColumn("jid", finalizeJid(col("jid")))
      else wide
    Seq("host", "host_list", "username").foldLeft(withJid) { (df, c) =>
      if (df.columns.contains(c)) df.withColumn(c, suffixS(col(c))) else df
    }
  }
}
