package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization — the deterministic batch equivalent of
  * [[graft.streaming.EventAggregator.sessionize]]'s gap rule: per key,
  * events in time order split into a new session wherever the gap to the
  * previous event exceeds `gapMs`.
  *
  * Shape: one window shuffle on the key (lag + running sum, no global
  * sort) and one hash aggregation on `(key, session)` — both partition by
  * the key, so at 100 TB this distributes over millions of small groups.
  * Tie-safe: rows sharing a timestamp always land in the same session
  * whatever their window order, so the output is deterministic and
  * oracle-comparable.
  *
  * Output: `(key, session_idx, n_events, first_ts, last_ts, mean_value)`
  * with `session_idx` numbering each key's sessions 1..n in time order.
  */
object Sessionize {

  def apply(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
            gapMs: Long): DataFrame = {
    require(gapMs > 0, s"gapMs must be positive, got $gapMs")
    // withColumn would silently clobber same-named input columns
    Seq("__new", "session_idx").foreach { c =>
      require(!df.columns.contains(c),
        s"Sessionize reserves column name '$c'; rename it in the input")
    }
    val w = Window.partitionBy(keyCol).orderBy(tsCol)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev: Column = lag(col(tsCol), 1).over(w)
    df
      .withColumn("__new",
        when(prev.isNull ||
          (graft.functions.Exprs.tsMicros(col(tsCol)) -
            graft.functions.Exprs.tsMicros(prev)) > gapMs * 1000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(run))
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("first_ts"),
        max(col(tsCol)).as("last_ts"),
        avg(col(valueCol)).as("mean_value"))
  }
}
