package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.TextIndex

/** Continuous retrieval-index maintenance: a stream of new documents
  * kept searchable in a [[graft.operators.TextIndex]] layout,
  * exactly-once — the retrieval counterpart of [[IvfIngest]] (ANN) and
  * [[SpanIngest]] (boilerplate gate).
  *
  * Cold start needs no prior `bm25-build` step: the first non-empty
  * batch against a FRESH path bootstraps the index as its first epoch
  * (the sink passes [[graft.operators.TextIndex.appendEpoch]]'s
  * `bootstrap = true` — opt-in there, because for a bare CLI append a
  * missing index is usually a mistyped path, while the sink's
  * checkpoint pins this one; a path with `_old`/`_staging` swap
  * residue still fails loudly with the recovery instructions rather
  * than papering over a crashed compaction).
  *
  * Each micro-batch lands as ONE committed epoch
  * ([[graft.operators.TextIndex.appendEpoch]] — the batch is indexed
  * and written, no existing file is read or touched), keyed by the
  * batch id: `foreachBatch` is AT-LEAST-once under query restarts, and
  * a replayed batch overwrites its own epoch dirs instead of
  * double-counting its postings. Serving ([[graft.operators.TextIndex
  * .read]]) sees only committed epochs, so a crashed append is
  * invisible and searches stay correct mid-ingest. The BATCH cadence
  * owns the layout: [[graft.operators.TextIndex.compact]] folds the
  * per-batch epochs back to one term-sorted epoch (restoring row-group
  * pruning across the whole index) and GCs crashed orphans — pause the
  * stream around it, single-writer discipline like every compactor
  * here.
  *
  * {{{
  * spark.readStream.schema(docSchema).parquet(landingDir)
  *   .writeStream
  *   .foreachBatch(TextIndexIngest.sink(indexPath, "doc_id", "text"))
  *   .option("checkpointLocation", ckpt)
  *   .trigger(Trigger.AvailableNow())
  *   .start()
  * }}}
  *
  * Id-disjointness across batches is the source's contract (exact
  * within-stream dedup upstream via [[StreamingCurate.dedupedStream]]
  * where the source can replay ids). */
object TextIndexIngest {

  /** The `foreachBatch` sink: land this micro-batch as epoch
    * `b<batchId>`. Empty batches are skipped without burning an epoch
    * (AvailableNow triggers emit them freely). */
  def sink(indexPath: String, idCol: String, textCol: String,
           termPartitions: Int = 32): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      if (batch.limit(1).collect().nonEmpty) {
        // allowReplace: a replayed batch id carries the SAME source rows
        // (Structured Streaming replays the offset range), so re-landing
        // its epoch is idempotent re-delivery, not data replacement
        // bootstrap: the sink's cold-start contract — its checkpoint pins
        // the path, so "no index here yet" really is a first batch, not
        // the mistyped-path hazard that keeps bare appendEpoch fail-loud
        TextIndex.appendEpoch(batch, indexPath, idCol, textCol,
          epoch = s"b$batchId", termPartitions = termPartitions,
          allowReplace = true, bootstrap = true)
        ()
      }
}
