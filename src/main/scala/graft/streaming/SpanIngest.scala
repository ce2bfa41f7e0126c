package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.{Dedup, Materialize}

/** Continuous span-index maintenance: a stream of new documents gated
  * against — and folded into — a [[graft.operators.Dedup.writeSpanIndex]]
  * bucketed span-frequency layout, exactly-once. Closes the lambda loop
  * for the boilerplate gate the way [[IvfIngest]] closes it for ANN and
  * [[StreamingCurate.idempotentCurateIngestSink]] for signature dedup:
  * each micro-batch is scored against the CURRENT index (bucket-aligned,
  * only the batch's spans shuffle), the docs below the indexed-span
  * threshold land at `outDir/batch_id=N`, and the SAME kept docs' span
  * counts are appended under a batch-keyed epoch — so the NEXT batch
  * already gates against them. The batch cadence owns the layout:
  * [[graft.operators.Dedup.compactSpanIndex]] periodically folds the
  * per-append files (and the one-row-per-epoch span multiplicity) back
  * to build-time economics; counts are additive, so unlike the ANN side
  * there is no drift-gated relearn — the append IS the merge, deferred.
  *
  * {{{
  * spark.readStream.schema(docSchema).parquet(landingDir)
  *   .writeStream
  *   .foreachBatch(SpanIngest.sink(outDir, "span_ix", "doc_id", "text"))
  *   .option("checkpointLocation", ckpt)
  *   .trigger(Trigger.AvailableNow())   // or ProcessingTime for continuous
  *   .start()
  * }}}
  *
  * Delivery: `foreachBatch` is AT-LEAST-once under query restarts, and
  * the replay gate must cover the WHOLE sink, not just the append
  * (the [[StreamingCurate.idempotentCurateIngestSink]] lesson): a
  * committed key means the first run scored, landed, and appended — and
  * re-running the scoring would find the batch's own spans already in
  * the index, read indexed_frac ≈ 1 for every kept doc, and overwrite
  * the landing directory with an EMPTY keep set (data loss). One
  * delivery token gates both legs. A crash at any earlier point leaves
  * the key uncommitted and the re-run byte-identical: a crashed
  * append's orphan rows sit at an unlisted epoch, invisible to the
  * re-run's scoring, so the keep set recomputes exactly.
  *
  * Single-writer discipline: pause (or drain) the stream around a
  * rebuild or a compaction, exactly like batch appends. */
object SpanIngest {

  /** The `foreachBatch` sink: gate this micro-batch against the `name`
    * span index, land the keepers idempotently, append their spans under
    * the batch-id key. The kept frame is materialized once — it feeds
    * two writes, and re-running the gate per leg would double its cost.
    * An empty keep set still lands its (empty) batch directory for
    * read-side uniformity but skips the index append — an empty append
    * would burn an epoch and a per-bucket file for nothing.
    *
    * `preGate` composes the TWO-STAGE form — cheap coarse filter before
    * the fine one, the shape the reference's ingest consumer applies
    * before its exact check (step-2/consumer.py:356-364): a
    * [[graft.operators.Dedup.SpanSketch]] (typically built once at
    * stream start from the then-current index) sheds
    * boilerplate-dominated docs as a PURE PER-ROW FILTER — no join, no
    * shuffle — so only the survivors' spans enter the exact bucketed
    * join. On a boilerplate-heavy stream that shrinks the fine gate's
    * batch-side shuffle by the shed fraction at the cost of `depth`
    * array probes per span. Semantics: the composed gate drops a
    * SUPERSET of the exact gate's drops (the exact leg is still
    * applied; sketch estimates only overcount) — strictly more
    * aggressive boilerplate removal, never less. The sketch is STATIC
    * while the index grows per batch, so spans appended since the
    * sketch was built are caught by the exact leg only — staleness
    * costs pre-shed efficiency, never correctness. Replay safety is
    * unchanged: a committed key no-ops before either gate runs, and a
    * crashed attempt left nothing visible, so the retry's recompute —
    * with whatever sketch the restarted stream holds — is the one
    * delivered outcome. */
  def sink(outDir: String, name: String, idCol: String, textCol: String,
           maxIndexedFrac: Double = 0.5,
           preGate: Option[Dedup.SpanSketch] = None): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val key = s"batch_$batchId"
      if (!Dedup.spanIndexKeyCommitted(batch.sparkSession, name, key)) {
        val coarse = preGate.fold(batch)(sk =>
          Dedup.filterAgainstSpanSketch(batch, sk, idCol, textCol,
            maxIndexedFrac))
        val kept = Materialize.eagerCheckpoint(
          Dedup.filterAgainstBucketedSpanIndex(coarse, name, idCol, textCol,
            maxIndexedFrac))
        StreamingCurate.writeBatchIdempotent(kept, outDir, batchId)
        if (kept.limit(1).collect().nonEmpty) {
          Dedup.appendToSpanIndexIdempotent(kept, name, idCol, textCol, key)
          ()
        }
      }
    }
}
