package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Dedup

/** Continuous multimodal hash-index maintenance: a stream of new binary
  * assets kept servable in a [[graft.operators.Dedup.writeHashIndex]]
  * layout, exactly-once — the multimodal member of the engine's ingest
  * sink family ([[IvfIngest]] for ANN layouts, the banded-MinHash append
  * inside [[StreamingCurate]] for text near-dup).
  *
  * Each micro-batch is decoded and hashed ONCE (the narrow pass: 8 bytes
  * leave the codec boundary per asset) and appended under its batch-id
  * idempotency key ([[graft.operators.Dedup.appendToHashIndexIdempotent]]):
  * `foreachBatch` is AT-LEAST-once under query restarts, so a replayed
  * batch reads as already-delivered and no-ops instead of serving its
  * hashes twice. New assets become near-dup-servable
  * ([[graft.operators.Dedup.pairsAgainstHashIndex]]) at the next batch
  * boundary; the batch cadence owns [[graft.operators.Dedup
  * .compactHashIndex]], which folds per-append files back to ~one per
  * bucket. Single-writer discipline around rebuilds/compactions, exactly
  * like the other sinks.
  *
  * {{{
  * spark.readStream.schema(assetSchema).parquet(landingDir)
  *   .writeStream
  *   .foreachBatch(HashIndexIngest.sink(indexName, HashIndexIngest.ImageAssets))
  *   .option("checkpointLocation", ckpt)
  *   .trigger(Trigger.AvailableNow())
  *   .start()
  * }}} */
object HashIndexIngest {

  /** Which modality's hasher turns the asset batch into `(sh_id,
    * simhash)` rows. The sink protocol is modality-agnostic — only the
    * narrow-pass hash differs (dHash for images, energy-delta
    * fingerprint for audio); unhashable assets are excluded by the
    * hashers themselves, as everywhere. */
  sealed trait Modality
  /** Hash via [[graft.operators.Dedup.imageHashes]] (decode + dHash). */
  case object ImageAssets extends Modality
  /** Hash via [[graft.operators.Dedup.audioHashes]] (energy-delta
    * fingerprint). */
  case object AudioAssets extends Modality
  /** Hash via [[graft.operators.Dedup.videoHashes]] (frame walk +
    * temporal-mean dHash). */
  case object VideoAssets extends Modality

  /** The `foreachBatch` sink: hash this micro-batch once, append under
    * its batch-id key. Empty batches are skipped without burning an
    * epoch (AvailableNow triggers emit them freely). */
  def sink(name: String, modality: Modality): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      if (batch.limit(1).collect().nonEmpty) {
        val hashes = modality match {
          case ImageAssets => Dedup.imageHashes(batch)
          case AudioAssets => Dedup.audioHashes(batch)
          case VideoAssets => Dedup.videoHashes(batch)
        }
        Dedup.appendToHashIndexIdempotent(hashes, name,
          key = s"batch_$batchId")
        ()
      }
}
