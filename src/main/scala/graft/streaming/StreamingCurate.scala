package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.operators.{Dedup, TextAnalysis}

/** Ingest-time curation of a document STREAM — the continuous front half
  * of the training-data pipeline (the reference's batch curation is
  * `Pipeline.curate`; this is what a 100 TB/day feed runs BEFORE anything
  * lands).
  *
  * The lambda split, stated explicitly: ingest curates what a row can
  * decide about itself — exact dedup within the watermark horizon,
  * decontamination against a FIXED eval corpus, quality scoring, PII
  * redaction, split assignment — all stateless or watermark-bounded, so
  * the stream never blocks on the corpus. Near-dup (MinHash-LSH) removal
  * is corpus-GLOBAL (a self-join no stream can legally express) and
  * belongs to the periodic batch compaction pass (`Pipeline.curate`),
  * which also catches exact dups whose originals had aged out of the
  * dedup state.
  *
  * Decontamination is the interesting piece: the batch operator
  * ([[graft.operators.Dedup.decontaminate]]) is a shingle join, but a
  * stream cannot anti-join against its own derived aggregate. Instead the
  * eval corpus's shingle set is compiled ONCE into a Bloom filter
  * ([[evalShingleBloom]]) and carried into every micro-batch as a binary
  * LITERAL — the probe is `O(shingles per doc)` per row with no join and
  * no state, the standard runtime-filter trick (Spark's own join
  * pruning uses the same `BloomFilterMightContain` expression).
  * Probabilistic by design: false positives (rate `fpp`) drop a CLEAN doc
  * — the conservative direction for decontamination; false negatives do
  * not exist, so nothing contaminated survives that the batch operator
  * would have caught at the same `k`.
  */
object StreamingCurate {

  /** A serialized eval-shingle Bloom filter WITH the shingle width it was
    * built at. The width rides with the bytes on purpose: probing a
    * `k=8` filter with 5-shingles matches essentially nothing and would
    * silently disable decontamination — the one failure mode the
    * zero-false-negatives guarantee forbids — so the pairing is enforced
    * by construction instead of by caller discipline. */
  final case class ShingleBloom(bytes: Array[Byte], k: Int, fpp: Double)

  /** Bloom filter over the eval corpus's distinct hashed word
    * `k`-shingles — built batch-side once, shipped as a literal. Size is
    * `expectedItems = |distinct shingles|` at `fpp`; for benchmark-scale
    * eval corpora (millions of shingles) that is a few MB of filter bits
    * riding the task broadcast, vs a per-batch shuffle of the stream.
    * The distinct shingle set feeds BOTH the sizing count and the filter
    * build, so it is materialized once (the Dedup/Similarity reuse
    * pattern), not exploded twice. */
  def evalShingleBloom(evalDocs: DataFrame, idCol: String, textCol: String,
                       k: Int = 8, fpp: Double = 0.001): ShingleBloom = {
    val sh = graft.operators.Materialize.eagerCheckpoint(
      Dedup.hashedWordShingles(evalDocs, idCol, textCol, k)
        .select("shingle").distinct())
    val n = math.max(sh.count(), 1L)
    val bf = sh.stat.bloomFilter("shingle", n, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    ShingleBloom(bos.toByteArray, k, fpp)
  }

  /** Bloom membership probe as a Column — the native
    * `BloomFilterMightContain` expression over a literal filter, usable
    * inside higher-order lambdas (the element variable passes straight
    * through as the value expression). `h` must be a LONG (the hashed
    * shingle). */
  def mightContain(bloom: Array[Byte], h: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Bridge.expression(lit(bloom)), Bridge.expression(h)))

  /** True iff ANY word-shingle of `text` (at the FILTER's own width)
    * hits the eval Bloom filter — the per-row streaming form of the
    * contamination predicate. */
  def contaminated(text: Column, evalBloom: ShingleBloom): Column =
    exists(graft.functions.ShingleHashes.shingleHashes(text, evalBloom.k),
      h => mightContain(evalBloom.bytes, h))

  /** The streaming curation flow. `docs` must carry `idCol`, `textCol`
    * and an event-time `tsCol`. Stages, in order:
    *  1. watermarked exact dedup on a 16-byte two-seed content hash
    *     (state bounded by `watermarkDelay`; a dup arriving after its
    *     original's state expired re-emits — the batch pass catches it);
    *  2. Bloom decontamination against `evalBloom` (probed at the
    *     filter's own shingle width — carried inside [[ShingleBloom]]);
    *  3. quality scoring, rows below `minQuality` dropped;
    *  4. PII redaction (adds `redacted` + per-type counts);
    *  5. deterministic md5 `split` assignment.
    * Output: input columns + quality/redaction columns + `split`, as an
    * append-mode-ready stream. */
  def curateStream(docs: DataFrame, idCol: String, textCol: String,
                   tsCol: String, evalBloom: ShingleBloom,
                   watermarkDelay: String = "10 minutes",
                   minQuality: Double = 0.5): DataFrame =
    perRowStages(
      dedupedStream(docs, textCol, tsCol, watermarkDelay),
      idCol, textCol, evalBloom, minQuality)

  /** Stage 1 of [[curateStream]], public so the [[curateBatchWithIndex]]
    * composition can run it upstream on the STREAM (exact dedup must see
    * across micro-batches; foreachBatch cannot): watermark-bounded exact
    * dedup on the two-seed content hash. Stream-legal (stateful but
    * bounded). */
  def dedupedStream(docs: DataFrame, textCol: String, tsCol: String,
                    watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .withColumn("__h1", xxhash64(col(textCol)))
      .withColumn("__h2", xxhash64(lit(1), col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__h1", "__h2")
      .drop("__h1", "__h2")

  /** Stages 2–5 of [[curateStream]] (all per-row, legal on stream or
    * batch alike): Bloom decontamination, quality, redaction, split. */
  private def perRowStages(df: DataFrame, idCol: String, textCol: String,
                           evalBloom: ShingleBloom, minQuality: Double): DataFrame = {
    val clean = df.filter(!contaminated(col(textCol), evalBloom))
    val scored = TextAnalysis.withQuality(clean, textCol)
      .filter(col("quality_score") >= minQuality)
    TextAnalysis.hashSplit(TextAnalysis.withPiiRedaction(scored, textCol), idCol)
  }

  /** [[curateStream]]'s stages PLUS near-dup removal against the landed
    * corpus's [[graft.operators.Dedup.buildDedupIndex]] — as a BATCH
    * transform for `foreachBatch`, because the index anti-join cannot run
    * in a continuous plan: the hit set derives from the stream, and a
    * stream anti-joined against its own derivative is a stream-stream
    * join Structured Streaming (rightly) rejects. Inside `foreachBatch`
    * every micro-batch is a plain batch frame, so the anti-join is just
    * [[graft.operators.Dedup.filterAgainstIndex]] — whose geometry comes
    * from the index itself, so there is no width/hash-count knob to
    * mismatch here. Compose as:
    * {{{
    * StreamingCurate.dedupedStream(docs, "text", "ts")
    *   .writeStream
    *   .foreachBatch(StreamingCurate.idempotentCurateSink(out,
    *     "doc_id", "text", bloom, index))  // batch-id-keyed overwrite
    *   .start()
    * }}}
    * Stage order: the cheap per-row gates (Bloom, quality) run FIRST and
    * the index anti-join only over their survivors — the two commute (the
    * anti-join keys on the id; the per-row stages only drop rows), so the
    * kept set is identical and the expensive signature stage sees the
    * smaller side.
    *
    * Delivery: the plain [[curateStream]] → file-sink path is
    * exactly-once (`_spark_metadata`-tracked); `foreachBatch` is
    * AT-LEAST-once under retries — a replayed batch re-appends. Use
    * [[idempotentCurateSink]] / [[writeBatchIdempotent]], which key the
    * write on the batch id so replays overwrite themselves. Exact
    * WITHIN-stream dedup still belongs upstream on the stream
    * ([[dedupedStream]]), which `foreachBatch` cannot see across
    * batches. */
  def curateBatchWithIndex(batch: DataFrame, idCol: String, textCol: String,
                           evalBloom: ShingleBloom, index: DataFrame,
                           minJaccard: Double = 0.8,
                           minQuality: Double = 0.5,
                           spanIndex: Option[DataFrame] = None,
                           maxIndexedFrac: Double = 0.5,
                           lmGate: Option[(graft.operators.LanguageModel.BigramLm, Double)] = None)
      : DataFrame = {
    val gated = perRowStages(batch, idCol, textCol, evalBloom, minQuality)
    // optional reference-LM perplexity gate (the CCNet stage at ingest):
    // the model is a REFERENCE corpus's, loaded once per run
    // ([[graft.operators.LanguageModel.read]]) and broadcast. The gate
    // DOES explode the batch into bigrams and run a per-doc aggregate —
    // it is cheap relative to the CORPUS-side stages that follow (the
    // span/signature joins meet corpus-scale index tables; this one
    // meets only a broadcast model), which is why it runs here, after
    // the truly per-row stages and before the index joins. All gates
    // drop rows keyed on the doc, so they commute.
    val lmed = lmGate.fold(gated) { case (lm, maxXent) =>
      graft.operators.LanguageModel
        .filterByCrossEntropy(gated, idCol, textCol, lm, maxXent).drop("xent")
    }
    // optional boilerplate gate against the landed corpus's
    // span-frequency index ([[graft.operators.Dedup.buildSpanIndex]]):
    // runs BEFORE the signature anti-join for the same reason the
    // per-row stages do — each cheaper stage shrinks the next one's
    // input (span scoring explodes only the batch; the signature stage
    // then sees the boilerplate-free survivors)
    val spanned = spanIndex.fold(lmed)(ix =>
      Dedup.filterAgainstSpanIndex(lmed, ix, idCol, textCol, maxIndexedFrac))
    Dedup.filterAgainstIndex(spanned, index, idCol, textCol, minJaccard)
  }

  /** Idempotent `foreachBatch` delivery as an OPERATOR (the former
    * "make the write idempotent" advice, made executable): each
    * micro-batch lands at `outDir/batch_id=<id>` with OVERWRITE, so a
    * replayed batch — `foreachBatch` is at-least-once under query
    * restarts — rewrites its own directory instead of appending
    * duplicates. Structured Streaming replays a batch id with the same
    * source offset range, hence the same input rows; with the
    * deterministic curation transforms this makes delivery effectively
    * exactly-once. The layout is a standard partition directory:
    * `spark.read.parquet(outDir)` reads the whole landed corpus with
    * `batch_id` as a (prunable) partition column. */
  def writeBatchIdempotent(curated: DataFrame, outDir: String,
                           batchId: Long): Unit =
    curated.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")

  /** [[curateBatchWithIndex]] composed with [[writeBatchIdempotent]] —
    * the ready-made exactly-once ingest sink:
    * {{{
    * StreamingCurate.dedupedStream(docs, "text", "ts")
    *   .writeStream
    *   .foreachBatch(StreamingCurate.idempotentCurateSink(out,
    *     "doc_id", "text", bloom, index))
    *   .start()
    * }}} */
  def idempotentCurateSink(outDir: String, idCol: String, textCol: String,
                           evalBloom: ShingleBloom, index: DataFrame,
                           minJaccard: Double = 0.8, minQuality: Double = 0.5,
                           spanIndex: Option[DataFrame] = None,
                           maxIndexedFrac: Double = 0.5,
                           lmGate: Option[(graft.operators.LanguageModel.BigramLm, Double)] = None)
      : (DataFrame, Long) => Unit =
    (batch, batchId) => writeBatchIdempotent(
      curateBatchWithIndex(batch, idCol, textCol, evalBloom, index,
        minJaccard, minQuality, spanIndex, maxIndexedFrac, lmGate),
      outDir, batchId)

  /** The FULL incremental-dedup streaming loop in one sink, against the
    * banded serving layout: each micro-batch is curated (Bloom
    * decontamination, quality, redaction, split), filtered against the
    * `<name>` banded index ([[graft.operators.Dedup
    * .filterAgainstBandedIndex]] — one-sided, only the batch shuffles),
    * the kept docs land at `outDir/batch_id=N`, and the SAME kept docs
    * are appended to the index under a batch-keyed epoch
    * ([[graft.operators.Dedup.appendToBandedIndexIdempotent]]) — so the
    * NEXT batch already dedups against them, closing the lambda gap
    * WITHIN the stream (the batch-cadence compaction remains the layout
    * owner). Exactly-once on both legs: a replayed batch overwrites its
    * own landing directory and its index append reads as
    * already-committed. The kept frame is materialized once — it feeds
    * two writes, and re-running the curation per leg would double its
    * cost and (worse) let the two legs diverge if any upstream stage
    * were nondeterministic.
    *
    * The replay gate covers the WHOLE sink, not just the append: a
    * committed key means the first run curated, landed, and appended —
    * and re-running the curation would filter the batch's own kept docs
    * against the index copies that first run added, overwriting the
    * landing directory with an EMPTY keep set (data loss, found by the
    * spec). One delivery token, both legs. A crash at any earlier point
    * leaves the key uncommitted, and the re-run is then byte-identical:
    * the index state the filter sees excludes the crashed append's
    * invisible orphans, so the keep set recomputes exactly. */
  /** The FULL streaming-curation capstone: quality gates + SEMANTIC
    * gate in ONE `foreachBatch` lifecycle — the production shape the
    * operators' scaladocs advertise. Per micro-batch:
    *  1. per-row curation (Bloom decontamination against `evalBloom`,
    *     quality ≥ `minQuality`, PII redaction, split) — the
    *     [[curateStream]] stages 2–5 (run [[dedupedStream]] upstream
    *     on the stream for stage 1, which must see across batches);
    *  2. SEMANTIC admission ([[SemDedupIngest]]): the curated
    *     survivors' embeddings (`embCol` must ride the stream rows)
    *     are gated against the persisted kept set at `statePath` —
    *     within-batch dedup by the id rule, cross-batch arrival-wins —
    *     and the admitted vectors JOIN that kept set, so the next
    *     batch gates against them;
    *  3. the admitted docs (FULL curated rows, quality/redaction/split
    *     columns included) land at `outDir/batch_id=N`.
    * Exactly-once end to end with ONE delivery token: the landing
    * write runs inside [[SemDedupIngest.gateBatchWith]]'s delivery
    * leg, BEFORE the `_epochs` commit — a committed batch key means
    * curated + landed + kept-set-appended all happened, a replayed
    * key no-ops the whole sink (recomputing the curation against the
    * batch's own kept-set copies would empty the keep set — the
    * [[idempotentCurateIngestSink]] data-loss class), and a crash at
    * any earlier point replays byte-identically (orphan state rows
    * are invisible, the landing dir overwrites itself). The curated
    * frame is materialized once; the semantic gate and the landing
    * join read one computation. A one-batch stream of the whole
    * corpus ≡ the batch composition `q_curate_semantic` runs
    * (spec-pinned, StreamingCurateSpec). */
  def idempotentCurateSemanticSink(outDir: String, statePath: String,
                                   idCol: String, textCol: String,
                                   embCol: String, evalBloom: ShingleBloom,
                                   minCosine: Double = 0.95,
                                   minQuality: Double = 0.5)
      : (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val key = s"batch_$batchId"
      if (!SemDedupIngest.keyCommitted(batch.sparkSession, statePath, key) &&
          batch.limit(1).collect().nonEmpty) {
        val curated = graft.operators.Materialize.eagerCheckpoint(
          perRowStages(batch, idCol, textCol, evalBloom, minQuality))
        SemDedupIngest.gateBatchWith(
          curated.select(col(idCol), col(embCol)), statePath, idCol, embCol,
          minCosine, key) { admitted =>
          writeBatchIdempotent(
            curated.join(admitted.select(idCol), Seq(idCol), "left_semi"),
            outDir, batchId)
        }
        ()
      }
    }

  def idempotentCurateIngestSink(outDir: String, name: String, idCol: String,
                                 textCol: String, evalBloom: ShingleBloom,
                                 minJaccard: Double = 0.8,
                                 minQuality: Double = 0.5)
      : (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val key = s"batch_$batchId"
      if (!graft.operators.Dedup.bandedIndexKeyCommitted(
          batch.sparkSession, name, key)) {
        val kept = graft.operators.Materialize.eagerCheckpoint(
          graft.operators.Dedup.filterAgainstBandedIndex(
            perRowStages(batch, idCol, textCol, evalBloom, minQuality),
            name, idCol, textCol, minJaccard))
        writeBatchIdempotent(kept, outDir, batchId)
        // empty keep set: land the (empty) batch dir for read-side
        // uniformity, but don't burn an index epoch on zero rows
        if (kept.limit(1).collect().nonEmpty) {
          graft.operators.Dedup.appendToBandedIndexIdempotent(kept, name,
            idCol, textCol, key)
          ()
        }
      }
    }
}
