package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import graft.functions.{HashedWeightSum, HashedWeightSumQ, ShingleHashes}

/** Trained quality classifier — the fasttext-style linear gate of public
  * training-data pipelines (Joulin et al. 2016 "Bag of Tricks for
  * Efficient Text Classification"; the quality-filter role per CCNet,
  * Wenzek et al. 2019), hand-rolled Spark-first: logistic regression
  * over hashed PRESENCE features (distinct word-unigram xxhash64 values,
  * [[graft.functions.ShingleHashes]] at k=1, bucketed `pmod dim`),
  * trained by full-batch gradient descent where every step is two
  * DataFrame aggregations — no MLlib, no RDDs, no driver-side row loops.
  *
  * This closes the gap between the engine's two existing quality gates:
  * [[TextAnalysis.withQuality]] is a FIXED heuristic (no way to encode
  * domain judgment), and the LM perplexity gate needs a trained LM and a
  * scoring cascade. A linear model over hashed unigrams is the cheap
  * middle: train on any labeled seed set, serve as one broadcast probe
  * per document.
  *
  * Scale shape (the 100 TB contract): per iteration, (1) margins are a
  * broadcast-weight probe ([[graft.functions.HashedWeightSum]] — the
  * weight vector crosses the wire once per executor, never as a task-
  * binary literal), and (2) the gradient is one explode → `groupBy(slot)`
  * → `sum` — map-side partial aggregation absorbs hot-word skew, the
  * result is ≤ `dim` rows (the ONLY driver collect, ~1 MiB at the 2¹⁶
  * default), and the corpus is never collected. `sampleFraction` bounds
  * the per-iteration scan for corpora where full-batch passes are
  * unaffordable; the fit stays honest because every sampled pass sees an
  * unbiased residual.
  *
  * Determinism: the float TRAINING weights are deterministic only up to
  * the partition reduction order of the gradient sums (the usual
  * distributed-GD caveat). SERVING is exact: [[quantize]] fixes the
  * weights to 2⁻²⁰ steps, and the served margin is an integer sum —
  * associative, bit-identical under any order, partitioning, or replay,
  * which is what lets a DuckDB oracle re-derive every served margin from
  * the dumped weight table and per-doc feature indices alone. */
object TextClassifier {

  /** Fixed-point step: weights quantize to multiples of 2^-QuantBits. */
  val QuantBits = 20
  val QuantScale: Double = (1L << QuantBits).toDouble

  /** Float training result. */
  case class Model(weights: Array[Double], bias: Double) {
    def quantize: QuantModel = QuantModel(
      weights.map(w => math.round(w * QuantScale)),
      math.round(bias * QuantScale))
  }

  /** Fixed-point serving form: margins are exact integer sums. */
  case class QuantModel(qweights: Array[Long], qbias: Long) {
    def dim: Int = qweights.length
  }

  /** Raw presence-feature hashes of a text column: distinct word-unigram
    * xxhash64 values (the [[graft.functions.ShingleHashes]] tokenizer —
    * shared bit-for-bit with every dedup/LM surface in the engine).
    * A NULL text coalesces to the EMPTY feature set rather than
    * propagating: a null-text doc is a featureless doc — it trains and
    * serves exactly the bias, the same answer the oracle fixture's
    * outer-exploded slots produce, instead of serving a NULL margin the
    * oracle can never agree with. */
  def featureHashes(textCol: Column): Column =
    coalesce(Bridge.column(ShingleHashes(Bridge.expression(textCol), 1)),
      array().cast("array<bigint>"))

  /** Bucketed feature slots `pmod(hash, dim)` — the exact indexes the
    * trainer aggregates, the server probes, and the oracle fixture
    * dumps ([[graft.functions.HashedWeightSum]]'s index contract). */
  def featureSlots(textCol: Column, dim: Int): Column =
    transform(featureHashes(textCol), h => pmod(h, lit(dim.toLong)))

  /** Train by full-batch (or `sampleFraction`-sampled) gradient descent:
    * logistic loss, L2 on weights (never the bias), constant step.
    * `labelCol` is coerced to double and must be 0/1. Returns float
    * weights — call [[quantize]] (or [[save]], which quantizes) for the
    * serving form. */
  def train(docs: DataFrame, textCol: String, labelCol: String,
            dim: Int = 1 << 16, iters: Int = 12, lr: Double = 0.5,
            l2: Double = 1e-6, sampleFraction: Double = 1.0,
            seed: Long = 42L): Model = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    val spark = docs.sparkSession
    val base = docs.select(col(labelCol).cast("double").as("__y"),
      featureHashes(col(textCol)).as("__f"))
    val sampled =
      if (sampleFraction >= 1.0) base else base.sample(sampleFraction, seed)
    // one featurization, reused across every iteration's two passes
    val feats = sampled.persist()
    try {
      val n = feats.count().toDouble
      require(n > 0, "train: no rows to fit (empty corpus or sample)")
      val w = new Array[Double](dim)
      var b = 0.0
      var it = 0
      while (it < iters) {
        val bc = spark.sparkContext.broadcast(w)
        try {
          val margin = Bridge.column(
            HashedWeightSum(Bridge.expression(col("__f")), bc)) + lit(b)
          val resid =
            (lit(1.0) / (lit(1.0) + exp(-margin)) - col("__y")).as("__r")
          val withR = feats.select(resid, col("__f"))
          // bias gradient: every doc contributes, featureless ones included
          val gb = withR.agg(sum(col("__r"))).head().getDouble(0)
          // weight gradients: presence features, ≤ dim result rows — the
          // only collect, bounded by construction
          val gw = withR
            .select(col("__r"),
              explode(transform(col("__f"), h => pmod(h, lit(dim.toLong))))
                .as("__slot"))
            .groupBy("__slot").agg(sum(col("__r")).as("__g"))
            .collect()
          // L2 decay applied DENSELY before the sparse gradient step:
          // every weight shrinks by (1 − lr·l2) each iteration, whether
          // or not its slot appeared in this pass's gradient — under
          // sampleFraction < 1 a lazily-decayed weight would regularize
          // only when sampled, making the effective l2 sample-dependent.
          // For slots in the gradient this is algebraically the fused
          // update w −= lr·(g/n + l2·w) (up to one fp rounding order);
          // full-batch runs touch the same live slots every iteration
          // (untouched slots stay 0), so the fit is unchanged in
          // substance — and serving exactness never rested on training
          // bit-identity (the quantized weights ARE the contract).
          if (l2 != 0.0) {
            val decay = 1.0 - lr * l2
            var i = 0
            while (i < dim) { w(i) *= decay; i += 1 }
          }
          var j = 0
          while (j < gw.length) {
            val slot = gw(j).getLong(0).toInt
            w(slot) -= lr * (gw(j).getDouble(1) / n)
            j += 1
          }
          b -= lr * (gb / n)
        } finally bc.unpersist(blocking = false)
        it += 1
      }
      Model(w, b)
    } finally feats.unpersist()
  }

  /** One broadcast per (live SparkContext, model instance), reused across
    * [[score]] calls: a long-lived serving session scoring repeatedly
    * (the bench's serve reps, a foreachBatch gate) would otherwise
    * accumulate one executor-side broadcast block per call until driver
    * GC happens to collect the references. Keys are WEAK on the model:
    * when the caller drops its model the entry (and, via the
    * ContextCleaner, the executor blocks) follows — no unbounded growth,
    * no explicit lifecycle for callers to get wrong. Keyed by context id
    * too, so a restarted session never serves a dead context's handle. */
  private val bcCache = new java.util.WeakHashMap[QuantModel,
    (String, org.apache.spark.broadcast.Broadcast[Array[Long]])]

  /** Score with the fixed-point serving weights: `(idCol, margin_q, p)`
    * where `margin_q` is the exact integer margin (qbias + Σ slot
    * weights) and `p = sigmoid(margin_q / 2^QuantBits)`. The margin is
    * the replayable column; the probability is derived per row. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: QuantModel): DataFrame = {
    val spark = docs.sparkSession
    val ctxId = spark.sparkContext.applicationId
    val bc = bcCache.synchronized {
      bcCache.get(model) match {
        case (id, cached) if id == ctxId => cached
        case _ =>
          val fresh = spark.sparkContext.broadcast(model.qweights)
          bcCache.put(model, (ctxId, fresh))
          fresh
      }
    }
    val marginQ = (Bridge.column(
      HashedWeightSumQ(Bridge.expression(col("__f")), bc))
      + lit(model.qbias)).as("margin_q")
    docs.select(col(idCol), featureHashes(col(textCol)).as("__f"))
      .select(col(idCol), marginQ)
      .withColumn("p",
        lit(1.0) / (lit(1.0) + exp(-(col("margin_q").cast("double")
          / lit(QuantScale)))))
  }

  /** Persist the serving form: NONZERO quantized weights as
    * `(widx, qw)` parquet + a `_meta` table (qbias, dim, quant_bits,
    * n_nonzero) written LAST — the commit point, so a crashed save
    * refuses on load instead of serving half a weight table. */
  def save(model: Model, path: String, spark: SparkSession): Unit = {
    import spark.implicits._
    val q = model.quantize
    val nonzero = q.qweights.zipWithIndex.collect {
      case (qw, i) if qw != 0L => (i.toLong, qw)
    }.toSeq
    nonzero.toDF("widx", "qw")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$path/weights")
    Seq((q.qbias, q.dim, QuantBits, nonzero.size.toLong))
      .toDF("qbias", "dim", "quant_bits", "n_nonzero")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_meta")
  }

  /** Load a [[save]]d serving model; refuses loudly on a missing or
    * half-written path (no `_meta` = no commit), a quantization-step
    * mismatch (weights saved at another scale would serve silently wrong
    * margins), or a weight-count mismatch (a torn weights table). */
  def load(spark: SparkSession, path: String): QuantModel = {
    val fs = new org.apache.hadoop.fs.Path(s"$path/_meta")
      .getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$path/_meta")),
      s"load: no committed classifier at $path (crashed save? re-run save)")
    val meta = spark.read.parquet(s"$path/_meta").head()
    val qbias = meta.getLong(meta.fieldIndex("qbias"))
    val dim = meta.getInt(meta.fieldIndex("dim"))
    val bits = meta.getInt(meta.fieldIndex("quant_bits"))
    val nNonzero = meta.getLong(meta.fieldIndex("n_nonzero"))
    require(bits == QuantBits,
      s"load: model at $path quantized at 2^-$bits, this build serves " +
        s"2^-$QuantBits — retrain or rescale")
    val w = new Array[Long](dim)
    val rows = spark.read.parquet(s"$path/weights").collect()
    require(rows.length.toLong == nNonzero,
      s"load: weight table at $path has ${rows.length} rows, _meta " +
        s"committed $nNonzero — torn save, re-run save")
    rows.foreach { r =>
      val i = r.getLong(0)
      require(i >= 0 && i < dim, s"load: weight index $i outside dim $dim")
      w(i.toInt) = r.getLong(1)
    }
    QuantModel(w, qbias)
  }
}
