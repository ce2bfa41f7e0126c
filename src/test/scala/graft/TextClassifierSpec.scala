package graft

import org.apache.spark.sql.functions._
import graft.operators.TextClassifier

/** Trained quality classifier: distributed logistic regression over
  * hashed presence features + fixed-point serving. */
class TextClassifierSpec extends SparkSpec {
  import spark.implicits._

  // linearly separable two-class corpus: class tokens + shared noise
  // tokens + a per-doc unique token (so the fit cannot memorize by id)
  private def corpus(n: Int) = (0 until n).map { i =>
    val y = i % 2
    val cls = if (y == 1) "alpha bravo quality prose here"
              else "omega zulu junk noise here"
    (i.toLong, s"$cls the data common token$i", y)
  }.toDF("doc_id", "text", "label")

  private lazy val docs = corpus(200)
  private lazy val model = TextClassifier.train(docs, "text", "label",
    dim = 1 << 12, iters = 25, lr = 0.5)

  test("train separates a separable corpus; served decisions match labels exactly") {
    val scored = TextClassifier.score(docs, "doc_id", "text", model.quantize)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(scored.length == 200)
    scored.foreach { case (id, marginQ, p) =>
      val y = id % 2
      assert((marginQ > 0) == (y == 1),
        s"doc $id (label $y) served margin_q $marginQ")
      // p is sigmoid(margin/scale): same side of 0.5 as the margin of 0
      assert((p > 0.5) == (y == 1), s"doc $id p=$p disagrees with margin")
    }
  }

  test("featureless doc serves exactly the quantized bias") {
    val q = model.quantize
    val out = TextClassifier.score(
      Seq((9L, ""), (10L, "   ")).toDF("doc_id", "text"),
      "doc_id", "text", q).collect()
    assert(out.forall(_.getLong(1) == q.qbias),
      s"blank docs must serve margin_q == qbias (${q.qbias}): " +
        out.map(r => r.getLong(1)).mkString(","))
  }

  test("NULL text serves exactly the bias too — never a NULL margin") {
    // the r17 advice's latent divergence: a null text must coalesce to
    // the EMPTY feature set (serving qbias, the same answer the oracle's
    // outer-exploded fixture produces) rather than propagating to a NULL
    // margin the oracle can never agree with
    val q = model.quantize
    val out = TextClassifier.score(
      Seq((11L, null: String), (12L, "alpha bravo quality prose here"))
        .toDF("doc_id", "text"),
      "doc_id", "text", q).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(11L) == q.qbias, s"null text served ${out(11L)}, want qbias")
    assert(out(12L) != q.qbias, "non-null doc should carry feature weight")
  }

  test("score() reuses ONE broadcast per model across repeated serves") {
    // the r17 advice's leak: a long-lived serving session scoring
    // repeatedly must not accumulate one executor weight broadcast per
    // call. Pin it structurally: every score() plan for the same model
    // instance must probe the SAME broadcast handle (block-count
    // assertions would be confounded by per-job task-binary broadcasts).
    val q = model.quantize
    def weightBcId(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.analyzed
        .flatMap(_.expressions.flatMap(_.collect {
          case e: graft.functions.HashedWeightSumQ => e.qweights.id
        })).head
    val ids = (0 until 4).map { _ =>
      weightBcId(TextClassifier.score(docs, "doc_id", "text", q))
    }
    assert(ids.distinct.size == 1,
      s"4 serves used ${ids.distinct.size} distinct weight broadcasts: $ids")
    // a DIFFERENT model instance must not alias the cached handle
    val q2 = QuantModelCopy(q)
    val other = weightBcId(TextClassifier.score(docs, "doc_id", "text", q2))
    assert(other != ids.head, "distinct models must broadcast separately")
  }

  /** Fresh QuantModel with equal content but new array identity. */
  private def QuantModelCopy(q: TextClassifier.QuantModel) =
    TextClassifier.QuantModel(q.qweights.clone(), q.qbias)

  test("save/load round-trips the serving model bit-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("qc-model").toString
    TextClassifier.save(model, dir, spark)
    val loaded = TextClassifier.load(spark, dir)
    val q = model.quantize
    assert(loaded.qbias == q.qbias && loaded.dim == q.dim)
    assert(java.util.Arrays.equals(loaded.qweights, q.qweights))
    // and the served margins are identical through the loaded model
    val a = TextClassifier.score(docs, "doc_id", "text", q)
      .select("doc_id", "margin_q").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = TextClassifier.score(docs, "doc_id", "text", loaded)
      .select("doc_id", "margin_q").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("load refuses a torn or uncommitted save") {
    val dir = java.nio.file.Files.createTempDirectory("qc-torn").toString
    // no _meta at all: a save that never reached its commit point
    intercept[IllegalArgumentException] {
      TextClassifier.load(spark, dir)
    }
    TextClassifier.save(model, dir, spark)
    // torn weights: the commit record names more rows than the table
    // holds (a partial weights write under a stale/duplicated _meta)
    val m = spark.read.parquet(s"$dir/_meta").head()
    Seq((m.getLong(0), m.getInt(1), m.getInt(2), m.getLong(3) + 1))
      .toDF("qbias", "dim", "quant_bits", "n_nonzero")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_meta")
    intercept[IllegalArgumentException] {
      TextClassifier.load(spark, dir)
    }
  }

  test("sampled training still separates (the 100 TB dial)") {
    val m = TextClassifier.train(corpus(400), "text", "label",
      dim = 1 << 12, iters = 25, lr = 0.5, sampleFraction = 0.5)
    val scored = TextClassifier.score(docs, "doc_id", "text", m.quantize)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(scored.forall { case (id, mq) => (mq > 0) == (id % 2 == 1) })
  }

  test("scoring plan is a single stage: no exchange, no join — one broadcast probe per row") {
    val plan = TextClassifier.score(docs, "doc_id", "text", model.quantize)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"scoring must not join:\n$plan")
  }

  test("margin is an exact integer sum: repartitioning never moves it") {
    val q = model.quantize
    val once = TextClassifier.score(docs, "doc_id", "text", q)
      .select("doc_id", "margin_q").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val reparted = TextClassifier.score(docs.repartition(7), "doc_id",
        "text", q)
      .select("doc_id", "margin_q").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(once == reparted)
  }
}
