package graft

import org.apache.spark.sql.functions._

import graft.operators.LanguageModel
import graft.operators.LanguageModel.BigramLm

/** Bigram-LM scoring: hand-computed probabilities, smoothing floors,
  * prune monotonicity, persistence round-trip, and the broadcast /
  * shuffle serving forms' exact agreement. */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  // corpus: bigrams "a b"×2 (docs 1,2), "b a"×1, "a c"×1; vocab {a,b,c}
  private lazy val docs = Seq(
    (1L, "a b"),
    (2L, "a b a c"),
    (3L, "b"),    // 1 token → no bigrams, xent NULL
    (4L, "   "),  // whitespace-only → 0 tokens
    (5L, "c a")
  ).toDF("doc_id", "text")

  private lazy val lm = LanguageModel.train(docs, "text")

  test("train: counts, contexts, vocab match the hand tally") {
    val bg = lm.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(bg == Map(("a", "b") -> 2L, ("b", "a") -> 1L, ("a", "c") -> 1L,
      ("c", "a") -> 1L))
    val ctx = lm.contexts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ctx == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
    assert(lm.vocabSize == 3L)
  }

  // P(w2|w1) = (n12 + .5) / (n1 + .5*3); logs per hand formula
  private def p(n12: Long, n1: Long): Double = (n12 + 0.5) / (n1 + 1.5)

  test("crossEntropy: exact per-doc values, NULL for unscorable docs") {
    val out = LanguageModel.crossEntropy(docs, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(out(3L) == ((0L, None)) && out(4L) == ((0L, None)))
    val x1 = -math.log(p(2, 3))
    assert(out(1L)._1 == 1L && math.abs(out(1L)._2.get - x1) < 1e-12)
    val x2 = -(math.log(p(2, 3)) + math.log(p(1, 1)) + math.log(p(1, 3))) / 3
    assert(out(2L)._1 == 3L && math.abs(out(2L)._2.get - x2) < 1e-12)
    val x5 = -math.log(p(1, 1))
    assert(out(5L)._1 == 1L && math.abs(out(5L)._2.get - x5) < 1e-12)
  }

  test("foreign corpus: unseen context scores the uniform 1/V floor") {
    val foreign = Seq((9L, "z z")).toDF("doc_id", "text")
    val out = LanguageModel.crossEntropy(foreign, "doc_id", "text", lm).collect()
    // P = (0 + .5)/(0 + .5*3) = 1/3
    assert(math.abs(out.head.getDouble(2) - (-math.log(1.0 / 3))) < 1e-12)
  }

  test("prune drops low-count bigrams; pruned xent upper-bounds exact") {
    val pruned = LanguageModel.prune(lm, minCount = 2)
    assert(pruned.bigrams.collect().map(r => (r.getString(0), r.getString(1)))
      .toSet == Set(("a", "b")))
    val exact = LanguageModel.crossEntropy(docs, "doc_id", "text", lm)
      .collect().flatMap(r => if (r.isNullAt(2)) None
        else Some(r.getLong(0) -> r.getDouble(2))).toMap
    val approx = LanguageModel.crossEntropy(docs, "doc_id", "text", pruned)
      .collect().flatMap(r => if (r.isNullAt(2)) None
        else Some(r.getLong(0) -> r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (id, x) => assert(approx(id) >= x - 1e-12,
      s"pruned xent must never under-report badness (doc $id)") }
    // doc 1 only uses the surviving bigram → identical score
    assert(math.abs(approx(1L) - exact(1L)) < 1e-12)
    // doc 5 lost its bigram → strictly worse
    assert(approx(5L) > exact(5L) + 1e-9)
  }

  test("filterByCrossEntropy gates on the threshold; keepUnscored explicit") {
    val tau = -math.log(p(2, 3)) + 1e-9 // just above doc 1's xent
    val kept = LanguageModel.filterByCrossEntropy(
      docs, "doc_id", "text", lm, tau).collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && !kept.contains(2L))
    assert(kept.contains(3L) && kept.contains(4L)) // unscorable kept by default
    val dropped = LanguageModel.filterByCrossEntropy(
        docs, "doc_id", "text", lm, tau, keepUnscored = false)
      .collect().map(_.getLong(0)).toSet
    assert(!dropped.contains(3L) && !dropped.contains(4L))
    assert(dropped.subsetOf(kept))
  }

  test("broadcast and shuffle serving forms agree exactly") {
    val b = LanguageModel.crossEntropy(docs, "doc_id", "text", lm,
      broadcastModel = true).orderBy("doc_id").collect().toSeq
    val s = LanguageModel.crossEntropy(docs, "doc_id", "text", lm,
      broadcastModel = false).orderBy("doc_id").collect().toSeq
    assert(b == s)
  }

  test("write/read round-trips the model; partial write fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lm").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "model").getAbsolutePath
    LanguageModel.write(lm, path)
    val back = LanguageModel.read(spark, path)
    assert(back.vocabSize == lm.vocabSize && back.alpha == lm.alpha)
    val a = LanguageModel.crossEntropy(docs, "doc_id", "text", lm)
      .orderBy("doc_id").collect().toSeq
    val b = LanguageModel.crossEntropy(docs, "doc_id", "text", back)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    // simulate a crashed write: meta missing → read must not serve
    val crashed = new java.io.File(dir, "crashed").getAbsolutePath
    lm.bigrams.write.parquet(s"$crashed/bigrams")
    lm.contexts.write.parquet(s"$crashed/contexts")
    intercept[Exception] { LanguageModel.read(spark, crashed) }
    // the rebuild pre-delete is scoped to the LM layout subdirs: a
    // caller who co-located unrelated data under the model path must
    // not lose it to a re-write (stale interp_meta still clears)
    val unrelated = new java.io.File(path, "unrelated-data/keep.txt")
    unrelated.getParentFile.mkdirs()
    java.nio.file.Files.writeString(unrelated.toPath, "precious")
    java.nio.file.Files.createDirectories(
      new java.io.File(path, "interp_meta").toPath) // stale marker husk
    LanguageModel.write(lm, path)
    assert(unrelated.exists, "re-write must not delete unrelated data")
    assert(!new java.io.File(path, "interp_meta").exists,
      "a stale interp_meta must not survive a plain re-write")
    assert(LanguageModel.read(spark, path).vocabSize == lm.vocabSize)
  }

  test("interpolated LM: hand-computed mixture, λ = 1 degenerates to the " +
    "bigram model, prune keeps the upper bound, round-trip") {
    val ilm = LanguageModel.trainInterpolated(docs, "text",
      alpha = 0.5, lambda = 0.7)
    assert(ilm.totalTokens == 9L && ilm.base.vocabSize == 3L)
    val uni = ilm.unigrams.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni == Map("a" -> 4L, "b" -> 3L, "c" -> 2L))
    def p1(nw: Long) = (nw + 0.5) / (9 + 0.5 * 3)
    def mix(n12: Long, n1: Long, nw: Long) =
      0.7 * p(n12, n1) + (1 - 0.7) * p1(nw)
    def xents(out: org.apache.spark.sql.DataFrame) = out.collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    val out = xents(LanguageModel.crossEntropyInterpolated(docs, "doc_id", "text", ilm))
    assert(math.abs(out(1L).get - (-math.log(mix(2, 3, 3)))) < 1e-12) // "a b"
    assert(math.abs(out(5L).get - (-math.log(mix(1, 1, 4)))) < 1e-12) // "c a"
    assert(out(3L).isEmpty && out(4L).isEmpty, "unscorable docs stay NULL")
    // λ = 1: the unigram leg multiplies by exactly 0.0 and vanishes —
    // bit-identical to the plain bigram model's scores
    val l1 = xents(LanguageModel.crossEntropyInterpolated(docs, "doc_id", "text",
      ilm.copy(lambda = 1.0)))
    val plain = xents(LanguageModel.crossEntropy(docs, "doc_id", "text", lm))
    assert(l1 == plain)
    // pruned interpolated xent pointwise dominates exact — dropping a
    // bigram only shrinks the mixture
    val prunedOut = xents(LanguageModel.crossEntropyInterpolated(docs, "doc_id",
      "text", LanguageModel.pruneInterpolated(ilm, minCount = 2)))
    out.foreach {
      case (id, Some(a)) => assert(prunedOut(id).get >= a - 1e-12, s"doc $id")
      case (id, None) => assert(prunedOut(id).isEmpty)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-ilm").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "m").getAbsolutePath
    LanguageModel.writeInterpolated(ilm, path)
    val back = LanguageModel.readInterpolated(spark, path)
    assert(back.lambda == 0.7 && back.totalTokens == 9L)
    assert(xents(LanguageModel.crossEntropyInterpolated(docs, "doc_id", "text",
      back)) == out)
    // a PLAIN write layout has no interp_meta commit marker → loud refuse
    val plainPath = new java.io.File(dir, "plain").getAbsolutePath
    LanguageModel.write(lm, plainPath)
    intercept[Exception](LanguageModel.readInterpolated(spark, plainPath))
    intercept[IllegalArgumentException](ilm.copy(lambda = 1.5))
    intercept[IllegalArgumentException](ilm.copy(totalTokens = 0L))
  }

  test("Kneser-Ney: hand-computed discount/backoff/continuation values, " +
    "unseen legs, prune dominance, round-trip") {
    val kn = LanguageModel.trainKneserNey(docs, "text")
    // tallies: contexts a(n1=3, fanout=2) b(1,1) c(1,1);
    // continuations a←{b,c}=2, b←{a}=1, c←{a}=1; 4 bigram types, V=3
    assert(kn.nBigramTypes == 4L && kn.vocabSize == 3L)
    val ctx = kn.contexts.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(ctx == Map("a" -> ((3L, 2L)), "b" -> ((1L, 1L)), "c" -> ((1L, 1L))))
    val ct = kn.contTypes.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ct == Map("a" -> 2L, "b" -> 1L, "c" -> 1L))
    def pcont(nct: Long) = (nct + 0.5) / (4 + 0.5 * 3)
    def pkn(n12: Long, n1: Long, fo: Long, nct: Long) =
      math.max(n12 - 0.75, 0.0) / n1 + (0.75 * fo / n1) * pcont(nct)
    def xents(out: org.apache.spark.sql.DataFrame) = out.collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    val out = xents(LanguageModel.crossEntropyKneserNey(docs, "doc_id", "text", kn))
    assert(math.abs(out(1L).get - (-math.log(pkn(2, 3, 2, 1)))) < 1e-12) // a→b
    val x2 = -(math.log(pkn(2, 3, 2, 1)) + math.log(pkn(1, 1, 1, 2)) +
      math.log(pkn(1, 3, 2, 1))) / 3 // (a,b) (b,a) (a,c)
    assert(math.abs(out(2L).get - x2) < 1e-12)
    assert(math.abs(out(5L).get - (-math.log(pkn(1, 1, 1, 2)))) < 1e-12) // c→a
    assert(out(3L).isEmpty && out(4L).isEmpty, "unscorable docs stay NULL")
    // unseen CONTEXT backs off wholly to the floored continuation;
    // unseen BIGRAM under a seen context keeps only the backoff leg
    val foreign = Seq((8L, "z z"), (9L, "a a")).toDF("doc_id", "text")
    val f = xents(LanguageModel.crossEntropyKneserNey(foreign, "doc_id", "text", kn))
    assert(math.abs(f(8L).get - (-math.log(pcont(0)))) < 1e-12)
    assert(math.abs(f(9L).get - (-math.log((0.75 * 2 / 3) * pcont(2)))) < 1e-12)
    // prune: contexts/continuations/totals keep describing the full
    // corpus; pruned xent pointwise dominates exact
    val pruned = LanguageModel.pruneKneserNey(kn, minCount = 2)
    val pOut = xents(LanguageModel.crossEntropyKneserNey(docs, "doc_id", "text",
      pruned))
    out.foreach {
      case (id, Some(a)) => assert(pOut(id).get >= a - 1e-12, s"doc $id")
      case (id, None) => assert(pOut(id).isEmpty)
    }
    assert(math.abs(pOut(1L).get - out(1L).get) < 1e-12,
      "doc 1 only uses the surviving bigram")
    assert(pOut(5L).get > out(5L).get + 1e-9, "doc 5 lost its bigram")
    // persistence round-trips; a plain-write layout refuses loudly; the
    // broadcast/shuffle serving forms agree exactly
    val dir = java.nio.file.Files.createTempDirectory("graft-knlm").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "m").getAbsolutePath
    LanguageModel.writeKneserNey(kn, path)
    val back = LanguageModel.readKneserNey(spark, path)
    assert(back.discount == 0.75 && back.beta == 0.5 &&
      back.nBigramTypes == 4L && back.vocabSize == 3L)
    assert(xents(LanguageModel.crossEntropyKneserNey(docs, "doc_id", "text",
      back)) == out)
    val plainPath = new java.io.File(dir, "plain").getAbsolutePath
    LanguageModel.write(lm, plainPath)
    intercept[Exception](LanguageModel.readKneserNey(spark, plainPath))
    // a KN re-write over the plain layout clears its commit marker
    LanguageModel.writeKneserNey(kn, plainPath)
    intercept[Exception](LanguageModel.read(spark, plainPath))
    assert(xents(LanguageModel.crossEntropyKneserNey(docs, "doc_id", "text",
      LanguageModel.readKneserNey(spark, plainPath))) == out)
    val shuffled = xents(LanguageModel.crossEntropyKneserNey(docs, "doc_id",
      "text", kn, broadcastModel = false))
    assert(shuffled == out)
    intercept[IllegalArgumentException](kn.copy(discount = 1.0))
    intercept[IllegalArgumentException](kn.copy(beta = 0.0))
    intercept[IllegalArgumentException](kn.copy(nBigramTypes = 0L))
  }

  test("trigram Kneser-Ney: hand-computed order recursion, all three " +
    "backoff legs, prune dominance, round-trip") {
    val kn = LanguageModel.trainKneserNey3(docs, "text")
    // only doc 2 ("a b a c") has trigrams: (a,b,a), (b,a,c).
    // c123: both 1. ctx12: (a,b)->(1,1), (b,a)->(1,1).
    // cont23 (distinct left contexts): (b,a)->1, (a,c)->1.
    // ctx2: b->(1,1), a->(1,1). cont3: a->1, c->1. 2 types, V=3.
    assert(kn.nContTypes == 2L && kn.vocabSize == 3L)
    val tg = kn.trigrams.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(tg == Map(("a", "b", "a") -> 1L, ("b", "a", "c") -> 1L))
    val ct23 = kn.cont23.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(ct23 == Map(("b", "a") -> 1L, ("a", "c") -> 1L))
    def p1(ncu: Long) = (ncu + 0.5) / (2 + 0.5 * 3)
    def p2(nct: Long, s2: Long, f2: Long, ncu: Long) =
      math.max(nct - 0.75, 0.0) / s2 + (0.75 * f2 / s2) * p1(ncu)
    def p3(n123: Long, n12: Long, f12: Long, p2v: Double) =
      math.max(n123 - 0.75, 0.0) / n12 + (0.75 * f12 / n12) * p2v
    def xents(out: org.apache.spark.sql.DataFrame) = out.collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    val out = xents(LanguageModel.crossEntropyKneserNey3(docs, "doc_id", "text", kn))
    // both of doc 2's trigrams score identically by symmetry
    val pTri = p3(1, 1, 1, p2(1, 1, 1, 1))
    assert(math.abs(out(2L).get - (-math.log(pTri))) < 1e-12)
    assert(out(1L).isEmpty && out(3L).isEmpty && out(4L).isEmpty &&
      out(5L).isEmpty, "docs under 3 tokens stay NULL")
    // the three backoff legs, each isolated by a foreign trigram:
    // unseen w2 context -> wholly P1; seen (w1,w2) + unseen trigram ->
    // backoff to P2; unseen (w1,w2) -> wholly P2
    val foreign = Seq((8L, "z z z"), (9L, "a b c"), (10L, "c a b"))
      .toDF("doc_id", "text")
    val f = xents(LanguageModel.crossEntropyKneserNey3(foreign, "doc_id", "text", kn))
    assert(math.abs(f(8L).get - (-math.log(p1(0)))) < 1e-12)
    assert(math.abs(f(9L).get -
      (-math.log((0.75 * 1 / 1.0) * p2(0, 1, 1, 1)))) < 1e-12)
    // "b" never appears as a trigram continuation, so its P1 uses ncu=0
    assert(math.abs(f(10L).get - (-math.log(p2(0, 1, 1, 0)))) < 1e-12)
    // prune: minCount 2 drops BOTH singleton trigrams; the continuation
    // cascade keeps describing the full corpus, so pruned xent dominates
    val pruned = LanguageModel.pruneKneserNey3(kn, minCount = 2)
    val pOut = xents(LanguageModel.crossEntropyKneserNey3(docs, "doc_id", "text",
      pruned))
    assert(math.abs(pOut(2L).get -
      (-math.log((0.75 * 1 / 1.0) * p2(1, 1, 1, 1)))) < 1e-12)
    assert(pOut(2L).get > out(2L).get + 1e-9, "pruned dominates exact")
    // persistence round-trips; cross-layout writes clear each other's
    // commit markers; broadcast and shuffle serving forms agree exactly
    val dir = java.nio.file.Files.createTempDirectory("graft-kn3lm").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "m").getAbsolutePath
    LanguageModel.writeKneserNey3(kn, path)
    val back = LanguageModel.readKneserNey3(spark, path)
    assert(back.discount == 0.75 && back.beta == 0.5 &&
      back.nContTypes == 2L && back.vocabSize == 3L)
    assert(xents(LanguageModel.crossEntropyKneserNey3(docs, "doc_id", "text",
      back)) == out)
    val knPath = new java.io.File(dir, "kn").getAbsolutePath
    LanguageModel.writeKneserNey(LanguageModel.trainKneserNey(docs, "text"), knPath)
    intercept[Exception](LanguageModel.readKneserNey3(spark, knPath))
    LanguageModel.writeKneserNey3(kn, knPath)
    intercept[Exception](LanguageModel.readKneserNey(spark, knPath))
    assert(xents(LanguageModel.crossEntropyKneserNey3(docs, "doc_id", "text",
      LanguageModel.readKneserNey3(spark, knPath))) == out)
    val shuffled = xents(LanguageModel.crossEntropyKneserNey3(docs, "doc_id",
      "text", kn, broadcastModel = false))
    assert(shuffled == out)
    intercept[IllegalArgumentException](kn.copy(discount = 1.0))
    intercept[IllegalArgumentException](kn.copy(nContTypes = 0L))
    intercept[IllegalArgumentException](LanguageModel.pruneKneserNey3(kn, 0))
  }

  test("order-N Kneser-Ney: the order-3 instance is BIT-IDENTICAL to " +
    "trainKneserNey3, higher orders round-trip / prune-dominate / agree " +
    "across serving forms, and guards raise") {
    // richer corpus so orders 4-5 have seen and backoff n-grams
    val corp = Seq(
      (1L, "a b a c a b a"),
      (2L, "b a c a b"),
      (3L, "a b a c d"),
      (4L, "c"),
      (5L, "")
    ).toDF("doc_id", "text")
    def xents(out: org.apache.spark.sql.DataFrame) = out.collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    // order 3 ≡ the hand-pinned KN3 implementation, bit for bit —
    // the generic recursion inherits KN3's hand-computed value pins
    val kn3 = LanguageModel.trainKneserNey3(corp, "text")
    val knN3 = LanguageModel.trainKneserNeyN(corp, "text", order = 3)
    assert(knN3.vocabSize == kn3.vocabSize &&
      knN3.nContTypes == kn3.nContTypes)
    val ref3 = LanguageModel.crossEntropyKneserNey3(corp, "doc_id", "text", kn3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    val gen3 = xents(
      LanguageModel.crossEntropyKneserNeyN(corp, "doc_id", "text", knN3))
    assert(gen3.view.mapValues(_._2).toMap ==
      ref3.view.mapValues(_._2).toMap, "order-3 scores must be bit-identical")
    assert(gen3.view.mapValues(_._1).toMap == ref3.view.mapValues(_._1).toMap)
    // pruned twins agree too (coalesce-to-backoff leg)
    assert(xents(LanguageModel.crossEntropyKneserNeyN(corp, "doc_id", "text",
        LanguageModel.pruneKneserNeyN(knN3, 2))).view.mapValues(_._2).toMap ==
      LanguageModel.crossEntropyKneserNey3(corp, "doc_id", "text",
          LanguageModel.pruneKneserNey3(kn3, 2))
        .collect().map(r => r.getLong(0) ->
          Option(r.get(2)).map(_.asInstanceOf[Double])).toMap)
    // order 5: docs under 5 tokens stay NULL; foreign docs hit every
    // backoff leg finitely; prune dominates; round-trip + shuffle form
    val kn5 = LanguageModel.trainKneserNeyN(corp, "text", order = 5)
    val out5 = xents(
      LanguageModel.crossEntropyKneserNeyN(corp, "doc_id", "text", kn5))
    assert(out5(1L)._1 == 3L && out5(2L)._1 == 1L && out5(3L)._1 == 1L)
    assert(out5(4L) == ((0L, None)) && out5(5L) == ((0L, None)))
    val foreign = Seq((9L, "z z z z z"), (10L, "d c a b a")).toDF("doc_id", "text")
    val f5 = xents(
      LanguageModel.crossEntropyKneserNeyN(foreign, "doc_id", "text", kn5))
    assert(f5(9L)._2.get > 0 && java.lang.Double.isFinite(f5(9L)._2.get))
    assert(f5(10L)._2.get > 0 && java.lang.Double.isFinite(f5(10L)._2.get))
    val p5 = xents(LanguageModel.crossEntropyKneserNeyN(corp, "doc_id", "text",
      LanguageModel.pruneKneserNeyN(kn5, 2)))
    Seq(1L, 2L, 3L).foreach { id =>
      assert(p5(id)._2.get >= out5(id)._2.get - 1e-12,
        s"pruned must dominate exact for doc $id")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-knnlm").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "m").getAbsolutePath
    LanguageModel.writeKneserNeyN(kn5, path)
    val back = LanguageModel.readKneserNeyN(spark, path)
    assert(back.order == 5 && back.vocabSize == kn5.vocabSize &&
      back.nContTypes == kn5.nContTypes)
    assert(xents(LanguageModel.crossEntropyKneserNeyN(corp, "doc_id", "text",
      back)) == out5)
    // cross-layout: a KN3 write over the KN-N layout clears knn_meta
    LanguageModel.writeKneserNey3(kn3, path)
    intercept[Exception](LanguageModel.readKneserNeyN(spark, path))
    assert(xents(LanguageModel.crossEntropyKneserNeyN(corp, "doc_id", "text",
      kn5, broadcastModel = false)) == out5)
    intercept[IllegalArgumentException](
      LanguageModel.trainKneserNeyN(corp, "text", order = 2))
    intercept[IllegalArgumentException](kn5.copy(discount = 1.0))
    intercept[IllegalArgumentException](kn5.copy(conts = kn5.conts.tail))
    intercept[IllegalArgumentException](LanguageModel.pruneKneserNeyN(kn5, 0))
  }

  test("modified Kneser-Ney: scores match an independent plain-Scala " +
    "reference, prune dominates, round-trip persists the discounts, and " +
    "thin levels degrade bit-identically to the fixed-discount cascade") {
    // deterministic two-tier corpus (LCG so the shape is reproducible and
    // was pre-validated): 5 common + 30 rare words over 60 docs of 12
    // tokens populates count-of-counts n1..n3 at BOTH levels (top-level
    // raw counts: 559/19/1; level-2 type counts: 258/64/25/8); four
    // copies of a filler trigram add the top level's n4
    var lcg = 1L
    def nextLcg(): Long = {
      lcg = lcg * 6364136223846793005L + 1442695040888963407L; lcg
    }
    val corpus = (1L to 60L).map { id =>
      (id, Seq.fill(12) {
        val r = nextLcg()
        if (((r >>> 33) % 2) == 0) s"c${java.lang.Long.remainderUnsigned(r >>> 12, 5)}"
        else f"r${java.lang.Long.remainderUnsigned(r >>> 12, 30)}%02d"
      }.mkString(" "))
    } ++ (61L to 64L).map(id => (id, "p1 p2 p3")) ++
      (65L to 67L).map(id => (id, "q1 q2 q3")) // n3 += 1 keeps D3 ≥ 0
    val corp = corpus.toDF("doc_id", "text")
    val lm = LanguageModel.trainModifiedKneserNeyN(corp, "text", order = 3)
    // ---- independent reference: the same estimator and recursion over
    // plain Scala collections (no Spark, no SQL) ----
    val toks = corpus.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    val tris = toks.values.flatMap(
      _.sliding(3).filter(_.size == 3).map(s => (s(0), s(1), s(2)))).toSeq
    val cnt = tris.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def buckets(cs: Iterable[Long]) = (cs.sum, cs.count(_ == 1L).toLong,
      cs.count(_ == 2L).toLong, cs.count(_ >= 3L).toLong)
    val ctxTop = cnt.groupBy { case ((a, b, _), _) => (a, b) }
      .view.mapValues(m => buckets(m.values)).toMap
    val cont2 = cnt.keys.groupBy { case (_, b, c) => (b, c) }
      .view.mapValues(_.size.toLong).toMap
    val ctx1 = cont2.groupBy(_._1._1)
      .view.mapValues(m => buckets(m.values)).toMap
    val cont1 = cont2.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val ntt = cont2.size.toLong
    val vocab = toks.values.flatten.toSet.size
    def disc(hist: Iterable[Long]) = {
      val n1 = hist.count(_ == 1L); val n2 = hist.count(_ == 2L)
      val n3 = hist.count(_ == 3L); val n4 = hist.count(_ == 4L)
      assert(n1 > 0 && n2 > 0 && n3 > 0 && n4 > 0,
        "test corpus must populate n1..n4 (n4 = 0 now gates the fallback too)")
      val y = n1 / (n1 + 2.0 * n2)
      (math.min(math.max(1.0 - (2.0 * y * n2) / n1, 0.0), 1.0),
        math.min(math.max(2.0 - (3.0 * y * n3) / n2, 0.0), 2.0),
        math.min(math.max(3.0 - (4.0 * y * n4) / n3, 0.0), 3.0))
    }
    val dl2 = disc(cont2.values); val dtop = disc(cnt.values)
    assert(lm.discounts == IndexedSeq(dl2, dtop),
      "train-time estimates must equal the reference estimator")
    def dsel(c: Long, d: (Double, Double, Double)) =
      if (c >= 3) d._3 else if (c == 2) d._2 else d._1
    def p1(w3: String) = (cont1.getOrElse(w3, 0L) + 0.5) / (ntt.toDouble + 0.5 * vocab)
    def p2(w2: String, w3: String) = ctx1.get(w2) match {
      case None => p1(w3)
      case Some((s1, f1, f2, f3)) =>
        val n = cont2.getOrElse((w2, w3), 0L)
        math.max(n - dsel(n, dl2), 0.0) / s1 +
          ((dl2._1 * f1 + dl2._2 * f2 + dl2._3 * f3) / s1) * p1(w3)
    }
    def p3(a: String, b: String, c: String) = ctxTop.get((a, b)) match {
      case None => p2(b, c)
      case Some((tot, t1, t2, t3)) =>
        val n = cnt.getOrElse((a, b, c), 0L)
        math.max(n - dsel(n, dtop), 0.0) / tot +
          ((dtop._1 * t1 + dtop._2 * t2 + dtop._3 * t3) / tot) * p2(b, c)
    }
    val expected = toks.view.mapValues { t =>
      val ts = t.sliding(3).filter(_.size == 3).toSeq
      if (ts.isEmpty) None
      else Some(-ts.map(s => math.log(p3(s(0), s(1), s(2)))).sum / ts.size)
    }.toMap
    def xents(out: org.apache.spark.sql.DataFrame) = out.collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    val got = xents(
      LanguageModel.crossEntropyModifiedKneserNeyN(corp, "doc_id", "text", lm))
    expected.foreach { case (id, e) =>
      (e, got(id)) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-12, s"doc $id")
        case (a, b) => assert(a == b, s"doc $id")
      }
    }
    // foreign docs: every leg finite
    val foreign = Seq((901L, "z z z z"), (902L, "a b z c a")).toDF("doc_id", "text")
    xents(LanguageModel.crossEntropyModifiedKneserNeyN(
      foreign, "doc_id", "text", lm)).foreach { case (id, x) =>
      assert(x.exists(v => v > 0 && java.lang.Double.isFinite(v)), s"doc $id")
    }
    // prune dominance: discounts and cascade stay full-corpus
    val pruned = LanguageModel.pruneModifiedKneserNeyN(lm, minCount = 2)
    assert(pruned.discounts == lm.discounts)
    val pOut = xents(
      LanguageModel.crossEntropyModifiedKneserNeyN(corp, "doc_id", "text", pruned))
    got.foreach {
      case (id, Some(a)) => assert(pOut(id).get >= a - 1e-12, s"doc $id")
      case (id, None) => assert(pOut(id).isEmpty)
    }
    // round-trip: discounts persist; scores identical; foreign layouts refuse
    val dir = java.nio.file.Files.createTempDirectory("graft-mknlm").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "m").getAbsolutePath
    LanguageModel.writeModifiedKneserNeyN(lm, path)
    val back = LanguageModel.readModifiedKneserNeyN(spark, path)
    assert(back.order == 3 && back.discounts == lm.discounts &&
      back.vocabSize == lm.vocabSize && back.nContTypes == lm.nContTypes)
    assert(xents(LanguageModel.crossEntropyModifiedKneserNeyN(corp, "doc_id",
      "text", back)) == got)
    intercept[Exception](LanguageModel.readKneserNeyN(spark, path))
    LanguageModel.writeKneserNeyN(
      LanguageModel.trainKneserNeyN(corp, "text", order = 3), path)
    intercept[Exception](LanguageModel.readModifiedKneserNeyN(spark, path))
    // broadcast and shuffle serving forms agree exactly
    assert(xents(LanguageModel.crossEntropyModifiedKneserNeyN(corp, "doc_id",
      "text", lm, broadcastModel = false)) == got)
    // a corpus too thin for Chen-Goodman at EVERY level falls back to
    // the fixed 0.75 discounts per level — and with all levels on the
    // fallback the modified model is BIT-identical to the
    // fixed-discount KN-N (0.75·f1 + 0.75·f2 + 0.75·f3 ≡ 0.75·f
    // exactly in binary): the documented degeneracy, pinned
    val thinLm = LanguageModel.trainModifiedKneserNeyN(docs, "text", order = 3)
    assert(thinLm.discounts.forall(_ == ((0.75, 0.75, 0.75))),
      s"thin levels must use the fixed fallback: ${thinLm.discounts}")
    assert(xents(LanguageModel.crossEntropyModifiedKneserNeyN(docs, "doc_id",
        "text", thinLm)) ==
      xents(LanguageModel.crossEntropyKneserNeyN(docs, "doc_id", "text",
        LanguageModel.trainKneserNeyN(docs, "text", order = 3))),
      "all-fallback modified KN must be bit-identical to fixed-discount KN")
    // construction guards
    intercept[IllegalArgumentException](
      lm.copy(discounts = lm.discounts.updated(0, (1.5, 1.0, 1.0))))
    intercept[IllegalArgumentException](lm.copy(discounts = lm.discounts.tail))
    intercept[IllegalArgumentException](
      LanguageModel.pruneModifiedKneserNeyN(lm, 0))
  }

  test("broadcastModel auto-falls back to the shuffle join above " +
    "maxBroadcastRows — the guard on the one corpus-growing default") {
    // bound of 0: even this tiny model exceeds it, so the requested
    // broadcast HINT must be withheld and the scores must not change.
    // The assertion is on the logical hint, not the physical join: AQE
    // is still free to auto-broadcast a table its OWN size check says
    // fits (that check is size-aware, which is the whole point — the
    // danger was only the unconditional hint that overrides it).
    def hinted(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.toString.contains("strategy=broadcast")
    val b = LanguageModel.crossEntropy(docs, "doc_id", "text", lm)
    val bRows = b.orderBy("doc_id").collect().toSeq
    assert(hinted(b), "under the bound, the model tables carry the hint")
    val g = LanguageModel.crossEntropy(docs, "doc_id", "text", lm,
      broadcastModel = true, maxBroadcastRows = 0L)
    val gRows = g.orderBy("doc_id").collect().toSeq
    assert(gRows == bRows, "the fallback form must score identically")
    assert(!hinted(g),
      "above the bound, the requested broadcast hint is refused: " +
        g.queryExecution.optimizedPlan.toString)
    // the same guard rides every family member
    val kn = LanguageModel.trainKneserNey(docs, "text")
    val knB = LanguageModel.crossEntropyKneserNey(docs, "doc_id", "text", kn)
      .orderBy("doc_id").collect().toSeq
    val knG = LanguageModel.crossEntropyKneserNey(docs, "doc_id", "text", kn,
      broadcastModel = true, maxBroadcastRows = 0L)
    assert(knG.orderBy("doc_id").collect().toSeq == knB)
    assert(!hinted(knG))
    intercept[IllegalArgumentException](
      LanguageModel.crossEntropy(docs, "doc_id", "text", lm,
        maxBroadcastRows = -1L).collect())
  }

  test("broadcast probe memoized per model: train/read seed the count, " +
    "a hand-built model counts once — serving pays zero probe jobs") {
    val sc = spark.sparkContext
    def groupJobs(g: String): Int = sc.statusTracker.getJobIdsForGroup(g).length
    // the status store is fed async: poll until at least `atLeast` jobs of
    // the group are visible. Jobs surface in submission order, so once a
    // LATER-submitted marker job is visible, any probe job submitted
    // before it would be visible too — "exactly the marker" is sound.
    def await(g: String, atLeast: Int): Int = {
      val deadline = System.nanoTime + 10L * 1000 * 1000 * 1000
      while (groupJobs(g) < atLeast && System.nanoTime < deadline)
        Thread.sleep(20)
      groupJobs(g)
    }
    // 1) a SEEDED model never touches its table: the poison frame raises
    // on any scan, so a probe job here would fail the test loudly
    val poison = spark.range(1)
      .filter(expr("isnull(raise_error('broadcast probe ran a job'))"))
      .select(lit("a").as("w1"), lit("b").as("w2"), lit(1L).as("n12"))
    assert(BigramLm(poison, poison, 3L, 0.5).seedLargestRows(7L)
      .largestRows == 7L)
    // 2) trained models come pre-seeded: largestRows answers jobless
    val trained = lm // force the lazy train OUTSIDE the measured group
    sc.setJobGroup("probe-trained", "probe-trained")
    try {
      assert(trained.largestRows == 4L) // 4 distinct bigrams, no job to answer
      sc.parallelize(Seq(1)).count() // marker: exactly ONE job (no AQE stages)
    } finally sc.clearJobGroup()
    assert(await("probe-trained", 1) == 1,
      "a trained model must answer largestRows without running a job")
    // 3) persisted models seed from the meta row: zero probe jobs at serve
    val dir = java.nio.file.Files.createTempDirectory("graft-lm-probe").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "m").getAbsolutePath
    LanguageModel.write(lm, path)
    val back = LanguageModel.read(spark, path)
    sc.setJobGroup("probe-served", "probe-served")
    try {
      assert(back.largestRows == 4L)
      sc.parallelize(Seq(1)).count() // marker: exactly one job
    } finally sc.clearJobGroup()
    assert(await("probe-served", 1) == 1,
      "a loaded model must answer largestRows without running a job " +
        "(seeded by the meta row's n_largest)")
    // 4) a hand-constructed model pays ONE bounded count, then memoizes
    val hand = BigramLm(lm.bigrams, lm.contexts, 3L, 0.5)
    sc.setJobGroup("probe-hand", "probe-hand")
    try {
      assert(hand.largestRows == 4L) // first call: >= 1 count job
      sc.parallelize(Seq(1)).count() // marker: exactly one job
    } finally sc.clearJobGroup()
    val afterFirst = await("probe-hand", 2)
    assert(afterFirst >= 2, "first largestRows on an unseeded model counts")
    sc.setJobGroup("probe-hand", "probe-hand")
    try {
      assert(hand.largestRows == 4L) // memoized: no further job
      sc.parallelize(Seq(1)).count() // marker: exactly one job
    } finally sc.clearJobGroup()
    assert(await("probe-hand", afterFirst + 1) == afterFirst + 1,
      "repeated largestRows must not re-run the probe")
  }

  test("modified KN at ORDER 5: per-level thin-histogram fallback — the top " +
    "level estimator-feeds, every continuation level falls back") {
    // planted top-order histogram: one 5-gram each at count 4, 3, 2, 1 —
    // n1..n4 = 1 at the top level, so Chen-Goodman feeds there. Every
    // lower level sees only count-1 continuation types (all 5-grams are
    // distinct per suffix), so n2..n4 = 0 and the level falls back.
    val corpus = (
      (1 to 4).map(i => (i.toLong, "p1 p2 p3 p4 p5")) ++
      (5 to 7).map(i => (i.toLong, "q1 q2 q3 q4 q5")) ++
      (8 to 9).map(i => (i.toLong, "r1 r2 r3 r4 r5")) :+
      ((10L, "s1 s2 s3 s4 s5"))
    ).toDF("doc_id", "text")
    val lm5 = LanguageModel.trainModifiedKneserNeyN(corpus, "text", order = 5)
    assert(lm5.order == 5 && lm5.discounts.length == 4)
    // levels 2..4 (continuation types): all thin -> fixed fallback
    (0 to 2).foreach { i =>
      assert(lm5.discounts(i) == ((0.75, 0.75, 0.75)),
        s"continuation level ${i + 2} must fall back: ${lm5.discounts(i)}")
    }
    // level 5 (raw counts): the exact Chen-Goodman estimate at n1..n4 = 1,
    // written with estimateDiscounts' literal IEEE association
    val y = 1 / (1 + 2.0 * 1)
    val expect = (
      math.min(math.max(1.0 - (2.0 * y * 1) / 1, 0.0), 1.0),
      math.min(math.max(2.0 - (3.0 * y * 1) / 1, 0.0), 2.0),
      math.min(math.max(3.0 - (4.0 * y * 1) / 1, 0.0), 3.0))
    assert(lm5.discounts(3) == expect,
      s"top level must estimator-feed: ${lm5.discounts(3)} vs $expect")
    // and the model scores: every doc has exactly one 5-gram
    val out = LanguageModel.crossEntropyModifiedKneserNeyN(
      corpus, "doc_id", "text", lm5).collect()
    assert(out.length == 10 &&
      out.forall(r => r.getLong(1) == 1L && r.getDouble(2) > 0))
  }

  test("degenerate models are rejected at construction") {
    intercept[IllegalArgumentException] {
      BigramLm(lm.bigrams, lm.contexts, vocabSize = 0L, alpha = 0.5)
    }
    intercept[IllegalArgumentException] {
      BigramLm(lm.bigrams, lm.contexts, vocabSize = 3L, alpha = 0.0)
    }
    intercept[IllegalArgumentException] { LanguageModel.prune(lm, 0) }
  }
}
