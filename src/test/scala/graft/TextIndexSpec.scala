package graft

import graft.operators.TextIndex

/** Inverted index + BM25 vs hand-computed values, persistence
  * round-trip, and the guards. */
class TextIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark join spark"),
    (2L, "hash table lookup"),
    (3L, "the quick fox"),
    (4L, "   ") // tokenless: part of N/avgdl, can never match
  ).toDF("doc_id", "text")

  private lazy val ix = TextIndex.build(docs, "doc_id", "text")

  test("build: postings carry dl, docFreq and scalars match the hand tally") {
    assert(ix.nDocs == 4L)
    assert(math.abs(ix.avgdl - 2.25) < 1e-12) // (3+3+3+0)/4
    val p = ix.postings.collect()
      .map(r => (r.getLong(0), r.getString(1)) -> ((r.getInt(2), r.getLong(3)))).toMap
    assert(p((1L, "spark")) == ((3, 2L))) // dl 3, tf 2
    assert(p((1L, "join")) == ((3, 1L)))
    val df = ix.docFreq.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df("spark") == 1L && df("the") == 1L)
  }

  test("bm25: hand-computed scores; duplicate query terms don't double-count") {
    // query {spark, hash}; idf both = ln(1 + 3.5/1.5); avgdl 2.25
    val idf = math.log(1 + 3.5 / 1.5)
    val s1 = idf * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 3 / 2.25))
    val s2 = idf * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 3 / 2.25))
    val out = TextIndex.bm25(ix, "doc_id", "spark hash spark")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet == Set(1L, 2L), "only docs sharing a term appear")
    assert(out(1L)._1 == 1L && math.abs(out(1L)._2 - s1) < 1e-12)
    assert(out(2L)._1 == 1L && math.abs(out(2L)._2 - s2) < 1e-12)
  }

  test("bm25: common terms dampen, never flip the score sign") {
    // "the" appears in 1 of 4 docs here, but even a df=N term keeps
    // idf = ln(1 + 0.5/(N+0.5)) > 0 under the +1 smoothing
    val out = TextIndex.bm25(ix, "doc_id", "the").collect()
    assert(out.forall(_.getDouble(2) > 0))
  }

  test("unmatched query scores an empty set; guards reject degenerate args") {
    assert(TextIndex.bm25(ix, "doc_id", "zzz qqq").count() == 0)
    intercept[IllegalArgumentException](TextIndex.bm25(ix, "doc_id", "   "))
    intercept[IllegalArgumentException](
      TextIndex.bm25(ix, "doc_id", "spark", k1 = 0.0))
    intercept[IllegalArgumentException](
      TextIndex.bm25(ix, "doc_id", "spark", b = 1.5))
  }

  test("merge(build(A), build(B)) ≡ build(A ∪ B) for id-disjoint halves") {
    val a = docs.filter($"doc_id" % 2 === 0)
    val b = docs.filter($"doc_id" % 2 =!= 0)
    val merged = TextIndex.merge(TextIndex.build(a, "doc_id", "text"),
      TextIndex.build(b, "doc_id", "text"))
    assert(merged.nDocs == ix.nDocs)
    assert(math.abs(merged.avgdl - ix.avgdl) < 1e-12)
    def dfMap(i: TextIndex.InvertedIndex) = i.docFreq.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfMap(merged) == dfMap(ix))
    def postSet(i: TextIndex.InvertedIndex) = i.postings.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3))).toSet
    assert(postSet(merged) == postSet(ix))
    val s1 = TextIndex.bm25(ix, "doc_id", "spark hash")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val s2 = TextIndex.bm25(merged, "doc_id", "spark hash")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s1.keySet == s2.keySet)
    s1.foreach { case (id, v) => assert(math.abs(s2(id) - v) < 1e-9) }
  }

  test("persisted serve pushes the term predicate into the postings scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-plan").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "ix").getAbsolutePath
    TextIndex.write(ix, path, termPartitions = 2)
    val served = TextIndex.bm25(TextIndex.read(spark, path), "doc_id", "spark hash")
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"the query terms must reach the parquet scan as a pushed filter:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("epoch lifecycle: append ≡ rebuild, crashed epoch invisible, " +
    "replay idempotent, compact folds to one epoch with scores unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-life").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "ix").getAbsolutePath
    val first = docs.filter($"doc_id" <= 2)
    val rest = docs.filter($"doc_id" > 2)
    TextIndex.write(TextIndex.build(first, "doc_id", "text"), path,
      termPartitions = 2)
    TextIndex.appendEpoch(rest, path, "doc_id", "text", "b1",
      termPartitions = 2)
    def scores(ix: TextIndex.InvertedIndex) =
      TextIndex.bm25(ix, "doc_id", "spark hash the")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val grown = TextIndex.read(spark, path)
    val oneShot = TextIndex.build(docs, "doc_id", "text")
    assert(grown.nDocs == oneShot.nDocs && grown.totalDl == oneShot.totalDl)
    assert(grown.avgdl == oneShot.avgdl, "exact integer sums ⇒ identical avgdl")
    assert(scores(grown) == scores(oneShot),
      "serve-after-append must equal the one-shot build bit for bit")
    // crashed epoch: postings land, meta never does → invisible to read
    TextIndex.build(Seq((9L, "spark spark spark")).toDF("doc_id", "text"),
        "doc_id", "text")
      .postings.write.parquet(s"$path/postings/epoch=crashed")
    assert(scores(TextIndex.read(spark, path)) == scores(oneShot),
      "uncommitted postings must not serve")
    // a colliding key is refused by default (silent replacement), and
    // the explicit replay form overwrites itself — no double counting
    intercept[IllegalArgumentException] {
      TextIndex.appendEpoch(rest, path, "doc_id", "text", "b1",
        termPartitions = 2)
    }
    TextIndex.appendEpoch(rest, path, "doc_id", "text", "b1",
      termPartitions = 2, allowReplace = true)
    assert(scores(TextIndex.read(spark, path)) == scores(oneShot))
    // appending into a FRESH path bootstraps the index ONLY under the
    // explicit bootstrap flag (the streaming cold start): a bare append
    // to a missing index is usually a mistyped --path, so it fails
    // loudly instead of fabricating a one-batch "index"
    val fresh = new java.io.File(dir, "fresh").getAbsolutePath
    val exBare = intercept[IllegalArgumentException] {
      TextIndex.appendEpoch(rest, fresh, "doc_id", "text", "b0",
        termPartitions = 2)
    }
    assert(exBare.getMessage.contains("bootstrap = true"), exBare.getMessage)
    TextIndex.appendEpoch(rest, fresh, "doc_id", "text", "b0",
      termPartitions = 2, bootstrap = true)
    assert(TextIndex.read(spark, fresh).nDocs == 2L,
      "first epoch against a fresh path must bootstrap the index")
    // ...but a path with swap residue is NOT fresh even under the flag:
    // there the real index sits at the side dirs and must surface, not
    // be papered over by a one-batch "index"
    val crashedSwap = new java.io.File(dir, "crashed-swap").getAbsolutePath
    TextIndex.write(TextIndex.build(first, "doc_id", "text"),
      crashedSwap + "_old", termPartitions = 2)
    val exSwap = intercept[IllegalArgumentException] {
      TextIndex.appendEpoch(rest, crashedSwap, "doc_id", "text", "b9",
        bootstrap = true)
    }
    assert(exSwap.getMessage.contains("replaceIndex"), exSwap.getMessage)
    // a path with an EXISTING layout but no committed epochs (pre-epoch
    // flat index / crashed build) is NOT fresh — bootstrapping epoch
    // dirs into it would corrupt it; refuse with the migration message
    val legacy = new java.io.File(dir, "legacy").getAbsolutePath
    docs.limit(1).write.parquet(s"$legacy/meta") // meta w/o epoch column
    val exLegacy = intercept[IllegalArgumentException] {
      TextIndex.appendEpoch(rest, legacy, "doc_id", "text", "b0",
        bootstrap = true)
    }
    assert(exLegacy.getMessage.contains("pre-epoch"), exLegacy.getMessage)
    // a committed base WITHOUT the positions column (persisted by a
    // pre-positional release) refuses positional appends — mixed epochs
    // would silently drop old docs from phrase queries
    val prePos = new java.io.File(dir, "prepos").getAbsolutePath
    val built = TextIndex.build(first, "doc_id", "text")
    built.postings.drop("positions")
      .write.parquet(s"$prePos/postings/epoch=e0")
    built.docFreq.write.parquet(s"$prePos/docfreq/epoch=e0")
    spark.createDataFrame(Seq((built.nDocs, built.totalDl)))
      .toDF("n_docs", "total_dl")
      .write.parquet(s"$prePos/meta/epoch=e0")
    val exPos = intercept[IllegalArgumentException] {
      TextIndex.appendEpoch(rest, prePos, "doc_id", "text", "b1")
    }
    assert(exPos.getMessage.contains("positional"), exPos.getMessage)
    // compaction: one committed epoch, orphan GC'd, scores unchanged
    TextIndex.compact(spark, path, termPartitions = 2)
    val afterCompact = TextIndex.read(spark, path)
    assert(scores(afterCompact) == scores(oneShot))
    def epochs(sub: String) = Option(new java.io.File(s"$path/$sub").listFiles)
      .getOrElse(Array.empty).filter(_.getName.startsWith("epoch=")).map(_.getName).toSet
    assert(epochs("meta") == Set("epoch=e0") &&
      epochs("postings") == Set("epoch=e0"),
      s"compaction must fold to one epoch and GC the orphan: " +
        s"${epochs("postings")}")
    // bad epoch keys refused before any file lands
    intercept[IllegalArgumentException] {
      TextIndex.appendEpoch(rest, path, "doc_id", "text", "0") }
  }

  test("streamed ingest sink ≡ the batch epoch loop; replay no-ops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-stream").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "ix").getAbsolutePath
    TextIndex.write(TextIndex.build(docs.filter($"doc_id" <= 2), "doc_id", "text"),
      path, termPartitions = 2)
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(graft.streaming.TextIndexIngest.sink(path, "doc_id", "text",
        termPartitions = 2))
      .start()
    in.addData((3L, "the quick fox"), (4L, "   "))
    q.processAllAvailable()
    in.addData((5L, "lonely spark article"))
    q.processAllAvailable()
    q.stop()
    val streamed = TextIndex.read(spark, path)
    val oneShot = TextIndex.build(
      docs.filter($"doc_id" <= 2).unionByName(
        Seq((3L, "the quick fox"), (4L, "   "), (5L, "lonely spark article"))
          .toDF("doc_id", "text")), "doc_id", "text")
    assert(streamed.nDocs == oneShot.nDocs && streamed.totalDl == oneShot.totalDl)
    val a = TextIndex.bm25(streamed, "doc_id", "spark the")
      .orderBy("doc_id").collect().toSeq
    val b = TextIndex.bm25(oneShot, "doc_id", "spark the")
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "streamed epochs must serve exactly the batch answer")
    // a replayed batch id overwrites its own epoch — simulate by calling
    // the sink again with the same id and rows
    graft.streaming.TextIndexIngest.sink(path, "doc_id", "text", 2)(
      Seq((5L, "lonely spark article")).toDF("doc_id", "text"), 1L)
    assert(TextIndex.read(spark, path).nDocs == oneShot.nDocs,
      "replay must not double-count")
  }

  test("build: positions are the 0-based token offsets, sorted") {
    val p = ix.postings.collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getSeq[Int](4)).toMap
    assert(p((1L, "spark")) == Seq(0, 2) && p((1L, "join")) == Seq(1))
    assert(p((3L, "quick")) == Seq(1))
  }

  test("driver tokenizer ≡ the Column tokenizer on adversarial strings") {
    val cases = Seq("a b  c", "  leading", "trailing  ", "\tmixed \n ws\r x",
      "", "   ", "one", "a b", "p-u.n,c! t",
      // control chars: NOT \s, NOT stripped by Spark's space-only trim —
      // they stay inside the adjacent term on both sides (Java
      // String.trim would have stripped them, the desynchronization the
      // driver twin deliberately avoids by not trimming at all)
      "\u0001hash join", "tail\u0002 ", " \u0001alone", "\u0003")
    val colSide = cases.toDF("t")
      .select(graft.operators.TextAnalysis.tokens($"t").as("w"))
      .collect().map(_.getSeq[String](0).toSeq)
    val driverSide = cases.map(graft.operators.TextAnalysis.tokenizeDriver)
    colSide.zip(driverSide).zip(cases).foreach { case ((c, d), s) =>
      assert(c == d, s"tokenizers diverge on ${s.map(_.toInt)}: $c vs $d")
    }
  }

  test("bm25Phrase: adjacency-verified occurrences, hand-computed score") {
    val pdocs = Seq(
      (1L, "hash join hash join x"), // 2 occurrences, dl 5
      (2L, "join hash"),             // both terms, wrong order: no match
      (3L, "hash x join"),           // both terms, gap: no match
      (4L, "hash join"),             // 1 occurrence, dl 2
      (5L, "other words only")
    ).toDF("doc_id", "text")
    val pix = TextIndex.build(pdocs, "doc_id", "text")
    val out = TextIndex.bm25Phrase(pix, "doc_id", "hash join")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet == Set(1L, 4L), s"phrase docs only: ${out.keySet}")
    assert(out(1L)._1 == 2L && out(4L)._1 == 1L)
    // phrase-as-one-term BM25: N=5, df=2, avgdl=(5+2+3+2+3)/5=3
    val idf = math.log(1 + (5 - 2 + 0.5) / (2 + 0.5))
    def sc(tf: Long, dl: Long) =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))
    assert(math.abs(out(1L)._2 - sc(2, 5)) < 1e-12)
    assert(math.abs(out(4L)._2 - sc(1, 2)) < 1e-12)
    // single-term phrase degenerates to tf occurrences
    val one = TextIndex.bm25Phrase(pix, "doc_id", "hash")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    // duplicate-term phrase: "hash join hash" needs hash at p and p+2
    val dup = TextIndex.bm25Phrase(pix, "doc_id", "hash join hash")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dup == Map(1L -> 1L), s"doc 1 only ('hash join hash join x'): $dup")
    intercept[IllegalArgumentException](TextIndex.bm25Phrase(pix, "doc_id", " "))
  }

  test("decontaminatePhrases drops exactly the verbatim-hit docs; " +
    "phraseContamination profiles them") {
    val pdocs = Seq(
      (1L, "hash join hash join x"), // hits phrase 1 twice
      (2L, "join hash"),             // wrong order: clean
      (3L, "sort merge now"),        // hits phrase 2
      (4L, "hash join sort merge"),  // hits both
      (5L, "other words only")
    ).toDF("doc_id", "text")
    val pix = TextIndex.build(pdocs, "doc_id", "text")
    val phrases = Seq((1L, "hash join"), (2L, "sort merge"))
      .toDF("phrase_id", "phrase")
    val kept = TextIndex.decontaminatePhrases(pdocs, pix, "doc_id",
      phrases, "phrase_id", "phrase").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 5L), s"survivors: $kept")
    val prof = TextIndex.phraseContamination(pix, "doc_id", phrases,
        "phrase_id", "phrase")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(prof == Map(1L -> ((1L, 2L)), 3L -> ((1L, 1L)), 4L -> ((2L, 2L))),
      s"contamination profile: $prof")
    // no-pushdown twin agrees
    assert(TextIndex.decontaminatePhrases(pdocs, pix, "doc_id", phrases,
        "phrase_id", "phrase", pushdownTerms = false)
      .collect().map(_.getLong(0)).toSet == kept)
  }

  test("bm25Phrase: phrase survives the persisted epoch lifecycle") {
    val pdocs = Seq((1L, "hash join tail"), (2L, "hash x"), (3L, "a hash join"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-ph").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "ix").getAbsolutePath
    TextIndex.write(TextIndex.build(pdocs.filter($"doc_id" <= 2), "doc_id", "text"),
      path, termPartitions = 2)
    TextIndex.appendEpoch(pdocs.filter($"doc_id" === 3), path, "doc_id", "text",
      "b1", termPartitions = 2)
    def m(ix: TextIndex.InvertedIndex) =
      TextIndex.bm25Phrase(ix, "doc_id", "hash join")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(m(TextIndex.read(spark, path)) == m(TextIndex.build(pdocs, "doc_id", "text")),
      "epoch-grown phrase answers must equal the one-shot build's")
  }

  test("bm25Window: order-free within-window co-occurrence, boundary " +
    "inclusive, supersets the exact phrase") {
    val wdocs = Seq(
      (1L, "hash join x"),         // adjacent, in order
      (2L, "join y hash"),         // distance 2, reversed
      (3L, "hash a b c join"),     // distance 4
      (4L, "hash only here"),
      (5L, "join only here")
    ).toDF("doc_id", "text")
    val wix = TextIndex.build(wdocs, "doc_id", "text")
    def hits(w: Int) = TextIndex.bm25Window(wix, "doc_id", "hash join", w)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // window 1: adjacency either order — doc 1 only
    assert(hits(1) == Map(1L -> 1L))
    // window 2: doc 2's reversed pair at distance 2 enters (boundary
    // INCLUSIVE); window 4 admits doc 3
    assert(hits(2) == Map(1L -> 1L, 2L -> 1L))
    assert(hits(4) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // single-term window query degenerates to tf (every hash-bearing doc)
    assert(TextIndex.bm25Window(wix, "doc_id", "hash", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
    // containment guarantee, BOTH directions: the window form supersets
    // the exact phrase's docs exactly when window ≥ L−1 (an L-term
    // verbatim occurrence puts its last term at L−1 from the anchor)...
    val phraseDocs = TextIndex.bm25Phrase(wix, "doc_id", "hash join")
      .collect().map(_.getLong(0)).toSet
    assert(phraseDocs.subsetOf(hits(1).keySet), "L=2 ⇒ window 1 suffices")
    // ...and BELOW that bound a verbatim doc IS missed — the documented
    // reason the phrase form exists (3-term phrase, window 1: 'x' sits
    // at distance 2 from the 'hash' anchor in doc 1)
    val phrase3 = TextIndex.bm25Phrase(wix, "doc_id", "hash join x")
      .collect().map(_.getLong(0)).toSet
    assert(phrase3 == Set(1L))
    assert(TextIndex.bm25Window(wix, "doc_id", "hash join x", 1).count() == 0,
      "window < L−1 must be allowed to miss the verbatim doc")
    assert(TextIndex.bm25Window(wix, "doc_id", "hash join x", 2)
      .collect().map(_.getLong(0)).toSet.contains(1L),
      "window = L−1 restores the containment guarantee")
    // anchor-order contract: the FIRST term anchors, the others are
    // order-free around it — reordering 2-term queries never changes
    // the matched set (|q−p| is symmetric)
    assert(TextIndex.bm25Window(wix, "doc_id", "join hash", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == hits(2))
    intercept[IllegalArgumentException](
      TextIndex.bm25Window(wix, "doc_id", "hash join", 0))
  }

  test("bm25PhraseBatch ≡ per-phrase bm25Phrase across mixed lengths; " +
    "empty phrase vanishes") {
    val pdocs = Seq(
      (1L, "hash join hash join x"),
      (2L, "join hash"),
      (3L, "hash x join sort merge"),
      (4L, "hash join sort"),
      (5L, "other words only x")
    ).toDF("doc_id", "text")
    val pix = TextIndex.build(pdocs, "doc_id", "text")
    val phrases = Seq((10L, "hash join"), (20L, "x"), (30L, "hash join sort"),
      (40L, "sort merge"), (50L, "absent phrase"), (60L, "  "))
      .toDF("phrase_id", "phrase")
    val batch = TextIndex.bm25PhraseBatch(pix, "doc_id", phrases,
        "phrase_id", "phrase").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // cross-validate against the independent single-phrase implementation
    val singles = Seq(10L -> "hash join", 20L -> "x", 30L -> "hash join sort",
      40L -> "sort merge").flatMap { case (pid, ph) =>
      TextIndex.bm25Phrase(pix, "doc_id", ph).collect()
        .map(r => (pid, r.getLong(0)) -> ((r.getLong(1), r.getDouble(2))))
    }.toMap
    assert(batch.keySet == singles.keySet,
      s"batch must equal per-phrase serves: ${batch.keySet} vs ${singles.keySet}")
    singles.foreach { case (k, (n, s)) =>
      assert(batch(k)._1 == n && math.abs(batch(k)._2 - s) < 1e-12, s"$k")
    }
    // spot-check the hand facts: "hash join" hits docs 1 (×2) and 4;
    // the 3-term phrase only doc 4; the absent/empty phrases nothing
    assert(batch((10L, 1L))._1 == 2L && batch((10L, 4L))._1 == 1L)
    assert(!batch.contains((10L, 2L)) && !batch.contains((10L, 3L)))
    assert(batch.keys.filter(_._1 == 30L).map(_._2).toSet == Set(4L))
    assert(!batch.keys.exists(k => k._1 == 50L || k._1 == 60L))
    // no-pushdown twin answers identically
    val noPd = TextIndex.bm25PhraseBatch(pix, "doc_id", phrases,
        "phrase_id", "phrase", pushdownTerms = false).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(noPd == batch)
  }

  test("bm25Batch ≡ per-query bm25; empty-term query vanishes; pushdown plan") {
    val queries = Seq((10L, "spark hash spark"), (20L, "the"), (30L, "zzz"),
      (40L, "   ")).toDF("query_id", "query")
    val out = TextIndex.bm25Batch(ix, "doc_id", queries, "query_id", "query")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    val singles = Seq(10L -> "spark hash spark", 20L -> "the").flatMap {
      case (qid, q) => TextIndex.bm25(ix, "doc_id", q).collect()
        .map(r => (qid, r.getLong(0)) -> ((r.getLong(1), r.getDouble(2))))
    }.toMap
    assert(out.keySet == singles.keySet,
      s"batch must equal per-query serves: ${out.keySet} vs ${singles.keySet}")
    singles.foreach { case (k, (n, s)) =>
      assert(out(k)._1 == n && math.abs(out(k)._2 - s) < 1e-12, s"$k")
    }
    // no-pushdown variant answers identically (plan differs, algebra not)
    val noPd = TextIndex.bm25Batch(ix, "doc_id", queries, "query_id", "query",
      pushdownTerms = false).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(noPd == out)
  }

  test("pushdown driver-collect bound: an oversized unit table fails " +
    "loudly and names the no-pushdown escape") {
    // 1M+1 distinct single-term queries — past MaxPushdownUnits, the
    // eval-suite-scale contract's executable edge. The guard must fire
    // BEFORE any postings scan and point at pushdownTerms = false.
    val huge = spark.range(TextIndex.MaxPushdownUnits + 1L)
      .selectExpr("id AS query_id", "concat('t', id) AS query")
    val ex = intercept[IllegalArgumentException] {
      TextIndex.bm25Batch(ix, "doc_id", huge, "query_id", "query")
    }
    assert(ex.getMessage.contains("pushdownTerms = false") &&
      ex.getMessage.contains("no-pushdown"), ex.getMessage)
  }

  test("streamed ingest cold start: first batch bootstraps a fresh path") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-cold").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "ix").getAbsolutePath // never built
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(graft.streaming.TextIndexIngest.sink(path, "doc_id", "text",
        termPartitions = 2))
      .start()
    in.addData((1L, "spark join spark"), (2L, "hash table"))
    q.processAllAvailable()
    in.addData((3L, "spark stream"))
    q.processAllAvailable()
    q.stop()
    val ix = TextIndex.read(spark, path)
    assert(ix.nDocs == 3L, "cold-start stream must have bootstrapped the index")
    assert(TextIndex.bm25(ix, "doc_id", "spark").collect()
      .map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("bm25TopK ≡ exhaustive scoring + rounded k-cut across k, missing " +
    "terms, and k past the match count; quantized blocks stay bounded") {
    import org.apache.spark.sql.functions.{col, floor}
    // 200 docs with spread tf/dl so the score distribution has real
    // tiers AND exact ties — the k-cut exercises both the pruning and
    // the rounded tie-break
    val corpus = spark.range(200).selectExpr("id AS doc_id",
      "concat(repeat('spark ', 1 + cast(id % 5 AS INT)), " +
        "repeat('hash ', cast(id % 3 AS INT)), " +
        "repeat('pad ', cast(id % 11 AS INT)), 'tail') AS text")
    val full = TextIndex.build(corpus, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25-topk").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "topk").getAbsolutePath
    TextIndex.writeTopK(full, path, termPartitions = 4)
    val layout = TextIndex.readTopK(spark, path)
    val r6 = (c: org.apache.spark.sql.Column) =>
      floor(c * 1000000.0 + 0.5) / 1000000.0
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("n_matched"), r6(col("score")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    for (q <- Seq("spark hash", "spark", "hash pad zzz");
         k <- Seq(1, 3, 10, 50, 1000)) {
      val pruned = rows(TextIndex.bm25TopK(layout, "doc_id", q, k))
      val exhaustive = rows(TextIndex.bm25(full, "doc_id", q)
        .orderBy(r6(col("score")).desc, col("doc_id")).limit(k))
      assert(pruned == exhaustive, s"q='$q' k=$k")
    }
    // a query of only absent terms returns the empty frame, same schema
    val none = TextIndex.bm25TopK(layout, "doc_id", "zzz qqq", 5)
    assert(none.columns.toSeq == Seq("doc_id", "n_matched", "score") &&
      none.count() == 0)
    // the quantized-block construction bounds per-term metadata by
    // design — the serve-time collect is bounded for ANY corpus size
    val perTerm = layout.blockMeta.groupBy("term").count()
      .collect().map(_.getLong(1))
    assert(perTerm.forall(_ <= 257L))
    // degenerate parameters refused
    intercept[IllegalArgumentException] {
      TextIndex.bm25TopK(layout, "doc_id", "spark", 0) }
    intercept[IllegalArgumentException] {
      TextIndex.bm25TopK(layout, "doc_id", "   ", 5) }
    // a crashed writeTopK (no meta) refuses to load
    val crashed = new java.io.File(dir, "crashed").getAbsolutePath
    layout.blocks.write.parquet(s"$crashed/blocks")
    intercept[Exception] { TextIndex.readTopK(spark, crashed) }
  }

  test("bm25TopK phase-2 decision bit: split at selective k, all-essential " +
    "on the k-collapse shape — recorded, and the answers stay exact") {
    import org.apache.spark.sql.functions.{col, floor}
    // 300 docs all carry the low-idf term; 20 also carry three
    // high-idf terms. At small k the threshold sits in the
    // high-scoring tier, the low-idf list is non-essential and the
    // MaxScore split serves. Past the 20 rich docs (k = 100) the
    // threshold falls into the common-only tier: no list's bound stays
    // under θ, nothing is non-essential, and the serve must RECORD
    // that it ran all-essential — the k-collapse cell the r15 verdict
    // wanted adjudicable from the artifact.
    val corpus = spark.range(300).selectExpr("id AS doc_id",
      "concat(repeat('alpha ', 1 + cast(id % 4 AS INT)), " +
        "CASE WHEN id < 20 THEN 'beta gamma delta ' ELSE '' END, " +
        "repeat('pad ', cast(id % 7 AS INT)), 'tail') AS text")
    val full = TextIndex.build(corpus, "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-topk-split").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "topk").getAbsolutePath
    TextIndex.writeTopK(full, path, termPartitions = 4)
    val layout = TextIndex.readTopK(spark, path)
    val q = "alpha beta gamma delta"
    val r6 = (c: org.apache.spark.sql.Column) =>
      floor(c * 1000000.0 + 0.5) / 1000000.0
    def serve(k: Int) = TextIndex.bm25TopKDiag(layout, "doc_id", q, k)
    val (df5, d5) = serve(5)
    assert(d5.servedBy == "split",
      s"selective k must serve via the MaxScore split: $d5")
    assert(d5.nEssential < d5.nQueryTerms && d5.keptPostings < d5.totalPostings,
      s"the split's whole point is essential < terms and kept < total: $d5")
    val (df100, d100) = serve(100)
    assert(d100.servedBy == "all_essential",
      s"the k-collapse shape must RECORD the all-essential path: $d100")
    assert(d100.nEssential == d100.nQueryTerms &&
      d100.keptPostings == d100.totalPostings,
      s"collapse means nothing was non-essential and no block pruned: $d100")
    // the decision never changes the answer: both paths ≡ exhaustive
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), r6(col("score")).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    for ((df, k) <- Seq((df5, 5), (df100, 100)))
      assert(rows(df) == rows(TextIndex.bm25(full, "doc_id", q)
        .orderBy(r6(col("score")).desc, col("doc_id")).limit(k)), s"k=$k")
  }

  test("write/read round-trips; crashed write (no meta) refuses to load") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25").toFile
    dir.deleteOnExit()
    val path = new java.io.File(dir, "ix").getAbsolutePath
    TextIndex.write(ix, path, termPartitions = 4)
    val back = TextIndex.read(spark, path)
    val a = TextIndex.bm25(ix, "doc_id", "spark hash")
      .orderBy("doc_id").collect().toSeq
    val b = TextIndex.bm25(back, "doc_id", "spark hash")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    val crashed = new java.io.File(dir, "crashed").getAbsolutePath
    ix.postings.write.parquet(s"$crashed/postings")
    intercept[Exception] { TextIndex.read(spark, crashed) }
  }
}
