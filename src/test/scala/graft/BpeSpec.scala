package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe
import graft.operators.Bpe.Merge

/** BPE training/encoding vs an independent driver-side reference
  * implementation of the Sennrich et al. algorithm. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- reference implementation (pure Scala, no Spark) ----
  private def refApply(s: Vector[String], l: String, r: String): Vector[String] =
    s.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
      else acc :+ x
    }

  private def refTrain(words: Map[String, Long], numMerges: Int,
                       minPairCount: Long): Seq[(String, String, Long)] = {
    var syms: Map[String, Vector[String]] =
      words.keys.map(w => w -> (w.map(_.toString).toVector :+ "</w>")).toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var continue = true
    while (continue && out.length < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((w, n) <- words; s = syms(w); i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) += n
      val best = counts.toSeq.sortBy { case ((l, r), n) => (-n, l, r) }.headOption
      best match {
        case Some(((l, r), n)) if n >= minPairCount =>
          out += ((l, r, n))
          syms = syms.map { case (w, s) => w -> refApply(s, l, r) }
        case _ => continue = false
      }
    }
    out.toSeq
  }

  // the Sennrich-style corpus: low×5 lower×2 newest×6 widest×3
  private lazy val docs = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest"),
    (5L, "   ") // tokenless doc — must survive encode with an empty array
  ).toDF("doc_id", "text")

  private val refWords = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
    "widest" -> 3L)

  test("wordTable: counts and char+marker decomposition") {
    val wt = Bpe.wordTable(docs, "text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getSeq[String](2).toVector))).toMap
    assert(wt.keySet == refWords.keySet)
    assert(wt("newest") == ((6L,
      Vector("n", "e", "w", "e", "s", "t", "</w>"))))
    refWords.foreach { case (w, n) => assert(wt(w)._1 == n) }
  }

  test("pairCounts matches the reference first-round tally") {
    val got = Bpe.pairCounts(Bpe.wordTable(docs, "text")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ref = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    for ((w, n) <- refWords;
         s = w.map(_.toString).toVector :+ "</w>"; i <- 0 until s.length - 1)
      ref((s(i), s(i + 1))) += n
    assert(got == ref.toMap)
    // the famous first winner: ("e","s") from newest+widest at 9
    assert(got(("e", "s")) == 9L)
  }

  test("train reproduces the reference merge sequence exactly") {
    val got = Bpe.train(docs, "text", numMerges = 10)
      .map(m => (m.lhs, m.rhs, m.count))
    val ref = refTrain(refWords, 10, 2L)
    assert(got == ref)
    assert(got.head == (("e", "s", 9L)))
    // determinism: a second training is identical
    assert(Bpe.train(docs, "text", numMerges = 10)
      .map(m => (m.lhs, m.rhs, m.count)) == got)
  }

  test("applyMerge: greedy leftmost non-overlapping on runs") {
    val df = Seq(
      (1, Seq("x", "x", "x")),
      (2, Seq("x", "x", "x", "x")),
      (3, Seq("a", "x", "x")),
      (4, Seq("x"))
    ).toDF("id", "syms")
    val out = df.select($"id", Bpe.applyMerge($"syms", "x", "x").as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toVector).toMap
    assert(out(1) == Vector("xx", "x"))
    assert(out(2) == Vector("xx", "xx"))
    assert(out(3) == Vector("a", "xx"))
    assert(out(4) == Vector("x"))
  }

  test("encode ≡ reference per-word encoding; unseen words from chars") {
    val merges = Bpe.train(docs, "text", numMerges = 8)
    def refEncode(w: String): Vector[String] =
      merges.sortBy(_.rank).foldLeft(w.map(_.toString).toVector :+ "</w>") {
        (s, m) => refApply(s, m.lhs, m.rhs)
      }
    val toEncode = docs.unionByName(
      Seq((9L, "lowest newest")).toDF("doc_id", "text")) // "lowest" unseen
    val out = Bpe.encode(toEncode, "doc_id", "text", merges).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    assert(out(5L) == Vector.empty) // tokenless doc kept, empty encoding
    assert(out(1L) == (1 to 5).flatMap(_ => refEncode("low")).toVector)
    assert(out(9L) == (refEncode("lowest") ++ refEncode("newest")).toVector)
    val n = Bpe.encode(toEncode, "doc_id", "text", merges)
      .filter($"doc_id" === 9L).head.getAs[Int]("n_bpe_tokens")
    assert(n == out(9L).length)
  }

  test("pretokenize: punctuation splits off its word, merges cross the " +
    "boundaries whitespace hides") {
    import org.apache.spark.sql.functions.{col => c}
    // preTokens: alnum runs + each punctuation char, whitespace dropped
    val toks = Seq((1L, """{"k": 87}""")).toDF("id", "t")
      .select(graft.operators.TextAnalysis.preTokens(c("t")))
      .head().getSeq[String](0).toVector
    assert(toks == Vector("{", "\"", "k", "\"", ":", "87", "}"), toks.toString)
    // ALL whitespace drops — tab/newline too, not just the spaces a
    // bare trim() would have caught (a tab must never become a word)
    val ws = Seq((1L, "ab\tcd\ne f")).toDF("id", "t")
      .select(graft.operators.TextAnalysis.preTokens(c("t")))
      .head().getSeq[String](0).toVector
    assert(ws == Vector("ab", "cd", "e", "f"), ws.toString)
    // the pretokenized word table sees units the whitespace table can't:
    // "ab," under whitespace is ONE word; under pretokenize "ab" + ","
    val docs = Seq((1L, "ab, ab, ab."), (2L, "ab ab")).toDF("doc_id", "text")
    val wsWords = Bpe.wordTable(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wsWords == Map("ab," -> 2L, "ab." -> 1L, "ab" -> 2L))
    val preWords = Bpe.wordTable(docs, "text", pretokenize = true).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(preWords == Map("ab" -> 5L, "," -> 2L, "." -> 1L))
    // trained on pre-tokens, "ab" merges once at count 5 (the whitespace
    // table would fragment it across 3 distinct words at counts 2/2/1)
    val merges = Bpe.train(docs, "text", numMerges = 1, pretokenize = true)
    assert(merges.map(m => (m.lhs, m.rhs, m.count)) == Seq(("a", "b", 5L)))
    // encode under the flag: doc 1 = ab , ab , ab . as pre-token units
    val out = Bpe.encode(docs, "doc_id", "text", merges, pretokenize = true)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    assert(out(1L) == Vector("ab", "</w>", ",", "</w>", "ab", "</w>",
      ",", "</w>", "ab", "</w>", ".", "</w>"), out(1L).toString)
  }

  test("train stops at minPairCount; guards reject degenerate args") {
    // singleton corpus: every pair count is 1 → no merges at the default
    val single = Seq((1L, "abc")).toDF("doc_id", "text")
    assert(Bpe.train(single, "text", 5).isEmpty)
    assert(Bpe.train(single, "text", 5, minPairCount = 1L).nonEmpty)
    intercept[IllegalArgumentException](Bpe.train(docs, "text", 0))
    intercept[IllegalArgumentException](Bpe.train(docs, "text", 3, 0L))
  }
}
