package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the
  * vocabulary-learning pass a training-data pipeline runs before
  * tokenizing a corpus.
  *
  * The classic scaling trick IS the design: BPE statistics only depend
  * on the WORD-FREQUENCY table, so the corpus is scanned exactly once
  * ([[wordTable]] — one hash aggregation, map-side partials) and the
  * merge loop iterates over the vocabulary-scale table, never the
  * corpus. Each merge round is: adjacent-pair counts weighted by word
  * frequency (one shuffle of map-partition-distinct pairs), a
  * `TakeOrdered(1)` argmax to the driver (one tiny bounded probe — the
  * merge list itself is the only driver state, ≤ `numMerges` rows), and
  * a per-word symbol rewrite (narrow). Lineage is truncated through
  * [[Materialize.eagerCheckpoint]] every round, so plan depth stays
  * constant no matter how many merges are learned and the loop honors
  * the shared reliable-checkpoint durability story.
  *
  * Merge application is the standard greedy leftmost-non-overlapping
  * rule, expressed as ONE `aggregate` HOF fold per round (see
  * [[applyMerge]]) — no UDF, no driver round-trip of symbol arrays.
  *
  * [[encode]] is the serving side: the same distinct-words trick (each
  * distinct word is encoded once, then joined back to token positions),
  * so encoding a 100 TB corpus costs one corpus scan for the explode,
  * one vocabulary-scale merge-application chain, and one join keyed on
  * the word — broadcast-able whenever the vocabulary fits, the usual
  * case after length-bounded tokenization. */
object Bpe {

  /** One learned merge: `rank` is application order, `count` the
    * weighted pair frequency that won the round. */
  final case class Merge(rank: Int, lhs: String, rhs: String, count: Long)

  /** End-of-word marker appended to every word's symbol sequence —
    * standard BPE: it lets merges learn suffix units ("est</w>") that
    * never glue across word boundaries. */
  val EndOfWord = "</w>"

  /** A word's initial BPE symbol sequence: its characters plus
    * [[EndOfWord]]. */
  private def charSyms(word: Column): Column =
    concat(transform(sequence(lit(1), length(word)),
      i => word.substr(i, lit(1))), array(lit(EndOfWord)))

  /** The unit tokenizer BPE decomposes: whitespace words by default, or
    * — under `pretokenize` — [[TextAnalysis.preTokens]]' GPT-2-style
    * units, where punctuation splits off its word so merges can learn
    * subwords the whitespace tokenizer hides inside "word," and "word."
    * (they are distinct whitespace tokens but share one pre-token). */
  private def unitTokens(textCol: String, pretokenize: Boolean): Column =
    if (pretokenize) TextAnalysis.preTokens(col(textCol))
    else TextAnalysis.tokens(col(textCol))

  /** Word-frequency table with the initial symbol decomposition:
    * `(word, n, syms)` where `syms` = the word's characters plus
    * [[EndOfWord]]. One corpus scan; everything downstream iterates on
    * this vocabulary-scale frame. */
  def wordTable(docs: DataFrame, textCol: String,
                pretokenize: Boolean = false): DataFrame =
    docs.select(explode(unitTokens(textCol, pretokenize)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("syms", charSyms(col("word")))

  /** Adjacent symbol-pair counts over a word table, weighted by word
    * frequency: `(lhs, rhs, n)`. The counting core of every BPE round
    * (and of [[graft.SparkEntry]]'s `q_bpe_pairs` oracle query). */
  def pairCounts(words: DataFrame): DataFrame = {
    // zip_with over two slices, not transform-with-element_at: the
    // latter re-evaluates the syms expression per element — quadratic
    // per word when projection collapse substitutes the char
    // decomposition into every element_at (see LanguageModel
    // .bigramStructs for the measured cost of that shape)
    val s = col("syms")
    words.select(col("n").as("__wn"),
        explode(when(size(s) < 2,
            array().cast("array<struct<lhs:string,rhs:string>>"))
          .otherwise(zip_with(
            slice(s, lit(1), size(s) - 1),
            slice(s, lit(2), size(s) - 1),
            (a, b) => struct(a.as("lhs"), b.as("rhs"))))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum("__wn").as("n"))
  }

  /** Greedy leftmost-non-overlapping application of ONE merge to a
    * symbol array, as a single fold: append each symbol, except that a
    * symbol equal to `rhs` whose accumulated predecessor is `lhs` fuses
    * with it. Leftmost-first falls out of the fold order; overlap runs
    * resolve like the reference scan ([x,x,x] under (x,x) → [xx,x],
    * because the fused "xx" no longer equals `lhs` when the third x
    * arrives). */
  private[graft] def applyMerge(syms: Column, lhs: String, rhs: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(lhs) && s === lit(rhs),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(lhs + rhs))))
        .otherwise(concat(acc, array(s))))

  /** Learn up to `numMerges` merges from the corpus. Ties break by
    * (count desc, lhs, rhs) — fully deterministic, independent of
    * partitioning, so two trainings of the same corpus produce the same
    * vocabulary anywhere. Stops early when the best remaining pair
    * falls below `minPairCount` (merging singletons learns noise). */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2L,
            pretokenize: Boolean = false): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be positive, got $numMerges")
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    var words = Materialize.eagerCheckpoint(wordTable(docs, textCol, pretokenize))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var continue = true
    while (continue && merges.length < numMerges) {
      val top = pairCounts(words)
        .orderBy(col("n").desc, col("lhs"), col("rhs")).limit(1).collect()
      if (top.isEmpty || top.head.getAs[Long]("n") < minPairCount) continue = false
      else {
        val m = Merge(merges.length, top.head.getAs[String]("lhs"),
          top.head.getAs[String]("rhs"), top.head.getAs[Long]("n"))
        merges += m
        val prev = words
        words = Materialize.eagerCheckpoint(
          prev.withColumn("syms", applyMerge(col("syms"), m.lhs, m.rhs)))
        prev.unpersist(blocking = false)
      }
    }
    words.unpersist(blocking = false)
    merges.toSeq
  }

  /** Persist a merge list as parquet `(rank, lhs, rhs, count)` — the
    * model artifact a tokenizer deployment ships. Tiny (≤ numMerges
    * rows), but parquet keeps it engine-portable and schema'd. */
  def writeMerges(spark: org.apache.spark.sql.SparkSession,
                  merges: Seq[Merge], path: String): Unit =
    spark.createDataFrame(merges).toDF("rank", "lhs", "rhs", "count")
      .write.mode("overwrite").parquet(path)

  /** Load a persisted merge list, rank-ordered. Bounded driver read —
    * the list is the model, numMerges rows by construction. */
  def readMerges(spark: org.apache.spark.sql.SparkSession,
                 path: String): Seq[Merge] =
    spark.read.parquet(path).orderBy("rank").collect().toSeq
      .map(r => Merge(r.getAs[Int]("rank"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("count")))

  /** Apply a learned merge list to a word table's `syms`, in rank
    * order — one fold per merge, lineage truncated every 16 rounds so
    * arbitrarily large vocabularies keep a bounded plan. */
  def encodeWords(words: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.sortBy(_.rank).zipWithIndex.foldLeft(words) {
      case (df, (m, i)) =>
        val next = df.withColumn("syms", applyMerge(col("syms"), m.lhs, m.rhs))
        if ((i + 1) % 16 == 0) Materialize.eagerCheckpoint(next) else next
    }

  /** Tokenize a corpus with a learned merge list: each document's
    * whitespace tokens become the concatenation of their words' BPE
    * symbol sequences, in document order. Output:
    * `(idCol, bpe_tokens, n_bpe_tokens)`; tokenless documents keep an
    * empty array rather than vanishing. The distinct-words trick keeps
    * the merge chain off the corpus: encode once per distinct word,
    * then one word-keyed join back to positions (broadcast when the
    * vocabulary allows). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[Merge],
             pretokenize: Boolean = false): DataFrame = {
    val positions = docs.select(col(idCol),
      posexplode_outer(unitTokens(textCol, pretokenize)).as(Seq("__pos", "word")))
    val encoded = encodeWords(
      positions.filter(col("word").isNotNull).select("word").distinct()
        .withColumn("syms", charSyms(col("word"))),
      merges)
    positions
      .join(encoded, Seq("word"), "left")
      .groupBy(idCol)
      .agg(flatten(transform(
        array_sort(collect_list(when(col("word").isNotNull,
          struct(col("__pos"), col("syms"))))),
        s => s.getField("syms"))).as("bpe_tokens"))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")))
  }
}
