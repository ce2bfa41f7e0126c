package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inverted text index + BM25 ranking (Robertson & Zaragoza 2009, "The
  * Probabilistic Relevance Framework: BM25 and Beyond") — the corpus
  * SEARCH primitive a curation pipeline reaches for when it needs more
  * than membership tests: "which training documents mention this eval
  * phrase", near-decontamination forensics, topical subcorpus pulls.
  * Everything is exact counts + closed-form arithmetic, so the whole
  * path sits under the DuckDB oracle (`q_bm25`).
  *
  * Index = three parts, all derived in ONE corpus scan:
  * `postings(doc, term, tf, dl)` (dl rides the groupBy key — constant
  * per doc, so it costs nothing extra and scoring never joins a
  * doc-length table), `docFreq(term, df)` (vocabulary-scale, derived
  * from postings — never a corpus rescan), and two scalars (N, avgdl).
  *
  * Scoring a query: the query's distinct terms become a LITERAL `isin`
  * predicate on the postings scan — no join for the candidate set, the
  * predicate pushes down to parquet row-group stats when the postings
  * are [[write]]-persisted sorted by term, so a serve reads only the
  * query terms' slices of the index. `docFreq` for those terms is a
  * second pushed-down point read joined broadcast. Per-term partials
  * then sum per doc: one aggregate, keyed on the doc — the only shuffle
  * of a serve, proportional to the MATCHING postings, never the corpus.
  *
  * idf is the "+1" smoothed variant `ln(1 + (N − df + 0.5)/(df + 0.5))`
  * — strictly positive, so a term occurring in most documents dampens
  * rather than flips the score. Query terms are DISTINCT (duplicate
  * words in a query don't double-count — the common simplification; a
  * weighted-query variant is one extra column if ever needed). Output
  * is every document sharing ≥ 1 term, with its matched-term count and
  * score; the caller applies its own top-k (`orderBy(score)` + limit →
  * TakeOrderedAndProject) — the operator doesn't bake in a cut, and
  * the oracle compares the full scored set, which is robust to
  * last-ulp score ties that a rank column would amplify. */
object TextIndex {

  /** A built index: see object doc. `nDocs`/`avgdl` count EVERY corpus
    * row (tokenless docs lower avgdl; they can never match, but they
    * are part of the collection the statistics describe). */
  final case class InvertedIndex(postings: DataFrame, docFreq: DataFrame,
                                 nDocs: Long, avgdl: Double) {
    require(nDocs > 0, "inverted index needs a non-empty corpus")
  }

  /** One corpus scan → the full index. The doc-length `dl` is computed
    * in the same projection as the explode and carried through the
    * groupBy key (constant per doc), so no second scan and no join
    * reassembles it. */
  def build(docs: DataFrame, idCol: String, textCol: String): InvertedIndex = {
    val toks = TextAnalysis.tokens(col(textCol))
    val postings = docs
      .select(col(idCol), col(textCol), size(toks).as("dl"))
      .select(col(idCol), col("dl"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = postings.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)), avg(size(toks))).head()
    InvertedIndex(postings, docFreq, stats.getLong(0),
      Option(stats.get(1)).map(_.asInstanceOf[Double]).getOrElse(0.0))
  }

  /** BM25 over the index for one query string (tokenized with the
    * shared [[TextAnalysis.tokens]] definition, distinct terms).
    * Output: `(idCol, n_matched, score)` for every doc sharing ≥ 1
    * term. */
  def bm25(index: InvertedIndex, idCol: String, query: String,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k1 > 0 && b >= 0 && b <= 1, s"need k1 > 0, b in [0,1]: k1=$k1 b=$b")
    val terms = query.trim.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(terms.nonEmpty, "bm25: empty query")
    val idf = log(lit(1.0) +
      (lit(index.nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5))
    val tfNorm = (col("tf") * (k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / index.avgdl))
    index.postings
      .filter(col("term").isin(terms.map(lit): _*))
      .join(broadcast(index.docFreq.filter(col("term").isin(terms.map(lit): _*))),
        Seq("term"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_matched"), sum(idf * tfNorm).as("score"))
  }

  /** Additive growth — the span-index algebra on the retrieval side:
    * for id-DISJOINT corpora, `merge(build(A), build(B)) ≡ build(A∪B)`.
    * A doc's postings live entirely in one side (union, no re-count),
    * document frequencies and N are additive, and avgdl is the
    * doc-count-weighted mean — so the per-ingest-cycle path is plain
    * append-and-merge, no epoch machinery (spec-pinned, like
    * [[Dedup.mergeSpanIndexes]]). Disjointness is the caller's contract,
    * as there: re-indexing an id would double its postings. */
  def merge(a: InvertedIndex, b: InvertedIndex): InvertedIndex =
    InvertedIndex(
      a.postings.unionByName(b.postings),
      a.docFreq.unionByName(b.docFreq)
        .groupBy("term").agg(sum("df").as("df")),
      a.nDocs + b.nDocs,
      (a.avgdl * a.nDocs + b.avgdl * b.nDocs) / (a.nDocs + b.nDocs))

  /** Persist: postings REPARTITIONED AND SORTED BY TERM (each query
    * term's rows land in few contiguous row groups — the pushed-down
    * `isin` skips the rest via min/max stats), docFreq, and a 1-row
    * meta written LAST (the commit-marker role: a crashed write leaves
    * no meta and [[read]] refuses). */
  def write(index: InvertedIndex, path: String, termPartitions: Int = 32): Unit = {
    require(termPartitions >= 1, s"termPartitions must be positive: $termPartitions")
    index.postings
      .repartitionByRange(termPartitions, col("term"))
      .sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$path/postings")
    index.docFreq.write.mode("overwrite").parquet(s"$path/docfreq")
    val spark = index.postings.sparkSession
    spark.createDataFrame(Seq((index.nDocs, index.avgdl)))
      .toDF("n_docs", "avgdl")
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load a persisted index; the tables stay lazy scans, meta is one
    * bounded driver row. */
  def read(spark: SparkSession, path: String): InvertedIndex = {
    val meta = spark.read.parquet(s"$path/meta").head()
    InvertedIndex(
      spark.read.parquet(s"$path/postings"),
      spark.read.parquet(s"$path/docfreq"),
      meta.getAs[Long]("n_docs"), meta.getAs[Double]("avgdl"))
  }
}
