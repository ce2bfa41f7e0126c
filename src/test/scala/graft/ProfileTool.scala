package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev tool: stage-by-stage timing of the dedup pipeline at sf0.1. */
object ProfileTool {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val s = Sessions.local("32")
    val docs = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
    t("docs count")(docs.count())
    val shHof = Dedup.hashShingles(Dedup.wordShingles(docs, "doc_id", "text"))
    t("shingles HOF count")(println("  shingle rows: " + shHof.count()))
    val sh0 = Dedup.hashedWordShingles(docs, "doc_id", "text")
    t("shingles native count")(println("  shingle rows: " + sh0.count()))
    val sh = t("shingles localCheckpoint")(sh0.localCheckpoint())
    val sigs = t("minhash signatures")(Dedup.minhashSignatures(sh, 128).count())
    val sigDf = Dedup.minhashSignatures(sh, 128)
    val cands = Dedup.lshCandidatePairs(sigDf, 32, 128)
    t("lsh candidates")(println("  candidate pairs: " + cands.count()))
    t("verify (jaccardFor)")(println("  verified dups: " +
      Dedup.minhashDuplicates(sh, 0.8).count()))
    t("exact all-pairs")(println("  exact pairs: " + Dedup.jaccardPairs(sh, 0.8).count()))
    t("clusters")(println("  cluster rows: " +
      Dedup.duplicateClusters(Dedup.jaccardPairs(sh, 0.8)).count()))
    s.stop()
  }
}
