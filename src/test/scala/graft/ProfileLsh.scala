package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev tool: stage timing of the embed-LSH query at sf0.1. */
object ProfileLsh {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val s = Sessions.local("32")
    val e = s.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val planted = e.select((col("vec_id") + 1000000L).as("vec_id"),
      concat(array(-element_at(col("embedding"), 1)),
        slice(col("embedding"), 2, 63)).as("embedding"))
    val corpus = e.select("vec_id", "embedding").union(planted)
    t("corpus count")(corpus.count())
    val withB = Similarity.withNorm(corpus, "embedding")
      .select(col("vec_id"), col("vec"), col("norm"),
        Similarity.lshBandBuckets(col("embedding"), 64, 24, 8).as("bk"))
    t("buckets compute")(withB.count())
    val n = t("localCheckpoint")(withB.localCheckpoint())
    val banded = n.select(col("vec_id"), posexplode(col("bk")))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
    val cands = banded.select(col("band"), col("bucket"), col("vec_id").as("id_a"))
      .join(banded.select(col("band"), col("bucket"), col("vec_id").as("id_b")), Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
    t("candidates")(println("  candidates: " + cands.count()))
    t("full query")(SparkEntry.queries("q_embed_lsh_pairs")(s, "/root/testdata/sf0.1").count())
    s.stop()
  }
}
