package graft

import org.apache.spark.sql.functions._
import graft.operators.{Materialize, Similarity}

/** Dev tool: stage-by-stage timing of the inline IVF-PQ serve at sf0.1 —
  * attribution ground truth for the q_ann_pq bench entry. */
object ProfilePq {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[profile] $name%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val s = Sessions.local("32")
    val e = s.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    t("embeddings count")(e.count())
    val cb = t("trainPq")(
      Similarity.trainPq(e, "vec_id", "embedding", m = 8, ksub = 16))
    val cb2 = t("trainPq (2nd)")(
      Similarity.trainPq(e, "vec_id", "embedding", m = 8, ksub = 16))
    val lazyIx = Similarity.buildPqIndex(e, "vec_id", "embedding", "label", cb)
    t("encode count (lazy)")(lazyIx.count())
    val ix = t("encode eagerCheckpoint")(Materialize.eagerCheckpoint(
      Similarity.buildPqIndex(e, "vec_id", "embedding", "label", cb)))
    val q = e.filter(col("vec_id") < 20)
    t("serve from checkpointed codes")(
      Similarity.ivfTopKPq(ix, e, q, "vec_id", "embedding", "label",
        cb, 3, candidateFactor = 4).count())
    t("serve again (warm)")(
      Similarity.ivfTopKPq(ix, e, q, "vec_id", "embedding", "label",
        cb, 3, candidateFactor = 4).count())
    t("serve from LAZY codes")(
      Similarity.ivfTopKPq(lazyIx, e, q, "vec_id", "embedding", "label",
        cb, 3, candidateFactor = 4).count())
    s.stop()
  }
}
