package graft

/** Dev tool (not a spec): quantify guide §1.4's count()-vs-noop-sink
  * question for the bench's timed action. count() can let Catalyst
  * prune columns a real consumer would compute; the noop sink
  * materializes every column. Prints median-of-3 for both actions per
  * query so the gap — if any — is a measured fact, not a guess. */
object NoopProbeTool {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val qs = if (args.nonEmpty) args.toSeq else Seq(
      "q_filter_project", "q_pii_redact", "q_bpe_encode", "q_lm_xent_kn5",
      "q_image_dedup_verified", "q_bm25", "q_topk", "q_curate_full")
    // prewarm both action shapes
    qs.foreach { q =>
      SparkEntry.queries(q)(s, dir).count()
      SparkEntry.queries(q)(s, dir).write.format("noop").mode("overwrite").save()
    }
    def med3(f: => Unit): Double =
      (0 until 3).map { _ =>
        s.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
    qs.foreach { q =>
      val c = med3(SparkEntry.queries(q)(s, dir).count())
      val n = med3(SparkEntry.queries(q)(s, dir)
        .write.format("noop").mode("overwrite").save())
      println(f"$q%-28s count=$c%6.2f  noop=$n%6.2f  ratio=${n / c}%5.2f")
    }
    s.stop()
  }
}
