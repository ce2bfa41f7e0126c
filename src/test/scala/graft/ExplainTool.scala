package graft

/** Dev tool: dump formatted plans for selected queries (not a spec). */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local("8")
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q_embed_lsh_pairs", "q_fresco_pipeline", "q_sessionize")
    qs.foreach { q =>
      println(s"==== $q ====")
      SparkEntry.queries(q)(s, "/root/testdata/sf0.001").explain("formatted")
    }
    s.stop()
  }
}
