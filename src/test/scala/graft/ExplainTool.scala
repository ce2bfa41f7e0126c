package graft

/** Dev tool: dump formatted plans for selected queries (not a spec).
  * Dir/cpus from the usual env contract (SPARK_GRAFT_SF_DIR /
  * SPARK_GRAFT_CPUS) so plan captures match the bench's data scale. */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val s = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q_embed_lsh_pairs", "q_fresco_pipeline", "q_sessionize")
    qs.foreach { q =>
      println(s"==== $q ====")
      SparkEntry.queries(q)(s, dir).explain("formatted")
    }
    s.stop()
  }
}
