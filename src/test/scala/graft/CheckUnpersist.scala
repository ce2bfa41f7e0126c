package graft

import graft.operators.Dedup

/** Dev check: CC rounds must not accumulate persisted blocks. */
object CheckUnpersist {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    import spark.implicits._
    // a 60-node chain forces several contraction rounds
    val pairs = (0L until 59L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.duplicateClusters(pairs)
    val n = out.count()
    val persisted = spark.sparkContext.getPersistentRDDs
    println(s"[check] cluster rows: $n, persisted RDDs after CC: ${persisted.size}")
    persisted.values.foreach(r => println(s"  [check] still persisted: ${r.name} ${r.id}"))
    spark.stop()
  }
}
