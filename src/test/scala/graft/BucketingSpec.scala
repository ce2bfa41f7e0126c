package graft

import graft.operators.Bucketing

/** Bucketed joins must be shuffle-free: the whole point of paying the
  * shuffle once at write time. */
class BucketingSpec extends SparkSpec {

  test("same-bucketed tables join without any Exchange in the plan") {
    val sf = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "o_b", "l_orderkey", 8)

    // keep the optimizer from broadcasting so the bucket layout is what
    // decides the physical join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "li_b", "o_b", "l_orderkey")
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"), s"unexpected shuffle:\n$physical")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
