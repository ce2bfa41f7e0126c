package graft

/** Smoke: every declared query runs at sf0.001 and yields rows; every query
  * with oracle SQL exists in `queries` (driver-contract invariants). */
class QueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries impl: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_profile_approx tolerance: a coarse-accuracy sketch stays inside " +
    "the GK rank bound against the exact percentile") {
    import org.apache.spark.sql.functions.expr
    // values == ranks, so the GK bound (rank error <= n/accuracy = 100)
    // translates directly: the sketch's p-quantile must land between the
    // exact (p ± 0.011)-quantiles. The band carries ~10 ranks of slack
    // past the guarantee on purpose: percentile() interpolates, so an
    // exact ±0.01 band is fractionally TIGHTER than the rank bound and a
    // boundary-legal sketch output (error exactly 100 ranks, which can
    // shift with partition-merge order across machines) would flake.
    val df = { import spark.implicits._; (0 until 10000).map(_.toDouble).toDF("v") }
    Seq(0.25, 0.5, 0.75).foreach { p =>
      val r = df.agg(
        expr(s"approx_percentile(v, $p, 100)").as("ap"),
        expr(s"percentile(v, ${p - 0.011})").as("lo"),
        expr(s"percentile(v, ${p + 0.011})").as("hi")).head()
      assert(r.getDouble(0) >= r.getDouble(1) && r.getDouble(0) <= r.getDouble(2),
        s"p=$p: sketch ${r.getDouble(0)} outside exact band " +
          s"[${r.getDouble(1)}, ${r.getDouble(2)}]")
    }
  }
}
