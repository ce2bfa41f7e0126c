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

  test("q_curate_lm composition: kept ≡ (served rounded xent ≤ cutoff) minus " +
    "near-dup losers; unscoreable docs never pass the gate") {
    import org.apache.spark.sql.functions._
    val served = SparkEntry.queries("q_lm_xent_served")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val losers = graft.operators.Dedup.minhashDuplicates(
        graft.operators.Dedup.hashedWordShingles(
          SparkEntry.tbl(spark, sf, "documents"), "doc_id", "text"), 0.8)
      .select(col("id_b")).collect().map(_.getLong(0)).toSet
    val expected = served.collect {
      case (id, Some(x)) if x <= SparkEntry.LmCurateMaxXent => id
    }.toSet -- losers
    val kept = SparkEntry.queries("q_curate_lm")(spark, sf).collect()
    assert(kept.map(_.getLong(0)).toSet == expected)
    // the gate compares the ROUNDED value (the hash-gate-proven quantity),
    // so every surfaced xent sits at or under the cutoff exactly
    assert(kept.forall(r => !r.isNullAt(3) &&
      r.getDouble(3) <= SparkEntry.LmCurateMaxXent))
  }

  test("tbl normalizes TIMESTAMP_NTZ reads to session-zoned µs timestamps") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Under a DEFAULT session, naive parquet timestamps (the 2026-08
    // testdata encoding) surface as TIMESTAMP_NTZ and unix_micros-based
    // arithmetic fails analysis. Sessions.local disables that inference,
    // so to exercise tbl's own normalization branch this spec turns it
    // back on for the read, then asserts the loader still hands every
    // query a zoned TIMESTAMP with the identical instant.
    val dir = java.nio.file.Files.createTempDirectory("ntz-tbl").toString
    Seq(("2013-01-01 10:00:00", 1L)).toDF("raw", "user_id")
      .select(col("raw").cast("timestamp_ntz").as("ts"), col("user_id"))
      .write.parquet(s"$dir/events.parquet")
    val key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    spark.conf.set(key, "true")
    try {
      val raw = spark.read.parquet(s"$dir/events.parquet")
      assert(raw.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampNTZType,
        "precondition: the naive file must read as NTZ with inference on")
      val loaded = SparkEntry.tbl(spark, dir, "events")
      assert(loaded.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType)
      val micros = loaded.select(unix_micros(col("ts"))).head().getLong(0)
      assert(micros == 1357034400000000L) // 2013-01-01T10:00:00Z, UTC session
    } finally spark.conf.set(key, "false")
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
